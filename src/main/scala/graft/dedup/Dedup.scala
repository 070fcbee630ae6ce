package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for web-scale corpora: exact (hash-groupBy),
  * exact n-gram Jaccard (shingle inverted-index join), MinHash LSH
  * (Spark ML), SimHash banding, and embedding-cosine near-dup.
  *
  * Cache lifetime: the self-join intermediates below are `.cache()`d and
  * intentionally NOT unpersisted — the returned DataFrames are lazy and
  * may re-evaluate after return, so eager unpersist would break them.
  * Long-lived sessions calling these repeatedly rely on Spark's LRU
  * storage eviction; callers wanting deterministic release should
  * materialize the result and `spark.catalog.clearCache()`.
  *
  * Scale design: every pairwise method avoids the O(n²) cross join —
  * candidate pairs come from an equi-join on a shared key (shingle, LSH
  * bucket, simhash band), which Spark executes as a shuffled hash join on
  * that key. Hot keys (stop-shingles shared by millions of docs) are the
  * classic skew hazard, so shingle joins drop shingles above a document-
  * frequency cap — the standard trick, and it also removes the quadratic
  * blowup of a single viral shingle.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per normalized-text fingerprint.
    * One shuffle on the fingerprint; survivors join back by id would be a
    * second — instead we keep (fingerprint → survivor, group size).
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val survivors = exactGroups(df, textCol, idCol)
      .select(col("keep_id").as(idCol))
    df.join(survivors, idCol)
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle:
    * explode distinct shingles → self-join on shingle (inverted index) →
    * |A∩B| via groupBy pair → Jaccard with |A|+|B|-|A∩B|.
    *
    * `maxShingleDf` drops shingles appearing in more docs than the cap
    * (skew + noise control at scale; pass Int.MaxValue to disable).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int, minJaccard: Double,
                        maxShingleDf: Int = 1000): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"),
        explode(array_distinct(TextFunctions.wordNGrams(col(textCol), n))).as("s"))
      .filter(length(col("s")) > 0)
    val filtered = {
      val base =
        if (maxShingleDf == Int.MaxValue) sh
        else {
          val hot = sh.groupBy("s").agg(count(lit(1)).as("df_count"))
            .filter(col("df_count") > maxShingleDf).select("s")
          sh.join(hot, Seq("s"), "left_anti")
        }
      // consumed 3x (sizes + both join sides): cache the shingle index so
      // tokenize/shingle/explode runs once, not three times.
      base.cache()
    }
    val sizes = filtered.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = filtered.as("a")
      .join(filtered.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash LSH near-dup pairs, engine-native: per-table signature
    * h_t = min over shingles of xxhash64(shingle, seed_t) (all codegen'd
    * higher-order functions), candidates from an equi-join on the LONG
    * (table, signature) key — a real hash join, unlike Spark ML's
    * approxSimilarityJoin whose VectorUDT key forces a non-codegen join —
    * then an exact Jaccard rerank (array_intersect on the shingle sets)
    * keeps only pairs >= minJaccard. OR-amplification over
    * `numHashTables` gives recall ≈ 1-(1-J)^k; the post-filter gives
    * precision 1, so the output equals exact Jaccard pairs restricted to
    * LSH-recalled candidates — sub-quadratic at corpus scale.
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, numHashTables: Int = 8,
                   minJaccard: Double = 0.2,
                   seed: Long = 42): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextFunctions.wordNGrams(col(textCol), n)).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .cache() // reused: signature build + two candidate-rerank joins
    val sigs = sh.select(col("id"),
      explode(array((0 until numHashTables).map { t =>
        struct(lit(t).as("t"),
          array_min(transform(col("shingles"),
            s => xxhash64(s, lit(seed + t)))).as("h"))
      }: _*)).as("sig"))
      .select(col("id"), col("sig.t").as("t"), col("sig.h").as("h"))
    val cand = sigs.as("a")
      .join(sigs.as("b"),
        col("a.t") === col("b.t") && col("a.h") === col("b.h") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("shingles").as("_sa")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("_sb")), "id_b")
      .withColumn("_inter", size(array_intersect(col("_sa"), col("_sb"))))
      .withColumn("est_jaccard", round(col("_inter") /
        (size(col("_sa")) + size(col("_sb")) - col("_inter")), 6))
      .filter(col("est_jaccard") >= minJaccard)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Banding: split the 64-bit hash into `bands` chunks; by pigeonhole any
    * pair within maxHamming (< bands) shares at least one exact band, so
    * candidates come from equi-joins on (band index, band bits) — never a
    * cross join.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands > maxHamming, "need bands > maxHamming for pigeonhole recall")
    val bits = 64 / bands
    val withHash = TextFunctions.withSimhash(df, textCol, idCol, "simhash")
      .select(col(idCol).as("id"), col("simhash"))
    val banded = withHash.select(col("id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * bits)
            .bitwiseAND(if (bits == 64) -1L else (1L << bits) - 1).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .cache() // self-joined: avoid recomputing the simhash aggregation twice
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        TextFunctions.hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs above `minCosine`, via the ANN
    * machinery (sign-sketch banding) in graft.sim.Similarity.
    */
  def embeddingPairs(df: DataFrame, vecCol: String, idCol: String,
                     minCosine: Double, planes: Int = 16,
                     seed: Long = 42): DataFrame =
    graft.sim.Similarity.cosinePairs(df, vecCol, idCol, minCosine, planes, seed)
}
