package graft.dedup

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for web-scale corpora: exact (hash-groupBy),
  * exact n-gram Jaccard (shingle inverted-index join), MinHash LSH
  * (Spark ML), SimHash banding, and embedding-cosine near-dup.
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
    val filtered =
      if (maxShingleDf == Int.MaxValue) sh
      else {
        val hot = sh.groupBy("s").agg(count(lit(1)).as("df_count"))
          .filter(col("df_count") > maxShingleDf).select("s")
        sh.join(hot, Seq("s"), "left_anti")
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

  /** MinHash LSH candidate pairs (Spark ML): shingles → binary HashingTF
    * vector → MinHashLSH.approxSimilarityJoin. Returns (id_a, id_b,
    * jaccard_distance <= maxDistance). The LSH OR-amplification over
    * `numHashTables` keeps the join sub-quadratic at corpus scale.
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, numHashTables: Int = 8,
                   maxDistance: Double = 0.8, numFeatures: Int = 1 << 18,
                   seed: Long = 42): DataFrame = {
    val shingled = df.select(col(idCol).as("id"),
      array_distinct(TextFunctions.wordNGrams(col(textCol), n)).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setBinary(true).setNumFeatures(numFeatures)
    val vecs = tf.transform(shingled).select("id", "features")
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = mh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, maxDistance, "dist")
      .filter(col("datasetA.id") < col("datasetB.id"))
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        round(lit(1.0) - col("dist"), 6).as("est_jaccard"))
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
