package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** Wall-clock attribution for minhashPairs (q38) at one SF: times
  * (a) the shingle build + pin, (b) signatures + collision join +
  * candidate dedup over the pinned shingles, (c) the exact rerank joins
  * + IntersectCount — so the expensive phase gets a name.
  *
  * Usage: runMain graft.tools.MinhashPhaseProbe <sfDir> [iters]
  */
object MinhashPhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val p = spark.sparkContext.defaultParallelism
    def t(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    (1 to iters).foreach { it =>
      val docs = Tables.documents(spark, d)
      val sh = graft.ops.Par.fanOut(
          docs.select(col("doc_id").as("id"), col("text")))
        .select(col("id"),
          TextFunctions.distinctWordNGrams(col("text"), 3).as("shingles"))
        .filter(size(col("shingles")) > 0)
        .persist()
      val (tSh, nSh) = t(sh.count())
      val sigs = sh.select(col("id"),
        posexplode_outer(graft.functions.MinHashSig(col("shingles"), 8, 42)))
        .select(col("id"), col("pos").as("t"), col("col").as("h"))
        .filter(col("h").isNotNull)
      val sigsP = sigs.repartition(p, col("t"), col("h"))
      val cand = sigsP.as("a").hint("shuffle_hash")
        .join(sigsP.as("b"),
          col("a.t") === col("b.t") && col("a.h") === col("b.h") &&
            col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b")).agg(lit(1))
        .select("id_a", "id_b")
        .persist()
      val (tCand, nCand) = t(cand.count())
      val reranked = cand.repartition(p, col("id_a"))
        .join(sh.select(col("id").as("id_a"), col("shingles").as("_sa")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("shingles").as("_sb")), "id_b")
        .withColumn("_inter",
          graft.functions.IntersectCount(col("_sa"), col("_sb")))
        .withColumn("est_jaccard", round(col("_inter") /
          (size(col("_sa")) + size(col("_sb")) - col("_inter")), 6))
        .filter(col("est_jaccard") >= 0.2)
        .select("id_a", "id_b", "est_jaccard")
      val (tRerank, nOut) = t(reranked.queryExecution.toRdd.count())
      println(f"[mhp] $d iter=$it shingle_pin=$tSh%.2f s ($nSh docs) " +
        f"cand=$tCand%.2f s ($nCand pairs) rerank=$tRerank%.2f s ($nOut out)")
      // VARIANT: same rerank with the arrays slimmed to sorted long
      // hashes before the joins — isolates how much of the rerank is
      // fat-payload shuffle vs join mechanics
      val shH = sh.select(col("id"),
        array_sort(transform(col("shingles"), x => xxhash64(x))).as("hs"))
        .persist()
      shH.count()
      val rerankH = cand.repartition(p, col("id_a"))
        .join(shH.select(col("id").as("id_a"), col("hs").as("_ha")), "id_a")
        .join(shH.select(col("id").as("id_b"), col("hs").as("_hb")), "id_b")
        .withColumn("_inter", size(array_intersect(col("_ha"), col("_hb"))))
        .withColumn("est_jaccard", round(col("_inter") /
          (size(col("_ha")) + size(col("_hb")) - col("_inter")), 6))
        .filter(col("est_jaccard") >= 0.2)
        .select("id_a", "id_b", "est_jaccard")
      val (tRerankH, nOutH) = t(rerankH.queryExecution.toRdd.count())
      println(f"[mhp] $d iter=$it rerank_hashed=$tRerankH%.2f s ($nOutH out)")
      shH.unpersist()
      sh.unpersist(); cand.unpersist()
      ()
    }
    spark.stop()
  }
}
