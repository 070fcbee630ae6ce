package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Stage-level timing for q64_neardup_survivors — the last >1.0 decade
  * exponent on the board (e(1→10) ≈ 1.05 in r9). The query is three
  * stages: n-gram Jaccard pair generation (q36's path, measured e 0.97
  * alone), connected components over the pair graph, and the survivors
  * anti-join + lang rollup. This probe times each stage separately per
  * SF and prints the components route taken (driver union-find vs
  * distributed min-label rounds) with the edge count, so the
  * superlinear term gets a NAME instead of a hypothesis.
  *
  * Usage: runMain graft.tools.NeardupStageProbe [sfDirs...]
  * (defaults to sf0.1 + the ScaleDataGen sf1/sf10 doc dirs, generating
  * them if absent)
  */
object NeardupStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dirs =
      if (args.nonEmpty) args.toSeq
      else {
        val base = "/root/testdata/sf0.1"
        val d1 = "/tmp/graft_docs_sf1"
        val d10 = "/tmp/graft_docs_sf10"
        val tables = Set("documents", "embeddings")
        ScaleDataGen.generate(spark, base, 10, d1, tables)
        ScaleDataGen.generate(spark, base, 100, d10, tables)
        Seq(base, d1, d10)
      }
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "2").toInt

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    println(f"[neardup] ${"dir"}%-24s ${"pairs_s"}%8s ${"nPairs"}%8s " +
      f"${"comp_s"}%8s ${"route"}%-7s ${"surv_s"}%8s ${"total_s"}%8s")
    dirs.foreach { d =>
      val docs = Tables.documents(spark, d)
      docs.count() // warm footers
      // candidate-volume law: the self-join emits sum_s C(df_s, 2) rows;
      // if that is linear across decades, a superlinear pairs-stage time
      // is CPU/shuffle constants, not a plan blow-up
      val dfHist = docs.select(col("doc_id"),
          explode(graft.text.TextFunctions.distinctWordNGrams(col("text"), 3))
            .as("s"))
        .filter(length(col("s")) > 0)
        .groupBy("s").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("index_rows"),
          sum(col("c") * (col("c") - 1) / 2).as("cand_pairs"),
          max(col("c")).as("max_df"))
        .head()
      println(s"[neardup] $d index_rows=${dfHist.getLong(0)} " +
        s"cand_pairs=${dfHist.getDouble(1).toLong} max_df=${dfHist.getLong(2)}")
      val best = (1 to iters).map { _ =>
        val (pairs, tPairs) = t {
          val p = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
            n = 3, minJaccard = 0.2, maxShingleDf = Int.MaxValue)
            .persist()
          p.count()
          p
        }
        val nPairs = pairs.count()
        val route = if (nPairs * 2 <= (1L << 20)) "driver" else "dist"
        val (comps, tComp) = t {
          val c = Dedup.components(pairs).persist()
          c.count()
          c
        }
        val (_, tSurv) = t {
          val removed = comps.filter(col("id") =!= col("comp"))
            .select(col("id").as("doc_id"))
          docs.join(removed, Seq("doc_id"), "left_anti")
            .groupBy("lang").agg(count(lit(1))).count()
        }
        pairs.unpersist(); comps.unpersist()
        (tPairs, nPairs, tComp, route, tSurv)
      }.minBy(r => r._1 + r._3 + r._5)
      val (tPairs, nPairs, tComp, route, tSurv) = best
      println(f"[neardup] $d%-24s $tPairs%8.2f $nPairs%8d " +
        f"$tComp%8.2f $route%-7s $tSurv%8.2f ${tPairs + tComp + tSurv}%8.2f")
    }
    spark.stop()
  }
}
