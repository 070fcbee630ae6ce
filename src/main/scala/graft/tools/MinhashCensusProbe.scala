package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** Candidate-volume census for minhashPairs (q38): per SF, the signature
  * row count, the (t,h) collision-join volume, distinct candidate pairs,
  * and how many survive the exact rerank — locating q38's cost between
  * collision generation, pair dedup, and rerank.
  *
  * Usage: runMain graft.tools.MinhashCensusProbe [sfDirs...]
  */
object MinhashCensusProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf10")
    dirs.foreach { d =>
      val docs = Tables.documents(spark, d)
      val sh = graft.ops.Par.fanOut(
          docs.select(col("doc_id").as("id"), col("text")))
        .select(col("id"),
          TextFunctions.distinctWordNGrams(col("text"), 3).as("shingles"))
        .filter(size(col("shingles")) > 0)
      val sigs = sh.select(col("id"),
        posexplode_outer(graft.functions.MinHashSig(col("shingles"), 8, 42)))
        .select(col("id"), col("pos").as("t"), col("col").as("h"))
        .filter(col("h").isNotNull)
      val p = spark.sparkContext.defaultParallelism
      val sigsP = sigs.repartition(p, col("t"), col("h"))
      val joined = sigsP.as("a").hint("shuffle_hash")
        .join(sigsP.as("b"),
          col("a.t") === col("b.t") && col("a.h") === col("b.h") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .persist()
      val collisions = joined.count()
      val cand = joined.groupBy("id_a", "id_b").agg(count(lit(1)).as("m"))
        .persist()
      val cstats = cand.agg(count(lit(1)), avg("m"), max("m")).first()
      println(s"[mhc] $d sig_rows=${sigs.count()} collisions=$collisions " +
        s"cand=${cstats.getLong(0)} " +
        f"avg_mult=${cstats.getDouble(1)}%.2f max_mult=${cstats.getLong(2)}")
      // per-(t,h) bucket df census: the join volume is sum C(df,2)
      val bdf = sigsP.groupBy("t", "h").agg(count(lit(1)).as("df"))
      val bs = bdf.agg(count(lit(1)), max("df"),
        sum(col("df") * (col("df") - 1) / 2)).first()
      println(s"[mhc] $d buckets=${bs.getLong(0)} max_bucket_df=${bs.getLong(1)} " +
        s"pair_volume=${bs.getAs[Any](2)}")
      joined.unpersist(); cand.unpersist()
      ()
    }
    spark.stop()
  }
}
