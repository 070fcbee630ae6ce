package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** Candidate-volume census for the shingle-join family (q36/q38/q64):
  * per SF, the exploded-index row count, distinct shingles, the df
  * distribution's top buckets, and the pair volume sum_s C(df_s, 2) —
  * plus how much of the index (and of the pair volume) df=1 shingles
  * account for, i.e. the ceiling for a df>=2 prefilter.
  *
  * Usage: runMain graft.tools.ShingleVolumeProbe [sfDirs...]
  */
object ShingleVolumeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1", "/tmp/graft_sf10")
    dirs.foreach { d =>
      val docs = Tables.documents(spark, d)
      val sh = graft.ops.Par.fanOut(
          docs.select(col("doc_id").as("doc"), col("text")))
        .select(col("doc"), explode_outer(
          filter(TextFunctions.distinctWordNGrams(col("text"), 3),
            s => length(s) > 0)).as("s"))
        .filter(col("s").isNotNull)
      val dfs = sh.groupBy("s").agg(count(lit(1)).as("df"))
      val stats = dfs.agg(
        count(lit(1)).as("distinct_s"),
        sum(col("df")).as("index_rows"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("df1_s"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("df1_rows"),
        sum(col("df") * (col("df") - 1) / 2).as("pairs"),
        max(col("df")).as("max_df")).first()
      println(s"[shvol] $d distinct_s=${stats.getLong(0)} " +
        s"index_rows=${stats.getLong(1)} df1_s=${stats.getLong(2)} " +
        s"pairs=${stats.getAs[Any](4)} max_df=${stats.getLong(5)}")
      val top = dfs.orderBy(desc("df")).limit(8).collect()
        .map(r => r.getLong(1)).mkString(",")
      println(s"[shvol] $d top df: $top")
      // distinct candidate pairs (>=1 shared shingle) vs pair volume:
      // the multiplicity ratio bounds what slimming the pair-agg key +
      // joining sizes back could save over carrying n_a/n_b through
      val pairs = sh.as("a").hint("shuffle_hash")
        .join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
        .groupBy(col("a.doc").as("da"), col("b.doc").as("db"))
        .agg(count(lit(1)).as("n_inter"))
      val pstats = pairs.agg(count(lit(1)), avg("n_inter"),
        sum(when(col("n_inter") >= 10, 1L).otherwise(0L))).first()
      println(s"[shvol] $d distinct_pairs=${pstats.getLong(0)} " +
        f"avg_inter=${pstats.getDouble(1)}%.2f inter10=${pstats.getLong(2)}")
    }
    spark.stop()
  }
}
