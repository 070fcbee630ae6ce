package graft.tools

import graft.dedup.Dedup

/** Interleaved same-JVM A/B of ngramJaccardPairs' prefix-filter route vs
  * the full-index route (r15 verdict item 4): args = sfDir [iters].
  * Prints per-arm times and checks the two routes return identical pair
  * sets (count + xor-hash of rounded rows — cheap full-result compare).
  */
object PrefixFilterABProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val t = if (args.length > 2) args(2).toDouble else 0.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    def arm(prefix: Boolean) =
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
        minJaccard = t, maxShingleDf = Int.MaxValue, prefixFilter = prefix)
    // result signature: count + xor of per-row hashes (order-free)
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("id_a"), col("id_b"),
          round(col("jaccard"), 6))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    println(s"prefix sig: ${sig(arm(true))}")
    println(s"full   sig: ${sig(arm(false))}")
    require(sig(arm(true)) == sig(arm(false)), "ROUTES DIVERGED")
    // warm both arms, then interleave
    arm(true).queryExecution.toRdd.count()
    arm(false).queryExecution.toRdd.count()
    val (tp, tf) = (Array.ofDim[Double](iters), Array.ofDim[Double](iters))
    (0 until iters).foreach { i =>
      def t(df: org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      tp(i) = t(arm(true)); tf(i) = t(arm(false))
      println(f"iter $i: prefix ${tp(i)}%.2f s  full ${tf(i)}%.2f s")
    }
    println(f"MIN prefix ${tp.min}%.2f s  full ${tf.min}%.2f s  " +
      f"ratio ${tp.min / tf.min}%.2f")
    spark.stop()
  }
}
