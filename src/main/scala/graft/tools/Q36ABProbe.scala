package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Par
import graft.text.TextFunctions

/** Interleaved A/B for q36's inverted-index self-join key: xxhash64(shingle)
  * long vs the raw shingle string. Host throughput drifts 2-3x between
  * sessions, so cross-round bench numbers cannot adjudicate the r13
  * hashed-key change — alternating the two shapes inside ONE JVM does.
  * Usage: runMain graft.tools.Q36ABProbe [sfDir] [iters]
  */
object Q36ABProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val iters = if (args.length > 1) args(1).toInt else 4
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()

    def pairs(hashed: Boolean): DataFrame = {
      val base = Par.fanOut(docs.select(col("doc_id").as("doc"),
        col("text").as("text")))
      val arr = filter(TextFunctions.distinctWordNGrams(col("text"), 3),
        s => length(s) > 0)
      val shRaw = base.select(col("doc"), arr.as("_arr"))
        .select(col("doc"), size(col("_arr")).as("n_sh"),
          explode_outer(col("_arr")).as("s"))
        .filter(col("s").isNotNull)
      val sh =
        if (hashed) shRaw.select(col("doc"), col("n_sh"),
          xxhash64(col("s")).as("s"))
        else shRaw
      sh.as("a").hint("shuffle_hash")
        .join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
        .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
          col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
        .agg(count(lit(1)).as("n_inter"))
        .withColumn("jaccard",
          round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6))
        .filter(col("jaccard") >= 0.2)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    }

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // code-cache occupancy per iteration: if the slow iterations
    // correlate with full CodeHeap pools, the spikes are sweeper-induced
    // recompile churn, not plan cost
    import scala.jdk.CollectionConverters._
    def codeHeap: String = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(p => f"${p.getName.replace("CodeHeap '", "").replace("'", "")}=" +
        f"${p.getUsage.getUsed / 1048576}%d/${p.getUsage.getMax / 1048576}%dMB")
      .mkString(" ")
    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime

    val hs = collection.mutable.ArrayBuffer.empty[Double]
    val ss = collection.mutable.ArrayBuffer.empty[Double]
    (1 to iters).foreach { i =>
      val j0 = jitMs
      hs += time(pairs(hashed = true))
      val j1 = jitMs
      ss += time(pairs(hashed = false))
      println(f"[q36ab] iter $i hashed=${hs.last}%.2f(jit=${j1 - j0}ms) " +
        f"string=${ss.last}%.2f(jit=${jitMs - j1}ms)  $codeHeap")
    }
    println(f"[q36ab] $sfDir  hashed min=${hs.min}%.2f  string min=${ss.min}%.2f" +
      f"  ratio=${hs.min / ss.min}%.2f")
    spark.stop()
  }
}
