package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe for `compactSpanIndex`: probe latency against a span index
  * holding the SAME corpus as (a) one base batch, (b) base + many small
  * append batches (the many-small-files shape months of crawl appends
  * produce), (c) the compacted index. The probe work is identical in all
  * three — only the file layout differs — so the delta is pure
  * listing/footer/row-group overhead, the cost compaction exists to
  * remove.
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.nonEmpty) args(0).toInt else 40
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val batchRows = math.max(1L, n / nBatches)
    println(s"[compact] corpus $n docs, $nBatches append batches of ~$batchRows")

    val root = java.nio.file.Files.createTempDirectory("compactprobe").toString
    val probe = docs.limit(64)

    def timeProbe(dir: String, label: String): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.dedup.SubstringDedup.spansAgainstIndex(
          probe.withColumn("doc_id", col("doc_id") + 10000000L),
          "text", "doc_id", dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[compact] $label%-28s min ${ts.min}%6.2f s")
      ts.min
    }

    // (a) whole corpus in ONE base batch
    val oneDir = s"$root/one"
    graft.dedup.SubstringDedup.writeSpanIndex(docs, "text", "doc_id", oneDir)
    timeProbe(oneDir, "single base batch")

    // (b) same corpus split over nBatches appends
    val manyDir = s"$root/many"
    val bucketed = docs.withColumn("_b", pmod(col("doc_id"), lit(nBatches)))
    graft.dedup.SubstringDedup.writeSpanIndex(
      bucketed.filter(col("_b") === 0).drop("_b"), "text", "doc_id", manyDir)
    (1 until nBatches).foreach { b =>
      graft.dedup.SubstringDedup.appendToSpanIndex(
        bucketed.filter(col("_b") === b).drop("_b"), "text", "doc_id",
        manyDir, batchId = s"b$b")
    }
    val tMany = timeProbe(manyDir, s"$nBatches append batches")

    // (c) compacted
    graft.dedup.SubstringDedup.compactSpanIndex(spark, manyDir, "compacted")
    val tComp = timeProbe(manyDir, "after compactSpanIndex")
    println(f"[compact] compaction speedup at $nBatches batches: ${tMany / tComp}%4.2fx")

    spark.stop()
  }
}
