package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway probe: behavior of batch + raw-streaming event reads over the
  * regenerated (micros) testdata layout.
  */
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    println("BATCH ts type: " + ev.schema.find(_.name == "ts").get.dataType)
    ev.select(min("ts"), max("ts")).show(false)
    try {
      val st = graft.streaming.Streams.readEventsRaw(
        spark, "/root/testdata/sf0.001", glob = "events.parquet")
      val out = graft.streaming.Streams.runToMemory(
        graft.streaming.Streams.windowedRollup(st),
        s"probe_${System.nanoTime}", "complete")
      out.select(min("window_start"), max("window_start"), count(lit(1))).show(false)
    } catch { case e: Throwable =>
      println("STREAM FAILED: " + e.getMessage.take(500))
    }
    // pushdown check: a ts filter should reach the parquet scan
    val filtered = ev.filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"))
      .select("event_id")
    val physical = filtered.queryExecution.executedPlan.toString
    println("PUSHED: " + physical.linesIterator
      .filter(_.contains("PushedFilters")).mkString(" | ").take(300))
    println("COUNT>=jan15: " + filtered.count())
    spark.stop()
  }
}
