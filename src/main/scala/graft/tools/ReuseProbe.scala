package graft.tools

import org.apache.spark.sql.functions._

/** Minimal reproduction probe: does exchange/stage reuse fire for a
  * self-join over (a) a bare scan-derived frame, (b) an explicitly
  * repartition'd frame, (c) a PERSISTED frame, (d) a persisted +
  * repartition'd frame — the q38 shape? Prints ReusedExchange counts
  * from the final AQE plan for each.
  *
  * Usage: runMain graft.tools.ReuseProbe
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = spark.range(0, 200000).select(col("id"),
      pmod(col("id"), lit(1000)).as("k"))

    def reuseCount(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .split("== Initial Plan ==")(0)
      (plan.split("\n").count(_.contains("ReusedExchange")),
        plan.split("\n").count(l => l.contains("Exchange") &&
          !l.contains("Reused")))
    }
    def selfJoin(f: org.apache.spark.sql.DataFrame) =
      f.as("a").hint("shuffle_hash").join(f.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
        .groupBy(col("a.id")).agg(count(lit(1)))

    val bare = base
    println(s"[reuse] bare scan self-join: ${reuseCount(selfJoin(bare))}")
    val rep = base.repartition(8, col("k"))
    println(s"[reuse] repartitioned self-join: ${reuseCount(selfJoin(rep))}")
    val pinned = base.persist()
    pinned.count()
    println(s"[reuse] persisted self-join: ${reuseCount(selfJoin(pinned))}")
    val pinnedRep = pinned.repartition(8, col("k"))
    println(s"[reuse] persisted+repartitioned self-join: " +
      s"${reuseCount(selfJoin(pinnedRep))}")
    // (e) cache ABOVE the exchange: if InMemoryTableScan preserves the
    // cached repartition's HashPartitioning, the self-join needs NO
    // exchange at all — the workaround for (c)/(d)'s broken reuse
    val repPinned = base.repartition(8, col("k")).persist()
    repPinned.count()
    println(s"[reuse] repartitioned-then-persisted self-join " +
      s"(want 0 exchanges): ${reuseCount(selfJoin(repPinned))}")
    spark.stop()
  }
}
