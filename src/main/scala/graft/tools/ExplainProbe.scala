package graft.tools

/** Prints the formatted physical plan of one registered query plus the
  * red-flag summary the plan-audit loop actually greps for (cartesian /
  * nested-loop joins, codegen stage count, exchanges) — the
  * `.explain("formatted")`-and-iterate discipline as a one-command
  * probe.
  *
  * Usage: runMain graft.tools.ExplainProbe <queryName> [sfDir]
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ExplainProbe <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    // AQE finalizes (and codegen-collapses) the plan only on execution,
    // and only on THIS QueryExecution — df.count() would execute a
    // different wrapped plan and leave this one at the initial guess
    df.queryExecution.toRdd.count()
    // formatted mode AFTER execution reflects the final AQE plan and
    // names WholeStageCodegen spans explicitly
    val full = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // post-execution AQE output appends the pre-execution tree under an
    // "Initial Plan" header — count markers in the FINAL plan only
    val plan = full.split("== Initial Plan ==")(0)
    def n(marker: String) = plan.split("\n").count(_.contains(marker))
    println(s"[explain] $name: cartesian=${n("CartesianProduct")} " +
      s"bnlj=${n("BroadcastNestedLoop")} " +
      s"exchanges=${n("Exchange")} " +
      s"codegen_stages=${
        org.apache.spark.sql.GraftSqlBridge.codegenStageCount(df)} " +
      s"sorts=${n("Sort ")}")
    spark.stop()
  }
}
