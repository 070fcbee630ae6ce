package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted plans for selected queries to audit
  * pushdown/broadcast/codegen at the physical level.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q02_filter_project")
    val spark = graft.tools.Sessions.build("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .explain("formatted")
    }
    spark.stop()
  }
}
