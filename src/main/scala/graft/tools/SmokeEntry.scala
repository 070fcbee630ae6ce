package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev replica of the driver's t1 smoke: run SparkEntry.entry, print the
  * result; exits nonzero if it yields no rows.
  */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.tools.Sessions.build("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.show(20, truncate = false)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
