package graft.tools

/** Times the driver's `SparkEntry.entry` smoke (flagship grid search). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.entry(spark).collect()
    println(f"ENTRY rows=${rows.length} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    rows.foreach(r => println(s"ENTRY $r"))
    spark.stop()
  }
}
