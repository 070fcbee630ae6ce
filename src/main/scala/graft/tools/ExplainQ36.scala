package graft.tools
object ExplainQ36 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q36_ngram_jaccard")(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
    spark.stop()
  }
}
