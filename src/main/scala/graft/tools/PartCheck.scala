package graft.tools
import org.apache.spark.sql.functions._
object PartCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/tmp/graft_sf10"
    val docs = graft.Tables.documents(spark, d)
    println("docs partitions=" + docs.rdd.getNumPartitions + " rows=" + docs.count())
    def t(f: => Unit): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    val fn = graft.SparkEntry.queries("q32_quality")
    fn(spark, "/root/testdata/sf0.01").queryExecution.toRdd.count() // warm
    val plain = (1 to 2).map(_ => t(fn(spark, d).queryExecution.toRdd.count())).min
    val fanned = (1 to 2).map(_ => t {
      val df = graft.ops.Par.fanOut(docs).select(
        col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).as("token_count"),
        round(graft.text.TextFunctions.avgWordLen(col("text")), 4).as("avg_word_len"),
        round(graft.text.TextFunctions.stopwordRatio(col("text")), 4).as("stopword_ratio"),
        graft.text.TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
      df.queryExecution.toRdd.count()
    }).min
    println(f"[part] q32 plain=$plain%.1f s   fanned=$fanned%.1f s")
    spark.stop()
  }
}
