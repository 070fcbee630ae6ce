package graft.tools

import org.apache.spark.sql.functions._

object PinDebug {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, d)

    def show(label: String, q: org.apache.spark.sql.DataFrame): Unit = {
      println(s"== $label")
      q.queryExecution.executedPlan.toString.split("\n")
        .filter(_.contains("artitioning")).foreach(l =>
          println("   " + l.trim.take(140)))
    }

    val base = docs.select(col("doc_id").as("id"),
      graft.text.TextFunctions.distinctWordNGrams(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)

    // uncached
    val sigsU = base.select(col("id"),
      posexplode_outer(graft.functions.MinHashSig(col("shingles"), 8, 42)))
      .select(col("id"), col("pos").as("t"), col("col").as("h"))
      .filter(col("h").isNotNull)
    val sU = sigsU.repartition(3, col("t"), col("h"))
    show("uncached selfjoin", sU.as("a").hint("shuffle_hash").join(sU.as("b"),
      col("a.t") === col("b.t") && col("a.h") === col("b.h") &&
        col("a.id") < col("b.id")).groupBy(col("a.id"), col("b.id")).count())

    // cached
    val pinned = graft.ops.Par.pinLatest("pindebug.sh", base)
    val sigsC = pinned.select(col("id"),
      posexplode_outer(graft.functions.MinHashSig(col("shingles"), 8, 42)))
      .select(col("id"), col("pos").as("t"), col("col").as("h"))
      .filter(col("h").isNotNull)
    val sC = sigsC.repartition(3, col("t"), col("h"))
    show("cached selfjoin", sC.as("a").hint("shuffle_hash").join(sC.as("b"),
      col("a.t") === col("b.t") && col("a.h") === col("b.h") &&
        col("a.id") < col("b.id")).groupBy(col("a.id"), col("b.id")).count())

    // cached, no join — bare repartition
    show("cached bare repartition", sC)
    spark.stop()
  }
}
