package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Par
import graft.text.TextFunctions

/** Bisect per-expression cost over the documents table: times each named
  * pipeline twice and prints the min. For finding which part of a dedup
  * plan actually burns the CPU.
  */
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Par.fanOut(Tables.documents(spark, sfDir).select("doc_id", "text"))

    def timed(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"EXPR $name%-28s ${ts.map(_._1).min}%8.3f s  n=${ts.head._2}")
    }

    timed("baseline_len") {
      docs.agg(sum(length(col("text")))).head(); docs.count()
    }
    timed("tokens_count") {
      docs.select(sum(size(TextFunctions.tokens(col("text"))))).head(); 1L
    }
    timed("xxhash_tokens") {
      docs.select(sum(size(transform(TextFunctions.tokens(col("text")),
        t => xxhash64(t))))).head(); 1L
    }
    timed("simhash_only") {
      docs.select(sum(bit_count(TextFunctions.simhash(col("text"))))).head(); 1L
    }
    timed("simhash_banded_explode") {
      val wh = TextFunctions.withSimhash(docs, "text", "doc_id")
        .select(col("doc_id").as("id"), col("simhash"))
      val bits = 16
      wh.select(col("id"), col("simhash"),
        explode_outer(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("simhash"), b * bits)
              .bitwiseAND((1L << bits) - 1).as("key"))
        }: _*)).as("bk")).count()
    }
    timed("full_q37") {
      graft.dedup.Dedup.simhashPairs(
        Tables.documents(spark, sfDir), "text", "doc_id", 3, 4).count()
    }
    timed("ngrams_only") {
      docs.select(sum(size(array_distinct(
        TextFunctions.wordNGrams(col("text"), 3))))).head(); 1L
    }
    timed("ngram_shingles_codegen") {
      docs.select(sum(size(
        TextFunctions.distinctWordNGrams(col("text"), 3)))).head(); 1L
    }
    // minhash sub-pipelines (mirrors Dedup.minhashPairs internals)
    val sh = docs.select(col("doc_id").as("id"),
      TextFunctions.distinctWordNGrams(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    timed("mh_shingles") { sh.count() }
    val seed = 42L
    val sigs = sh.select(col("id"),
      explode_outer(array((0 until 8).map { t =>
        struct(lit(t).as("t"),
          array_min(transform(col("shingles"),
            s => xxhash64(s, lit(seed + t)))).as("h"))
      }: _*)).as("sig"))
      .select(col("id"), col("sig.t").as("t"), col("sig.h").as("h"))
    timed("mh_signatures") { sigs.count() }
    timed("mh_candidates") {
      val p = spark.sparkContext.defaultParallelism
      sigs.repartition(p, col("t"), col("h"))
        .groupBy("t", "h").agg(collect_list(col("id")).as("ids"))
        .filter(size(col("ids")) > 1).count()
    }
    timed("full_q38") {
      graft.dedup.Dedup.minhashPairs(
        Tables.documents(spark, sfDir), "text", "doc_id", 3, 8, 0.2).count()
    }
    spark.stop()
  }
}
