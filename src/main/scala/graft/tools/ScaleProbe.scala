package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dev probe: dedup operators at 100x the testdata document count.
  * Synthesizes N docs (~60 tokens from a 5k-word vocab) with 1% planted
  * near-duplicates, then times minhash / simhash / exact-jaccard and
  * reports recall of the planted pairs. Validates the candidate-join
  * strategy beyond toy scale before trusting it at 100 TB.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vocabSize = 5000
    val docLen = 60
    // deterministic synthetic corpus, generated distributed
    val base = spark.range(n.toLong).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until docLen).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(vocabSize)))): _*)
        .as("text"))
    // plant near-dups: docs [0, n/100) copied with one token changed
    val dups = base.filter(col("doc_id") < n / 100)
      .select((col("doc_id") + n).as("doc_id"),
        concat(lit("wCHANGED "), substring_index(col("text"), " ", docLen - 1)).as("text"))
    val docs = base.union(dups).cache()
    println(s"[scale] corpus = ${docs.count()} docs")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val planted = n / 100
    val mh = timed("minhashPairs") {
      Dedup.minhashPairs(docs, "text", "doc_id", n = 3, numHashTables = 8,
        minJaccard = 0.5).cache().count()
    }
    println(s"[scale] minhash pairs = $mh (planted $planted)")

    val sh = timed("simhashPairs") {
      Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3, bands = 4)
        .count()
    }
    println(s"[scale] simhash pairs = $sh")

    val jac = timed("ngramJaccardPairs(df-capped)") {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
        minJaccard = 0.5, maxShingleDf = 50).count()
    }
    println(s"[scale] exact jaccard pairs = $jac")

    // ANN at scale: synthetic 32-dim embeddings, IVF vs brute force on a
    // 100-query panel.
    val dim = 32
    val emb = spark.range(n.toLong).select(col("id").as("vec_id"),
      array((0 until dim).map(j =>
        (pmod(xxhash64(col("id") % 50, lit(j)), lit(1000)) / 500.0 - 1.0) +
          (pmod(xxhash64(col("id"), lit(j + dim)), lit(100)) / 500.0)): _*)
        .as("embedding")).cache()
    emb.count()
    val queries = emb.filter(col("vec_id") < 100)
    val exact = timed("bruteForceTopK(100q)") {
      graft.sim.Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val ivf = timed("ivfTopK(100q)") {
      graft.sim.Similarity.ivfTopK(emb, queries, "embedding", "vec_id", 10,
        nClusters = 50, nProbe = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(f"[scale] IVF recall vs brute force = ${(exact & ivf).size.toDouble / exact.size}%.3f")

    // hot-path scoring: Scala UDF vs codegen'd LinearScore expression on a
    // frame big enough (1M x 64) that per-row boxing, not job scheduling,
    // is the cost
    val bigN = 1000000L
    val big = spark.range(bigN).select(
      array((0 until dim).map(j =>
        (pmod(xxhash64(col("id"), lit(j)), lit(1000)) / 500.0 - 1.0)): _*)
        .as("v")).cache()
    big.count()
    val w = Array.tabulate(dim)(j => (j * 37 % 19 - 9) / 10.0)
    val udfScore = udf((v: Seq[Double]) => {
      var s = 0.5; var j = 0
      while (j < v.length && j < w.length) { s += w(j) * v(j); j += 1 }
      s
    })
    def sumOf(c: org.apache.spark.sql.Column): Double =
      big.select(sum(c)).head().getDouble(0)
    sumOf(udfScore(col("v"))) // warm
    sumOf(graft.functions.LinearScore(col("v"), w, 0.5))
    val reps = 5
    val tU = System.nanoTime()
    (1 to reps).foreach(_ => sumOf(udfScore(col("v"))))
    val udfSec = (System.nanoTime() - tU) / 1e9
    val tE = System.nanoTime()
    (1 to reps).foreach(_ => sumOf(graft.functions.LinearScore(col("v"), w, 0.5)))
    val exprSec = (System.nanoTime() - tE) / 1e9
    println(f"[scale] score ${bigN} rows x$reps: udf = $udfSec%.2f s, " +
      f"codegen expr = $exprSec%.2f s (${udfSec / exprSec}%.2fx)")
    spark.stop()
  }
}
