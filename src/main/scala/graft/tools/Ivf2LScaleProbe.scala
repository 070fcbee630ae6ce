package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Cap-bound-regime adjudication of the r15 two-level IVF quantizer
  * (r14 verdict "What's wrong #1" Done criterion): on a synthetic
  * clustered corpus big enough that sqrt-n cells exceed the flat cap,
  * compare
  *
  *   - the PRE-r15 operating point — nClusters pinned at the old 4096
  *     cap, so cell size is n/4096 and the constant candidate budget is
  *     unsatisfiable (per-query candidates ≈ nProbeFloor × n/4096,
  *     linear in n), against
  *   - the r15 route — nClusters forced past the cap (two-level product
  *     codebook), cells sized so the auto probe is back at
  *     ~AutoProbeBudget candidate rows per query,
  *
  * measuring per-query CANDIDATE ROWS, batch serve wall, and planted-
  * twin top-1 recall (must be 1.0 structurally on both). A smaller
  * decade (default n/10, auto-sized flat) anchors the serve exponent.
  *
  * args: [nMillions=20] [dim=16] [nQueries=2000] [outDir=/tmp/graft_ivf2l]
  *       [arms=all] (comma list of small_auto,big_cap4096,big_twolevel,
  *       big_auto — corpora are reused if already generated, so a
  *       single arm re-runs in build+serve time only)
  * Needs SPARK_DRIVER_MEM=16g+.
  */
object Ivf2LScaleProbe {
  def main(args: Array[String]): Unit = {
    val nM = if (args.length > 0) args(0).toDouble else 20.0
    val dim = if (args.length > 1) args(1).toInt else 16
    val nQ = if (args.length > 2) args(2).toInt else 2000
    val out = if (args.length > 3) args(3) else "/tmp/graft_ivf2l"
    val arms: Set[String] =
      if (args.length > 4 && args(4) != "all") args(4).split(",").toSet
      else Set("small_auto", "big_cap4096", "big_twolevel", "big_auto")
    val n = (nM * 1e6).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic UNIFORM pseudorandom corpus, all codegen (no UDF,
    // no RNG): xxhash64-derived coords in [-1, 1). Uniform is the right
    // shape for a COST-LAW probe — KMeans splits it into balanced
    // Voronoi cells, so candidates-per-query measures the sizing rule,
    // not accidental mode collapse (a low-mode synthetic collapses both
    // quantizers to the mode count and the comparison measures nothing;
    // first attempt's 64-center corpus occupied ~286 of 20k cells).
    // Twin recall stays structural at 1.0 regardless of distribution.
    def gen(rows: Long, dir: String): Unit = {
      if (new java.io.File(s"$dir/_SUCCESS").exists()) {
        println(s"REUSE $dir"); return
      }
      spark.range(0L, rows, 1L, cpus.toInt * 4)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => pmod(xxhash64(col("id") * dim + j), lit(1L << 20))
              .cast("double") / (1L << 19) - 1.0).as("embedding"))
        .write.mode("overwrite").parquet(dir)
    }

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    /** Per-query candidate rows under the index's AUTO probe — the
      * serve-side cost law the verdict flagged. Mirrors
      * probeIvfIndexBatch's candidate join, counted instead of reranked.
      */
    def candidateRows(dir: String, queries: DataFrame): (Long, Int) = {
      val quant = Similarity.loadQuantizer(spark, dir)
      val rows = Similarity.loadBuildMeta(spark, dir)._1.get
      val nProbe = Similarity.autoNProbe(quant.numCells, rows)
      val probes = queries.select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("_qv"))
        .withColumn("_cell", explode(quant.probeCells(
          graft.functions.L2Normalize(col("_qv")), nProbe)))
      val cand = probes
        .join(spark.read.parquet(s"$dir/cells"), "_cell")
        .count()
      (cand, nProbe)
    }

    def serve(dir: String, queries: DataFrame): Double = {
      val t0 = System.nanoTime()
      Similarity.probeIvfIndexBatch(queries, "embedding", "vec_id", dir,
        k = 1).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    def twinRecall(dir: String, queries: DataFrame): Double = {
      val res = Similarity.probeIvfIndexBatch(
        queries.withColumn("vec_id", col("vec_id") + 1000000000L),
        "embedding", "vec_id", dir, k = 1)
      val hits = res.filter(col("neighbor_id") ===
        col("query_id") - 1000000000L && col("cos") === 1.0).count()
      hits.toDouble / queries.count()
    }

    def report(tag: String, dir: String, corpus: DataFrame): Unit = {
      val q = Similarity.loadQuantizer(spark, dir)
      val queries = corpus.filter(pmod(col("vec_id"),
        lit(math.max(1L, n / nQ))) === 0)
      val (cand, nProbe) = candidateRows(dir, queries)
      val nq = queries.count()
      val s1 = serve(dir, queries)
      val s2 = serve(dir, queries)
      println(f"REPORT $tag cells=${q.numCells} twoLevel=" +
        q.isInstanceOf[Similarity.TwoLevelQuantizer] +
        f" nProbe=$nProbe candPerQuery=${cand / math.max(1, nq)}" +
        f" serveMin=${math.min(s1, s2)}%.1f s (n_queries=$nq)" +
        f" twinRecall=${twinRecall(dir, queries)}%.3f")
    }

    // decade anchor: n/10, auto-sized (flat — under the cap)
    val dSmall = s"$out/corpus_small"
    val dBig = s"$out/corpus_big"
    timed("gen_small") { gen(n / 10, dSmall) }
    timed("gen_big") { gen(n, dBig) }
    val small = spark.read.parquet(dSmall)
    val big = spark.read.parquet(dBig)

    if (arms("small_auto")) {
      timed("build_small_auto") {
        Similarity.writeIvfIndex(small, "embedding", "vec_id",
          s"$out/idx_small_auto", maxIter = 3)
      }
      report("small_auto", s"$out/idx_small_auto", small)
    }

    // pre-r15 operating point: flat codebook pinned at the old cap
    if (arms("big_cap4096")) {
      timed("build_big_cap4096") {
        Similarity.writeIvfIndex(big, "embedding", "vec_id",
          s"$out/idx_big_cap", nClusters = 4096, maxIter = 3,
          recallCurveSamples = 0)
      }
      report("big_cap4096", s"$out/idx_big_cap", big)
    }

    // r15 route, forced: cells explicitly past the cap (two-level),
    // sized so the auto probe is back at the candidate budget
    if (arms("big_twolevel")) {
      val forced = math.max(Similarity.FlatCellCap + 1,
        (n / (Similarity.AutoProbeBudget / 4)).toInt)
      timed("build_big_twolevel") {
        Similarity.writeIvfIndex(big, "embedding", "vec_id",
          s"$out/idx_big_2l", nClusters = forced, maxIter = 3,
          recallCurveSamples = 0)
      }
      report("big_twolevel", s"$out/idx_big_2l", big)
    }

    // auto at n (autoCells: budget-driven cells past ~1.86M rows,
    // two-level once past the flat cap)
    if (arms("big_auto")) {
      timed("build_big_auto") {
        Similarity.writeIvfIndex(big, "embedding", "vec_id",
          s"$out/idx_big_auto", maxIter = 3, recallCurveSamples = 0)
      }
      report("big_auto", s"$out/idx_big_auto", big)
    }

    spark.stop()
  }
}
