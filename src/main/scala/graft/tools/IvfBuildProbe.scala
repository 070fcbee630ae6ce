package graft.tools

import org.apache.spark.sql.functions._

/** Decompose `Similarity.writeIvfIndex`'s cost by PHASE across three
  * data decades (sf0.1 / ×100 / ×1000 ~ 2k / 200k / 2M vectors), so the
  * q94_build exponent has an attribution, not a guess. Phases:
  *
  *   load    — persist + count of the vector-valid corpus
  *   fit     — quantizer train-set filter + spherical KMeans fit
  *             (k-means|| init included; maxIter=5 as q94_build runs it)
  *   assign  — fused NearestCentroid argmin over the full corpus +
  *             repartition(_cell) + hive-partitioned parquet write
  *   curve   — the measured recall-rank pass (256 samples × corpus)
  *   total   — one plain `writeIvfIndex` end-to-end for the headline
  *
  * Usage: SPARK_DRIVER_MEM=32g sbt "runMain graft.tools.IvfBuildProbe"
  * Writes one line per (decade, phase) with seconds; exponents printed
  * per phase at the end. Min-of-ITERS (SPARK_GRAFT_PROBE_ITERS, def 2).
  */
object IvfBuildProbe {
  def main(args: Array[String]): Unit = {
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "2").toInt
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sim.Similarity

    val base = "/root/testdata/sf0.1"
    val d10 = "/tmp/graft_docs_sf10"
    val d100 = "/tmp/graft_docs_sf100"
    ScaleDataGen.generate(spark, base, 100, d10, Set("embeddings"))
    ScaleDataGen.generate(spark, base, 1000, d100, Set("embeddings"))

    def minOf(f: () => Unit): Double =
      (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min

    val results = scala.collection.mutable.LinkedHashMap[(String, String), Double]()
    for ((tag, dir) <- Seq("d1" -> base, "d10" -> d10, "d100" -> d100)) {
      import org.apache.spark.ml.functions.array_to_vector
      val emb = graft.Tables.embeddings(spark, dir)
      val idx = s"/tmp/ivf_build_probe_$tag"

      // --- phased run (mirrors writeIvfIndex's internals) ---
      val toVec = Similarity.spreadNarrow(
          emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
            .filter(col("vec").isNotNull && size(col("vec")) > 0))
        .withColumn("_nv",
          array_to_vector(Similarity.normalized(col("vec").cast("array<double>"))))
      var nRows = 0L
      val pinned = toVec.persist()
      results((tag, "load")) = minOf(() => { nRows = pinned.count() })
      val kCells = math.max(16, math.min(4096,
        math.ceil(math.sqrt(nRows.toDouble)).toInt))
      val train = Similarity.quantizerTrainSet(pinned, "id", nRows, kCells)
      val trainRows = train.count()
      var centers: Seq[(Int, Seq[Double])] = Seq.empty
      results((tag, "fit")) = minOf(() => {
        val km = Similarity.fitSphericalKMeans(train, "_nv", kCells, 42L, 5)
        centers = km.clusterCenters.zipWithIndex
          .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      })
      val assigned = pinned.withColumn("_cell", graft.functions.NearestCentroid(
          Similarity.normalized(col("vec").cast("array<double>")), centers))
        .select(col("id"), col("vec"), col("_cell"))
      results((tag, "assign")) = minOf(() =>
        assigned.repartition(col("_cell"))
          .write.mode("overwrite").partitionBy("_cell").parquet(s"$idx/cells"))
      results((tag, "curve")) = minOf(() => {
        // mirror writeIvfIndex's callsite: curve over the written index
        val cellsDf = spark.read.parquet(s"$idx/cells")
          .select("id", "vec", "_cell")
        val r = Similarity.measureRecallRanks(cellsDf,
          Similarity.FlatQuantizer(centers), 256)
        require(r.length > 0 || nRows < 2)
      })
      pinned.unpersist(blocking = true)
      results((tag, "total")) = minOf(() =>
        Similarity.writeIvfIndex(emb, "embedding", "vec_id", idx, maxIter = 5))
      println(f"PHASES $tag rows=$nRows cells=$kCells train=$trainRows " +
        Seq("load", "fit", "assign", "curve", "total")
          .map(p => f"$p=${results((tag, p))}%.2fs").mkString(" "))
    }
    for (p <- Seq("load", "fit", "assign", "curve", "total")) {
      val e1 = math.log10(results(("d10", p)) / results(("d1", p))) / 2.0
      val e2 = math.log10(results(("d100", p)) / results(("d10", p)))
      println(f"EXPONENT $p%-7s e(1->10)=$e1%.2f e(10->100)=$e2%.2f")
    }
    spark.stop()
  }
}
