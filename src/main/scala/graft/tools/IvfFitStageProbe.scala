package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Stage split for q62-class IVF cost at scale: L2-normalize+cache,
  * spherical-KMeans fit (kmeans|| init + Lloyd iterations), and the
  * probe/rerank tail — answers "is the quantizer FIT the q62 floor, and
  * would a sample-fit quantizer (the faiss train-on-sample design) pay?"
  * before any code changes. Also times a sample-fit variant directly:
  * fit on a deterministic hash-sample capped at `samplePerCell × cells`
  * rows, assign the FULL corpus, and compare planted-twin top-1 recall
  * (the q62 oracle property) against the full fit.
  *
  * Usage: runMain graft.tools.IvfFitStageProbe [sfDir] [samplePerCell]
  */
object IvfFitStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_docs_sf10")
    val perCell = args.lift(1).map(_.toInt).getOrElse(128)
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.ml.functions.array_to_vector

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivffit] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    val emb = Tables.embeddings(spark, sfDir)
    val toVec = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("_cv"))
      .withColumn("_vec", array_to_vector(
        graft.functions.L2Normalize(col("_cv")))).cache()
    val n = t("normalize+cache")(toVec.count())
    val kCells = math.max(16, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))
    println(s"[ivffit] n=$n cells=$kCells")

    import org.apache.spark.ml.clustering.KMeans
    def fit(df: org.apache.spark.sql.DataFrame) =
      new KMeans().setK(kCells).setSeed(42).setMaxIter(5)
        .setFeaturesCol("_vec").setPredictionCol("_cell").fit(df)

    val fullModel = t("fit FULL corpus")(fit(toVec))
    val cap = perCell * kCells
    val sample = toVec.filter(
      pmod(xxhash64(col("neighbor_id")), lit(math.max(1L, n / cap))) === 0L)
      .cache()
    val sn = sample.count()
    println(s"[ivffit] sample rows=$sn (cap=$cap)")
    val sampleModel = t(s"fit SAMPLE")(fit(sample))

    // planted-twin recall under each quantizer: every 50th vector's twin
    // (identical vector) must land in the probed cells — q62's oracle
    // property, seed-free by construction
    def twinRecall(model: org.apache.spark.ml.clustering.KMeansModel): Double = {
      val assigned = model.transform(toVec).select("neighbor_id", "_cell")
      val probesQ = toVec.filter(pmod(col("neighbor_id"), lit(50)) === 0)
        .select(col("neighbor_id").as("query_id"), col("_vec"))
      val qCells = model.transform(probesQ.withColumnRenamed("_vec", "_v")
          .withColumnRenamed("_v", "_vec"))
        .select(col("query_id"), col("_cell").as("_qcell"))
      val hit = qCells.join(assigned,
          qCells("query_id") === assigned("neighbor_id") &&
            qCells("_qcell") === assigned("_cell"))
        .count()
      hit.toDouble / qCells.count()
    }
    val rFull = t("assign+twin-check FULL")(twinRecall(fullModel))
    val rSample = t("assign+twin-check SAMPLE")(twinRecall(sampleModel))
    println(f"[ivffit] twin-in-own-cell full=$rFull%.4f sample=$rSample%.4f")
    spark.stop()
  }
}
