package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage split for q62-class IVF cost at scale: L2-normalize+cache,
  * spherical-KMeans fit (kmeans|| init + Lloyd iterations), and the
  * probe/rerank tail — answers "is the quantizer FIT the q62 floor, and
  * would a sample-fit quantizer (the faiss train-on-sample design) pay?"
  * before any code changes. Also times the PRODUCTION sample-fit variant
  * (`Similarity.quantizerTrainSet` — the shipped sampler, not a probe
  * re-implementation) and compares quantizer QUALITY under two
  * non-vacuous metrics:
  *
  *  - full-corpus inertia (mean squared distance to the assigned
  *    centroid, the k-means objective itself) — sample/full ratio close
  *    to 1.0 means the sampled fit found centroids as good as the full
  *    fit's;
  *  - NATURAL top-1 recall at the auto probe fraction (cells/16,
  *    floor 3): for a slice of query vectors, is the exact nearest
  *    NON-IDENTICAL neighbor's cell among the query's probed cells?
  *
  * Planted-twin recall is deliberately NOT a metric here: an identical
  * vector maps to the same cell under ANY deterministic quantizer
  * (same input, same transform), so it reads 1.0 for an arbitrarily bad
  * sample fit — it validates the q62 oracle's robustness, not quantizer
  * quality. (An earlier version of this probe also joined each probe
  * row to ITSELF, making the readout doubly tautological.)
  *
  * Usage: runMain graft.tools.IvfFitStageProbe [sfDir]
  */
object IvfFitStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_docs_sf10")
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
      .withColumn("_nv", graft.functions.L2Normalize(col("_cv")))
      .withColumn("_vec", array_to_vector(col("_nv"))).cache()
    val n = t("normalize+cache")(toVec.count())
    val kCells = math.max(16, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))
    val nProbe = math.max(3, kCells / 16)
    println(s"[ivffit] n=$n cells=$kCells nProbe=$nProbe")

    import org.apache.spark.ml.clustering.KMeans
    def fit(df: org.apache.spark.sql.DataFrame) =
      new KMeans().setK(kCells).setSeed(42).setMaxIter(5)
        .setFeaturesCol("_vec").setPredictionCol("_cell").fit(df)

    val fullModel = t("fit FULL corpus")(fit(toVec))
    // the PRODUCTION sampler, not a re-implementation: an earlier version
    // floored the modulus (n/cap vs ceil) and measured a ~1.3× larger
    // sample than production ships — the probe exists to adjudicate the
    // production trade, so it must draw the production sample
    val sample = graft.sim.Similarity.quantizerTrainSet(
      toVec, "neighbor_id", n, kCells).cache()
    val sn = sample.count()
    println(s"[ivffit] sample rows=$sn (production cap=${
      math.max(128L * kCells, 1L << 16)})")
    val sampleModel = t(s"fit SAMPLE")(fit(sample))

    def centDf(model: org.apache.spark.ml.clustering.KMeansModel) =
      spark.createDataFrame(model.clusterCenters.zipWithIndex
          .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq)
        .toDF("_cell", "_centroid")

    val sq2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)

    // k-means objective on the FULL corpus: how good are the centroids
    // the sampled fit found, measured on data it never saw?
    def inertia(model: org.apache.spark.ml.clustering.KMeansModel): Double =
      model.transform(toVec).select(col("_nv"), col("_cell"))
        .join(broadcast(centDf(model)), "_cell")
        .agg(avg(sq2(col("_nv"), col("_centroid")))).head().getDouble(0)

    // natural serving recall: every `step`-th vector queries the index;
    // hit = the exact nearest NON-IDENTICAL neighbor's assigned cell is
    // among the query's nProbe nearest centroids (the ivfTopK metric).
    // Identical twins are excluded from the exact-neighbor pick (cos
    // rounds to 1.0) precisely because they cannot miss.
    def naturalRecall(model: org.apache.spark.ml.clustering.KMeansModel): Double = {
      val step = math.max(1L, n / 500)
      val assigned = model.transform(toVec)
        .select(col("neighbor_id").as("nid"), col("_cell"))
      val queries = toVec.filter(pmod(col("neighbor_id"), lit(step)) === 0)
        .select(col("neighbor_id").as("qid"), col("_nv").as("_qv")).cache()
      val dot = aggregate(zip_with(col("_qv"), col("_nv"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      val exact = queries
        .crossJoin(toVec.select(col("neighbor_id").as("nid"), col("_nv")))
        .filter(col("qid") =!= col("nid"))
        .withColumn("_cos", dot)
        .filter(col("_cos") < 0.999999) // identical vectors can't miss
        .withColumn("_rn", row_number().over(
          Window.partitionBy("qid").orderBy(desc("_cos"), asc("nid"))))
        .filter(col("_rn") === 1).select("qid", "nid")
      val probed = queries.crossJoin(broadcast(centDf(model)))
        .withColumn("_d2", sq2(col("_qv"), col("_centroid")))
        .withColumn("_rn", row_number().over(
          Window.partitionBy("qid").orderBy(asc("_d2"), asc("_cell"))))
        .filter(col("_rn") <= nProbe).select("qid", "_cell")
      val nq = queries.count().toDouble
      val hits = exact.join(assigned, "nid").join(probed, Seq("qid", "_cell"))
        .count()
      queries.unpersist()
      hits / nq
    }

    val iFull = t("inertia FULL")(inertia(fullModel))
    val iSample = t("inertia SAMPLE")(inertia(sampleModel))
    println(f"[ivffit] inertia full=$iFull%.6f sample=$iSample%.6f " +
      f"ratio=${iSample / iFull}%.4f")
    val rFull = t("natural recall FULL")(naturalRecall(fullModel))
    val rSample = t("natural recall SAMPLE")(naturalRecall(sampleModel))
    println(f"[ivffit] natural top-1 recall @nProbe=$nProbe " +
      f"full=$rFull%.4f sample=$rSample%.4f")
    spark.stop()
  }
}
