package graft.search

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.CvResults
import graft.plan.{Folds, ParamGrid}

/** Data-parallel grid search — the 100 TB-safe generalization the
  * broadcast path can't reach (SURVEY.md §7.4): when X exceeds executor
  * memory, the DATA stays a distributed DataFrame with a fold COLUMN and
  * each (candidate, fold) task is itself a distributed Spark ML fit. The
  * task axis is driver-sequenced (each fit already uses the whole
  * cluster); the relational skeleton — fold predicate, score frame,
  * CvResults mean/std/rank, best-candidate refit — is byte-identical to
  * the broadcast path, which is the point: switching regimes changes the
  * executor, not the semantics.
  *
  * Param names map to Spark ML LogisticRegression: `reg_param`,
  * `elastic_net`, `max_iter`.
  */
/** Data-parallel forest — the same broadcast-overflow fallback for the
  * tree-ensemble family: when X outgrows executor memory, train ONE
  * distributed Spark ML forest (data-parallel tree induction over the
  * full DataFrame) instead of `DistForest`'s per-seed task fan-out over
  * broadcast data. Same trade the reference documents
  * (`examples/search/spark_ml.py:31-40`): task-parallel wins while data
  * fits — each tree sees all rows with zero coordination — and this path
  * takes over when it doesn't.
  */
class DataParallelForest(nEstimators: Int = 100,
                         maxDepth: Int = 5,
                         seed: Long = 42) extends Serializable {
  def fit(spark: SparkSession, df: DataFrame,
          featuresCol: String, labelCol: String):
      org.apache.spark.ml.classification.RandomForestClassificationModel = {
    val prepared = df.select(
      array_to_vector(col(featuresCol).cast("array<double>")).as("_features"),
      col(labelCol).cast("double").as("_label"))
    new org.apache.spark.ml.classification.RandomForestClassifier()
      .setFeaturesCol("_features").setLabelCol("_label")
      .setNumTrees(nEstimators).setMaxDepth(maxDepth).setSeed(seed)
      .fit(prepared)
  }

  /** Predictions joined back as a column (probability as array<double>). */
  def transform(model: org.apache.spark.ml.classification.RandomForestClassificationModel,
                df: DataFrame, featuresCol: String): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val prepared = df.withColumn("_features",
      array_to_vector(col(featuresCol).cast("array<double>")))
    model.transform(prepared)
      .withColumn("probs", vector_to_array(col("probability")))
      .withColumn("preds", col("prediction").cast("int"))
      .drop("_features", "rawPrediction", "probability", "prediction")
  }
}

class DataParallelGridSearch(grid: Map[String, Seq[Double]],
                             cv: Int = 3,
                             scoring: String = "accuracy",
                             seed: Long = 42) extends Serializable {

  final case class DpResult(cvResults: DataFrame,
                            bestParams: Map[String, Double],
                            bestScore: Double,
                            bestModel: org.apache.spark.ml.classification.LogisticRegressionModel,
                            bestCandidateId: Int)

  private def mkEstimator(params: Map[String, Double]): LogisticRegression =
    new LogisticRegression()
      .setFeaturesCol("_features").setLabelCol("_label")
      // multinomial even for 2 classes: k coefficient rows, so the fitted
      // model converts losslessly to the engine's k x (d+1) LogRegModel
      .setFamily("multinomial")
      .setRegParam(params.getOrElse("reg_param", 0.0))
      .setElasticNetParam(params.getOrElse("elastic_net", 0.0))
      .setMaxIter(params.getOrElse("max_iter", 50.0).toInt)

  def fit(spark: SparkSession, df: DataFrame,
          featuresCol: String, labelCol: String): DpResult = {
    val cands = ParamGrid.expand(
      grid.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) })
      .map(_.map { case (k, v) => k -> v.asInstanceOf[Double] })
    fitCandidates(spark, df, featuresCol, labelCol, cands)
  }

  /** Same search over an EXPLICIT candidate list (already in Spark ML
    * param names: reg_param / elastic_net / max_iter) — the entry point
    * the broadcast-path searches auto-route through, so candidate_id
    * stays aligned with the caller's own candidate ordering.
    */
  def fitCandidates(spark: SparkSession, df: DataFrame,
                    featuresCol: String, labelCol: String,
                    cands: Seq[Map[String, Double]]): DpResult = {
    require(cands.nonEmpty, "empty candidate list")
    val prepared = df.select(
      array_to_vector(col(featuresCol).cast("array<double>")).as("_features"),
      col(labelCol).cast("double").as("_label"))
      // fold by hashed row position, NOT the label (fold-label correlation
      // would skew CV); stable within a job, which is all CV needs
      .withColumn("_fold", Folds.byHash(monotonically_increasing_id(), cv, seed))
      .cache() // scanned once per (candidate, fold) fit — keep it hot
    prepared.count()

    val evaluator = new MulticlassClassificationEvaluator()
      .setLabelCol("_label").setMetricName(scoring)

    val scoreRows = for {
      (params, ci) <- cands.zipWithIndex
      fold <- 0 until cv
    } yield {
      val train = prepared.filter(col("_fold") =!= fold)
      val test = prepared.filter(col("_fold") === fold)
      val model = mkEstimator(params).fit(train)
      val score = evaluator.evaluate(model.transform(test))
      (ci, fold, score, test.count())
    }
    import spark.implicits._
    val scores = scoreRows.toDF("candidate_id", "fold_id", "score", "n_test")
    val agg = CvResults.aggregate(scores, Seq("candidate_id")).cache()
    val bestRow = CvResults.best(agg, Seq("candidate_id")).head()
    val bestId = bestRow.getAs[Int]("candidate_id")
    val best = mkEstimator(cands(bestId)).fit(prepared)
    prepared.unpersist()
    DpResult(agg.orderBy("candidate_id"), cands(bestId),
      bestRow.getAs[Double]("mean_test_score"), best, bestId)
  }
}

/** Lossless conversion of a fitted (multinomial) Spark ML logistic model
  * into the engine's LogRegModel, so the data-parallel route returns the
  * SAME model type as the broadcast route — callers never see which
  * executor regime ran.
  */
object SparkMLBridge {
  def toLogRegModel(
      m: org.apache.spark.ml.classification.LogisticRegressionModel): graft.exec.LogRegModel = {
    val k = m.numClasses
    val d = m.numFeatures
    val cm = m.coefficientMatrix
    val iv = m.interceptVector
    val weights = Array.tabulate(k) { c =>
      val row = new Array[Double](d + 1)
      var j = 0
      while (j < d) { row(j) = cm(c, j); j += 1 }
      row(d) = iv(c)
      row
    }
    graft.exec.LogRegModel(weights, k)
  }
}
