package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.CvResults
import graft.exec.{Learner, Metrics, Model, ModelParallel}
import graft.exec.ModelParallel.{FitTask, TrainMatrix}
import graft.plan.{ParamGrid, ParamSampler}

/** Search meta-estimators: distributed hyperparameter search over
  * candidates × CV folds (reference `search.py` DistBaseSearchCV /
  * DistGridSearchCV / DistRandomizedSearchCV / DistMultiModelSearch).
  *
  * Pipeline (SURVEY.md §3.1): driver enumerates the candidate lattice →
  * task fan-out against the broadcast matrix (ModelParallel.run) →
  * `CvResults.aggregate` (groupBy + window rank, fully distributed) →
  * best candidate → driver refit on the full matrix.
  */
final case class SearchResult(cvResults: DataFrame,
                              bestParams: Map[String, Double],
                              bestScore: Double,
                              bestCandidateId: Int,
                              bestModel: Model)

class DistGridSearchCV(learner: Learner,
                       grid: Map[String, Seq[Double]],
                       cv: Int = 5,
                       scoring: String = "accuracy",
                       iid: Boolean = false,
                       seed: Long = 42,
                       errorScore: Option[Double] = None) extends Serializable {

  /** Secondary metrics (reference scorer-dict): each task still fits once;
    * cv_results grows mean_test_<m>/std_test_<m> columns per metric while
    * rank/best stay on the primary `scoring` (the refit metric).
    */
  private var extraScorings: Seq[String] = Nil
  def withExtraScorings(names: Seq[String]): this.type = {
    extraScorings = names; this
  }

  protected def candidates(): Seq[Map[String, Double]] =
    ParamGrid.expand(grid.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) })
      .map(_.map { case (k, v) => k -> v.asInstanceOf[Double] })

  def fit(spark: SparkSession, df: DataFrame,
          featuresCol: String, labelCol: String): SearchResult = {
    val matrix = ModelParallel.collectMatrix(df, featuresCol, labelCol, cv, seed)
    fitMatrix(spark, matrix)
  }

  def fitMatrix(spark: SparkSession, matrix: TrainMatrix): SearchResult = {
    val cands = candidates()
    require(cands.nonEmpty, "empty parameter grid")
    val bc = spark.sparkContext.broadcast(matrix)
    val tasks = for {
      (params, ci) <- cands.zipWithIndex
      fold <- 0 until cv
    } yield FitTask(ci * cv + fold, ci, fold, params)

    // cached: `best()` below and the returned cvResults both consume this
    // frame — without the cache every later action re-runs the whole fit
    // fan-out. One row per candidate, so the cache is tiny.
    val agg = {
      val a =
        if (extraScorings.isEmpty)
          CvResults.aggregate(
            ModelParallel.run(spark, tasks, bc, learner, scoring, seed, errorScore),
            Seq("candidate_id"), iid = iid)
        else
          CvResults.aggregateMulti(
            ModelParallel.runMulti(spark, tasks, bc, learner,
              scoring +: extraScorings, seed, errorScore),
            Seq("candidate_id"), scoring +: extraScorings)
      a.cache()
    }

    // Attach the param columns (small driver-side frame, broadcast join).
    val paramNames = cands.head.keys.toSeq.sorted
    val paramRows = cands.zipWithIndex.map { case (m, i) =>
      org.apache.spark.sql.Row.fromSeq(i +: paramNames.map(m))
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("candidate_id",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        paramNames.map(n => org.apache.spark.sql.types.StructField(
          s"param_$n", org.apache.spark.sql.types.DoubleType, nullable = false)))
    val paramsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(paramRows, 1), schema)
    val cvResults = agg.join(broadcast(paramsDf), "candidate_id")
      .orderBy("candidate_id")

    val bestRow = CvResults.best(agg, Seq("candidate_id")).head()
    val bestId = bestRow.getAs[Int]("candidate_id")
    val bestScore = bestRow.getAs[Double]("mean_test_score")
    val bestParams = cands(bestId)
    // Refit on the FULL matrix (reference `search.py:543-550`).
    val bestModel = learner.fit(matrix.x, matrix.y, bestParams, seed)
    // unpersist, not destroy: the returned cvResults DataFrame is lazy and
    // may re-evaluate against the broadcast after we return.
    bc.unpersist()
    SearchResult(cvResults, bestParams, bestScore, bestId, bestModel)
  }
}

class DistRandomizedSearchCV(learner: Learner,
                             grid: Map[String, Seq[Double]],
                             nIter: Int,
                             cv: Int = 5,
                             scoring: String = "accuracy",
                             iid: Boolean = false,
                             seed: Long = 42,
                             errorScore: Option[Double] = None)
  extends DistGridSearchCV(learner, grid, cv, scoring, iid, seed, errorScore) {

  override protected def candidates(): Seq[Map[String, Double]] =
    ParamSampler.sample(
      grid.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) }, nIter, seed)
      .map(_.map { case (k, v) => k -> v.asInstanceOf[Double] })
}

/** Multi-armed search over heterogeneous (name, learner, grid) triples
  * (reference `search.py:717-908`): sample `n` candidates per model, fit
  * models × candidates × folds in ONE fan-out, aggregate per (model,
  * candidate), report per-model winners and refit the global best.
  */
class DistMultiModelSearch(models: Seq[(String, Learner, Map[String, Seq[Double]])],
                           n: Int = 5,
                           cv: Int = 5,
                           scoring: String = "accuracy",
                           seed: Long = 42) extends Serializable {

  final case class MultiResult(cvResults: DataFrame,
                               bestModelName: String,
                               bestParams: Map[String, Double],
                               bestScore: Double,
                               bestModel: Model)

  def fit(spark: SparkSession, df: DataFrame,
          featuresCol: String, labelCol: String): MultiResult = {
    val matrix = ModelParallel.collectMatrix(df, featuresCol, labelCol, cv, seed)
    val bc = spark.sparkContext.broadcast(matrix)

    // Per-model candidate draws; rows are keyed by (model_name,
    // per-model candidate index) — names, not arithmetic id packing, so
    // candidate counts can never collide across models. Task ids (used
    // only for per-task seeds) get a running offset to stay globally
    // unique.
    val perModel = models.zipWithIndex.map { case ((name, learner, grid), mi) =>
      val cands = ParamSampler.sample(
        grid.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) }, n, seed + mi)
        .map(_.map { case (k, v) => k -> v.asInstanceOf[Double] })
      (name, learner, cands)
    }
    val taskOffsets = perModel.scanLeft(0)(_ + _._3.size * cv).init
    val frames = perModel.zip(taskOffsets).map {
      case ((name, learner, cands), off) =>
        val tasks = for {
          (params, pi) <- cands.zipWithIndex
          fold <- 0 until cv
        } yield FitTask(off + pi * cv + fold, pi, fold, params)
        ModelParallel.run(spark, tasks, bc, learner, scoring, seed)
          .withColumn("model_name", lit(name))
    }
    val scores = frames.reduce(_ union _)
    // cached for the same reason as in DistGridSearchCV.fitMatrix
    val agg = CvResults.aggregate(scores, Seq("model_name", "candidate_id")).cache()
    val bestRow = CvResults.best(agg, Seq("model_name", "candidate_id")).head()
    val bestPi = bestRow.getAs[Int]("candidate_id")
    val bestName = bestRow.getAs[String]("model_name")
    val (_, bestLearner, bestCands) = perModel.find(_._1 == bestName).get
    val bestParams = bestCands(bestPi)
    val bestModel = bestLearner.fit(matrix.x, matrix.y, bestParams, seed)
    bc.unpersist() // cvResults is lazy; destroy would break re-evaluation
    MultiResult(agg.orderBy("model_name", "candidate_id"), bestName, bestParams,
      bestRow.getAs[Double]("mean_test_score"), bestModel)
  }
}
