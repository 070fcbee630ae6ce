package graft.search

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.CvResults
import graft.exec.CART
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

/** Shared scaffold of every data-parallel CV route (grid search, tree
  * search, multi-model race): the fold-hash column, the cache, and the
  * row/fold-size bookkeeping — ONE pass, no per-(candidate, fold) count
  * jobs. Folds are hashed row position, NOT the label (fold-label
  * correlation would skew CV); stable within a job, which is all CV
  * needs. One definition so a fix to the fold skeleton lands everywhere.
  */
private[search] final case class DpCvFrame(prepared: DataFrame, nTotal: Long,
                                           foldSizes: Map[Int, Long]) {
  def train(fold: Int): DataFrame = prepared.filter(col("_fold") =!= fold)
  def test(fold: Int): DataFrame = prepared.filter(col("_fold") === fold)
  def nTest(fold: Int): Long = foldSizes.getOrElse(fold, 0L)
  def nTrain(fold: Int): Long = nTotal - nTest(fold)
  def unpersist(): Unit = { prepared.unpersist(); () }
}

private[search] object DpCvFrame {
  /** `selected` must already project the fit columns; the fold column is
    * added here so every route hashes identically.
    */
  def apply(selected: DataFrame, cv: Int, seed: Long): DpCvFrame = {
    val prepared = selected
      .withColumn("_fold", Folds.byHash(monotonically_increasing_id(), cv, seed))
      .cache() // scanned once per (candidate, fold) fit — keep it hot
    val nTotal = prepared.count()
    val foldSizes = prepared.groupBy("_fold").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    DpCvFrame(prepared, nTotal, foldSizes)
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

  private def mkEstimator(params: Map[String, Double], nTrain: Long): LogisticRegression = {
    // The engine's `c` is INVERSE L2 strength over the objective
    // meanNLL + ||w||^2 / (2*c*n) (LogisticRegressionLBFGS.scala:23);
    // Spark ML minimizes meanLoss + regParam/2 * ||w||^2, so the lossless
    // translation is regParam = 1/(c*nTrain) — per fit, because n differs
    // between a fold fit and the full-data refit. A bare 1/c would
    // regularize n times stronger than the broadcast regime.
    val reg = params.get("c") match {
      case Some(c) => if (c > 0) 1.0 / (c * math.max(1L, nTrain)) else 0.0
      case None    => params.getOrElse("reg_param", 0.0)
    }
    new LogisticRegression()
      .setFeaturesCol("_features").setLabelCol("_label")
      // multinomial even for 2 classes: k coefficient rows, so the fitted
      // model converts losslessly to the engine's k x (d+1) LogRegModel
      .setFamily("multinomial")
      .setRegParam(reg)
      .setElasticNetParam(params.getOrElse("elastic_net", 0.0))
      .setMaxIter(params.getOrElse("max_iter", 100.0).toInt)
  }

  def fit(spark: SparkSession, df: DataFrame,
          featuresCol: String, labelCol: String): DpResult = {
    val cands = ParamGrid.expand(
      grid.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) })
      .map(_.map { case (k, v) => k -> v.asInstanceOf[Double] })
    fitCandidates(spark, df, featuresCol, labelCol, cands)
  }

  /** Same search over an EXPLICIT candidate list (engine param names —
    * `c` / `max_iter` — or raw Spark ML `reg_param` / `elastic_net`) —
    * the entry point the broadcast-path searches auto-route through, so
    * candidate_id stays aligned with the caller's own candidate ordering.
    *
    * Scoring goes through [[DistributedScore]] against the losslessly
    * bridged engine model, NOT a Spark ML evaluator: the metric NAMES and
    * MATH ("accuracy", "f1_weighted", "neg_log_loss", …) are then
    * identical across the two fit regimes, and `iid`/`extraScorings`
    * produce the same cv_results schema the broadcast route emits.
    */
  def fitCandidates(spark: SparkSession, df: DataFrame,
                    featuresCol: String, labelCol: String,
                    cands: Seq[Map[String, Double]],
                    iid: Boolean = false,
                    extraScorings: Seq[String] = Nil,
                    jobParallelism: Int = 8): DpResult = {
    require(cands.nonEmpty, "empty candidate list")
    val cvf = DpCvFrame(df.select(
      // keep the array form alongside the vector: Spark ML fits on the
      // vector, DistributedScore's engine-model UDFs read the array
      col(featuresCol).cast("array<double>").as("_xs"),
      array_to_vector(col(featuresCol).cast("array<double>")).as("_features"),
      col(labelCol).cast("double").as("_label")), cv, seed)
    val prepared = cvf.prepared
    val nTotal = cvf.nTotal

    val allMetrics = scoring +: extraScorings
    val tasks = for {
      (params, ci) <- cands.zipWithIndex
      fold <- 0 until cv
    } yield (params, ci, fold)
    // the (candidate, fold) fits are independent distributed jobs —
    // submit them concurrently (see `JobParallel`); order-preserving, so
    // candidate_id/fold_id keying is identical to the sequential loop
    val scoreRows = graft.ops.Par.concurrently(tasks, jobParallelism) {
      case (params, ci, fold) =>
        val model = SparkMLBridge.toLogRegModel(
          mkEstimator(params, cvf.nTrain(fold)).fit(cvf.train(fold)))
        val ms = DistributedScore.scoreMany(allMetrics, model, cvf.test(fold),
          "_xs", "_label")
        (ci, fold, ms(scoring), cvf.nTest(fold), ms)
    }
    import spark.implicits._
    val agg = (if (extraScorings.isEmpty) {
      val scores = scoreRows.map { case (ci, f, s, n, _) => (ci, f, s, n) }
        .toDF("candidate_id", "fold_id", "score", "n_test")
      CvResults.aggregate(scores, Seq("candidate_id"), iid = iid)
    } else {
      val scores = scoreRows
        .toDF("candidate_id", "fold_id", "score", "n_test", "scores")
      CvResults.aggregateMulti(scores, Seq("candidate_id"), allMetrics,
        iid = iid)
    }).cache()
    val bestRow = CvResults.best(agg, Seq("candidate_id")).head()
    val bestId = bestRow.getAs[Int]("candidate_id")
    val best = mkEstimator(cands(bestId), nTotal).fit(prepared)
    cvf.unpersist()
    DpResult(agg.orderBy("candidate_id"), cands(bestId),
      bestRow.getAs[Double]("mean_test_score"), best, bestId)
  }
}

/** Distributed scoring of an engine `Model` against a DataFrame test
  * fold — the data-parallel twin of `Metrics`: rows never leave the
  * executors; only sufficient statistics (a k x k confusion matrix for
  * classification, residual sums for regression) reach the driver, where
  * the metric math is `Metrics`' exactly.
  */
object DistributedScore {
  import graft.exec.Model

  def apply(scoring: String, model: Model, test: DataFrame,
            featuresCol: String, labelCol: String): Double = scoring match {
    case "accuracy" | "f1_weighted" =>
      fromConfusion(scoring, confusion(model, test, featuresCol, labelCol))
    case "neg_log_loss" =>
      negLogLoss(model, test, featuresCol, labelCol)
    case "r2" | "neg_mean_squared_error" =>
      regression(scoring, model, test, featuresCol, labelCol)
    case other => throw new IllegalArgumentException(
      s"data-parallel scoring supports accuracy/f1_weighted/neg_log_loss/" +
        s"r2/neg_mean_squared_error, not $other")
  }

  /** Several metrics over one fitted model — the multi-metric twin of
    * `Metrics.multi`. The confusion matrix is computed ONCE and reused by
    * every confusion-derived metric; only proba/regression metrics add a
    * scan of their own.
    */
  def scoreMany(scorings: Seq[String], model: Model, test: DataFrame,
                featuresCol: String, labelCol: String): Map[String, Double] = {
    lazy val cells = confusion(model, test, featuresCol, labelCol)
    scorings.distinct.map {
      case s @ ("accuracy" | "f1_weighted") => s -> fromConfusion(s, cells)
      case s => s -> apply(s, model, test, featuresCol, labelCol)
    }.toMap
  }

  /** `model.predict` as a Column: the fused codegen'd kernel when the
    * family has one ([[graft.predict.FusedScore]] — linear, SVC, CART,
    * forest, GBT, constant, masked), else the broadcast-UDF fallback.
    * The fused kernels reproduce each model's float order, so the two
    * routes agree bit-for-bit on well-formed rows (spec-pinned); what
    * changes is ONLY that scoring stays inside whole-stage codegen
    * instead of paying per-row boxing over the full distributed fold.
    */
  private def predictCol(model: Model, featuresCol: String): Column = {
    val x = col(featuresCol).cast("array<double>")
    graft.predict.FusedScore.predict(model, x).getOrElse {
      val f = udf((xs: Seq[Double]) => model.predict(xs.toArray))
      f(x)
    }
  }

  /** Matches `Metrics.negLogLoss` exactly: mean log of the true-class
    * probability, eps-clipped at 1e-15, 0.0 on an empty fold.
    */
  private def negLogLoss(model: Model, test: DataFrame,
                         featuresCol: String, labelCol: String): Double = {
    val eps = 1e-15
    val x = col(featuresCol).cast("array<double>")
    val llCol = graft.predict.FusedScore.proba(model, x) match {
      case Some(p) =>
        // get() is 0-based and null out-of-range under ANSI too, so the
        // UDF's `yi in [0, k) else eps` clause maps to coalesce
        val pi = coalesce(get(p, col(labelCol).cast("double").cast("int")),
          lit(eps))
        log(greatest(lit(eps), least(lit(1 - eps), pi)))
      case None =>
        val lp = udf((xs: Seq[Double], y: Double) => {
          val prob = model.predictProba(xs.toArray)
          val yi = y.toInt
          val pi = if (yi >= 0 && yi < prob.length) prob(yi) else eps
          math.log(math.max(eps, math.min(1 - eps, pi)))
        })
        lp(x, col(labelCol).cast("double"))
    }
    val r = test.select(llCol.as("_ll"))
      .agg(count(lit(1)), sum(col("_ll"))).head()
    val n = r.getLong(0)
    if (n == 0) 0.0 else r.getDouble(1) / n
  }

  /** (label, prediction, count) cells — one shuffle, k^2 rows collected. */
  def confusion(model: Model, test: DataFrame,
                featuresCol: String, labelCol: String): Seq[(Double, Double, Long)] = {
    test.groupBy(col(labelCol).cast("double").as("_l"),
        predictCol(model, featuresCol).as("_p"))
      .count().collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
  }

  /** Metric from confusion cells, matching `Metrics.accuracy`/`f1Weighted`
    * (classes = labels observed in y; zero_division=0).
    */
  def fromConfusion(scoring: String, cells: Seq[(Double, Double, Long)]): Double = {
    val total = cells.map(_._3).sum.toDouble
    if (total == 0) return 0.0
    scoring match {
      case "accuracy" =>
        cells.collect { case (l, p, c) if l == p => c }.sum / total
      case "f1_weighted" =>
        val classes = cells.map(_._1).distinct.sorted
        var f1Sum = 0.0
        classes.foreach { c =>
          val tp = cells.collect { case (l, p, n) if l == c && p == c => n }.sum.toDouble
          val fp = cells.collect { case (l, p, n) if l != c && p == c => n }.sum.toDouble
          val fn = cells.collect { case (l, p, n) if l == c && p != c => n }.sum.toDouble
          val support = tp + fn
          val prec = if (tp + fp > 0) tp / (tp + fp) else 0.0
          val rec = if (tp + fn > 0) tp / (tp + fn) else 0.0
          val f1 = if (prec + rec > 0) 2 * prec * rec / (prec + rec) else 0.0
          f1Sum += f1 * support
        }
        f1Sum / total
    }
  }

  private def regression(scoring: String, model: Model, test: DataFrame,
                         featuresCol: String, labelCol: String): Double = {
    val r = test.select(col(labelCol).cast("double").as("_y"),
        predictCol(model, featuresCol).as("_p"))
      .agg(count(lit(1)), sum(col("_y")), sum(col("_y") * col("_y")),
        sum(pow(col("_y") - col("_p"), 2)))
      .head()
    val n = r.getLong(0)
    if (n == 0) return 0.0
    val ssRes = r.getDouble(3)
    scoring match {
      case "neg_mean_squared_error" => -ssRes / n
      case "r2" =>
        val ssTot = r.getDouble(2) - r.getDouble(1) * r.getDouble(1) / n
        if (ssTot == 0) { if (ssRes == 0) 1.0 else 0.0 } else 1.0 - ssRes / ssTot
    }
  }
}

/** ONE data-parallel fit of a routable engine learner over a DataFrame —
  * the shared kernel behind the eliminator's over-budget route and the
  * DataFrame OOF: logistic via Spark ML (losslessly bridged), trees via
  * DataParallelCART. Returns the same engine `Model` types the broadcast
  * regime produces; unsupported learners fail loudly.
  */
object DataParallelFit {
  /** `nRows`: the training row count when the caller already knows it
    * (fold-size bookkeeping in the search loops) — skips the count job
    * the logistic regularization translation otherwise pays per fit.
    */
  def fit(learner: graft.exec.Learner, data: DataFrame,
          featuresCol: String, labelCol: String,
          params: Map[String, Double], seed: Long,
          nRows: Long = -1L): graft.exec.Model = {
    import org.apache.spark.ml.functions.array_to_vector
    learner match {
      case graft.exec.LogisticRegressionGD | graft.exec.LogisticRegressionLBFGS =>
        val p = data.select(
          array_to_vector(col(featuresCol).cast("array<double>")).as("_features"),
          col(labelCol).cast("double").as("_label"))
        val est = new LogisticRegression()
          .setFeaturesCol("_features").setLabelCol("_label")
          .setFamily("multinomial")
          .setMaxIter(params.getOrElse("max_iter", 100.0).toInt)
        // engine c -> regParam = 1/(c*n) (lossless translation; see
        // DataParallelGridSearch.mkEstimator). A MISSING c means the
        // engine DEFAULT c=1 (broadcast learners regularize at
        // lambda = 1/n when params omit 'c') — NOT Spark ML's regParam=0,
        // which would silently fit unregularized and diverge from the
        // broadcast regime on separable data. An explicit c <= 0 opts out.
        val c = params.getOrElse("c", 1.0)
        if (c > 0) {
          val n = if (nRows > 0) nRows else data.count()
          est.setRegParam(1.0 / (c * math.max(1L, n)))
        }
        SparkMLBridge.toLogRegModel(est.fit(p))
      case c: CART.Classifier =>
        DataParallelCART.fitClassifier(data, featuresCol, labelCol, params,
          seed, nClasses = math.max(0, c.nClassesHint))
      case CART.Regressor =>
        DataParallelCART.fitRegressor(data, featuresCol, labelCol, params, seed)
      case graft.exec.GBT.Classifier =>
        // class inventory from the data, like the broadcast fit's
        // y.max + 1 (one tiny agg job per fit)
        val k = math.max(2, data.agg(max(col(labelCol).cast("double")))
          .head().getDouble(0).toInt + 1)
        DataParallelGBT.fit(data, featuresCol, labelCol, params, seed, k)
      case graft.exec.GBT.Regressor =>
        DataParallelGBT.fit(data, featuresCol, labelCol, params, seed, 0)
      case other => throw new IllegalArgumentException(
        s"the data-parallel regime supports the logistic, CART, and GBT " +
          s"learners, not $other")
    }
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
