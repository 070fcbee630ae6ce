package graft.predict

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.Model

/** Distributed batch prediction (reference `predict.py`
  * `get_prediction_udf`): a fitted model, broadcast once, applied to a
  * DataFrame's feature column.
  *
  * Return-type rules mirror `predict.py:160-176`: `predict` emits an
  * int (class index) or string (when labels are provided) scalar;
  * `predict_proba` emits `array<double>`. The reference needs Arrow +
  * pandas UDFs to make this fast from Python; in-JVM a plain Scala UDF
  * over the broadcast model is already batch-free of IPC — the natural
  * next step (a codegen'd Catalyst Expression) is noted in SURVEY §7.3
  * and only pays off once model inference itself is the bottleneck.
  */
object Predict {

  /** Integer class prediction column. Null feature rows predict null —
    * reference-typed UDF args are NOT null-skipped by Spark, so every
    * UDF here guards explicitly instead of NPE-ing the executor.
    */
  def predictUdf(spark: SparkSession, model: Model): Column => Column = {
    val bc = spark.sparkContext.broadcast(model)
    val f = udf((v: Seq[Double]) =>
      if (v == null) None else Some(bc.value.predict(v.toArray).toInt))
    (c: Column) => f(c.cast("array<double>"))
  }

  /** String-label prediction column (classes_ dtype = str branch). */
  def predictLabelUdf(spark: SparkSession, model: Model,
                      labels: Seq[String]): Column => Column = {
    val bc = spark.sparkContext.broadcast(model)
    val lab = labels.toIndexedSeq
    val f = udf((v: Seq[Double]) => {
      if (v == null) null
      else {
        val i = bc.value.predict(v.toArray).toInt
        if (i >= 0 && i < lab.size) lab(i) else null
      }
    })
    (c: Column) => f(c.cast("array<double>"))
  }

  /** Probability-vector column (`predict_proba` → ArrayType(Double)). */
  def predictProbaUdf(spark: SparkSession, model: Model): Column => Column = {
    val bc = spark.sparkContext.broadcast(model)
    val f = udf((v: Seq[Double]) =>
      if (v == null) null else bc.value.predictProba(v.toArray).toSeq)
    (c: Column) => f(c.cast("array<double>"))
  }

  /** UDF-free linear-model scoring: ONE codegen'd LinearScoreMatrix
    * expression scoring every class in a single fused loop, argmax for
    * the prediction (first max wins, matching LogRegModel.predict).
    * Preferred over the UDF paths when the model is linear — the whole
    * projection stays in whole-stage codegen. Deliberately NOT one
    * LinearScore column per class: past a few dozen classes the inlined
    * per-class dot loops outgrow the JVM's huge-method JIT threshold and
    * the stage silently runs interpreted (the SrpBandKeys cliff).
    */
  def withLinearPredictions(df: DataFrame, model: graft.exec.LogRegModel,
                            featuresCol: String,
                            outCol: String = "preds"): DataFrame = {
    val scores = graft.functions.LinearScoreMatrix(
      col(featuresCol).cast("array<double>"), model.weights)
    df.withColumn(outCol, graft.agg.Voting.argmax(scores))
  }

  def withPredictions(spark: SparkSession, df: DataFrame, model: Model,
                      featuresCol: String, outCol: String = "preds",
                      labels: Option[Seq[String]] = None): DataFrame = {
    val fn = labels match {
      case Some(l) => predictLabelUdf(spark, model, l)
      case None    => predictUdf(spark, model)
    }
    df.withColumn(outCol, fn(col(featuresCol)))
  }

  def withProbabilities(spark: SparkSession, df: DataFrame, model: Model,
                        featuresCol: String,
                        outCol: String = "scores"): DataFrame =
    df.withColumn(outCol, predictProbaUdf(spark, model)(col(featuresCol)))

  /** Text-input prediction (reference `predict.py:59-71`,
    * `feature_type='text'`): a RAW STRING column goes through a fitted
    * [[graft.encode.Encoderizer.TextHashStage]] into a linear model in
    * ONE call — the one-call surface the reference exposes for text
    * models, previously only reachable as Encoderizer.transform →
    * Predict. The hashed feature space is numFeatures × gram-sizes wide
    * and almost-all-zero per row, so the scorer walks the SPARSE
    * vector's active entries against the broadcast weight matrix
    * instead of densifying 2^18 doubles per row through the
    * `array<double>` UDF path. Hashing and scoring both ride the scan —
    * no shuffle, distributes with the input partitioning.
    */
  def withTextPredictions(df: DataFrame,
                          stage: graft.encode.Encoderizer.TextHashStage,
                          model: graft.exec.LogRegModel,
                          outCol: String = "preds",
                          labels: Option[Seq[String]] = None): DataFrame = {
    // a short label list is a CALLER CONFIGURATION ERROR — mapping
    // out-of-range class indices to null would disguise it as missing
    // data in the output (fail loudly up front instead)
    labels.foreach(l => require(l.size >= model.weights.length,
      s"${l.size} labels for a ${model.weights.length}-class model"))
    val (withVec, scores, vecCol) = textScores(df, stage, model)
    val idx = graft.agg.Voting.argmax(scores)
    val predCol = labels match {
      case Some(l) => element_at(typedLit(l), idx + 1)
      case None    => idx
    }
    withVec.withColumn(outCol, predCol).drop(vecCol)
  }

  /** Text-input `predict_proba` (reference `predict.py:67-68` text
    * branch composed with the `predict_proba` return type at 170-176):
    * raw string column → hashed sparse features → softmax'd class
    * probabilities (`array<double>`) in ONE call, bit-identical to
    * `Encoderizer.transform` → `LogRegModel.predictProba` on the same
    * rows. Like the argmax path, hashing and scoring both ride the
    * scan — no shuffle.
    */
  def withTextProbabilities(df: DataFrame,
                            stage: graft.encode.Encoderizer.TextHashStage,
                            model: graft.exec.LogRegModel,
                            outCol: String = "proba"): DataFrame = {
    val (withVec, scores, vecCol) = textScores(df, stage, model)
    withVec.withColumn(outCol, graft.functions.Softmax(scores)).drop(vecCol)
  }

  /** Text-input prediction through a One-vs-Rest model (the reference's
    * text branch is model-agnostic — `get_prediction_udf(model=ovr,
    * feature_type='text')` — so the fused path must cover the OvR
    * family too, not just the multinomial scorer). Emits
    * `classes(argmax)` as DOUBLE, exactly `OvRModel.predict`: per-class
    * positive probability is `sigmoid(margin_c)` with `margin_c =
    * w1 − w0` per binary model; sigmoid and the norm step are monotone
    * / positive-scale, so argmax over raw margins is EXACT, and the
    * margins come from one [[graft.functions.SparseScoreMatrix]] over
    * the margin-row matrix — zero shuffle, no densify.
    */
  def withTextPredictionsOvR(df: DataFrame,
                             stage: graft.encode.Encoderizer.TextHashStage,
                             model: graft.search.OvRModel,
                             outCol: String = "preds"): DataFrame = {
    val (withVec, margins, vecCol) = textScoresOvR(df, stage, model)
    val idx = graft.agg.Voting.argmax(margins)
    withVec.withColumn(outCol,
      element_at(typedLit(model.classes.toSeq), idx + 1)).drop(vecCol)
  }

  /** OvR text `predict_proba`: sigmoid per class margin, then the
    * model's norm — the `multiclass.py:337-362` stack, fused onto the
    * scan. Matches `OvRModel.predictProba` (constant per-class models
    * are encoded as ±1000 bias rows: sigmoid saturates to exactly
    * 0.0 / 1.0 in double, the `_ConstantPredictor` probabilities).
    */
  def withTextProbabilitiesOvR(df: DataFrame,
                               stage: graft.encode.Encoderizer.TextHashStage,
                               model: graft.search.OvRModel,
                               outCol: String = "proba"): DataFrame = {
    val (withVec, margins, vecCol) = textScoresOvR(df, stage, model)
    val pos = transform(margins, m => lit(1.0) / (lit(1.0) + exp(-m)))
    val normed = model.norm.map(graft.agg.Voting.normalize(pos, _))
      .getOrElse(pos)
    withVec.withColumn(outCol, normed).drop(vecCol)
  }

  private def textScoresOvR(df: DataFrame,
                            stage: graft.encode.Encoderizer.TextHashStage,
                            model: graft.search.OvRModel)
      : (DataFrame, Column, String) = {
    val d = stage.width
    val marginRows: Array[Array[Double]] = model.models.map {
      case m: graft.exec.LogRegModel =>
        require(m.nClasses == 2 && m.weights.forall(_.length == d + 1),
          s"OvR text path needs binary linear per-class models over $d " +
            s"features; got ${m.nClasses} classes × " +
            s"${m.weights.head.length - 1}")
        m.weights(1).zip(m.weights(0)).map { case (a, b) => a - b }
      case c: graft.exec.ConstantModel =>
        // positiveProba is exactly 1.0 or 0.0; sigmoid(±1000) saturates
        // to exactly those doubles (exp(-1000) == 0.0, exp(1000) == Inf)
        val bias = if (c.value.toInt.min(1).max(0) == 1) 1000.0 else -1000.0
        Array.fill(d)(0.0) :+ bias
      case other => throw new IllegalArgumentException(
        s"OvR text path needs linear or constant per-class models, got " +
          other.getClass.getSimpleName)
    }
    val vecCol = s"_txtfeat_${stage.name}"
    val withVec = stage.transform(df, vecCol)
    (withVec, graft.functions.SparseScoreMatrix(col(vecCol), marginRows),
      vecCol)
  }

  /** Shared text-path scorer: hashed features + ONE fused codegen'd
    * [[graft.functions.SparseScoreMatrix]] walking only the active
    * entries (never densifies the 2^18 hash space; the earlier per-row
    * Scala UDF boxed a SparseVector per row and broke the whole-stage
    * codegen span the rest of the projection runs in).
    */
  private def textScores(df: DataFrame,
                         stage: graft.encode.Encoderizer.TextHashStage,
                         model: graft.exec.LogRegModel)
      : (DataFrame, Column, String) = {
    val d = stage.width
    require(model.weights.forall(_.length == d + 1),
      s"model rows carry ${model.weights.head.length - 1}+bias weights; " +
        s"the text stage produces $d features")
    val vecCol = s"_txtfeat_${stage.name}"
    val withVec = stage.transform(df, vecCol)
    (withVec, graft.functions.SparseScoreMatrix(col(vecCol), model.weights),
      vecCol)
  }

  /** Multilabel prediction column: SORTED `array<string>` label set (the
    * MultiLabelBinarizer inverse_transform of the per-class votes).
    */
  def withMultilabelPredictions(spark: SparkSession, df: DataFrame,
                                model: graft.search.MultilabelOvRModel,
                                featuresCol: String,
                                outCol: String = "pred_labels"): DataFrame = {
    val bc = spark.sparkContext.broadcast(model)
    val f = udf((v: Seq[Double]) =>
      if (v == null) null else bc.value.predictLabels(v.toArray).toSeq)
    df.withColumn(outCol, f(col(featuresCol).cast("array<double>")))
  }
}
