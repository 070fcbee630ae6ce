package graft.exec

/** Single-node learner contract executed inside one Spark task.
  *
  * The reference distributes sklearn estimators as pickled closures over an
  * RDD of fit tasks (`search.py:413-435`); our analog is a serializable
  * `Learner` fit against the broadcast training matrix inside
  * `mapPartitions`. Learners are deliberately small, deterministic (seeded)
  * and allocation-light — the distribution semantics, not the learner zoo,
  * is what the engine contributes (SURVEY.md §7.4).
  *
  * `X` is row-major `Array[Array[Double]]`; `y` is class index (0..k-1) for
  * classifiers, real value for regressors.
  */
trait Model extends Serializable {
  def predict(x: Array[Double]): Double
  /** Class-probability vector; regressors return Array(prediction). */
  def predictProba(x: Array[Double]): Array[Double]
}

trait Learner extends Serializable {
  /** Fit with hyperparameters. Unknown params are ignored (the planner
    * validates names up front, mirroring the reference's ctor checks).
    */
  def fit(X: Array[Array[Double]], y: Array[Double],
          params: Map[String, Double], seed: Long): Model

  /** Fit with per-fit side data — the engine's `**fit_params` channel
    * (reference `search.py:347,435` threads caller fit_params into every
    * candidate × fold fit; its xgboost integration exercises eval-set
    * early stopping, `tests/test_spark.py:165-187`). The default ignores
    * the side data: only iterative learners (L-BFGS / GD logistic) honor
    * the early-stopping contract; everything else fits as before.
    */
  def fit(X: Array[Array[Double]], y: Array[Double],
          params: Map[String, Double], seed: Long,
          side: FitSideData): Model = fit(X, y, params, seed)
}

/** Per-fit side data riding alongside the hyperparameters: a held-out
  * eval slice plus patience stops iterative solvers once held-out loss
  * stops improving (the xgboost `eval_set`/`early_stopping_rounds`
  * contract the reference's fit_params tests exercise). The eval slice is
  * expected SMALL — it serializes into each fit task's closure, not a
  * broadcast; hold out folds with the CV machinery, not here.
  *
  * `history`, when non-null, collects the per-iteration eval losses the
  * solver observed — only meaningful for driver-local fits (executors
  * append to their own serialized copy), used by specs to assert the stop
  * actually fired early.
  */
final case class FitSideData(
    evalX: Array[Array[Double]] = null,
    evalY: Array[Double] = null,
    earlyStoppingRounds: Int = 0,
    minDelta: Double = 0.0,
    history: scala.collection.mutable.ArrayBuffer[Double] = null)
    extends Serializable {
  def hasEarlyStopping: Boolean =
    earlyStoppingRounds > 0 && evalX != null && evalY != null && evalX.length > 0
}

object FitSideData {
  val empty: FitSideData = FitSideData()

  /** Mean NLL of (evalX, evalY) under a fitted probabilistic model — the
    * early-stopping monitor metric, eps-clipped like `Metrics.negLogLoss`.
    */
  def evalNll(m: Model, evalX: Array[Array[Double]], evalY: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < evalX.length) {
      val p = m.predictProba(evalX(i))
      val yi = evalY(i).toInt
      val pi = if (yi >= 0 && yi < p.length) math.max(1e-15, p(yi)) else 1e-15
      s -= math.log(pi)
      i += 1
    }
    s / math.max(1, evalX.length)
  }
}

/** Degenerate single-class short-circuit (reference `_ConstantPredictor`,
  * `multiclass.py:175-192`): always predicts the constant with prob 1.
  */
final case class ConstantModel(value: Double, nClasses: Int) extends Model {
  def predict(x: Array[Double]): Double = value
  def predictProba(x: Array[Double]): Array[Double] = {
    val p = new Array[Double](math.max(nClasses, 1))
    if (nClasses > 0) p(value.toInt.min(nClasses - 1).max(0)) = 1.0 else ()
    p
  }
}

object ConstantLearner extends Learner {
  def fit(X: Array[Array[Double]], y: Array[Double],
          params: Map[String, Double], seed: Long): Model = {
    // loud, like every other learner — minBy on empty would die with an
    // obscure "empty.minBy" from inside the task otherwise
    require(y.nonEmpty, "empty training set")
    // Majority vote, ties to the smallest label (numpy bincount.argmax).
    val counts = y.groupBy(identity).view.mapValues(_.length)
    val best = counts.toSeq.minBy { case (v, n) => (-n, v) }._1
    ConstantModel(best, y.max.toInt + 1)
  }
}
