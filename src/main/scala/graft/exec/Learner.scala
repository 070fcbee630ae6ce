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
