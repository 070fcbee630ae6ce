package graft.exec

/** Linear support-vector classifier — squared-hinge loss with L2
  * regularization, solved per class one-vs-rest by [[LBFGS]] (the smooth
  * loss makes quasi-Newton applicable; this is sklearn `LinearSVC`'s
  * default `loss="squared_hinge"` / `multi_class="ovr"` surface, the
  * estimator the reference's flagship demo grid-searches — sk-dist
  * `README.rst` / `examples/search/basic.py` run `sklearn.svm.SVC`-family
  * models through `DistGridSearchCV`).
  *
  * Params follow the engine's logistic convention: `c` = inverse L2
  * strength scaled per sample (lambda = 1/(c*n)), `max_iter`, `tol`.
  * Deterministic: zero init, no randomness.
  *
  * The fitted model's `predictProba` returns the per-class DECISION
  * values (w·x + b), not probabilities — sklearn's LinearSVC likewise
  * exposes only `decision_function`; argmax semantics (and therefore
  * accuracy/f1 scoring and OvR stacking) are unaffected. Don't score it
  * with `neg_log_loss`.
  */
final case class LinearSVCModel(weights: Array[Array[Double]],
                                nClasses: Int) extends Model {
  /** Per-class decision values w·x + b (a decision_function, not a
    * probability simplex).
    */
  def predictProba(x: Array[Double]): Array[Double] = {
    val out = new Array[Double](weights.length)
    var c = 0
    while (c < weights.length) {
      val w = weights(c)
      var s = w(w.length - 1)
      var j = 0
      while (j < x.length && j < w.length - 1) { s += w(j) * x(j); j += 1 }
      out(c) = s
      c += 1
    }
    out
  }
  def predict(x: Array[Double]): Double = {
    val p = predictProba(x)
    var b = 0; var i = 1
    while (i < p.length) { if (p(i) > p(b)) b = i; i += 1 }
    b.toDouble
  }
}

object LinearSVC extends Learner {

  def fit(X: Array[Array[Double]], y: Array[Double],
          params: Map[String, Double], seed: Long): Model =
    fitCore(X, y, params, FitSideData.empty)

  /** fit_params channel: eval-slice + patience early stopping per
    * one-vs-rest class solver. The monitor metric is the class's binary
    * mean squared-hinge on the eval slice (NOT NLL — LinearSVC exposes
    * decision values, not probabilities); each class keeps its own
    * best-on-eval iterate. `side.history` interleaves the per-class
    * solver traces in class order.
    */
  override def fit(X: Array[Array[Double]], y: Array[Double],
                   params: Map[String, Double], seed: Long,
                   side: FitSideData): Model =
    fitCore(X, y, params, side)

  private def fitCore(X: Array[Array[Double]], y: Array[Double],
                      params: Map[String, Double], side: FitSideData): Model = {
    val n = X.length
    require(n > 0, "empty training set")
    val d = X(0).length
    val k = math.max(2, y.max.toInt + 1)
    val c = params.getOrElse("c", 1.0)
    val lambda = if (c <= 0) 0.0 else 1.0 / (c * n)
    val maxIter = params.getOrElse("max_iter", 200.0).toInt
    val tol = params.getOrElse("tol", 1e-8)

    val weights = Array.tabulate(k) { cls =>
      // Binary problem for class cls: target +1 / -1; mean squared hinge
      // + (lambda/2)||w_nonbias||^2.
      def lossGrad(wv: Array[Double]): (Double, Array[Double]) = {
        val g = new Array[Double](d + 1)
        var loss = 0.0
        var i = 0
        while (i < n) {
          val x = X(i)
          val t = if (y(i) == cls.toDouble) 1.0 else -1.0
          var f = wv(d)
          var j = 0
          while (j < d) { f += wv(j) * x(j); j += 1 }
          val m = 1.0 - t * f
          if (m > 0) {
            loss += m * m
            val coef = -2.0 * t * m
            j = 0
            while (j < d) { g(j) += coef * x(j); j += 1 }
            g(d) += coef
          }
          i += 1
        }
        loss /= n
        var j = 0
        while (j < d) { // bias unregularized
          g(j) = g(j) / n + lambda * wv(j)
          loss += 0.5 * lambda * wv(j) * wv(j)
          j += 1
        }
        g(d) /= n
        (loss, g)
      }
      if (!side.hasEarlyStopping)
        LBFGS.minimize(new Array[Double](d + 1), lossGrad, maxIter, tol)
      else {
        def evalHinge(wv: Array[Double]): Double = {
          var loss = 0.0
          var i = 0
          while (i < side.evalX.length) {
            val x = side.evalX(i)
            val t = if (side.evalY(i) == cls.toDouble) 1.0 else -1.0
            var f = wv(d)
            var j = 0
            while (j < d && j < x.length) { f += wv(j) * x(j); j += 1 }
            val m = 1.0 - t * f
            if (m > 0) loss += m * m
            i += 1
          }
          loss / math.max(1, side.evalX.length)
        }
        var bestLoss = evalHinge(new Array[Double](d + 1))
        var bestW: Array[Double] = null
        var rounds = 0
        val monitor: Array[Double] => Boolean = { wv =>
          val el = evalHinge(wv)
          if (side.history != null) side.history += el
          if (el < bestLoss - side.minDelta) {
            bestLoss = el; bestW = wv.clone(); rounds = 0; true
          } else { rounds += 1; rounds < side.earlyStoppingRounds }
        }
        val last = LBFGS.minimize(new Array[Double](d + 1), lossGrad,
          maxIter, tol, monitor)
        // the zero init is only a BASELINE, never a candidate: if no
        // iterate beat it by minDelta (minDelta too coarse / degenerate
        // eval slice), return the optimizer's final iterate — same model
        // the un-monitored path yields — not an all-zero rewind
        if (bestW == null) last else bestW
      }
    }
    LinearSVCModel(weights, k)
  }
}
