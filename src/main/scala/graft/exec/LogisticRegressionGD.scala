package graft.exec

/** Multinomial logistic regression by full-batch gradient descent.
  *
  * Deterministic (zero init, fixed iteration count) so meta-estimator tests
  * can pin exact outcomes. Hyperparameters follow sklearn naming where it
  * matters to the search planners: `c` (inverse L2 strength), `max_iter`,
  * `lr` (step size). Handles k >= 2 classes via softmax; binary is the
  * k=2 special case of the same code path.
  */
final case class LogRegModel(weights: Array[Array[Double]], // k x (d+1), last = bias
                             nClasses: Int) extends Model {

  def scores(x: Array[Double]): Array[Double] = {
    val z = new Array[Double](nClasses)
    var c = 0
    while (c < nClasses) {
      val w = weights(c)
      var s = w(x.length) // bias
      var j = 0
      while (j < x.length) { s += w(j) * x(j); j += 1 }
      z(c) = s
      c += 1
    }
    z
  }

  def predictProba(x: Array[Double]): Array[Double] = {
    val z = scores(x)
    var mx = z(0); var i = 1
    while (i < z.length) { if (z(i) > mx) mx = z(i); i += 1 }
    var sum = 0.0
    i = 0
    while (i < z.length) { z(i) = math.exp(z(i) - mx); sum += z(i); i += 1 }
    i = 0
    while (i < z.length) { z(i) /= sum; i += 1 }
    z
  }

  def predict(x: Array[Double]): Double = {
    val p = scores(x)
    var best = 0; var i = 1
    while (i < p.length) { if (p(i) > p(best)) best = i; i += 1 } // first max
    best.toDouble
  }
}

object LogisticRegressionGD extends Learner {

  def fit(X: Array[Array[Double]], y: Array[Double],
          params: Map[String, Double], seed: Long): Model =
    fitCore(X, y, params, FitSideData.empty)

  /** fit_params channel: same eval-slice + patience early stopping as the
    * L-BFGS learner — held-out NLL checked each GD iteration, best-on-eval
    * weights returned.
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
    val maxIter = params.getOrElse("max_iter", 100.0).toInt
    val lr = params.getOrElse("lr", 0.5)
    // early stop when the mean gradient magnitude falls below tol —
    // large max_iter stops costing fit time once converged (sklearn's
    // tol contract); tol <= 0 disables.
    val tol = params.getOrElse("tol", 1e-6)

    val w = Array.fill(k)(new Array[Double](d + 1))
    val grad = Array.fill(k)(new Array[Double](d + 1))
    val model = LogRegModel(w, k)
    val es = side.hasEarlyStopping
    var bestLoss =
      if (es) FitSideData.evalNll(model, side.evalX, side.evalY) else 0.0
    var bestW: Array[Array[Double]] = null
    var rounds = 0
    var it = 0
    while (it < maxIter) {
      var cc = 0
      while (cc < k) { java.util.Arrays.fill(grad(cc), 0.0); cc += 1 }
      var i = 0
      while (i < n) {
        val p = model.predictProba(X(i))
        val yi = y(i).toInt
        cc = 0
        while (cc < k) {
          val err = p(cc) - (if (cc == yi) 1.0 else 0.0)
          val g = grad(cc)
          var j = 0
          while (j < d) { g(j) += err * X(i)(j); j += 1 }
          g(d) += err
          cc += 1
        }
        i += 1
      }
      var gradMax = 0.0
      cc = 0
      while (cc < k) {
        val g = grad(cc); val wc = w(cc)
        var j = 0
        while (j <= d) {
          val reg = if (j < d) lambda * wc(j) else 0.0 // bias unregularized
          val step = g(j) / n + reg
          val a = math.abs(step)
          if (a > gradMax) gradMax = a
          wc(j) -= lr * step
          j += 1
        }
        cc += 1
      }
      it += 1
      if (tol > 0 && gradMax < tol) it = maxIter // converged
      if (es) {
        val el = FitSideData.evalNll(model, side.evalX, side.evalY)
        if (side.history != null) side.history += el
        if (el < bestLoss - side.minDelta) {
          bestLoss = el; bestW = w.map(_.clone()); rounds = 0
        } else {
          rounds += 1
          if (rounds >= side.earlyStoppingRounds) it = maxIter // patience out
        }
      }
    }
    // zero init is a baseline, not a candidate: if no epoch beat it by
    // minDelta, keep the final iterate (the un-monitored path's model)
    // instead of rewinding to all-zero weights
    if (es && bestW != null) LogRegModel(bestW, k) else model
  }
}
