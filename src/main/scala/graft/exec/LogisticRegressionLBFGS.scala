package graft.exec

/** Multinomial logistic regression by L-BFGS (solver core in [[LBFGS]]).
  * Same model/parameter surface as [[LogisticRegressionGD]]
  * (`c` = inverse L2 strength, `max_iter`, `tol`) but converges in tens of
  * iterations where fixed-step GD needs hundreds — this is the
  * quality-competitive solver for the search meta-estimators, matching the
  * reference's default LogisticRegression solver family (sk-dist examples
  * run sklearn's lbfgs-backed estimator, `examples/search/spark_ml.py`).
  *
  * Deterministic: zero init, no randomness, fixed history size. Bias terms
  * are unregularized, matching GD and sklearn.
  */
object LogisticRegressionLBFGS extends Learner {

  def fit(X: Array[Array[Double]], y: Array[Double],
          params: Map[String, Double], seed: Long): Model =
    fitCore(X, y, params, FitSideData.empty)

  /** fit_params channel: with an eval slice + patience, the L-BFGS loop
    * monitors held-out NLL after every accepted step and stops once it
    * hasn't improved by `minDelta` for `earlyStoppingRounds` consecutive
    * steps, returning the BEST-on-eval iterate (standard early-stopping
    * rewind), not the last.
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
    val tol = params.getOrElse("tol", 1e-8)

    val stride = d + 1
    val dim = k * stride

    // mean negative log-likelihood + (lambda/2)||w_nonbias||^2, and its grad
    def lossGrad(wv: Array[Double]): (Double, Array[Double]) = {
      val g = new Array[Double](dim)
      var loss = 0.0
      val z = new Array[Double](k)
      var i = 0
      while (i < n) {
        val x = X(i)
        var cc = 0
        while (cc < k) {
          val off = cc * stride
          var s = wv(off + d)
          var j = 0
          while (j < d) { s += wv(off + j) * x(j); j += 1 }
          z(cc) = s
          cc += 1
        }
        var mx = z(0); cc = 1
        while (cc < k) { if (z(cc) > mx) mx = z(cc); cc += 1 }
        var sum = 0.0; cc = 0
        while (cc < k) { z(cc) = math.exp(z(cc) - mx); sum += z(cc); cc += 1 }
        val yi = y(i).toInt
        loss -= math.log(z(yi) / sum)
        cc = 0
        while (cc < k) {
          val err = z(cc) / sum - (if (cc == yi) 1.0 else 0.0)
          val off = cc * stride
          var j = 0
          while (j < d) { g(off + j) += err * x(j); j += 1 }
          g(off + d) += err
          cc += 1
        }
        i += 1
      }
      loss /= n
      var t = 0
      while (t < dim) {
        g(t) /= n
        if (t % stride != d) { // bias unregularized
          loss += 0.5 * lambda * wv(t) * wv(t)
          g(t) += lambda * wv(t)
        }
        t += 1
      }
      (loss, g)
    }

    def toModel(wv: Array[Double]): LogRegModel =
      LogRegModel(Array.tabulate(k)(cc =>
        java.util.Arrays.copyOfRange(wv, cc * stride, (cc + 1) * stride)), k)

    if (!side.hasEarlyStopping) {
      toModel(LBFGS.minimize(new Array[Double](dim), lossGrad, maxIter, tol))
    } else {
      var bestLoss = FitSideData.evalNll(toModel(new Array[Double](dim)),
        side.evalX, side.evalY)
      var bestW: Array[Double] = null
      var rounds = 0
      val monitor: Array[Double] => Boolean = { wv =>
        val el = FitSideData.evalNll(toModel(wv), side.evalX, side.evalY)
        if (side.history != null) side.history += el
        if (el < bestLoss - side.minDelta) {
          bestLoss = el; bestW = wv.clone(); rounds = 0; true
        } else { rounds += 1; rounds < side.earlyStoppingRounds }
      }
      val last = LBFGS.minimize(new Array[Double](dim), lossGrad, maxIter,
        tol, monitor)
      // zero init is a baseline, not a candidate: with no accepted
      // iterate, fall back to the final iterate (the un-monitored
      // path's model), never an all-zero rewind
      toModel(if (bestW == null) last else bestW)
    }
  }
}
