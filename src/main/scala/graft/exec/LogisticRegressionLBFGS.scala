package graft.exec

/** Multinomial logistic regression by L-BFGS (two-loop recursion, Armijo
  * backtracking). Same model/parameter surface as [[LogisticRegressionGD]]
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

  private val History = 10
  private val ArmijoC1 = 1e-4
  private val Backtrack = 0.5
  private val MaxLineSearch = 20

  def fit(X: Array[Array[Double]], y: Array[Double],
          params: Map[String, Double], seed: Long): Model = {
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
    var w = new Array[Double](dim)

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

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def supNorm(a: Array[Double]): Double = {
      var m = 0.0; var i = 0
      while (i < a.length) { val v = math.abs(a(i)); if (v > m) m = v; i += 1 }
      m
    }

    val sHist = new Array[Array[Double]](History)
    val yHist = new Array[Array[Double]](History)
    val rhoHist = new Array[Double](History)
    var hLen = 0 // valid history entries
    var hPos = 0 // next write slot (ring)

    var (loss, grad) = lossGrad(w)
    var it = 0
    var done = supNorm(grad) < tol
    while (it < maxIter && !done) {
      // two-loop recursion: dir = -H grad
      val q = grad.clone()
      val alpha = new Array[Double](History)
      var h = 0
      while (h < hLen) {
        val idx = (hPos - 1 - h + 2 * History) % History
        val a = rhoHist(idx) * dot(sHist(idx), q)
        alpha(h) = a
        var i = 0
        while (i < dim) { q(i) -= a * yHist(idx)(i); i += 1 }
        h += 1
      }
      if (hLen > 0) {
        val last = (hPos - 1 + History) % History
        val gamma = dot(sHist(last), yHist(last)) / dot(yHist(last), yHist(last))
        var i = 0
        while (i < dim) { q(i) *= gamma; i += 1 }
      }
      h = hLen - 1
      while (h >= 0) {
        val idx = (hPos - 1 - h + 2 * History) % History
        val beta = rhoHist(idx) * dot(yHist(idx), q)
        val a = alpha(h)
        var i = 0
        while (i < dim) { q(i) += (a - beta) * sHist(idx)(i); i += 1 }
        h -= 1
      }
      // q is now H*grad; descend along -q
      var gd = -dot(grad, q)  // directional derivative along -q
      if (gd >= 0) { // not a descent direction (history degenerate): steepest
        System.arraycopy(grad, 0, q, 0, dim)
        gd = -dot(grad, grad)
      }
      var step = if (hLen == 0) 1.0 / math.max(1.0, supNorm(grad)) else 1.0
      var ls = 0
      var accepted = false
      var newW: Array[Double] = null
      var newLoss = 0.0
      var newGrad: Array[Double] = null
      while (ls < MaxLineSearch && !accepted) {
        val cand = new Array[Double](dim)
        var i = 0
        while (i < dim) { cand(i) = w(i) - step * q(i); i += 1 }
        val (l2, g2) = lossGrad(cand)
        if (l2 <= loss + ArmijoC1 * step * gd) {
          accepted = true; newW = cand; newLoss = l2; newGrad = g2
        } else { step *= Backtrack; ls += 1 }
      }
      if (!accepted) done = true // line search failed: stationary enough
      else {
        val s = new Array[Double](dim)
        val yv = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          s(i) = newW(i) - w(i); yv(i) = newGrad(i) - grad(i); i += 1
        }
        val sy = dot(s, yv)
        if (sy > 1e-12) { // curvature condition: keep history well-posed
          sHist(hPos) = s; yHist(hPos) = yv; rhoHist(hPos) = 1.0 / sy
          hPos = (hPos + 1) % History
          if (hLen < History) hLen += 1
        }
        w = newW; loss = newLoss; grad = newGrad
        if (supNorm(grad) < tol) done = true
      }
      it += 1
    }

    val weights = Array.tabulate(k)(cc =>
      java.util.Arrays.copyOfRange(w, cc * stride, (cc + 1) * stride))
    LogRegModel(weights, k)
  }
}
