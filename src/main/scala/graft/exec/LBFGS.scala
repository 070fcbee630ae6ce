package graft.exec

/** Reusable limited-memory BFGS minimizer (two-loop recursion, Armijo
  * backtracking) — the solver core shared by [[LogisticRegressionLBFGS]]
  * and [[LinearSVC]]. Deterministic: zero-init-agnostic (caller supplies
  * the start), fixed history size, no randomness.
  *
  * `lossGrad` must return the loss and a FRESH gradient array each call.
  */
object LBFGS {

  private val History = 10
  private val ArmijoC1 = 1e-4
  private val Backtrack = 0.5
  private val MaxLineSearch = 20

  def minimize(w0: Array[Double],
               lossGrad: Array[Double] => (Double, Array[Double]),
               maxIter: Int, tol: Double): Array[Double] =
    minimize(w0, lossGrad, maxIter, tol, null)

  /** Monitored variant: after each ACCEPTED step, `monitor(w)` decides
    * whether to continue (false → stop). The hook behind eval-set early
    * stopping — the caller keeps its own best-iterate snapshot; the return
    * value is the last iterate, as always.
    */
  def minimize(w0: Array[Double],
               lossGrad: Array[Double] => (Double, Array[Double]),
               maxIter: Int, tol: Double,
               monitor: Array[Double] => Boolean): Array[Double] = {
    val dim = w0.length
    var w = w0

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
      var gd = -dot(grad, q) // directional derivative along -q
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
        if (monitor != null && !monitor(w)) done = true
      }
      it += 1
    }
    w
  }
}
