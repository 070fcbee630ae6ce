package graft.exec

/** Special functions for the univariate-selection p-value modes
  * (reference `preprocessing.py:33-39` — SelectFpr/SelectFdr/SelectFwe
  * over `f_classif` p-values). Implemented from the public formulas:
  * Lanczos log-gamma, regularized incomplete beta via the standard
  * continued fraction (modified Lentz evaluation), and the F-distribution
  * upper tail expressed through it. Self-contained — no new dependencies.
  */
object Stats {

  // Lanczos approximation, g = 7, n = 9 (the classic published
  // coefficient set; relative error < 1e-10 over the real half-line).
  private val lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def lgamma(xIn: Double): Double = {
    require(xIn > 0, s"lgamma needs x > 0, got $xIn")
    if (xIn < 0.5) {
      // reflection: Γ(x)Γ(1-x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * xIn)) - lgamma(1.0 - xIn)
    } else {
      val x = xIn - 1.0
      var a = lanczos(0)
      var i = 1
      while (i < lanczos.length) { a += lanczos(i) / (x + i); i += 1 }
      val t = x + 7.5
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized incomplete beta I_x(a, b), continued fraction evaluated
    * by modified Lentz; the symmetry swap keeps the fraction in its
    * fast-converging region.
    */
  def regIncBeta(x: Double, a: Double, b: Double): Double = {
    require(a > 0 && b > 0, s"need a, b > 0, got ($a, $b)")
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val lnFront = a * math.log(x) + b * math.log1p(-x) +
        lgamma(a + b) - lgamma(a) - lgamma(b)
      if (x < (a + 1.0) / (a + b + 2.0))
        math.exp(lnFront) * betacf(x, a, b) / a
      else
        1.0 - math.exp(lnFront) * betacf(1.0 - x, b, a) / b
    }
  }

  private def betacf(x: Double, a: Double, b: Double): Double = {
    val tiny = 1e-300
    val eps = 1e-14
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1.0)
    if (math.abs(d) < tiny) d = tiny
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      // even step: d_{2m} = m(b-m)x / ((a+2m-1)(a+2m))
      var num = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
      d = 1.0 + num * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + num / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      h *= d * c
      // odd step: d_{2m+1} = -(a+m)(a+b+m)x / ((a+2m)(a+2m+1))
      num = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
      d = 1.0 + num * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + num / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h // converged to working precision long before 300 terms in practice
  }

  /** Upper tail (survival) of the F distribution: P(F(d1, d2) > f) =
    * I_{d2/(d2 + d1 f)}(d2/2, d1/2).
    */
  def fSf(f: Double, d1: Double, d2: Double): Double = {
    require(d1 > 0 && d2 > 0, s"need positive dfs, got ($d1, $d2)")
    if (f <= 0.0) 1.0
    else regIncBeta(d2 / (d2 + d1 * f), d2 / 2.0, d1 / 2.0)
  }
}
