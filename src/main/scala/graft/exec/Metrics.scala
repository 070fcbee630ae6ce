package graft.exec

/** Scoring registry (reference `utils.py:75-143` scorer contract).
  * All scorers are "greater is better" — loss metrics are negated, sklearn
  * convention (`neg_log_loss`, `neg_mean_squared_error`).
  */
object Metrics {

  type Scorer = (Model, Array[Array[Double]], Array[Double]) => Double

  def scorer(name: String): Scorer = name match {
    case "accuracy"               => accuracy
    case "f1_weighted"            => f1Weighted
    case "neg_log_loss"           => negLogLoss
    case "r2"                     => r2
    case "neg_mean_squared_error" => negMse
    case other => throw new IllegalArgumentException(s"unknown scoring: $other")
  }

  /** Multi-metric scoring contract (reference `_multimetric_score`,
    * `utils.py:39-72`): one fitted model scored under several metrics.
    */
  def multi(names: Seq[String]): (Model, Array[Array[Double]], Array[Double]) => Map[String, Double] = {
    val fns = names.map(n => n -> scorer(n))
    (m, x, y) => fns.map { case (n, f) => n -> f(m, x, y) }.toMap
  }

  def accuracy(m: Model, x: Array[Array[Double]], y: Array[Double]): Double = {
    var ok = 0; var i = 0
    while (i < x.length) { if (m.predict(x(i)) == y(i)) ok += 1; i += 1 }
    if (x.isEmpty) 0.0 else ok.toDouble / x.length
  }

  /** Weighted-average one-vs-rest F1 (sklearn `f1_score(average="weighted")`,
    * zero_division=0).
    */
  def f1Weighted(m: Model, x: Array[Array[Double]], y: Array[Double]): Double = {
    if (x.isEmpty) return 0.0
    val preds = x.map(m.predict)
    val classes = y.distinct.sorted
    var f1Sum = 0.0
    classes.foreach { c =>
      var tp = 0.0; var fp = 0.0; var fn = 0.0; var support = 0.0
      var i = 0
      while (i < y.length) {
        val isC = y(i) == c; val predC = preds(i) == c
        if (isC) support += 1
        if (isC && predC) tp += 1
        else if (!isC && predC) fp += 1
        else if (isC && !predC) fn += 1
        i += 1
      }
      val prec = if (tp + fp > 0) tp / (tp + fp) else 0.0
      val rec = if (tp + fn > 0) tp / (tp + fn) else 0.0
      val f1 = if (prec + rec > 0) 2 * prec * rec / (prec + rec) else 0.0
      f1Sum += f1 * support
    }
    f1Sum / y.length
  }

  def negLogLoss(m: Model, x: Array[Array[Double]], y: Array[Double]): Double = {
    if (x.isEmpty) return 0.0
    val eps = 1e-15
    var ll = 0.0; var i = 0
    while (i < x.length) {
      val p = m.predictProba(x(i))
      val yi = y(i).toInt
      val pi = if (yi < p.length) p(yi) else eps
      ll += math.log(math.max(eps, math.min(1 - eps, pi)))
      i += 1
    }
    ll / x.length
  }

  def r2(m: Model, x: Array[Array[Double]], y: Array[Double]): Double = {
    if (x.isEmpty) return 0.0
    val mean = y.sum / y.length
    var ssRes = 0.0; var ssTot = 0.0; var i = 0
    while (i < x.length) {
      val e = y(i) - m.predict(x(i)); ssRes += e * e
      val t = y(i) - mean; ssTot += t * t
      i += 1
    }
    if (ssTot == 0) { if (ssRes == 0) 1.0 else 0.0 } else 1.0 - ssRes / ssTot
  }

  def negMse(m: Model, x: Array[Array[Double]], y: Array[Double]): Double = {
    if (x.isEmpty) return 0.0
    var s = 0.0; var i = 0
    while (i < x.length) { val e = y(i) - m.predict(x(i)); s += e * e; i += 1 }
    -s / x.length
  }
}
