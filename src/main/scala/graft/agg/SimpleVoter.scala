package graft.agg

import graft.exec.Model

/** Ensemble of PRE-FITTED models (reference `SimpleVoter`,
  * `postprocessing.py:17-120`): hard = weighted modal vote of labels
  * (ties → smallest label, numpy bincount.argmax); soft = weighted mean
  * of probability vectors, argmax (first max).
  *
  * `classes` maps internal indices back to original labels (the
  * reference's LabelEncoder round-trip, `postprocessing.py:114-120`).
  */
final case class SimpleVoter(models: Seq[Model],
                             classes: Seq[Double],
                             voting: String = "hard",
                             weights: Option[Seq[Double]] = None) extends Model {
  require(voting == "hard" || voting == "soft", s"unknown voting: $voting")
  private val w = weights.getOrElse(Seq.fill(models.size)(1.0))
  require(w.size == models.size, "one weight per model")

  def predict(x: Array[Double]): Double = voting match {
    case "hard" =>
      val votes = scala.collection.mutable.Map.empty[Double, Double].withDefaultValue(0.0)
      models.zip(w).foreach { case (m, wi) => votes(m.predict(x)) += wi }
      val win = votes.toSeq.minBy { case (label, cnt) => (-cnt, label) }._1
      // the winner is an INTERNAL index — round-trip it through `classes`
      // exactly like the soft path, or the two voting modes return
      // different label spaces
      val wi = win.toInt
      if (wi >= 0 && wi < classes.size) classes(wi) else win
    case "soft" =>
      val p = predictProba(x)
      var b = 0; var i = 1
      while (i < p.length) { if (p(i) > p(b)) b = i; i += 1 }
      if (classes.nonEmpty) classes(b) else b.toDouble
  }

  def predictProba(x: Array[Double]): Array[Double] = {
    val k = math.max(classes.size,
      models.headOption.map(_.predictProba(x).length).getOrElse(0))
    val acc = new Array[Double](k)
    var totW = 0.0
    models.zip(w).foreach { case (m, wi) =>
      val p = m.predictProba(x)
      var i = 0
      while (i < k && i < p.length) { acc(i) += wi * p(i); i += 1 }
      totW += wi
    }
    if (totW > 0) acc.map(_ / totW) else acc
  }
}
