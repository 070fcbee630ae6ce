package graft.predict

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.exec.{CART, ConstantModel, GBT, LinearSVCModel, LogRegModel, Model}
import graft.functions.{LinearScoreMatrix, Softmax, TreeEnsembleScore}
import graft.search.{ForestModel, MaskedModel}

/** UDF-free scoring columns for the engine's model zoo — the dispatch
  * that keeps batch prediction and data-parallel CV scoring inside
  * whole-stage codegen (reference `predict.py` marshals per row through
  * Python; here every family with a columnar kernel scores in one fused
  * loop over referenced primitive arrays).
  *
  * Each fused column reproduces its model's own floating-point
  * evaluation order (see [[graft.functions.TreeEnsembleScore]] /
  * [[graft.functions.LinearScoreMatrix]] / [[graft.functions.Softmax]]),
  * so results match the driver-side `Model.predict`/`predictProba`
  * bit-for-bit on well-formed rows; a null feature row is null. Models
  * with no kernel (OvR/OvO stacks, voters) return None — callers keep
  * the broadcast-UDF fallback for those.
  */
object FusedScore {

  /** `model.predictProba(x)` as a fused `array<double>` column. */
  def proba(model: Model, x: Column): Option[Column] = model match {
    case m: LogRegModel =>
      Some(Softmax(LinearScoreMatrix(x, m.weights)))
    case m: LinearSVCModel => // decision values, the model's own contract
      Some(LinearScoreMatrix(x, m.weights))
    case t: CART.TreeModel =>
      Some(TreeEnsembleScore.tree(x, t))
    case f: ForestModel =>
      Some(TreeEnsembleScore.forestProba(x, f))
    case g: GBT.GBTModel =>
      val raw = TreeEnsembleScore.gbtRaw(x, g)
      Some(
        if (g.nClasses == 0) raw
        else if (g.nClasses == 2) {
          // GBTModel.predictProba's binary branch, same double ops
          val p1 = lit(1.0) / (lit(1.0) + exp(-element_at(raw, 1)))
          array(lit(1.0) - p1, p1)
        } else Softmax(raw))
    case c: ConstantModel =>
      // input-independent but null-propagating like the UDF surface
      Some(when(x.isNotNull,
        typedLit(c.predictProba(Array.empty[Double]).toSeq)))
    case MaskedModel(inner, keep) =>
      proba(inner, sliceFeatures(x, keep))
    case _ => None
  }

  /** `model.predict(x)` as a fused DOUBLE column. Argmaxes happen over
    * the same vector each model argmaxes (raw scores for linear/GBT,
    * probability vectors for trees/forests), first max wins — the
    * models' own tie-break.
    */
  def predict(model: Model, x: Column): Option[Column] = model match {
    case m: LogRegModel => // argmax over RAW scores (LogRegModel.predict)
      Some(argmaxD(LinearScoreMatrix(x, m.weights)))
    case m: LinearSVCModel =>
      Some(argmaxD(LinearScoreMatrix(x, m.weights)))
    case t: CART.TreeModel =>
      val v = TreeEnsembleScore.tree(x, t)
      Some(if (t.nClasses == 0) element_at(v, 1) else argmaxD(v))
    case f: ForestModel =>
      val v = TreeEnsembleScore.forestProba(x, f)
      Some(if (f.nClasses == 0) element_at(v, 1) else argmaxD(v))
    case g: GBT.GBTModel =>
      val raw = TreeEnsembleScore.gbtRaw(x, g)
      Some(
        if (g.nClasses == 0) element_at(raw, 1)
        else if (g.nClasses == 2) // s(0) > 0 -> 1.0 (GBTModel.predict)
          when(element_at(raw, 1) > 0.0, 1.0).otherwise(0.0)
        else argmaxD(raw))
    case c: ConstantModel =>
      Some(when(x.isNotNull, lit(c.value)))
    case MaskedModel(inner, keep) =>
      predict(inner, sliceFeatures(x, keep))
    case _ => None
  }

  /** `MaskedModel.slice`: project the kept feature indices (1-based
    * element_at over the 0-based mask).
    */
  private def sliceFeatures(x: Column, keep: Array[Int]): Column =
    // guard: transform over the literal mask is never null by itself, so
    // a null feature row must null the slice explicitly to keep the
    // null-row -> null-score contract through the recursion
    when(x.isNotNull, transform(typedLit(keep.toSeq), i => element_at(x, i + 1)))

  private def argmaxD(scores: Column): Column =
    graft.agg.Voting.argmax(scores).cast("double")
}
