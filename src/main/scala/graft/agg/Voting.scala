package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Model-vote and score-normalization algebra (reference
  * `postprocessing.py` SimpleVoter, `multiclass.py:337-362` predict_proba
  * normalization).
  *
  * Everything is built from codegen'd higher-order functions
  * (`transform`/`filter`/`aggregate`/`zip_with`) over array columns — no
  * UDFs, so the hot path stays inside whole-stage codegen and the
  * expressions survive Catalyst pushdown at any scale.
  */
object Voting {

  /** Hard vote: modal value of an array of per-model predictions, ties
    * broken by the SMALLEST value — exactly numpy `bincount(..).argmax()`
    * (`postprocessing.py:79-84`).
    */
  def hardVote(preds: Column): Column = {
    val vals = array_sort(array_distinct(preds))
    val counts = transform(vals, v => size(filter(preds, _ === v)))
    element_at(vals, array_position(counts, array_max(counts)).cast("int"))
  }

  /** Weighted hard vote: counts become weight sums (numpy
    * `bincount(votes, weights)`).
    */
  def hardVoteWeighted(preds: Column, weights: Column): Column = {
    val vals = array_sort(array_distinct(preds))
    val counts = transform(vals, v =>
      aggregate(
        zip_with(preds, weights, (p, w) => when(p === v, w).otherwise(lit(0.0))),
        lit(0.0), (acc, x) => acc + x))
    element_at(vals, array_position(counts, array_max(counts)).cast("int"))
  }

  /** Soft vote over per-model probability vectors (array of array<double>):
    * weighted element-wise mean, then argmax class index (0-based), ties to
    * the first (lowest) index — numpy `argmax` (`postprocessing.py:98-112`).
    */
  def softVoteScores(probs: Column, weights: Column): Column = {
    val weighted = zip_with(probs, weights, (p, w) => transform(p, x => x * w))
    val totalW = aggregate(weights, lit(0.0), (a, x) => a + x)
    val summed = aggregate(
      weighted,
      transform(element_at(probs, 1), _ => lit(0.0)),
      (acc, p) => zip_with(acc, p, (a, x) => a + x))
    // zero total weight: pass the (all-zero) sums through instead of
    // dividing into NaNs, which argmax would resolve to a garbage winner
    // (same guard as normalize below)
    transform(summed, x => when(totalW > 0, x / totalW).otherwise(x))
  }

  /** Argmax index (0-based, first max wins) of a score vector. */
  def argmax(scores: Column): Column =
    (array_position(scores, array_max(scores)) - 1).cast("int")

  /** Row-normalize a score vector: "l1" | "l2" | "max" (reference norm
    * option, `multiclass.py:359-361`). Unknown norm → identity (sklearn
    * raises; we validate at the API layer).
    */
  def normalize(scores: Column, norm: String): Column = norm match {
    case "l1" =>
      val s = aggregate(scores, lit(0.0), (a, x) => a + abs(x))
      transform(scores, x => when(s === 0.0, x).otherwise(x / s))
    case "l2" =>
      val s = sqrt(aggregate(scores, lit(0.0), (a, x) => a + x * x))
      transform(scores, x => when(s === 0.0, x).otherwise(x / s))
    case "max" =>
      val s = array_max(transform(scores, x => abs(x)))
      transform(scores, x => when(s === 0.0, x).otherwise(x / s))
    case other => throw new IllegalArgumentException(s"unknown norm: $other")
  }
}
