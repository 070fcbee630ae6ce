package graft.plan

/** Feature-elimination ladder planner (reference `eliminate.py:159-163`).
  *
  * Given `nFeatures` ranked worst-first, the ladder of candidate subsets
  * drops 0, step, 2*step, ... worst features while at least
  * `minFeaturesToSelect` remain. The empty drop-set (full model) is always
  * candidate 0 — the reference keeps it as the baseline.
  */
object RemovalLadder {

  /** Number of features dropped at each rung (rung 0 drops none). */
  def dropCounts(nFeatures: Int, step: Int, minFeaturesToSelect: Int): Seq[Int] = {
    require(step > 0, "step must be positive")
    (0 to nFeatures / step)
      .map(_ * step)
      .filter(d => nFeatures - d >= minFeaturesToSelect)
  }

  /** Rungs as drop-lists over a worst-first feature ranking: rung i drops
    * the first `dropCounts(i)` entries of `rankedWorstFirst`.
    */
  def rungs(rankedWorstFirst: Seq[Int], step: Int,
            minFeaturesToSelect: Int): Seq[Seq[Int]] =
    dropCounts(rankedWorstFirst.size, step, minFeaturesToSelect)
      .map(d => rankedWorstFirst.take(d))
}
