package graft.plan

import scala.util.Random

/** Hyperparameter task-space planners.
  *
  * Semantics follow the reference's grid/sampler contract (sk-dist
  * `search.py:643-645,710-714`, sklearn `ParameterGrid`/`ParameterSampler`):
  * grids expand as the product over SORTED parameter names with the last
  * name varying fastest; samplers draw without replacement from finite
  * grids and clamp `nIter` to the grid size (`validation.py:99-110`).
  *
  * Planning is driver-side (the candidate count is small — tens to
  * thousands); the expanded candidates become a Dataset that cross-joins
  * the fold plan into the distributed task lattice.
  */
object ParamGrid {

  /** Expand a param grid into candidate param maps, sorted-key product
    * order: first key varies slowest, last key fastest.
    */
  def expand(grid: Map[String, Seq[Any]]): Seq[Map[String, Any]] = {
    require(grid.values.forall(_.nonEmpty), "empty value list in param grid")
    val keys = grid.keys.toSeq.sorted
    keys.foldLeft(Seq(Map.empty[String, Any])) { (acc, k) =>
      for (m <- acc; v <- grid(k)) yield m + (k -> v)
    }
  }

  /** Multi-grid expansion (sklearn accepts a list of grids; concatenated
    * in order).
    */
  def expandAll(grids: Seq[Map[String, Seq[Any]]]): Seq[Map[String, Any]] =
    grids.flatMap(expand)
}

object ParamSampler {

  /** Draw `nIter` candidates without replacement from a finite grid,
    * seeded. `nIter` larger than the grid degenerates to the full grid
    * (reference `_check_n_iter`). Deterministic for a given seed; we do
    * not promise bit-parity with numpy's RNG, only a seeded deterministic
    * stream (SURVEY.md §7.4).
    */
  def sample(grid: Map[String, Seq[Any]], nIter: Int, seed: Long): Seq[Map[String, Any]] = {
    val all = ParamGrid.expand(grid)
    val n = math.min(nIter, all.size)
    new Random(seed).shuffle(all).take(n)
  }
}
