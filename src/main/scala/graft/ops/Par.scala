package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}

/** Parallelism plumbing for compute-heavy per-row derivations. */
object Par {

  /** Fan a narrow input out to all cores before an expensive per-row
    * derivation (shingling, hashing, signature building).
    *
    * Locally a small parquet table arrives as ONE split, so everything up
    * to the first shuffle — including the tokenize/shingle/explode work
    * that dominates dedup — serializes on one core. Repartitioning the raw
    * rows first costs one cheap shuffle of the undeived input and unblocks
    * every core. Gated on the current partition count so it is a no-op on
    * a real cluster where the scan already has >= defaultParallelism
    * splits — there the extra shuffle would be pure waste.
    *
    * Only plans that are pure scan pipelines (leaf + project/filter/alias)
    * are probed: the probe reads the physical partition count via
    * `df.rdd`, and under AQE that call on a plan CONTAINING EXCHANGES
    * would synchronously materialize every upstream shuffle stage — work
    * that then re-runs on the real action. A derived frame has already
    * been through a shuffle (so it is already spread across cores), and a
    * streaming frame cannot be probed at all; both pass through untouched.
    */
  def fanOut(df: DataFrame): DataFrame = {
    def scanOnly(plan: LogicalPlan): Boolean = plan match {
      case _: LeafNode => true
      case p: Project => scanOnly(p.child)
      case f: Filter => scanOnly(f.child)
      case a: SubqueryAlias => scanOnly(a.child)
      case _ => false
    }
    if (df.isStreaming || !scanOnly(df.queryExecution.optimizedPlan)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }
  }
}
