package graft.ops

import org.apache.spark.sql.DataFrame

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
    */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
