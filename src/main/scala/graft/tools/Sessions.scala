package graft.tools

import org.apache.spark.sql.SparkSession

/** One place to build correctly-configured sessions for the mains:
  * graft extensions (nanos-pushdown rule), AQE, UTC, right-sized shuffle
  * partitions (cores, never the 200 default).
  */
object Sessions {
  def build(master: String, shufflePartitions: Int): SparkSession =
    builder(master, shufflePartitions).getOrCreate()

  /** The configured builder, for mains that need extra settings on top
    * (e.g. MultiJvmProbe's executor classpath for local-cluster mode).
    */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder = {
    // SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" — experimentation hook for
    // isolated config A/Bs (same spirit as SPARK_GRAFT_AQE); unset in
    // every production/driver invocation, so defaults never shift.
    val extra = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "")
      .split(';').toSeq.map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    val b = SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // AQE on by default (the scale-correct choice: runtime coalescing,
      // skew splitting, plan re-optimization). SPARK_GRAFT_AQE=false is an
      // experimentation hook for measuring its per-query planning cost.
      .config("spark.sql.adaptive.enabled",
        (!Set("false", "0", "off").contains(
          sys.env.getOrElse("SPARK_GRAFT_AQE", "true").toLowerCase)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Cached plans take AQE-OPTIMIZED output partitioning (r15):
      // Spark's default (false) freezes `spark.sql.shuffle.partitions`
      // into every persisted intermediate — the pinned frames behind
      // the dedup/similarity operators (Par.pinLatest) then materialize
      // as `shuffle.partitions` near-empty partitions however small the
      // data, and EVERY downstream stage pays per-task fixed cost
      // (multi-MB task-binary deserialization for these nested cached
      // plans) times that count. Measured on q101 (RepeatStageProfile,
      // min-of-4, sf0.1): 32-partition pin → warm-run stages burn
      // 19 executor-CPU-s / 2.37 s wall; AQE-sized pin (1 partition)
      // → ~1 CPU-s / 1.36 s wall. Full-bench cpu map: q101 9.5 → 0.55,
      // q98 8.6 → 0.58 CPU-s. Scale-correct, not a local[32] trick:
      // at any size AQE gives the cache data-proportional partitions
      // (advisoryPartitionSizeInBytes), where the frozen default gives
      // it whatever constant the session happened to set. Opt out for
      // A/Bs with SPARK_GRAFT_EXTRA_CONF.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // SPARK_GRAFT_STATE_STORE=rocksdb switches streaming state to the
      // RocksDB provider (disk-bounded state — the 100x-cardinality
      // deployment shape; see Streams.withStateStore). Default stays the
      // in-memory HDFS-backed provider: at bench cardinality it is faster
      // and the bench floor should not silently shift between rounds.
      .config("spark.sql.streaming.stateStore.providerClass",
        if (sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "")
            .equalsIgnoreCase("rocksdb"))
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else // the Spark default, spelled out (the class is private[state])
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      // shuffle compression stays ON even in local mode: the CPU saving
      // measured at bench scale was noise, while a pair-heavy shuffle
      // (LSH candidate joins at probe scale) ran local disk out of space
      // uncompressed. Disk, not CPU, is the binding constraint.
    extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }
}
