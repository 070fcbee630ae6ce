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
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
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
}
