package graft.tools

import org.apache.spark.sql.SparkSession

/** One place to build correctly-configured sessions for the mains:
  * graft extensions (nanos-pushdown rule), AQE, UTC, right-sized shuffle
  * partitions (cores, never the 200 default).
  */
object Sessions {
  def build(master: String, shufflePartitions: Int): SparkSession =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local[k] only: shuffles never cross a network, so lz4 on every
      // shuffle block is pure CPU overhead. A real cluster deploy would
      // leave compression on (bandwidth >> CPU there).
      .config("spark.shuffle.compress", (!master.startsWith("local")).toString)
      .config("spark.shuffle.spill.compress", (!master.startsWith("local")).toString)
      .getOrCreate()
}
