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
      .getOrCreate()
}
