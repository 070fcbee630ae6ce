package graft.tools

import org.apache.spark.sql.functions._

/** Cost of Spark's `round(double, n)` (BigDecimal.valueOf ⇒
  * Double.toString per row — the JFR-hot path) vs the raw double
  * arithmetic, at pair-census cardinality. Decides whether the pair
  * operators should prefilter on the RAW ratio before computing the
  * rounded output column (two-phase, provably identical output).
  *
  * Usage: runMain graft.tools.RoundCostProbe [rows]
  */
object RoundCostProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"ROUND $name%-34s ${ts.min}%8.3f s")
    }
    // synthetic jaccard-ish ratios: i/(na+nb-i) over int columns
    val base = spark.range(0, n, 1, 32).select(
      (col("id") % 97 + 1).cast("int").as("i"),
      (col("id") % 113 + 50).cast("int").as("na"),
      (col("id") % 131 + 50).cast("int").as("nb"))
    timed("raw_ratio_filter") {
      noop(base.select((col("i") / (col("na") + col("nb") - col("i"))).as("j"))
        .filter(col("j") >= 0.2))
    }
    timed("round_then_filter (current)") {
      noop(base.select(round(col("i") / (col("na") + col("nb") - col("i")), 6).as("j"))
        .filter(col("j") >= 0.2))
    }
    timed("raw_prefilter_then_round") {
      noop(base
        .filter(col("i") / (col("na") + col("nb") - col("i")) >= 0.2 - 1e-6)
        .select(round(col("i") / (col("na") + col("nb") - col("i")), 6).as("j"))
        .filter(col("j") >= 0.2))
    }
    spark.stop()
  }
}
