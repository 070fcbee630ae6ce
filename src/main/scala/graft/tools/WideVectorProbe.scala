package graft.tools

import org.apache.spark.sql.functions._

import graft.encode.Encoderizer._

/** The huge-method JIT cliff, measured on the wide-vector surfaces: a
  * one-hot/multihot/map stage built as `vocab.size` separate CASE WHEN
  * columns generates a projection whose bytecode outgrows the JVM's
  * ~8 KB JIT threshold (or Janino's 64 KB method cap outright), and the
  * stage silently drops to the bytecode interpreter — the same cliff
  * SrpBandKeys closed for SRP signatures in r9. Times stage.transform
  * at several vocab widths over synthetic rows.
  *
  * Usage: runMain graft.tools.WideVectorProbe [nRows]
  */
object WideVectorProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t(label: String)(f: => Long): Unit = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[widevec] $label%-28s $best%8.2f s")
    }

    Seq(64, 512, 4096).foreach { w =>
      val vocab = (0 until w).map(i => s"v$i")
      val df = spark.range(n).select(col("id"),
        concat(lit("v"), pmod(col("id"), lit(w)).cast("string")).as("cat"),
        array(concat(lit("v"), pmod(col("id"), lit(w)).cast("string")),
          concat(lit("v"), pmod(col("id") + 7, lit(w)).cast("string")))
          .as("tags")).cache()
      df.count()
      val oh = OneHotStage("cat", vocab)
      t(s"onehot w=$w") {
        oh.transform(df, "f").agg(sum(expr("aggregate(f, 0.0D, (a, x) -> a + x)")))
          .head(); n
      }
      val mh = MultihotStage("tags", vocab)
      t(s"multihot w=$w") {
        mh.transform(df, "f").agg(sum(expr("aggregate(f, 0.0D, (a, x) -> a + x)")))
          .head(); n
      }
      df.unpersist()
    }
    spark.stop()
  }
}
