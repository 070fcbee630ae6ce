package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data operators beyond per-document scoring:
  * sequence packing and repetition/boilerplate detection.
  */
object Corpus {

  /** Concat-and-chunk sequence packing (the standard LLM pre-training
    * layout): within each `streamCol` stream, documents ordered by `idCol`
    * occupy contiguous token ranges of one concatenated stream; a training
    * sequence ("pack") is `budget` tokens, so a document starting at
    * offset o lands in pack `o div budget` at in-pack offset `o mod
    * budget`, possibly crossing into the next pack (`crosses`).
    *
    * Scale: the cumulative sum partitions by the stream key — per-stream
    * windows, never a global single-partition sort. Streams (language,
    * shard, source) are the natural parallel unit of a 100 TB corpus; a
    * single giant stream should be pre-sharded into `streamCol` values.
    */
  def packOffsets(df: DataFrame, textCol: String, idCol: String,
                  streamCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(streamCol).orderBy(idCol)
    df.select(col(idCol), col(streamCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("pack_id", expr(s"start_off DIV $budget"))
      .withColumn("pack_off", col("start_off") % budget)
      .withColumn("crosses", col("pack_off") + col("n_tokens") > budget)
  }

  /** Per-document repetition stats: top-token frequency ratio and distinct
    * ratio — the classic boilerplate/degenerate-text detectors. Exploded
    * two-phase aggregation (doc,token) -> doc; partial aggregation
    * combines map-side, and the per-document key cannot run hot.
    * Documents with no tokens produce no row (nothing to measure).
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
                      topTokenThreshold: Double = 0.1): DataFrame =
    df.select(col(idCol),
      explode_outer(TextFunctions.tokens(col(textCol))).as("_tok"))
      .filter(col("_tok").isNotNull)
      .groupBy(col(idCol), col("_tok")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol)).agg(
        sum("_c").as("n_tokens"),
        max("_c").as("_mx"),
        count(lit(1)).as("n_distinct"))
      .select(col(idCol),
        col("n_tokens"),
        round(col("_mx").cast("double") / col("n_tokens"), 4).as("top_tok_ratio"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4).as("distinct_ratio"),
        (col("_mx").cast("double") / col("n_tokens") > topTokenThreshold)
          .as("repetitive"))
}
