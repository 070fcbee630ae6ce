package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events stream. The reference is batch-only
  * (SURVEY.md §1.1); these operators extend the engine to the streaming
  * side of a training-data pipeline with the SAME transformations the
  * batch queries use — Spark's unified Dataset API means q11's hourly
  * rollup and the streaming rollup share one implementation.
  *
  * Scale: aggregations are keyed by (window, event_type) / user_id, so
  * state partitions across executors; watermarks bound state size.
  */
object Streams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Raw-layout event schema: `ts` as it sits in the driver's parquet —
    * TIMESTAMP(NANOS), which Spark surfaces as long under the legacy
    * nanosAsLong conf (see graft.Tables.load).
    */
  val rawEventSchema: StructType = StructType(
    eventSchema.map(f => if (f.name == "ts") f.copy(dataType = LongType) else f))

  /** Stream straight over the RAW nanos events parquet — no pre-normalized
    * copy. The streaming parquet source shares the batch reader, so the
    * legacy nanosAsLong conf applies; the long column is rebuilt to a
    * micros timestamp with integer division (a double division would lose
    * precision above 2^53 ns), mirroring the batch-side Tables.load.
    */
  def readEventsRaw(spark: SparkSession, dir: String,
                    glob: String = "*.parquet"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawEventSchema)
      .option("pathGlobFilter", glob) // streaming sources need a DIRECTORY
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Windowed rollup (shared shape with batch q11): tumbling window +
    * per-type counts/sums, 10-minute watermark bounds state.
    */
  def windowedRollup(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(nEvents: Long, total: Double,
                                startTs: Long, lastTs: Long)
  final case class Session(user_id: Long, n_events: Long, total_value: Double,
                           duration_ms: Long)

  /** Stateful sessionization: per-user running session closed after
    * `gapMs` of inactivity (processing-time timeout), emitted on close —
    * the `flatMapGroupsWithState` pattern for custom streaming state.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.nEvents, s.total, s.lastTs - s.startTs))
          } else {
            val evs = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption.getOrElse(
              SessionState(0, 0.0, Long.MinValue, Long.MinValue))
            val out = Seq.newBuilder[Session]
            evs.foreach { e =>
              val t = e.ts.getTime
              if (cur.nEvents > 0 && t - cur.lastTs > gapMs) {
                out += Session(userId, cur.nEvents, cur.total,
                  cur.lastTs - cur.startTs)
                cur = SessionState(0, 0.0, Long.MinValue, Long.MinValue)
              }
              cur = SessionState(cur.nEvents + 1, cur.total + e.value,
                if (cur.nEvents == 0) t else cur.startTs, t)
            }
            state.update(cur)
            state.setTimeoutDuration(gapMs)
            out.result().iterator
          }
      }
  }

  /** Streaming exact dedup: ONE survivor per normalized-text fingerprint
    * (first arrival — within a microbatch that is processing order, not
    * event order), with state bounded by the watermark —
    * `dropDuplicatesWithinWatermark` evicts fingerprint state once the
    * event time passes the horizon, so a continuous crawl can dedup
    * forever without unbounded state (the streaming twin of
    * `Dedup.exact`'s batch hash-groupBy).
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint",
        graft.text.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .drop("fingerprint") // batch/stream parity: Dedup.exact returns the original schema

  /** Run a streaming frame to completion against static files via the
    * memory sink (the local test harness; on a cluster this would be a
    * kafka/delta sink).
    */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: String = "append"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
