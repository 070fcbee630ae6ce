package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * All queries take a `dir` (scale-factor directory) so the same code runs
  * at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) — and, on a
  * real cluster, against any parquet root. Reads are plain
  * `spark.read.parquet`, so Catalyst's column pruning and filter pushdown
  * reach the scan.
  */
object Tables {
  /** Timestamp columns per table. lineitem/orders store TIMESTAMP(MILLIS/
    * MICROS) which Spark reads natively (timestamp_ntz). events.ts has
    * shipped in two layouts across testdata generations:
    *  - TIMESTAMP(NANOS), which Spark rejects outright — read nanos as
    *    long (legacy conf) and rebuild a timestamp with integer division
    *    (a double division would lose precision above 2^53 ns);
    *  - TIMESTAMP(MICROS) no-tz, which Spark reads as timestamp_ntz —
    *    normalized to TimestampType (sessions pin UTC, so the cast is
    *    value-identical) because every downstream consumer (epoch-second
    *    casts, streaming watermark twins) was built on TimestampType.
    * Filters on the rebuilt/normalized column would lose parquet pushdown;
    * the graft.plans.PushTimestampNanosFilters optimizer rule restores it
    * for both layouts.
    */
  private val normalizeTs: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  /** Table-handle cache (the engine's catalog): `spark.read.parquet`
    * re-lists files and re-reads footers on every call, which a session
    * running many queries over the same tables pays hundreds of times.
    * The cached DataFrame is just the analyzed scan plan — each query
    * still gets its own pruning/pushdown on top. Keyed per session so
    * tests with their own sessions never share plans.
    */
  private val handles =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Drop cached handles (all, or one session's) — required after
    * rewriting table files in place, since a cached handle's file index
    * would otherwise point at deleted/stale parquet parts.
    */
  def invalidate(session: Option[SparkSession] = None): Unit = session match {
    case Some(s) => handles.keys.filter(_._1 eq s).foreach(handles.remove)
    case None => handles.clear()
  }

  /** Rebuild a TIMESTAMP(NANOS)-read-as-long column into a micros
    * timestamp. Integer division — a double division would lose precision
    * above 2^53 ns. The ONE definition of the nanos conversion, shared by
    * this batch loader and `streaming.Streams.readEventsRaw`.
    */
  def rebuildNanosTs(df: DataFrame, c: String): DataFrame =
    df.withColumn(c,
      org.apache.spark.sql.functions.expr(s"timestamp_micros(`$c` DIV 1000)"))

  /** Normalize a natively-read timestamp_ntz column to TimestampType.
    * Sessions pin `spark.sql.session.timeZone=UTC` (tools.Sessions), so
    * the cast re-tags the same micros value — no instant shifts. The ONE
    * definition of the micros normalization, shared by this batch loader
    * and `streaming.Streams.readEventsRaw`.
    */
  def ntzToTimestamp(df: DataFrame, c: String): DataFrame =
    df.withColumn(c,
      org.apache.spark.sql.functions.col(c)
        .cast(org.apache.spark.sql.types.TimestampType))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // lazy sweep: entries of stopped sessions are unusable garbage that
    // would otherwise pin the session object for the JVM's lifetime
    handles.keys.filter(_._1.sparkContext.isStopped).foreach(handles.remove)
    handles.getOrElseUpdate((spark, dir, name), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      normalizeTs.getOrElse(name, Nil).foldLeft(df) { (acc, c) =>
        acc.schema.find(_.name == c) match {
          case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
            rebuildNanosTs(acc, c)
          case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
            ntzToTimestamp(acc, c)
          case _ => acc
        }
      }
    })
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
