package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.columnar.InMemoryRelation

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
    *
    * Plans whose lineage would PLAN AN EXCHANGE are not probed: the probe
    * reads the physical partition count via `df.rdd`, and under AQE that
    * call on a plan containing exchanges synchronously materializes every
    * upstream shuffle stage — work that then re-runs on the real action.
    * Such frames have also already been spread across cores by their
    * shuffle. Exchange-free derived plans (map/explode/union/local limit
    * over a scan) are still probed — they inherit the scan's partition
    * count and need the fan-out just as much as a bare scan. Streaming
    * frames cannot be probed at all and pass through untouched.
    */
  /** Run `f` over `items` on a bounded driver-side thread pool,
    * preserving input order in the result. For CONCURRENT SPARK JOB
    * SUBMISSION: a sequence of independent distributed fits submitted
    * one-by-one leaves the cluster idle during each job's driver-side
    * phases (planning, stat collection, model assembly); submitting from
    * `parallelism` threads overlaps them (Spark's scheduler interleaves
    * concurrent jobs at stage granularity under FIFO, fully under FAIR).
    * Fails FAST: the first thrown exception rethrows here immediately;
    * queued tasks are cancelled (`shutdownNow`), but tasks already
    * mid-flight finish in the background — their Spark jobs were
    * submitted and Spark does not unwind a running job on driver-thread
    * interrupt. NOT for executor-side code — this is a driver
    * orchestration helper.
    */
  def concurrently[T, R](items: Seq[T], parallelism: Int)(f: T => R): Seq[R] = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    if (parallelism == 1 || items.length <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, items.length))
      var failed = false
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        try Await.result(Future.sequence(items.map(t => Future(f(t)))),
          Duration.Inf)
        catch { case e: Throwable => failed = true; throw e }
      } finally {
        if (failed) pool.shutdownNow() else pool.shutdown()
        ()
      }
    }
  }

  private val pinned = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), DataFrame]()

  /** Persist `df` as the ONE live pinned intermediate for (session, key):
    * a new call under the same key unpersists the previous pin
    * (non-blocking). For the large per-call intermediates that back LAZY
    * operator results (shingle sets, exploded inverted indexes, vector
    * projections): each call must keep its intermediate persisted while
    * its result is alive, but a long-lived session — a bench loop, a
    * serving process — would otherwise accumulate one multi-GB pin PER
    * CALL with nothing ever unpersisting them (measured: a full-bench
    * session at 100× data OOM'd an 8 GB heap on exactly this). With the
    * registry a session holds at most one live intermediate per operator
    * family; an OLDER lazy result re-collected later just recomputes —
    * correct, slower — the same trade `Similarity.lastIvfResult`
    * documents. Entries of stopped sessions are swept lazily.
    */
  def pinLatest(key: String, df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    pinned.keySet.asScala.filter(_._1.sparkContext.isStopped)
      .foreach(pinned.remove)
    val p = df.persist()
    val prev = pinned.put((df.sparkSession, key), p)
    // The eviction guard must compare LOGICAL PLANS, not references:
    // `Dataset.persist`/`unpersist` both resolve against the shared cache
    // by plan `sameResult`, so re-pinning a logically-identical frame (a
    // repeat bench iteration, a repeated serving call) makes the new
    // persist a no-op against the SAME cache entry — a reference-equality
    // guard then lets `prev.unpersist` remove that shared entry, and the
    // expensive intermediate silently recomputes at every consumption
    // site while the registry believes it is pinned.
    if (prev != null && (prev ne p) &&
        !prev.queryExecution.analyzed.sameResult(p.queryExecution.analyzed))
      prev.unpersist(blocking = false)
    p
  }

  /** Release a pin EAGERLY (for callers whose result no longer needs the
    * intermediate — e.g. semanticDedup once the pair graph is
    * materialized) and drop its registry entry, so a later `pinLatest`
    * under the same key does not find a stale entry whose logical plan
    * matches the fresh pin. Removes the entry only when `df` IS the live
    * pin — a concurrent re-pin under the same key keeps its own entry.
    */
  def unpin(key: String, df: DataFrame): Unit = {
    pinned.remove((df.sparkSession, key), df)
    df.unpersist(blocking = false)
    ()
  }

  private[graft] def plansExchange(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort | _: GlobalLimit |
           _: Distinct | _: Deduplicate | _: Except | _: Intersect |
           _: RepartitionOperation | _: RebalancePartitions | _: CoGroup |
           _: Offset | _: Tail => true
      case _: FlatMapGroupsWithState | _: MapGroups => true
      case _ => false
    }

  /** Minimum estimated input size before [[fanOut]] inserts its
    * repartition: below this, even a single core finishes the scan-stage
    * work in well under a second, and the exchange round-trip costs more
    * than the parallelism buys (measured r12 at sf0.1: ~0.3 s per query
    * of pure repartition latency over 255 KB corpora, ~+6 s across the
    * fanned query set — while at 55 MB the same repartition turned a
    * 73 s one-core scan stage into 4 s). Plan stats are reliable here:
    * fanOut only ever sees exchange-free narrow plans, whose estimate
    * comes straight from the file scan.
    *
    * 2 MB, not the original 8 MB (r14): the estimate is COMPRESSED file
    * bytes while the cost driver is per-row CPU — a 5.5 MB parquet of
    * 50k documents sat under the old floor and ran its whole
    * regex-heavy scan stage on ONE core (isolated-probed at sf1:
    * q32 10.8 s / q33 9.0 s on the r14 host, ~0.3 s of that being the
    * exchange the floor was protecting against; the r12 bench host hid
    * the same serialization at 0.8 s/query behind faster single-core
    * throughput). 255 KB-class corpora (sf0.1) stay below the new
    * floor, so the small-SF bench floor is unchanged.
    */
  private[graft] val FanOutMinBytes: Long = 2L << 20

  def fanOut(df: DataFrame, minBytes: Long = FanOutMinBytes): DataFrame = {
    // Pinned/cached frames return UNTOUCHED, before any plan probe: cache
    // substitution runs before optimization, so a persisted derived frame
    // presents as a bare InMemoryRelation — plansExchange cannot see the
    // Join/Aggregate hidden inside it, the stats read would fall back to
    // the child plan's multiplicative estimate (the same ~1e5-off number
    // routeTwoPhase exists to avoid), and the df.rdd partition probe
    // would materialize the cache's upstream shuffles under AQE. A frame
    // someone pinned is either derived (already spread by its own
    // exchange) or a deliberately cached scan — neither wants an extra
    // repartition stacked on top of the cache.
    if (df.isStreaming ||
        df.storageLevel != org.apache.spark.storage.StorageLevel.NONE ||
        df.queryExecution.optimizedPlan.exists(
          _.isInstanceOf[InMemoryRelation]) ||
        plansExchange(df)) df
    else if (df.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(minBytes)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }
  }

  /** [[pinLatest]] ONLY when `df`'s upstream is a DERIVED plan (contains
    * a join/aggregate/window/…): a frame consumed by several divergent
    * plans re-executes its whole upstream once per consumer, which is
    * worth a pin exactly when that upstream is expensive. A bare
    * scan+filter+project is returned unpinned — re-scanning parquet is
    * cheap, and caching a corpus-scale projection would churn executor
    * storage for no saved work.
    */
  def pinIfDerived(key: String, df: DataFrame): DataFrame =
    if (plansExchange(df)) pinLatest(key, df) else df
}
