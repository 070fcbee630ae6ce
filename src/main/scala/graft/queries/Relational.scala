package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Core relational query surface, oracle-checked against DuckDB.
  *
  * These exercise every relational shape the reference computes with numpy /
  * pandas (SURVEY.md §2.5): scan, projection, filter, inner/broadcast/anti/
  * semi/cross joins, aggregation, window ranking, top-k, union/distinct,
  * pivot, scalar functions. Plans are declarative DataFrame ops so Catalyst
  * applies pushdown/pruning/join-selection; dimension tables are explicitly
  * `broadcast()` so the 100TB plan never shuffles the fact table against a
  * small side.
  *
  * Float discipline for the hash-compare oracle: every aggregated double is
  * `round(_, 2|4)` on BOTH sides, so the ~1e-12 relative error between
  * Spark's partition-order summation and DuckDB's sequential summation
  * cannot flip a digit. Integer-width mismatches (DuckDB `length`/`sum` of
  * int widen to BIGINT/HUGEINT) are reconciled with explicit casts in the
  * oracle SQL.
  */
object Relational {

  private def revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))

  // Exact integer-unit sums for the grouped revenue aggregates
  // (q01/q03/q04/q18): double summation ORDER differs between Spark and
  // DuckDB, and at sf1+ group sums land close enough to a .xx5 boundary
  // to flip round(x, 2) — the crosscheck's only manual adjudications.
  // Summing integers is order-independent and exact, so the rounded
  // result is engine-invariant — PROVIDED the per-row quantization
  // itself is. The engines quantize DIFFERENT numbers (Spark half-up-
  // rounds the double's shortest decimal representation via
  // BigDecimal.valueOf inside round(); DuckDB's DECIMAL cast rounds the
  // binary value scaled by 10^scale), so the quantization is engine-
  // invariant only when the term's TRUE mathematical value is at least
  // ~1e-9 away from every boundary at the chosen scale. That holds
  // exactly when the scale covers the term's true decimal precision:
  // extendedprice and discount are 2-dp by data contract (verified:
  // max |100x − round(100x)| < 1e-9 across the testdata), so
  // extendedprice·(1−discount) is a true 4-dp value and scale 4 is
  // tie-free. A term multiplying THREE 2-dp factors (q01's charge) is
  // a true 6-dp value — it needs scale 6, because true .xxxx50 values
  // DO occur and sit exactly on the scale-4 boundary where the two
  // quantizers disagree (observed at sf0.01 on the decimal-sum
  // predecessor of this vehicle).
  //
  // The SUM vehicle is Sum128 over round(term·10^scale) longs, NOT
  // sum(CAST(term AS DECIMAL(20+,scale))): any per-row path through a
  // >18-precision Decimal leaves the long-backed compact representation
  // and allocates BigDecimals inside the generated aggregate loop —
  // measured 3-5x slower at best, with intermittent HotSpot
  // deopt/recompile storms where one task burns 20-75 s of CPU on work
  // that takes 0.3 s compiled (DecimalAggProbe, r13 NOTES). Sum128's
  // two-long 128-bit accumulator keeps the per-row work in pure long
  // arithmetic at ANY corpus size, and materializes DECIMAL(38,0) once
  // per group. The DuckDB oracle keeps its DECIMAL casts — its decimal
  // sums are exact too, and the hash gate pins the equality.
  private def unitSum(term: org.apache.spark.sql.Column, scale: Int)
      : org.apache.spark.sql.Column =
    graft.functions.Sum128(
      round(term * math.pow(10, scale).toLong).cast("long"))

  /** round(sum(term), 2) with the sum exact in 10^-scale units. */
  private def sumMoney(term: org.apache.spark.sql.Column, scale: Int)
      : org.apache.spark.sql.Column =
    round(unitSum(term, scale) / lit(math.pow(10, scale).toLong), 2)
      .cast("double")

  /** Exact `DIV` (the oracle's HUGEINT `//`) built directly: the
    * SQL-string route would need a registered sum128 function.
    */
  private def intDiv(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{EvalMode, IntegralDivide, NumericEvalContext}
    GraftSqlBridge.column(IntegralDivide(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b),
      NumericEvalContext(EvalMode.LEGACY, allowDecimalPrecisionLoss = true)))
  }

  // Engine-invariant 4-dp average over a true 2-dp column (ADVICE r11):
  // round(avg(x), 4) on a double sum inherits the same partial-agg
  // ordering sensitivity that flipped sum_charge — lower probability
  // (averages don't land systematically on rounding boundaries the way
  // cent-multiple sums do), but the exact route costs nothing. Per-row
  // cents round(x*100) is tie-free and identical in both engines (x is
  // true 2-dp by data contract, so x*100 sits within 1e-9 of an
  // integer); the integer sum S is exact in any order (Sum128's 128-bit
  // long-limb accumulator — see unitSum for why not DECIMAL(38,0));
  // and floor((200·S + n) / (2·n)) is the mathematically exact half-up
  // round(S/(100·n), 4) scaled by 10⁴, computed wholly in integer
  // arithmetic (DECIMAL(38,0) once per group here, HUGEINT via `//` in
  // the DuckDB oracle). The only float op left is the final /10⁴ on an
  // identical integer — bit-identical across engines.
  private def avgExact2dp(c: String): org.apache.spark.sql.Column = {
    val s = unitSum(col(c), 2)
    val n = count(lit(1))
    intDiv(s * lit(200) + n, n * lit(2)).cast("double") / 10000
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary: full-scan aggregate with map-side
    // partial aggregation; groups are tiny so the shuffle is negligible.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          // price sums ride exact integer units via Sum128 (the
          // q03/q04/q18 discipline): a double sum over millions of
          // cent-valued rows is ordering-sensitive at the last ulp,
          // Spark's partial-agg order is nondeterministic, and at sf1
          // volume sum_charge landed on a round-to-cent boundary and
          // flipped between runs. The unit SCALE must cover the term's
          // TRUE decimal precision (see unitSum's comment): charge
          // multiplies THREE 2-dp factors, so its true value has SIX
          // decimals and scale-4 units would sit on genuine .xxxx50
          // ties where the engines' quantizers disagree — scale 6 is
          // tie-free again. sum_qty stays double: quantities are
          // integer-valued, exact below 2^53 in any summation order.
          sumMoney(col("l_extendedprice"), 2).as("sum_base_price"),
          sumMoney(revenue, 4).as("sum_disc_price"),
          sumMoney(revenue * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          avgExact2dp("l_quantity").as("avg_qty"),
          avgExact2dp("l_extendedprice").as("avg_price"),
          avgExact2dp("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Filter + projection that must reach the parquet scan as PushedFilters
    // + a 4-column ReadSchema.
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_quantity") < 25)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    }),

    // 3-way join with INDEPENDENT broadcast builds: lineitem (the one big
    // fact) joins broadcast(filtered orders) then broadcast(customer).
    // Neither broadcast depends on the other, so AQE materializes both
    // stages concurrently — the old shape (broadcast(c) ⋈ o, then
    // broadcast THAT into l) serialized two builds. lineitem is never
    // shuffled; only the tiny aggregate exchanges.
    "q03_join_revenue" -> ((s, d) => {
      val c = broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment"))
      val o = broadcast(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderpriority"))
      Tables.lineitem(s, d)
        // revenue carried through the joins as an 8-byte long of exact
        // 4-dp units (see unitSum) — half the decimal's row width on
        // the fact side, and the sum stays pure long arithmetic
        .select(col("l_orderkey"), round(revenue * 10000).cast("long").as("_rev"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(round(graft.functions.Sum128(col("_rev")) / lit(10000L), 2)
            .cast("double").as("rev"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment", "o_orderpriority")
    }),

    // Fact ⋈ small dim: broadcast hash join, no shuffle of lineitem.
    "q04_dim_join" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sumMoney(revenue, 4).as("rev"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    // Window ranking: top-3 customers by balance per nation (deterministic
    // tie-break on key). Same shape as the reference's rank_test_score.
    "q05_window_topn" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("rn"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("n_name", "rn")
    }),

    // Anti join: customers with no recent orders.
    "q06_anti_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // Semi join: suppliers with recent shipments (EXISTS).
    "q07_semi_join" -> ((s, d) => {
      Tables.supplier(s, d)
        .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // Union + distinct across two tables.
    "q08_union_distinct" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")
    }),

    // Small cross join (the reference's candidates × folds task lattice).
    "q09_cross_join" -> ((s, d) => {
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    }),

    // Global top-k with deterministic tie-break.
    "q10_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("totalprice"))
        .orderBy(col("totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Time-bucketed aggregation over the event stream (batch view of the
    // streaming hourly rollup in graft.streaming).
    "q11_events_hourly" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // Scalar function battery: string ops, cast, coalesce.
    "q12_scalar_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_type"), 1, 5).as("type5"),
        length(col("p_name")).cast("int").as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        round(coalesce(col("p_retailprice"), lit(0.0)), 2).as("price"),
        col("p_size").cast("long").as("size_l"))
        .orderBy("p_partkey")
    }),

    // Pivot (groupBy().pivot() — the reference's dict-of-arrays reshape).
    "q13_pivot_events" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0)
        .orderBy("user_id")
    }),

    // Exact distinct aggregation.
    "q14_distinct_users" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),

    // Semi-structured: JSON field extraction from the props column.
    "q15_json_extract" -> ((s, d) => {
      // fanOut: per-row JSON parsing otherwise serializes on the bench
      // file's two row groups (no-op at real scale)
      graft.ops.Par.fanOut(Tables.events(s, d))
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    }),

    // Hierarchical aggregation: ROLLUP with labeled subtotal rows.
    "q16_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    }),

    // Set difference: nations with rich customers but no rich suppliers.
    "q17_except" -> ((s, d) => {
      Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
          .select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    }),

    // Post-aggregation filter (HAVING).
    "q18_having" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"),
          sumMoney(revenue, 4).as("rev"))
        .filter(col("n_items") > 550)
        .orderBy("l_suppkey")
    }),

    // As-of (point-in-time) join: each event gets the user's most recent
    // order at-or-before the event time (right side pre-deduped to one
    // row per (key, ts) for determinism).
    "q48_asof_join" -> ((s, d) => {
      val events = Tables.events(s, d).select("event_id", "user_id", "ts")
      val orders = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max("o_orderkey").as("last_orderkey"))
      graft.ops.AsOfJoin.backward(events, orders,
        keyCol = "user_id", leftTsCol = "ts", rightTsCol = "o_orderdate",
        payloadCols = Seq("last_orderkey"))
        .select("event_id", "user_id", "last_orderkey")
        .orderBy("event_id")
    }),

    // Batch sessionization (the batch twin of streaming.Streams
    // .sessionize): session boundary = inactivity gap > 30 min, session
    // index = running count of boundaries per user.
    "q49_sessionize" -> ((s, d) => {
      val sec = col("ts").cast("long")
      val wOrd = Window.partitionBy("user_id").orderBy(sec.asc, col("event_id").asc)
      val sessions = Tables.events(s, d)
        .withColumn("_sec", sec)
        .withColumn("_gap", col("_sec") - lag("_sec", 1).over(wOrd))
        .withColumn("_new", when(col("_gap").isNull || col("_gap") > 1800, 1).otherwise(0))
        .withColumn("session_idx",
          sum("_new").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      sessions.groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"),
          (max("_sec") - min("_sec")).as("duration_sec"))
        .orderBy("user_id", "session_idx")
    }),

    // Window-function battery: row_number, lag delta, running sum, lead.
    "q50_window_funcs" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables.lineitem(s, d)
        .filter(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).cast("long").as("rn"),
          round(col("l_extendedprice") -
            coalesce(lag("l_extendedprice", 1).over(w), lit(0.0)), 2).as("price_delta"),
          // running sum over the integer-valued quantity: DuckDB's
          // segment-tree window aggregation sums in a different order
          // than Spark's sequential accumulator, so float running sums
          // can never hash-match, and double→decimal rounding disagrees
          // between the engines at representation ties. Integers are
          // order-independent and tie-free.
          sum(col("l_quantity").cast("long"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .as("running_qty"),
          lead("l_quantity", 1).over(w).as("next_qty"))
        .orderBy("l_suppkey", "rn")
    }),

    // CUBE: all grouping-set combinations with labeled subtotal rows.
    "q51_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 4).as("avg_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("avg_price"))
        .orderBy("status", "priority")
    }),

    // Exact interpolated quantiles per group.
    "q52_quantiles" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(
          round(expr("percentile(c_acctbal, 0.25)"), 6).as("p25"),
          round(expr("percentile(c_acctbal, 0.5)"), 6).as("p50"),
          round(expr("percentile(c_acctbal, 0.75)"), 6).as("p75"))
        .orderBy("c_mktsegment")
    }),

    // Correlated-subquery shape: orders priced above their customer's
    // average (expressed as a window in Spark, a correlated subquery in
    // the oracle — same semantics, each engine's idiom).
    "q53_above_customer_avg" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
      Tables.orders(s, d)
        .withColumn("_avg", avg("o_totalprice").over(w))
        // float discipline applies to PREDICATES on aggregates too: both
        // engines round the margin before comparing, so a ~1-ulp
        // summation-order difference can't flip a boundary row
        .filter(round(col("o_totalprice") - col("_avg") * 1.5, 4) > 0)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("totalprice"))
        .orderBy("o_orderkey")
    }),

    // Date-part extraction battery over order dates.
    "q55_date_parts" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"))
        .agg(count(lit(1)).as("n"),
          countDistinct(month(col("o_orderdate"))).as("n_months"),
          countDistinct(dayofweek(col("o_orderdate"))).as("n_dows"))
        .orderBy("y", "q")
    }),

    // String-function battery: pad/trim/replace/reverse/position.
    "q56_string_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "_").as("brand_pad"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_vowels"),
        reverse(col("p_type")).as("type_rev"),
        instr(col("p_name"), " ").cast("long").as("space_pos"),
        substring_index(col("p_name"), " ", 1).as("first_word"))
        .orderBy("p_partkey")
    }),

    // Array-function battery over embeddings: slice/sort/contains-style.
    "q57_array_funcs" -> ((s, d) => {
      val e = col("embedding").cast("array<double>")
      Tables.embeddings(s, d).select(
        col("vec_id"),
        round(element_at(e, 1), 6).as("first_dim"),
        round(array_max(e), 6).as("max_dim"),
        round(array_min(e), 6).as("min_dim"),
        round(element_at(array_sort(e), 32), 6).as("median_low"),
        size(filter(e, x => x > 0.0)).as("n_positive"))
        .orderBy("vec_id")
    }),

    // Regex predicate + LIKE.
    "q19_regexp" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").rlike("^(red|blue) (bolt|gear)s?$") ||
          col("p_type").like("%PROMO%"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    // Range (point-in-interval) join: orders priced into OVERLAPPING
    // bands (width 10k, stride 4k — each order lands in 2-3 bands), via
    // the bucketized equi-join (no BroadcastNestedLoopJoin). Bands are
    // half-open [lo, hi).
    "q80_range_join" -> ((s, d) => {
      // one slice, not leafNodeDefaultParallelism (= cores): 140 dimension
      // rows otherwise plan `cores` near-empty tasks on the broadcast
      // BUILD side — pure per-task fixed cost at any deployment size
      // (the r15 driver bench charged q80 10.5 executor-CPU-s at 32
      // cores; the rows and result are identical either way)
      val bands = s.range(0, 140, 1, numPartitions = 1).select(
        col("id").cast("int").as("band_id"),
        (col("id") * 4000.0).as("lo"),
        (col("id") * 4000.0 + 10000.0).as("hi"))
      val points = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      graft.ops.RangeJoin.pointInInterval(points, bands,
        pointCol = "o_totalprice", loCol = "lo", hiCol = "hi",
        bucketWidth = 4000.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_orders"),
          // Sum128 exact units, not a double sum (the q01/q03
          // discipline): per-band sums reach ~1e11 at sf10, where the
          // engines' partial-agg ORDER flips round(,2) at the last ulp
          // — caught by the r15 sf10 crosscheck gate
          sumMoney(col("o_totalprice"), 2).as("sum_price"))
        .orderBy("band_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(20,4))),2) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(20,4))),2) AS DOUBLE) AS sum_disc_price,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(24,6))),2) AS DOUBLE) AS sum_charge,
        | CAST((sum(CAST(round(l_quantity*100) AS BIGINT))*200 + count(*)) // (count(*)*2) AS DOUBLE)/10000 AS avg_qty,
        | CAST((sum(CAST(round(l_extendedprice*100) AS BIGINT))*200 + count(*)) // (count(*)*2) AS DOUBLE)/10000 AS avg_price,
        | CAST((sum(CAST(round(l_discount*100) AS BIGINT))*200 + count(*)) // (count(*)*2) AS DOUBLE)/10000 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q03_join_revenue" ->
      """SELECT c_mktsegment, o_orderpriority,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(20,4))),2) AS DOUBLE) AS rev,
        | count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    "q04_dim_join" ->
      """SELECT p_brand,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(20,4))),2) AS DOUBLE) AS rev,
        | round(sum(l_quantity),2) AS sum_qty,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q05_window_topn" ->
      """SELECT n_name, rn, c_custkey, acctbal FROM (
        |  SELECT c_nationkey, c_custkey,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |    round(c_acctbal,2) AS acctbal
        |  FROM customer) t
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE rn <= 3
        |ORDER BY n_name, rn""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q07_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey AND l_shipdate >= TIMESTAMP '2000-01-01')
        |ORDER BY s_suppkey""".stripMargin,

    "q08_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier) t
        |ORDER BY nationkey""".stripMargin,

    "q09_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q10_topk" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS totalprice FROM orders
        |ORDER BY totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q11_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q12_scalar_funcs" ->
      """SELECT p_partkey,
        | upper(p_brand) AS brand_u,
        | substr(p_type, 1, 5) AS type5,
        | CAST(length(p_name) AS INT) AS name_len,
        | p_brand || '-' || p_type AS brand_type,
        | round(coalesce(p_retailprice, 0.0),2) AS price,
        | CAST(p_size AS BIGINT) AS size_l
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q13_pivot_events" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type='click') AS click,
        | count(*) FILTER (WHERE event_type='view') AS view,
        | count(*) FILTER (WHERE event_type='purchase') AS purchase,
        | count(*) FILTER (WHERE event_type='signup') AS signup,
        | count(*) FILTER (WHERE event_type='error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q14_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q15_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q16_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q17_except" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        |EXCEPT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        |ORDER BY nationkey""".stripMargin,

    "q18_having" ->
      """SELECT l_suppkey, count(*) AS n_items,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))), 2) AS DOUBLE) AS rev
        |FROM lineitem GROUP BY l_suppkey
        |HAVING count(*) > 550
        |ORDER BY l_suppkey""".stripMargin,

    "q48_asof_join" ->
      """WITH ro AS (
        |  SELECT o_custkey AS user_id, o_orderdate,
        |         max(o_orderkey) AS last_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, ro.last_orderkey
        |FROM events e ASOF LEFT JOIN ro
        |  ON e.user_id = ro.user_id AND e.ts >= ro.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "q49_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
        |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
        |         OR CAST(floor(epoch(ts)) AS BIGINT)
        |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)),
        |sess AS (
        |  SELECT user_id, sec, value,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS INT) AS session_idx
        |  FROM marked)
        |SELECT user_id, session_idx, count(*) AS n_events,
        | round(sum(value), 2) AS sum_value,
        | max(sec) - min(sec) AS duration_sec
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q50_window_funcs" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | row_number() OVER w AS rn,
        | round(l_extendedprice - coalesce(lag(l_extendedprice) OVER w, 0.0), 2) AS price_delta,
        | CAST(sum(CAST(l_quantity AS BIGINT))
        |   OVER (PARTITION BY l_suppkey
        |         ORDER BY l_shipdate, l_orderkey, l_linenumber
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_qty,
        | lead(l_quantity) OVER w AS next_qty
        |FROM lineitem WHERE l_suppkey <= 5
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin,

    "q51_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q52_quantiles" ->
      """SELECT c_mktsegment,
        | round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
        | round(quantile_cont(c_acctbal, 0.5), 6) AS p50,
        | round(quantile_cont(c_acctbal, 0.75), 6) AS p75
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q53_above_customer_avg" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM orders o
        |WHERE round(o_totalprice - 1.5 * (
        |  SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey), 4) > 0
        |ORDER BY o_orderkey""".stripMargin,

    "q55_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | count(*) AS n,
        | count(DISTINCT month(o_orderdate)) AS n_months,
        | count(DISTINCT dayofweek(o_orderdate) + 1) AS n_dows
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q56_string_funcs" ->
      """SELECT p_partkey,
        | lpad(p_brand, 12, '_') AS brand_pad,
        | translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
        | reverse(p_type) AS type_rev,
        | CAST(instr(p_name, ' ') AS BIGINT) AS space_pos,
        | split_part(p_name, ' ', 1) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q57_array_funcs" ->
      """SELECT vec_id,
        | round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
        | round(list_max(CAST(embedding AS DOUBLE[])), 6) AS max_dim,
        | round(list_min(CAST(embedding AS DOUBLE[])), 6) AS min_dim,
        | round(list_sort(CAST(embedding AS DOUBLE[]))[32], 6) AS median_low,
        | CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.0)) AS INT)
        |   AS n_positive
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q19_regexp" ->
      """SELECT p_brand, count(*) AS n FROM part
        |WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)s?$')
        |   OR p_type LIKE '%PROMO%'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q80_range_join" ->
      """WITH bands AS (
        |  SELECT CAST(range AS INT) AS band_id,
        |         range * 4000.0 AS lo,
        |         range * 4000.0 + 10000.0 AS hi
        |  FROM range(0, 140))
        |SELECT b.band_id, count(*) AS n_orders,
        |       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(20,4))),2) AS DOUBLE) AS sum_price
        |FROM bands b JOIN orders o
        |  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        |GROUP BY b.band_id ORDER BY b.band_id""".stripMargin
  )
}
