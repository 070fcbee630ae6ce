package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Restores parquet filter pushdown through the nanos→timestamp rebuild.
  *
  * The testdata stores TIMESTAMP(NANOS), which Spark reads only as a raw
  * long (`Tables.load` rebuilds `timestamp_micros(c DIV 1000)`). A filter
  * on the rebuilt column — `timestamp_micros(c DIV 1000) >= TS` — cannot
  * reach the parquet scan: the scan column is the long, and Catalyst has
  * no algebra for inverting the rebuild. At 100 TB this forfeits row-group
  * and page pruning on every time predicate, the single biggest win on a
  * time-partitioned fact table.
  *
  * This rule supplies the missing algebra. With t = floor(c / 1000) µs and
  * a literal T µs:
  *   t >= T  ⟺  c >= T*1000          t > T  ⟺  c >= (T+1)*1000
  *   t <  T  ⟺  c <  T*1000          t <= T ⟺  c <  (T+1)*1000
  *   t == T  ⟺  T*1000 <= c < (T+1)*1000
  * The rewritten predicate references the raw long column, so the ordinary
  * FileSourceStrategy pushes it into the scan (visible as PushedFilters).
  */
object PushTimestampNanosFilters extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(c DIV 1000) and returns c. */
  private object NanosRebuild {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(c, Literal(1000L, LongType), _))
        if c.dataType == LongType => Some(c)
      case _ => None
    }
  }

  /** Only positive-micros literals (after 1970-01-01T00:00:00.000001):
    * SQL DIV truncates toward zero, not floor, so the t↔c equivalences
    * below hold for ALL c (including negative nanos) only when T > 0.
    * Pre-epoch literals simply don't rewrite — correct, just unpruned.
    */
  private object TsLit {
    // Upper bound: (t+1)*1000 must not overflow long nanos — a literal
    // past 2262-04-11 (the nanos horizon) can't be rewritten; skip it
    // (correct, just unpruned) instead of throwing from multiplyExact at
    // plan time and crashing a query that compares against e.g. 9999-12-31.
    private val MaxSafeMicros = Long.MaxValue / 1000 - 1
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType)
        if v > 0 && v <= MaxSafeMicros => Some(v)
      case Cast(Literal(v: Long, TimestampType), TimestampType, _, _)
        if v > 0 && v <= MaxSafeMicros => Some(v)
      case _ => None
    }
  }

  private def nanos(micros: Long): Long = Math.multiplyExact(micros, 1000L)

  /** Matches the micros-layout normalization `cast(c as timestamp)` over a
    * timestamp_ntz scan column (Tables.ntzToTimestamp), when the cast's
    * effective zone is UTC — there the cast re-tags the same micros value,
    * so `cast(c) cmp TS ⟺ c cmp TS_ntz` exactly, and the rewritten
    * predicate references the raw ntz column the parquet scan can prune on.
    */
  private object NtzRetag {
    def unapply(e: Expression): Option[Expression] = e match {
      case c @ Cast(child, TimestampType, _, _)
        if child.dataType == TimestampNTZType && c.timeZoneId.exists(z =>
          z == "UTC" || z == "Etc/UTC" || z == "GMT" || z == "Z" || z == "+00:00") =>
        Some(child)
      case _ => None
    }
  }

  private def ntzLit(micros: Long): Literal = Literal(micros, TimestampNTZType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // micros-layout retag unwrap: exact re-tag, so the comparison carries
    // over literally (both orientations, all five comparators)
    case GreaterThanOrEqual(NtzRetag(c), TsLit(t)) => GreaterThanOrEqual(c, ntzLit(t))
    case GreaterThan(NtzRetag(c), TsLit(t))        => GreaterThan(c, ntzLit(t))
    case LessThan(NtzRetag(c), TsLit(t))           => LessThan(c, ntzLit(t))
    case LessThanOrEqual(NtzRetag(c), TsLit(t))    => LessThanOrEqual(c, ntzLit(t))
    case EqualTo(NtzRetag(c), TsLit(t))            => EqualTo(c, ntzLit(t))
    case GreaterThanOrEqual(TsLit(t), NtzRetag(c)) => LessThanOrEqual(c, ntzLit(t))
    case GreaterThan(TsLit(t), NtzRetag(c))        => LessThan(c, ntzLit(t))
    case LessThan(TsLit(t), NtzRetag(c))           => GreaterThan(c, ntzLit(t))
    case LessThanOrEqual(TsLit(t), NtzRetag(c))    => GreaterThanOrEqual(c, ntzLit(t))
    case EqualTo(TsLit(t), NtzRetag(c))            => EqualTo(c, ntzLit(t))
    case GreaterThanOrEqual(NanosRebuild(c), TsLit(t)) =>
      GreaterThanOrEqual(c, Literal(nanos(t)))
    case GreaterThan(NanosRebuild(c), TsLit(t)) =>
      GreaterThanOrEqual(c, Literal(nanos(t + 1)))
    case LessThan(NanosRebuild(c), TsLit(t)) =>
      LessThan(c, Literal(nanos(t)))
    case LessThanOrEqual(NanosRebuild(c), TsLit(t)) =>
      LessThan(c, Literal(nanos(t + 1)))
    case EqualTo(NanosRebuild(c), TsLit(t)) =>
      And(GreaterThanOrEqual(c, Literal(nanos(t))),
        LessThan(c, Literal(nanos(t + 1))))
    // literal-on-the-left variants
    case GreaterThanOrEqual(TsLit(t), NanosRebuild(c)) =>
      LessThan(c, Literal(nanos(t + 1)))
    case GreaterThan(TsLit(t), NanosRebuild(c)) =>
      LessThan(c, Literal(nanos(t)))
    case LessThan(TsLit(t), NanosRebuild(c)) =>
      GreaterThanOrEqual(c, Literal(nanos(t + 1)))
    case LessThanOrEqual(TsLit(t), NanosRebuild(c)) =>
      GreaterThanOrEqual(c, Literal(nanos(t)))
    case EqualTo(TsLit(t), NanosRebuild(c)) =>
      And(GreaterThanOrEqual(c, Literal(nanos(t))),
        LessThan(c, Literal(nanos(t + 1))))
  }
}

/** SparkSessionExtensions entry point: register with
  * `.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions=graft.plans.GraftExtensions` conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PushTimestampNanosFilters)
    GraftFunctions.registerAll(e)
  }
}

/** SQL registration for the engine's codegen'd Catalyst expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) …")` works exactly like the
  * Column API — the same Expression node, the same generated code.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  def registerAll(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes (array, array)")
        graft.functions.CosineSim(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "l2_normalize(a) - unit-norm an array<double>; zero vectors pass through"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "l2_normalize takes (array)")
        graft.functions.L2Normalize(args(0))
      }))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit simhash fold of an array<bigint> of token hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64 takes (array<bigint>)")
        graft.functions.Simhash64(args(0))
      }))
    e.injectFunction((FunctionIdentifier("intersect_count"),
      info("intersect_count", "intersect_count(a, b) - distinct-overlap count of two arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "intersect_count takes (array, array)")
        graft.functions.IntersectCount(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("winnow_anchors"),
      info("winnow_anchors",
        "winnow_anchors(text, k, w) - MOSS winnowing fingerprints: " +
          "array<struct<pos:int, hash:bigint>> of rightmost-min k-gram " +
          "hashes per window of w (code-point positions)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "winnow_anchors takes (text, k, w)")
        def lit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"winnow_anchors $name must be an integer literal, got $other")
        }
        graft.functions.WinnowAnchors(args(0),
          lit(args(1), "k"), lit(args(2), "w"))
      }))
  }
}
