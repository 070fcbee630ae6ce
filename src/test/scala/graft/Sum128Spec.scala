package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sum128 (exact 128-bit long sum → DECIMAL(38,0)): BigInt ground truth
  * under forced codegen, carry/sign edges, null/empty semantics, and
  * multi-partition merges — the update AND merge paths both cross limb
  * boundaries in these fixtures.
  */
class Sum128Spec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def check(vals: Seq[Option[Long]], parts: Int): Unit = {
    import spark.implicits._
    val df = vals.toDF("x").repartition(parts)
    val got = df.agg(graft.functions.Sum128(col("x")).as("s"))
      .collect()(0).getDecimal(0)
    val want = vals.flatten.map(BigInt(_)).sum
    if (vals.flatten.isEmpty) assert(got == null, s"empty → null, got $got")
    else assert(BigInt(got.toBigInteger) == want,
      s"got $got want $want (parts=$parts, n=${vals.size})")
  }

  test("BigInt ground truth: random longs at full magnitude, 1..8 partitions") {
    val rng = new scala.util.Random(7)
    // full-magnitude longs force lo-limb wraparound on nearly every add;
    // mixing signs exercises the sign-extension path
    val vals = Seq.fill(500)(Some(rng.nextLong()))
    check(vals, 1); check(vals, 3); check(vals, 8)
  }

  test("carry edges: Long.MaxValue/MinValue runs, alternating signs") {
    check(Seq.fill(40)(Some(Long.MaxValue)), 4)
    check(Seq.fill(40)(Some(Long.MinValue)), 4)
    check(Seq.tabulate(41)(i => Some(if (i % 2 == 0) Long.MaxValue else Long.MinValue)), 3)
    check(Seq(Some(Long.MaxValue), Some(1L), Some(Long.MinValue), Some(-1L)), 2)
  }

  test("null and empty semantics match sum()") {
    check(Seq(Some(5L), None, Some(-7L), None), 2)
    check(Seq(None, None, None), 2) // all-null → null
    check(Seq.empty[Option[Long]], 1) // no rows → null (global agg)
  }

  test("grouped: per-group sums exact, null groups isolated") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(300)(i => (i % 7, rng.nextLong()))
    val got = rows.toDF("g", "x").repartition(5)
      .groupBy("g").agg(graft.functions.Sum128(col("x")).as("s"))
      .collect().map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger))
      .toMap
    val want = rows.groupBy(_._1).view
      .mapValues(_.map(t => BigInt(t._2)).sum).toMap
    assert(got == want)
  }

  test("DECIMAL(38,0) overflow → NULL (legacy decimal-sum contract), " +
       "both eval and codegen; 1e38-1 still materializes") {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    def limbs(v: BigInt): (Long, Long) =
      ((v >> 64).toLong, v.toLong) // low 64 bits, two's complement
    def viaExpr(v: BigInt): java.math.BigDecimal = {
      val (hi, lo) = limbs(v)
      val c = GraftSqlBridge.column(
        graft.functions.Long128ToDecimal(Literal(hi), Literal(lo)))
      spark.range(1).select(c.as("d")).collect()(0).getDecimal(0)
    }
    val ten38 = BigInt(10).pow(38)
    // direct kernel: null at +/-1e38 and beyond, exact just below
    assert(graft.functions.Long128ToDecimal.toDecimal(
      limbs(ten38)._1, limbs(ten38)._2) == null)
    assert(graft.functions.Long128ToDecimal.toDecimal(
      limbs(-ten38)._1, limbs(-ten38)._2) == null)
    // through the expression (CODEGEN_ONLY session → generated path)
    assert(viaExpr(ten38) == null)
    assert(viaExpr(ten38 + 12345) == null)
    assert(viaExpr(-ten38 - 1) == null)
    assert(BigInt(viaExpr(ten38 - 1).toBigInteger) == ten38 - 1)
    assert(BigInt(viaExpr(-(ten38 - 1)).toBigInteger) == -(ten38 - 1))
  }

  test("agrees with decimal(38,0) sum on the q01 cents shape") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val df = Seq.fill(2000)(math.round(rng.nextDouble() * 1e7) / 100.0)
      .toDF("price").repartition(6)
    val a = df.agg(graft.functions.Sum128(
        round(col("price") * 100).cast("long")).as("s"))
      .collect()(0).getDecimal(0)
    val b = df.agg(sum(round(col("price") * 100).cast("decimal(38,0)")).as("s"))
      .collect()(0).getDecimal(0)
    assert(a.compareTo(b) == 0, s"$a vs $b")
  }
}
