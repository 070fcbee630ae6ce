package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AsOfJoin, Skew}

class OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("asof backward join picks at-or-before, inclusive, per key") {
    val left = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L),
      (4L, "b", 100L), (5L, "c", 50L))
      .toDF("id", "k", "t")
    val right = Seq(
      ("a", 10L, "a@10"), ("a", 15L, "a@15"),
      ("b", 99L, "b@99"), ("b", 101L, "b@101"))
      .toDF("k", "t", "v")
    val got = AsOfJoin.backward(left, right, "k", "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("a@10"), "inclusive: right at exactly t matches")
    assert(got(2L).contains("a@15"), "latest at-or-before wins")
    assert(got(3L).isEmpty, "nothing before -> null")
    assert(got(4L).contains("b@99"), "future right rows ignored")
    assert(got(5L).isEmpty, "unmatched key -> null")
  }

  test("salted aggregation equals the plain aggregation") {
    val df = (0L until 10000L).map(i => (if (i < 9000) "hot" else s"k${i % 50}", i))
      .toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAgg(df, Seq("k"), salt = 8,
      partialAggs = Seq(sum("v").as("_s"), count(lit(1)).as("_n")),
      finalAggs = Seq(sum("_s").as("s"), sum("_n").cast("long").as("n")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("salted join equals the plain join") {
    val left = (0L until 5000L).map(i => (if (i % 10 < 9) 1L else i % 100, i))
      .toDF("key", "v")
    val right = (0L until 100L).map(i => (i, s"dim$i")).toDF("key", "name")
    val plain = left.join(right, "key").agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(left, right, "key", salt = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain.getLong(0) == salted.getLong(0))
    assert(plain.getLong(1) == salted.getLong(1))
  }
}
