package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.Voting

class VotingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def votesOf(rows: Seq[Seq[Int]]): Seq[Int] = {
    import spark.implicits._
    rows.toDF("preds")
      .select(Voting.hardVote(col("preds")).as("v"))
      .collect().map(_.getInt(0)).toSeq
  }

  test("hardVote picks the mode, ties broken by smallest value") {
    assert(votesOf(Seq(
      Seq(1, 1, 2),      // clear mode
      Seq(2, 1, 2, 1),   // tie -> smallest (bincount argmax semantics)
      Seq(3, 3, 3),
      Seq(5, 4, 4, 5, 5))) == Seq(1, 1, 3, 5))
  }

  test("weighted hardVote uses weight sums") {
    import spark.implicits._
    val got = Seq((Seq(0, 1, 1), Seq(5.0, 1.0, 1.0)))
      .toDF("preds", "w")
      .select(Voting.hardVoteWeighted(col("preds"), col("w")).as("v"))
      .head().getInt(0)
    assert(got == 0, "weight 5 on a single 0-vote beats two 1-votes")
  }

  test("softVoteScores is the weighted element-wise mean; argmax first-max") {
    import spark.implicits._
    val df = Seq((Seq(Seq(0.8, 0.2), Seq(0.4, 0.6)), Seq(1.0, 3.0)))
      .toDF("probs", "w")
      .select(Voting.softVoteScores(col("probs"), col("w")).as("s"))
      .select(col("s"), Voting.argmax(col("s")).as("am"))
    val row = df.head()
    val s = row.getSeq[Double](0)
    assert(math.abs(s(0) - 0.5) < 1e-12 && math.abs(s(1) - 0.5) < 1e-12)
    assert(row.getInt(1) == 0, "ties go to the first index, numpy argmax")
  }

  test("softVoteScores with zero total weight yields zeros, not NaNs") {
    import spark.implicits._
    val s = Seq((Seq(Seq(0.8, 0.2), Seq(0.4, 0.6)), Seq(0.0, 0.0)))
      .toDF("probs", "w")
      .select(Voting.softVoteScores(col("probs"), col("w")).as("s"))
      .head().getSeq[Double](0)
    assert(s.forall(x => !x.isNaN), s"NaN scores would argmax to garbage: $s")
  }

  test("normalize l1/l2/max") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(3.0, -1.0))).toDF("s")
    def norm(kind: String): Seq[Double] =
      df.select(Voting.normalize(col("s"), kind)).head().getSeq[Double](0)
    assert(norm("l1").zip(Seq(0.75, -0.25)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    val l2 = norm("l2")
    assert(math.abs(l2(0) - 3.0 / math.sqrt(10)) < 1e-12)
    assert(norm("max") == Seq(1.0, -1.0 / 3.0))
    intercept[IllegalArgumentException](Voting.normalize(col("s"), "bogus"))
  }
}
