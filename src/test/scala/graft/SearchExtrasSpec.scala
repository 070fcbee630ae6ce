package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.exec.{Learner, LogisticRegressionGD, Metrics, Model, ModelParallel}
import graft.exec.ModelParallel.TrainMatrix
import graft.plan.{Expansions, Folds}
import graft.search._

class SearchExtrasSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def blobs(n: Int = 60, seed: Int = 7): TrainMatrix = {
    val rng = new Random(seed)
    val x = Array.tabulate(n) { i =>
      val c = i % 2
      Array(c * 4.0 + rng.nextGaussian() * 0.3, rng.nextGaussian())
    }
    val y = Array.tabulate(n)(i => (i % 2).toDouble)
    TrainMatrix(x, y, ModelParallel.stratifiedFolds(y, 3, seed))
  }

  test("multimetric search: one fit, several metrics, rank on primary") {
    val r = new DistGridSearchCV(LogisticRegressionGD,
      Map("c" -> Seq(0.1, 1.0), "max_iter" -> Seq(40.0)), cv = 3)
      .withExtraScorings(Seq("f1_weighted", "neg_log_loss"))
      .fitMatrix(spark, blobs())
    val cols = r.cvResults.columns.toSet
    assert(Set("mean_test_accuracy", "std_test_accuracy",
      "mean_test_f1_weighted", "mean_test_neg_log_loss",
      "mean_test_score", "rank_test_score").subsetOf(cols), cols.toSeq.sorted)
    val row = r.cvResults.orderBy("candidate_id").head()
    assert(row.getAs[Double]("mean_test_score")
      == row.getAs[Double]("mean_test_accuracy"), "primary = refit metric")
    assert(row.getAs[Double]("mean_test_neg_log_loss") <= 0.0)
  }

  test("error_score contains learner failures instead of aborting the search") {
    object ExplodingLearner extends Learner {
      def fit(x: Array[Array[Double]], y: Array[Double],
              params: Map[String, Double], seed: Long): Model = {
        if (params.getOrElse("c", 1.0) < 0.5) throw new RuntimeException("boom")
        LogisticRegressionGD.fit(x, y, params, seed)
      }
    }
    val r = new DistGridSearchCV(ExplodingLearner,
      Map("c" -> Seq(0.1, 1.0), "max_iter" -> Seq(30.0)), cv = 3,
      errorScore = Some(-1.0)).fitMatrix(spark, blobs())
    val byId = r.cvResults.collect()
      .map(row => row.getAs[Int]("candidate_id") -> row.getAs[Double]("mean_test_score"))
      .toMap
    assert(byId(0) == -1.0, "failed candidate filled with error_score")
    assert(byId(1) > 0.9 && r.bestCandidateId == 1)
    // without errorScore the failure propagates
    intercept[Exception] {
      new DistGridSearchCV(ExplodingLearner,
        Map("c" -> Seq(0.1), "max_iter" -> Seq(30.0)), cv = 3)
        .fitMatrix(spark, blobs())
    }
  }

  test("negative downsampling caps the binary problem (ratio and multiplier)") {
    import spark.implicits._
    val df = ((0 until 10).map(i => (i.toLong, 1)) ++
      (10 until 110).map(i => (i.toLong, 0)))
      .toDF("id", "label")
    val ratio = Expansions.negativesMask(df, "label", 1, 0.2, "ratio", seed = 5)
    val nNegRatio = ratio.filter(col("label") === 0).count()
    assert(ratio.filter(col("label") === 1).count() == 10, "positives all kept")
    assert(nNegRatio < 40, s"~20% of 100 negatives expected, got $nNegRatio")
    val mult = Expansions.negativesMask(df, "label", 1, 2.0, "multiplier", seed = 5)
    val nNegMult = mult.filter(col("label") === 0).count()
    assert(nNegMult < 45, s"~2x positives expected, got $nNegMult")
    intercept[IllegalArgumentException](
      Expansions.negativesMask(df, "label", 1, 1.0, "bogus", seed = 5))
  }

  test("hash folds are deterministic, seed-sensitive, and balanced") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val f1 = df.select(Folds.byHash(col("id"), 5, seed = 1).as("f"))
    val f2 = df.select(Folds.byHash(col("id"), 5, seed = 1).as("f"))
    val f3 = df.select(Folds.byHash(col("id"), 5, seed = 2).as("f"))
    assert(f1.collect().map(_.getInt(0)).toSeq == f2.collect().map(_.getInt(0)).toSeq)
    assert(f1.collect().map(_.getInt(0)).toSeq != f3.collect().map(_.getInt(0)).toSeq)
    val counts = f1.groupBy("f").count().collect().map(_.getLong(1))
    assert(counts.length == 5 && counts.forall(c => c > 130 && c < 270))
  }

  test("data-parallel search shares the relational skeleton and recovers blobs") {
    import spark.implicits._
    val m = blobs(n = 120)
    val df = m.x.zip(m.y).toSeq.map { case (x, y) => (x.toSeq, y) }
      .toDF("features", "label")
    val r = new DataParallelGridSearch(
      Map("reg_param" -> Seq(0.0, 0.1), "max_iter" -> Seq(30.0)), cv = 3)
      .fit(spark, df, "features", "label")
    assert(r.cvResults.columns.toSet.contains("rank_test_score"))
    assert(r.cvResults.count() == 2)
    assert(r.bestScore > 0.9, s"separable blobs, got ${r.bestScore}")
  }

  test("data-parallel forest fallback recovers blobs with proba columns") {
    import spark.implicits._
    val m = blobs(n = 120)
    val df = m.x.zip(m.y).toSeq.map { case (x, y) => (x.toSeq, y) }
      .toDF("features", "label")
    val fr = new DataParallelForest(nEstimators = 10, maxDepth = 4)
    val model = fr.fit(spark, df, "features", "label")
    val out = fr.transform(model, df, "features")
    assert(out.columns.contains("preds") && out.columns.contains("probs"))
    val acc = out.filter(col("preds") === col("label").cast("int")).count()
      .toDouble / 120
    assert(acc > 0.9, s"separable blobs, got $acc")
    assert(out.select("probs").head().getSeq[Double](0).size == 2,
      "binary blobs -> 2-class probability vector")
  }

  test("named forest factories mirror the reference variants") {
    val m = blobs()
    val rf = DistRandomForestClassifier(nEstimators = 8, maxDepth = 4)
      .fitMatrix(spark, m)
    val et = DistExtraTreesClassifier(nEstimators = 8, maxDepth = 4)
      .fitMatrix(spark, m)
    assert(Metrics.accuracy(rf, m.x, m.y) > 0.9)
    assert(Metrics.accuracy(et, m.x, m.y) > 0.9)
    val yReg = m.x.map(_(0))
    val mr = TrainMatrix(m.x, yReg, m.folds)
    val rfr = DistRandomForestRegressor(nEstimators = 10, maxDepth = 5)
      .fitMatrix(spark, mr)
    val etr = DistExtraTreesRegressor(nEstimators = 10, maxDepth = 5)
      .fitMatrix(spark, mr)
    assert(Metrics.r2(rfr, mr.x, mr.y) > 0.8)
    assert(Metrics.r2(etr, mr.x, mr.y) > 0.8)
  }
}
