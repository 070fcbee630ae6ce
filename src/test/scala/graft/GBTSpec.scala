package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.exec.{FitSideData, GBT, Metrics, ModelParallel}
import graft.exec.ModelParallel.TrainMatrix
import graft.search.DistGridSearchCV

/** Gradient-boosted trees: the learner family the reference's fit_params
  * channel actually early-stops (xgboost eval-set test,
  * `tests/test_spark.py:165-187`). Kernel math (prior, Newton leaf
  * values), staged improvement, per-stage early stopping with
  * best-iteration truncation, and the search-stack integration.
  */
class GBTSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def blobs(k: Int, n: Int, seed: Int = 7,
                    sep: Double = 4.0): (Array[Array[Double]], Array[Double]) = {
    val rng = new Random(seed)
    val x = Array.tabulate(n) { i =>
      val c = i % k
      Array(c * sep + rng.nextGaussian() * 0.4, rng.nextGaussian())
    }
    (x, Array.tabulate(n)(i => (i % k).toDouble))
  }

  test("binary Newton leaf values are exact on a known stump") {
    // v in {-2,-1,1,2}, y = v > 0: p0 = 0.5, F0 = log-odds = 0, residuals
    // +-0.5. The best regression split on residuals is the 0.0 midpoint
    // (both sides constant -> zero variance). Newton leaf value =
    // sum(r) / sum(p(1-p)) = (+-0.5 n)/(0.25 n) = +-2.0, so one stage at
    // lr 0.1 scores F = +-0.2 exactly.
    val x = Array(-2.0, -1.0, 1.0, 2.0, -2.0, -1.0, 1.0, 2.0).map(Array(_))
    val y = Array(0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0)
    val m = GBT.Classifier.fit(x, y,
      Map("n_estimators" -> 1.0, "max_depth" -> 1.0, "learning_rate" -> 0.1),
      seed = 1).asInstanceOf[GBT.GBTModel]
    assert(m.nStages == 1 && m.nClasses == 2)
    val pPos = 1.0 / (1.0 + math.exp(-0.2))
    assert(math.abs(m.predictProba(Array(1.5))(1) - pPos) < 1e-12)
    assert(math.abs(m.predictProba(Array(-1.5))(1) - (1 - pPos)) < 1e-12)
    assert(m.predict(Array(1.5)) == 1.0 && m.predict(Array(-1.5)) == 0.0)
  }

  test("regression: staged fits reduce training MSE monotonically-ish") {
    val rng = new Random(5)
    val x = Array.tabulate(300)(_ => Array(rng.nextDouble() * 4 - 2,
      rng.nextDouble() * 4 - 2))
    val y = x.map(v => 3.0 * v(0) + math.sin(3 * v(1)) + rng.nextGaussian() * 0.1)
    def mse(stages: Int): Double = {
      val m = GBT.Regressor.fit(x, y,
        Map("n_estimators" -> stages.toDouble, "max_depth" -> 3.0,
          "learning_rate" -> 0.2), seed = 3)
      x.zip(y).map { case (v, t) => val e = m.predict(v) - t; e * e }.sum / x.length
    }
    val m1 = mse(1); val m10 = mse(10); val m50 = mse(50)
    assert(m10 < m1 * 0.5, s"10 stages $m10 vs 1 stage $m1")
    assert(m50 < m10, s"50 stages $m50 vs 10 stages $m10")
    assert(m50 < 0.1, s"converged MSE $m50")
  }

  test("binary + multiclass accuracy on separable blobs; deterministic") {
    val (bx, by) = blobs(2, 200)
    val params = Map("n_estimators" -> 30.0, "learning_rate" -> 0.2)
    val bm = GBT.Classifier.fit(bx, by, params, seed = 11)
    assert(Metrics.accuracy(bm, bx, by) > 0.97, "binary")
    val (mx, my) = blobs(3, 240)
    val mm = GBT.Classifier.fit(mx, my, params, seed = 11)
    assert(Metrics.accuracy(mm, mx, my) > 0.95, "multiclass")
    // proba sums to 1, seeded refit is bit-identical
    val p = mm.predictProba(mx(0))
    assert(p.length == 3 && math.abs(p.sum - 1.0) < 1e-9)
    val mm2 = GBT.Classifier.fit(mx, my, params, seed = 11)
    assert(mx.take(20).forall(v =>
      mm.predictProba(v).sameElements(mm2.predictProba(v))))
    // subsample: still learns, still deterministic per seed
    val sm = GBT.Classifier.fit(bx, by, params + ("subsample" -> 0.7), seed = 2)
    val sm2 = GBT.Classifier.fit(bx, by, params + ("subsample" -> 0.7), seed = 2)
    assert(Metrics.accuracy(sm, bx, by) > 0.95, "subsampled")
    assert(bx.take(20).forall(v =>
      sm.predictProba(v).sameElements(sm2.predictProba(v))))
  }

  test("per-stage early stopping truncates at the best iteration") {
    import scala.collection.mutable.ArrayBuffer
    // Overfit-prone: few rows, noise dims, deep trees — held-out NLL
    // turns while train keeps improving, so patience fires early.
    val rng = new Random(3)
    val d = 10
    def mk(n: Int) = {
      val x = Array.tabulate(n) { i =>
        val c = i % 2
        Array.tabulate(d)(j =>
          if (j == 0) c * 1.0 + rng.nextGaussian() * 0.9 else rng.nextGaussian())
      }
      (x, Array.tabulate(n)(i => (i % 2).toDouble))
    }
    val (tx, ty) = mk(60)
    val (ex, ey) = mk(300)
    val params = Map("n_estimators" -> 200.0, "max_depth" -> 4.0,
      "learning_rate" -> 0.3)
    val fullHist = ArrayBuffer.empty[Double]
    GBT.Classifier.fit(tx, ty, params, 1,
      FitSideData(ex, ey, Int.MaxValue, history = fullHist))
    val earlyHist = ArrayBuffer.empty[Double]
    val early = GBT.Classifier.fit(tx, ty, params, 1,
      FitSideData(ex, ey, earlyStoppingRounds = 5, history = earlyHist))
      .asInstanceOf[GBT.GBTModel]
    assert(fullHist.length == 200, "patience=MaxValue runs every stage")
    assert(earlyHist.nonEmpty && earlyHist.length < 200,
      s"stopped at ${earlyHist.length}")
    // truncation rewind: returned stage count is the argmin of the
    // observed history (prior counts as stage 0), and its eval NLL is
    // the minimum observed
    val best = early.nStages
    assert(best <= earlyHist.length - 5 || best == earlyHist.length,
      s"best $best vs history ${earlyHist.length}")
    val evalNll = FitSideData.evalNll(early, ex, ey)
    assert(math.abs(evalNll - earlyHist.take(best).min) < 1e-12
      || best == 0, s"rewound NLL $evalNll vs ${earlyHist.take(best).minOption}")
    // early-stopped can't be worse on eval than the full run's final model
    val full = GBT.Classifier.fit(tx, ty, params, 1)
    assert(evalNll <= FitSideData.evalNll(full, ex, ey) + 1e-9)
  }

  test("search-stack integration: grid search + fit_params, both regimes") {
    val (x, y) = blobs(2, 120)
    val matrix = TrainMatrix(x, y, ModelParallel.stratifiedFolds(y, 3, 7))
    val (ex, ey) = blobs(2, 80, seed = 9)
    val r = new DistGridSearchCV(GBT.Classifier,
      Map("n_estimators" -> Seq(40.0), "learning_rate" -> Seq(0.1, 0.3),
        "max_depth" -> Seq(2.0)), cv = 3)
      .withFitSideData(FitSideData(ex, ey, earlyStoppingRounds = 3))
      .fitMatrix(spark, matrix)
    assert(r.bestScore > 0.95, s"GBT grid search, got ${r.bestScore}")
    assert(Metrics.accuracy(r.bestModel, ex, ey) > 0.95)
    // broadcast-overflow: boosted trees route through DataParallelGBT
    // (stage trees via histogram CART) — same search surface, same
    // fit_params early stopping, a usable model out
    import spark.implicits._
    val df = x.zip(y).toSeq.map { case (v, l) => (v.toSeq, l) }
      .toDF("features", "label")
    val dp = new DistGridSearchCV(GBT.Classifier,
      Map("n_estimators" -> Seq(40.0), "learning_rate" -> Seq(0.3)), cv = 3)
      .withBroadcastBudget(1L)
      .withFitSideData(FitSideData(ex, ey, earlyStoppingRounds = 3))
      .fit(spark, df, "features", "label")
    assert(dp.bestScore > 0.95, s"DP GBT grid search, got ${dp.bestScore}")
    assert(Metrics.accuracy(dp.bestModel, ex, ey) > 0.95)
  }
}
