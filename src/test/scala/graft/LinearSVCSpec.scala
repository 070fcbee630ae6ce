package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.exec.{LinearSVC, LinearSVCModel, LogisticRegressionLBFGS, Metrics}
import graft.exec.ModelParallel.TrainMatrix
import graft.search.DistGridSearchCV

/** LinearSVC (squared hinge, OvR) and the shared LBFGS solver core. */
class LinearSVCSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def blobs(k: Int, n: Int, sep: Double = 4.0,
                    seed: Int = 3): (Array[Array[Double]], Array[Double]) = {
    val rng = new Random(seed)
    val x = Array.tabulate(n) { i =>
      val c = i % k
      Array(
        (c % 3) * sep + rng.nextGaussian() * 0.3,
        (c / 3) * sep + rng.nextGaussian() * 0.3)
    }
    (x, Array.tabulate(n)(i => (i % k).toDouble))
  }

  test("binary separable data: perfect accuracy, decision signs correct") {
    val (x, y) = blobs(2, 120)
    val m = LinearSVC.fit(x, y, Map("c" -> 1.0), 42)
    assert(Metrics.accuracy(m, x, y) == 1.0)
    // decision values: class-1 rows score higher on head 1 than head 0
    x.indices.foreach { i =>
      val dec = m.predictProba(x(i))
      assert(dec.length == 2)
      if (y(i) == 1.0) assert(dec(1) > dec(0)) else assert(dec(0) > dec(1))
    }
  }

  test("multiclass OvR: recovers 4 planted blobs") {
    val (x, y) = blobs(4, 240)
    val m = LinearSVC.fit(x, y, Map("c" -> 1.0), 42)
    assert(Metrics.accuracy(m, x, y) >= 0.97)
  }

  test("deterministic: identical weights across fits") {
    val (x, y) = blobs(3, 90)
    val a = LinearSVC.fit(x, y, Map("c" -> 0.5), 1).asInstanceOf[LinearSVCModel]
    val b = LinearSVC.fit(x, y, Map("c" -> 0.5), 99).asInstanceOf[LinearSVCModel]
    a.weights.zip(b.weights).foreach { case (wa, wb) =>
      assert(wa.toSeq == wb.toSeq) // seed-independent: no randomness in solver
    }
  }

  test("c controls regularization: smaller c shrinks the weights") {
    val (x, y) = blobs(2, 120)
    def norm(c: Double): Double = {
      val m = LinearSVC.fit(x, y, Map("c" -> c), 42).asInstanceOf[LinearSVCModel]
      math.sqrt(m.weights.map(_.dropRight(1).map(v => v * v).sum).sum)
    }
    assert(norm(0.001) < norm(10.0))
  }

  test("squared hinge is zero beyond the margin") {
    // A fit on wide-margin data should drive training hinge loss ~ 0.
    val (x, y) = blobs(2, 120, sep = 8.0)
    val m = LinearSVC.fit(x, y, Map("c" -> 100.0), 42).asInstanceOf[LinearSVCModel]
    val hinge = x.indices.map { i =>
      val dec = m.predictProba(x(i))
      val t = if (y(i) == 1.0) 1.0 else -1.0
      val v = 1.0 - t * dec(1)
      if (v > 0) v * v else 0.0
    }.sum / x.length
    assert(hinge < 0.05, s"mean squared hinge $hinge")
  }

  test("LinearSVC works as a search estimator (reference flagship shape)") {
    val (x, y) = blobs(3, 180)
    val folds = graft.exec.ModelParallel.stratifiedFolds(y, 3, 7)
    val r = new DistGridSearchCV(LinearSVC,
      Map("c" -> Seq(0.01, 1.0), "max_iter" -> Seq(100.0)), cv = 3)
      .fitMatrix(spark, TrainMatrix(x, y, folds))
    assert(r.cvResults.count() == 2)
    assert(r.bestScore >= 0.95, s"best ${r.bestScore}")
    assert(r.bestModel.isInstanceOf[LinearSVCModel])
  }

  test("refactored LBFGS core: logistic solver still converges to the optimum") {
    val (x, y) = blobs(2, 120)
    val m = LogisticRegressionLBFGS.fit(x, y, Map("c" -> 1.0, "max_iter" -> 100.0), 42)
    assert(Metrics.accuracy(m, x, y) == 1.0)
    val ll = Metrics.negLogLoss(m, x, y)
    assert(ll > -0.1, s"neg log loss $ll") // near-separable: tiny loss
  }
}
