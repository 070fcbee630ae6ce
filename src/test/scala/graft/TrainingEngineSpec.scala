package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.exec.{CART, ConstantLearner, LogisticRegressionGD, Metrics, ModelParallel}
import graft.exec.ModelParallel.TrainMatrix
import graft.search._

class TrainingEngineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Tiny separable 3-class blob dataset (the reference's test style:
    * exact recovery on trivially separable data, fixed seed).
    */
  def blobs(n: Int = 90, seed: Int = 7): TrainMatrix = {
    val rng = new Random(seed)
    val centers = Array(Array(0.0, 0.0), Array(5.0, 5.0), Array(-5.0, 5.0))
    val x = Array.tabulate(n) { i =>
      val c = i % 3
      Array(centers(c)(0) + rng.nextGaussian() * 0.3,
        centers(c)(1) + rng.nextGaussian() * 0.3)
    }
    val y = Array.tabulate(n)(i => (i % 3).toDouble)
    TrainMatrix(x, y, ModelParallel.stratifiedFolds(y, 3, seed))
  }

  test("grid search recovers separable labels and ranks candidates") {
    val m = blobs()
    val gs = new DistGridSearchCV(LogisticRegressionGD,
      Map("c" -> Seq(0.1, 1.0), "max_iter" -> Seq(50.0)), cv = 3)
    val r = gs.fitMatrix(spark, m)
    val cv = r.cvResults.collect()
    assert(cv.length == 2)
    assert(cv.map(_.getAs[Int]("rank_test_score")).min == 1)
    assert(r.bestScore > 0.95, s"separable blobs should score ~1.0, got ${r.bestScore}")
    assert(Metrics.accuracy(r.bestModel, m.x, m.y) > 0.95)
    assert(r.cvResults.columns.toSet
      .intersect(Set("param_c", "param_max_iter", "mean_test_score",
        "std_test_score", "rank_test_score")).size == 5)
  }

  test("L-BFGS solver: faster convergence than GD, plugs into grid search") {
    import graft.exec.LogisticRegressionLBFGS
    val m = blobs()
    // At a tight iteration budget, L-BFGS already separates the blobs
    // while fixed-step GD has barely moved.
    val budget = Map("c" -> 1.0, "max_iter" -> 15.0)
    val lb = LogisticRegressionLBFGS.fit(m.x, m.y, budget, 0L)
    assert(Metrics.accuracy(lb, m.x, m.y) > 0.99,
      "L-BFGS should recover separable blobs in 15 iters")
    def meanNll(model: graft.exec.Model): Double = {
      val ps = m.x.zip(m.y).map { case (x, yi) =>
        -math.log(math.max(model.predictProba(x)(yi.toInt), 1e-15)) }
      ps.sum / ps.length
    }
    val gd = LogisticRegressionGD.fit(m.x, m.y, budget ++ Map("lr" -> 0.5), 0L)
    assert(meanNll(lb) < meanNll(gd),
      s"L-BFGS loss ${meanNll(lb)} should beat GD ${meanNll(gd)} at equal budget")
    // Deterministic: same inputs, same weights.
    val lb2 = LogisticRegressionLBFGS.fit(m.x, m.y, budget, 99L)
    assert(lb.asInstanceOf[graft.exec.LogRegModel].weights.flatten.toSeq ==
      lb2.asInstanceOf[graft.exec.LogRegModel].weights.flatten.toSeq)
    // Drop-in Learner for the search meta-estimators.
    val gs = new DistGridSearchCV(LogisticRegressionLBFGS,
      Map("c" -> Seq(0.1, 1.0), "max_iter" -> Seq(30.0)), cv = 3)
    val r = gs.fitMatrix(spark, m)
    assert(r.bestScore > 0.95, s"got ${r.bestScore}")
  }

  test("randomized search clamps nIter and stays deterministic per seed") {
    val m = blobs()
    val rs = new DistRandomizedSearchCV(LogisticRegressionGD,
      Map("c" -> Seq(0.01, 0.1, 1.0)), nIter = 100, cv = 3)
    val r = rs.fitMatrix(spark, m)
    assert(r.cvResults.count() == 3, "nIter clamps to grid size")
    val r2 = new DistRandomizedSearchCV(LogisticRegressionGD,
      Map("c" -> Seq(0.01, 0.1, 1.0)), nIter = 2, cv = 3).fitMatrix(spark, m)
    assert(r2.cvResults.count() == 2)
  }

  test("group-aware search: no group's rows split between train and test") {
    val m = blobs(n = 120)
    // group = key of 12 session-like clusters, rows of a group contiguous
    val groups = Array.tabulate(120)(i => s"s${i / 10}")
    import spark.implicits._
    val df = m.x.indices.map(i => (m.x(i).toSeq, m.y(i), groups(i)))
      .toDF("features", "label", "grp")
    val gs = new DistGridSearchCV(LogisticRegressionGD,
      Map("c" -> Seq(1.0), "max_iter" -> Seq(50.0)), cv = 3)
    val r = gs.fit(spark, df, "features", "label", "grp")
    assert(r.bestScore > 0.9, s"grouped CV on separable blobs, got ${r.bestScore}")
    // the fold plan itself: GroupKFold invariant on the collected matrix
    val folds = ModelParallel.groupKFolds(groups, 3)
    assert(groups.zip(folds).groupBy(_._1).values
      .forall(_.map(_._2).distinct.length == 1))
  }

  test("multi-model search picks the stronger family") {
    val m = blobs()
    val mm = new DistMultiModelSearch(Seq(
      ("logreg", LogisticRegressionGD, Map("c" -> Seq(1.0))),
      ("const", ConstantLearner, Map("c" -> Seq(1.0)))), n = 1, cv = 3)
    val r = mm.fit(spark, sparkDf(m), "features", "label")
    assert(r.bestModelName == "logreg")
    assert(r.bestScore > 0.9)
  }

  test("OvR recovers classes; norm produces a distribution") {
    val m = blobs()
    val ovr = new DistOneVsRest(LogisticRegressionGD, norm = Some("l1"))
    val model = ovr.fitMatrix(spark, m)
    assert(model.classes.toSeq == Seq(0.0, 1.0, 2.0))
    assert(Metrics.accuracy(model, m.x, m.y) > 0.95)
    val p = model.predictProba(m.x(0))
    assert(math.abs(p.sum - 1.0) < 1e-9, "l1-normalized probs sum to 1")
  }

  test("multilabel OvR recovers planted label sets") {
    import graft.exec.LogisticRegressionLBFGS
    // Labels determined by feature signs: "a" iff x0>0, "b" iff x1>0,
    // "c" iff x0+x1>0 — overlapping sets, some rows empty-set.
    val rng = new Random(21)
    val x = Array.fill(200)(Array(rng.nextGaussian() * 2, rng.nextGaussian() * 2))
    def truth(v: Array[Double]): Set[String] =
      Set("a" -> (v(0) > 0.5), "b" -> (v(1) > 0.5), "c" -> (v(0) + v(1) > 0.5))
        .collect { case (l, true) => l }
    val y = x.map(truth)
    val ml = new DistMultilabelOvR(LogisticRegressionLBFGS)
    val model = ml.fitSets(spark, x, y)
    assert(model.classes.toSeq == Seq("a", "b", "c"),
      "MultiLabelBinarizer order: sorted distinct labels")
    // exact-set recovery away from the decision boundaries
    val clear = x.indices.filter { i =>
      math.abs(x(i)(0) - 0.5) > 0.7 && math.abs(x(i)(1) - 0.5) > 0.7 &&
        math.abs(x(i)(0) + x(i)(1) - 0.5) > 0.7
    }
    assert(clear.size > 50, "enough unambiguous rows to grade on")
    val exact = clear.count(i => model.predictLabels(x(i)).toSet == y(i))
    assert(exact.toDouble / clear.size > 0.95,
      s"recovered ${exact}/${clear.size} planted label sets")
    // proba surface is one positive-probability per class, normalizable
    val p = model.predictProba(x(0))
    assert(p.length == 3 && p.forall(v => v >= 0 && v <= 1))
    // the DataFrame fit path and prediction column agree with fitSets
    import spark.implicits._
    val df = x.zip(y).toSeq.map { case (v, s) => (v.toSeq, s.toSeq.sorted) }
      .toDF("features", "labels")
    val model2 = ml.fit(spark, df, "features", "labels")
    val preds = graft.predict.Predict
      .withMultilabelPredictions(spark, df, model2, "features")
      .select("pred_labels").as[Seq[String]].collect()
    assert(preds.length == 200)
    val exact2 = clear.count(i => preds(i).toSet == y(i))
    assert(exact2.toDouble / clear.size > 0.95)
    // mlb_override path: pre-binarized indicator matrix, same model out
    val classes = Array("a", "b", "c")
    val yInd = y.map(s => classes.map(c => if (s(c)) 1.0 else 0.0))
    val model3 = ml.fitBinarized(spark, x, yInd, classes)
    assert(x.take(20).forall(v =>
      model3.predictLabels(v).toSeq == model2.predictLabels(v).toSeq))
  }

  test("multilabel edge contracts: dup in-set labels, pinned axis, negMethod") {
    import graft.exec.LogisticRegressionLBFGS
    import spark.implicits._
    val ml = new DistMultilabelOvR(LogisticRegressionLBFGS)
    // a DUPLICATE label inside one row's set must not inflate the
    // positive ROW count to n and falsely mark the class degenerate
    // (ConstantModel(1.0) would then predict "a" for every input)
    val x2 = Array(Array(5.0, 0.0), Array(-5.0, 0.0),
      Array(5.0, 1.0), Array(-5.0, 1.0))
    val y2 = Seq(Seq("a", "a"), Seq("b"), Seq("a", "a"), Seq("b"))
    val df2 = x2.zip(y2).toSeq.map { case (v, s) => (v.toSeq, s) }
      .toDF("features", "labels")
    val m2 = new DistMultilabelOvR(LogisticRegressionLBFGS)
      .withBroadcastBudget(1L) // force the data-parallel route under test
      .fit(spark, df2, "features", "labels")
    assert(!m2.predictLabels(Array(-5.0, 0.5)).contains("a"),
      "x0 < 0 rows are true negatives for 'a' — it must not be constant-positive")
    // fitBinarized PINS the class axis: an all-zero indicator column
    // keeps its (constant-negative) slot in the caller's order
    val classes = Array("b", "a", "never")
    val yInd = Array(Array(0.0, 1.0, 0.0), Array(1.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0), Array(1.0, 0.0, 0.0))
    val m3 = ml.fitBinarized(spark, x2, yInd, classes)
    assert(m3.classes.toSeq == Seq("b", "a", "never"),
      "caller order preserved, all-zero column kept")
    assert(m3.predictProba(x2(0)).length == 3,
      "proba width = indicator width")
    assert(!m3.predictLabels(x2(0)).contains("never"),
      "all-zero column serves as constant-negative")
    // a typo'd negMethod fails at CONSTRUCTION on both classes — the
    // broadcast route previously treated it silently as "ratio" while
    // the data-parallel route threw mid-fit
    intercept[IllegalArgumentException] {
      new DistMultilabelOvR(LogisticRegressionLBFGS,
        maxNegatives = Some(3.0), negMethod = "multipler")
    }
    intercept[IllegalArgumentException] {
      new DistOneVsRest(LogisticRegressionLBFGS,
        maxNegatives = Some(3.0), negMethod = "multipler")
    }
  }

  test("multilabel OvR auto-route: over-budget fit runs data-parallel") {
    import graft.exec.LogisticRegressionLBFGS
    import spark.implicits._
    val rng = new Random(21)
    val x = Array.fill(200)(Array(rng.nextGaussian() * 2, rng.nextGaussian() * 2))
    def truth(v: Array[Double]): Set[String] =
      Set("a" -> (v(0) > 0.5), "b" -> (v(1) > 0.5), "c" -> (v(0) + v(1) > 0.5))
        .collect { case (l, true) => l }
    val y = x.map(truth)
    val df = x.zip(y).toSeq.map { case (v, s) => (v.toSeq, s.toSeq.sorted) }
      .toDF("features", "labels")
    val dp = new DistMultilabelOvR(LogisticRegressionLBFGS)
      .withBroadcastBudget(1L).fit(spark, df, "features", "labels")
    val bc = new DistMultilabelOvR(LogisticRegressionLBFGS)
      .fit(spark, df, "features", "labels")
    assert(dp.classes.toSeq == Seq("a", "b", "c"))
    val clear = x.indices.filter { i =>
      math.abs(x(i)(0) - 0.5) > 0.7 && math.abs(x(i)(1) - 0.5) > 0.7 &&
        math.abs(x(i)(0) + x(i)(1) - 0.5) > 0.7
    }
    val exact = clear.count(i => dp.predictLabels(x(i)).toSet == y(i))
    assert(exact.toDouble / clear.size > 0.95,
      s"data-parallel multilabel recovered $exact/${clear.size}")
    // regime agreement away from the boundaries
    clear.take(60).foreach { i =>
      assert(dp.predictLabels(x(i)).toSeq == bc.predictLabels(x(i)).toSeq,
        s"row $i regime disagreement")
    }
    // all-positive class: every row carries "z" — the data-parallel route
    // must contain it as a constant-positive model, not diverge
    val dfAll = x.zip(y).toSeq
      .map { case (v, s) => (v.toSeq, (s + "z").toSeq.sorted) }
      .toDF("features", "labels")
    val withConst = new DistMultilabelOvR(LogisticRegressionLBFGS)
      .withBroadcastBudget(1L).fit(spark, dfAll, "features", "labels")
    assert(clear.take(20).forall(i =>
      withConst.predictLabels(x(i)).contains("z")))
  }

  test("L-BFGS plugs into OvR and the feature eliminator unchanged") {
    import graft.exec.LogisticRegressionLBFGS
    val m = blobs()
    val ovr = new DistOneVsRest(LogisticRegressionLBFGS, norm = Some("l1"))
    val model = ovr.fitMatrix(spark, m)
    assert(model.classes.toSeq == Seq(0.0, 1.0, 2.0))
    assert(Metrics.accuracy(model, m.x, m.y) > 0.95)

    val rng = new Random(13)
    val x = m.x.map(r => r ++ Array(rng.nextGaussian(), rng.nextGaussian()))
    val noisy = TrainMatrix(x, m.y, m.folds)
    val el = new DistFeatureEliminator(LogisticRegressionLBFGS,
      minFeaturesToSelect = 2, step = 1, cv = 3)
    val r = el.fitMatrix(spark, noisy)
    assert(r.bestScore > 0.9)
    assert(r.bestFeatures.toSet.intersect(Set(0, 1)) == Set(0, 1),
      s"informative dims kept, got ${r.bestFeatures.toSeq}")
  }

  test("OvO fits all pairs and recovers classes") {
    val m = blobs()
    val ovo = new DistOneVsOne(LogisticRegressionGD)
    val model = ovo.fitMatrix(spark, m)
    assert(model.pairs.length == 3)
    assert(Metrics.accuracy(model, m.x, m.y) > 0.95)
  }

  test("OvO vote ties break by confidence, then smallest class") {
    import graft.exec.Model
    // 3-class voting cycle: 0 beats 1, 1 beats 2, 2 beats 0 -> one vote
    // each; confidences decide. Pair order is ((0,1),(0,2),(1,2)).
    final case class Fixed(pPos: Double) extends Model {
      def predict(x: Array[Double]): Double = if (pPos > 0.5) 1.0 else 0.0
      def predictProba(x: Array[Double]): Array[Double] = Array(1 - pPos, pPos)
    }
    val classes = Array(0.0, 1.0, 2.0)
    val pairs = Array((0.0, 1.0), (0.0, 2.0), (1.0, 2.0))
    // (0,1): 0 wins weakly; (0,2): 2 wins strongly; (1,2): 1 wins weakly
    val cyc = OvOModel(classes, pairs,
      Array(Fixed(0.45), Fixed(0.95), Fixed(0.45)))
    assert(cyc.predict(Array(0.0)) == 2.0,
      "all tied on votes; class 2's strong margin must win")
    // exactly symmetric margins -> confidence ties too -> smallest class
    val sym = OvOModel(classes, pairs,
      Array(Fixed(0.5), Fixed(0.5), Fixed(0.5)))
    assert(sym.predict(Array(0.0)) == 0.0)
  }

  test("forest is seed-deterministic and fits blobs; regressor works") {
    val m = blobs()
    val f1 = new DistForest(10, Map("max_depth" -> 4.0), seed = 5)
      .fitMatrix(spark, m)
    val f2 = new DistForest(10, Map("max_depth" -> 4.0), seed = 5)
      .fitMatrix(spark, m)
    assert(m.x.forall(x => f1.predict(x) == f2.predict(x)), "same seed, same forest")
    assert(Metrics.accuracy(f1, m.x, m.y) > 0.95)

    val yReg = m.x.map(r => 2.0 * r(0) + r(1))
    val mr = TrainMatrix(m.x, yReg, m.folds)
    val fr = new DistForest(20, Map("max_depth" -> 6.0),
      classification = false, seed = 5).fitMatrix(spark, mr)
    assert(Metrics.r2(fr, mr.x, mr.y) > 0.8)
  }

  test("random trees embedding produces consistent sparse leaf codes") {
    val m = blobs()
    val emb = new DistRandomTreesEmbedding(nEstimators = 5, maxDepth = 3, seed = 3)
      .fitMatrix(spark, m)
    val code = emb.transform(m.x(0))
    assert(code.length == 5, "one active leaf per tree")
    assert(code.forall(i => i >= 0 && i < emb.width))
    assert(emb.transform(m.x(0)).toSeq == code.toSeq, "deterministic transform")
  }

  test("out-of-fold probabilities cover every row") {
    val m = blobs()
    val oof = OutOfFold.oofProba(spark, m, LogisticRegressionGD, cv = 3, seed = 1)
    assert(oof.length == m.nRows && oof.forall(_ != null))
    assert(oof.forall(p => math.abs(p.sum - 1.0) < 1e-6))
  }

  test("feature eliminator finds the planted informative features") {
    // 2 informative dims (blobs) + 3 pure-noise dims; ladder must drop noise.
    val base = blobs(n = 120)
    val rng = new Random(11)
    val x = base.x.map(r => r ++ Array(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()))
    val m = TrainMatrix(x, base.y, base.folds)
    val el = new DistFeatureEliminator(new CART.Classifier(3),
      minFeaturesToSelect = 2, step = 1, cv = 3)
    val r = el.fitMatrix(spark, m)
    assert(r.bestScore > 0.9)
    assert(r.bestFeatures.toSet.intersect(Set(0, 1)) == Set(0, 1),
      s"informative dims kept, got ${r.bestFeatures.toSeq}")
    assert(Metrics.accuracy(r.model, m.x, m.y) > 0.9)
  }

  test("grid search runs end-to-end on the real embeddings testdata") {
    // The synthetic embeddings carry no label signal (centroid classifier
    // scores ~0.07 on 10 classes), so this checks mechanics, not accuracy.
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val gs = new DistGridSearchCV(LogisticRegressionGD,
      Map("c" -> Seq(0.1, 1.0), "max_iter" -> Seq(30.0)), cv = 3)
    val r = gs.fit(spark, df, "embedding", "label")
    val cv = r.cvResults.collect()
    assert(cv.length == 2)
    assert(cv.map(_.getAs[Int]("rank_test_score")).sorted.head == 1)
    assert(r.bestScore >= 0.0 && r.bestScore <= 1.0)
    assert(r.bestModel.predictProba(Array.fill(64)(0.0)).length == 10)
  }

  private def sparkDf(m: TrainMatrix) = {
    import spark.implicits._
    m.x.zip(m.y).toSeq.map { case (x, y) => (x.toSeq, y) }
      .toDF("features", "label")
  }

  test("precomputed-kernel folds slice rows AND columns (square _safe_split)") {
    // K(i)(j) = i*10 + j makes every slice position-identifiable
    val k6 = Array.tabulate(6, 6)((i, j) => i * 10.0 + j)
    val m = TrainMatrix(k6, Array(0, 1, 0, 1, 0, 1).map(_.toDouble),
      Array(0, 1, 0, 1, 0, 1), precomputedKernel = true)
    val (trX, trY) = m.trainOf(0) // train rows/cols = indices {1, 3, 5}
    assert(trX.map(_.toSeq).toSeq == Seq(
      Seq(11.0, 13.0, 15.0), Seq(31.0, 33.0, 35.0), Seq(51.0, 53.0, 55.0)))
    assert(trY.toSeq == Seq(1.0, 1.0, 1.0))
    val (teX, teY) = m.testOf(0) // test rows {0, 2, 4} x TRAIN cols {1, 3, 5}
    assert(teX.map(_.toSeq).toSeq == Seq(
      Seq(1.0, 3.0, 5.0), Seq(21.0, 23.0, 25.0), Seq(41.0, 43.0, 45.0)))
    assert(teY.toSeq == Seq(0.0, 0.0, 0.0))
    // non-square kernels are a caller bug, loudly
    assertThrows[IllegalArgumentException] {
      TrainMatrix(Array(Array(1.0, 2.0)), Array(0.0), Array(0),
        precomputedKernel = true)
    }
  }

  test("grid search CVs a precomputed kernel (kernel logistic regression)") {
    // linear-kernel gram matrix of separable blobs: logistic regression
    // on K[train, train] features IS kernel logistic regression, and the
    // kernel-aware split keeps test features aligned to the fitted
    // coefficients (K[test, train]) — the reference's SVC(precomputed)
    // mechanics with an estimator the engine already has
    val b = blobs(n = 60)
    val rbf = (p: Array[Double], q: Array[Double]) => {
      val d2 = p.zip(q).map { case (a, c) => (a - c) * (a - c) }.sum
      math.exp(-0.1 * d2) // well-conditioned features in (0, 1]
    }
    val gram = Array.tabulate(b.nRows, b.nRows)((i, j) => rbf(b.x(i), b.x(j)))
    val m = TrainMatrix(gram, b.y, b.folds, precomputedKernel = true)
    val r = new DistGridSearchCV(graft.exec.LogisticRegressionLBFGS,
      Map("c" -> Seq(1.0), "max_iter" -> Seq(80.0)), cv = 3)
      .fitMatrix(spark, m)
    assert(r.bestScore > 0.9, s"kernel CV accuracy ${r.bestScore}")
  }
}
