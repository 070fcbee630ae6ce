package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.encode.{Encoderizer, Preprocessing}
import graft.exec.{LogisticRegressionGD, Metrics, ModelIO, ModelParallel, Stats}
import graft.exec.ModelParallel.TrainMatrix
import graft.search._

class PersistenceStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("F-distribution upper tail matches published critical values") {
    // Critical point: F_{0.05;1,10} = 4.9646 -> sf == 0.05; the rest are
    // parity-pinned against an independent implementation (mpmath
    // regularized incomplete beta) to 1e-9.
    assert(math.abs(Stats.fSf(4.9646, 1, 10) - 0.05) < 1e-5)
    assert(math.abs(Stats.fSf(3.3258, 4, 20) - 0.0304746341650241) < 1e-9)
    assert(math.abs(Stats.fSf(2.8661, 4, 20) - 0.0499989796688660) < 1e-9)
    assert(math.abs(Stats.fSf(2.6049, 5, 30) - 0.0451842572248268) < 1e-9)
    // limits and monotonicity
    assert(Stats.fSf(0.0, 3, 7) == 1.0)
    assert(Stats.fSf(100.0, 3, 7) < 1e-4)
    val ps = Seq(0.5, 1.0, 2.0, 4.0, 8.0).map(Stats.fSf(_, 3, 7))
    assert(ps == ps.sorted.reverse, "sf decreases in f")
    // lgamma sanity: Γ(5) = 24
    assert(math.abs(Stats.lgamma(5.0) - math.log(24.0)) < 1e-10)
  }

  test("fpr/fdr/fwe select planted informative features, drop noise") {
    val rng = new Random(31)
    // 2 informative dims (shifted by class), 6 pure-noise dims, 300 rows
    val rows = Seq.tabulate(300) { i =>
      val c = i % 3
      val arr = Array(c * 3.0 + rng.nextGaussian() * 0.5,
        -c * 2.0 + rng.nextGaussian() * 0.5) ++
        Array.fill(6)(rng.nextGaussian())
      (arr.toSeq, c)
    }
    val df = rows.toDF("arr", "y")
    for (mode <- Seq("fpr", "fdr", "fwe")) {
      val kept = Preprocessing.pValueKeepIndices(df, "arr", "y", mode, alpha = 0.05)
      assert(kept.toSet.intersect(Set(0, 1)) == Set(0, 1),
        s"$mode must keep the informative dims, got $kept")
      assert(kept.count(_ >= 2) <= 1,
        s"$mode kept too much noise at alpha=0.05: $kept")
    }
    // fwe (Bonferroni) is never more permissive than fpr
    val fpr = Preprocessing.pValueKeepIndices(df, "arr", "y", "fpr", 0.05).toSet
    val fwe = Preprocessing.pValueKeepIndices(df, "arr", "y", "fwe", 0.05).toSet
    assert(fwe.subsetOf(fpr))
    intercept[IllegalArgumentException](
      Preprocessing.pValueKeepIndices(df, "arr", "y", "bogus"))
  }

  private def blobs(n: Int = 90, seed: Int = 7): TrainMatrix = {
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

  test("model save/load: bit-identical predictions for every model family") {
    val dir = java.nio.file.Files.createTempDirectory("model_io").toString
    val m = blobs()
    val probes = m.x.take(30)

    val lr = LogisticRegressionGD.fit(m.x, m.y, Map("c" -> 1.0, "max_iter" -> 50.0), 0L)
    ModelIO.save(lr, s"$dir/lr.json")
    val lr2 = ModelIO.loadModel(s"$dir/lr.json")
    assert(probes.forall(x => lr.predictProba(x).toSeq == lr2.predictProba(x).toSeq))

    val forest = new DistForest(8, Map("max_depth" -> 4.0), seed = 5).fitMatrix(spark, m)
    ModelIO.save(forest, s"$dir/forest.json")
    val forest2 = ModelIO.loadModel(s"$dir/forest.json")
    assert(probes.forall(x => forest.predictProba(x).toSeq == forest2.predictProba(x).toSeq))
    // leaf ids survive (the embedding surface)
    val t = forest.trees.head; val t2 = forest2.asInstanceOf[ForestModel].trees.head
    assert(probes.forall(x => t.leafIndex(x) == t2.leafIndex(x)))

    val ovr = new DistOneVsRest(LogisticRegressionGD, norm = Some("l1")).fitMatrix(spark, m)
    ModelIO.save(ovr, s"$dir/ovr.json")
    val ovr2 = ModelIO.loadModel(s"$dir/ovr.json").asInstanceOf[OvRModel]
    assert(ovr2.classes.toSeq == ovr.classes.toSeq && ovr2.norm == ovr.norm)
    assert(probes.forall(x => ovr.predictProba(x).toSeq == ovr2.predictProba(x).toSeq))

    val svc = graft.exec.LinearSVC.fit(m.x, m.y, Map("c" -> 1.0), 0L)
    ModelIO.save(svc, s"$dir/svc.json")
    val svc2 = ModelIO.loadModel(s"$dir/svc.json")
    assert(probes.forall(x => svc.predictProba(x).toSeq == svc2.predictProba(x).toSeq))

    val ml = new DistMultilabelOvR(LogisticRegressionGD)
      .fitSets(spark, m.x, m.y.map(v => Set(s"c$v")))
    ModelIO.save(ml, s"$dir/ml.json")
    val ml2 = ModelIO.loadMultilabel(s"$dir/ml.json")
    assert(ml2.classes.toSeq == ml.classes.toSeq)
    assert(probes.forall(x => ml.predictLabels(x).toSeq == ml2.predictLabels(x).toSeq))
  }

  test("model save/load: GBT, OvO and tree-embedding round-trip") {
    import graft.exec.{FitSideData, GBT}
    val dir = java.nio.file.Files.createTempDirectory("model_io2").toString
    val m = blobs()
    val probes = m.x.take(30)

    // multiclass GBT: the stage x class tree matrix plus prior/lr
    val gbt = GBT.Classifier.fit(m.x, m.y,
      Map("n_estimators" -> 12.0, "max_depth" -> 3.0,
        "learning_rate" -> 0.3), 3L).asInstanceOf[GBT.GBTModel]
    ModelIO.save(gbt, s"$dir/gbt.json")
    val gbt2 = ModelIO.loadModel(s"$dir/gbt.json").asInstanceOf[GBT.GBTModel]
    assert(gbt2.nStages == gbt.nStages && gbt2.nClasses == gbt.nClasses)
    assert(probes.forall(x =>
      gbt.predictProba(x).toSeq == gbt2.predictProba(x).toSeq))

    // regression GBT (nClasses = 0 single-score axis)
    val reg = GBT.Regressor.fit(m.x, m.x.map(_.sum),
      Map("n_estimators" -> 8.0, "max_depth" -> 3.0), 3L)
    ModelIO.save(reg, s"$dir/gbtr.json")
    val reg2 = ModelIO.loadModel(s"$dir/gbtr.json")
    assert(probes.forall(x => reg.predict(x) == reg2.predict(x)))

    // a TRUNCATED (early-stopped) GBT keeps its truncated stage axis
    // through the round-trip (overfit-prone shape as in GBTSpec)
    val rng = new Random(3)
    def mk(n: Int) = {
      val x = Array.tabulate(n) { i =>
        val c = i % 2
        Array.tabulate(10)(j =>
          if (j == 0) c * 1.0 + rng.nextGaussian() * 0.9 else rng.nextGaussian())
      }
      (x, Array.tabulate(n)(i => (i % 2).toDouble))
    }
    val (tx, ty) = mk(60)
    val (ex, ey) = mk(300)
    val early = GBT.Classifier.fit(tx, ty,
      Map("n_estimators" -> 200.0, "max_depth" -> 4.0,
        "learning_rate" -> 0.3), 1,
      FitSideData(ex, ey, earlyStoppingRounds = 5)).asInstanceOf[GBT.GBTModel]
    assert(early.nStages < 200, "fixture must early-stop")
    ModelIO.save(early, s"$dir/gbt_early.json")
    val early2 = ModelIO.loadModel(s"$dir/gbt_early.json").asInstanceOf[GBT.GBTModel]
    assert(early2.nStages == early.nStages)
    assert(tx.forall(x =>
      early.predictProba(x).toSeq == early2.predictProba(x).toSeq))

    // OvO: pairs, class remap and per-pair models
    val ovo = new DistOneVsOne(LogisticRegressionGD).fitMatrix(spark, m)
    ModelIO.save(ovo, s"$dir/ovo.json")
    val ovo2 = ModelIO.loadModel(s"$dir/ovo.json").asInstanceOf[OvOModel]
    assert(ovo2.classes.toSeq == ovo.classes.toSeq)
    assert(ovo2.pairs.toSeq == ovo.pairs.toSeq)
    assert(probes.forall(x => ovo.predict(x) == ovo2.predict(x)))

    // tree embedding: leaf geometry (the transform surface) survives
    val te = new DistRandomTreesEmbedding(nEstimators = 8, maxDepth = 4,
      seed = 5).fitMatrix(spark, m)
    ModelIO.save(te, s"$dir/te.json")
    val te2 = ModelIO.loadTreeEmbedding(s"$dir/te.json")
    assert(te2.width == te.width)
    assert(probes.forall(x => te.transform(x).toSeq == te2.transform(x).toSeq))
  }

  test("encoderizer save/load: identical transform output") {
    val df = Seq(
      (1L, "alpha beta", "red", Some(1.5), Seq("a", "b")),
      (2L, "beta gamma", "blue", Some(2.5), Seq("b")),
      (3L, "gamma delta", "red", None, Seq("c", "a")),
      (4L, "delta epsilon", "green", Some(4.0), Seq.empty[String]),
      (5L, "epsilon zeta", "blue", Some(5.0), Seq("a"))
    ).toDF("id", "text", "color", "num", "tags")
    val model = Encoderizer.fit(df, Seq("text", "color", "num", "tags"),
      size = "small", overrides = Map("color" -> "categorical", "text" -> "text"))
    val dir = java.nio.file.Files.createTempDirectory("enc_io").toString
    ModelIO.save(model, s"$dir/enc.json")
    val model2 = ModelIO.loadEncoderizer(s"$dir/enc.json")
    assert(model2.width == model.width)
    assert(model2.stages.map(_.name) == model.stages.map(_.name))
    val v1 = model.transform(df).select("id", "features").collect()
      .map(r => r.getLong(0) -> r.get(1).toString).toMap
    val v2 = model2.transform(df).select("id", "features").collect()
      .map(r => r.getLong(0) -> r.get(1).toString).toMap
    assert(v1 == v2, "loaded encoder transforms identically")
    assert((0 until model2.width).forall(i =>
      model2.featureOrigin(i) == model.featureOrigin(i)))
    // the loaded mapping must also equal the block layout computed from
    // the loaded stage widths themselves (an independent reconstruction,
    // not just pre/post symmetry), and extract() must work on it
    val expected = model2.stages.flatMap(s => Seq.fill(s.width)(s.name))
    assert((0 until model2.width).map(model2.featureOrigin) == expected)
    val sub = model2.extract(Seq("num", "color"))
    assert(sub.width ==
      model2.stages.filter(s => Set("num", "color")(s.name)).map(_.width).sum)
    assert((0 until sub.width).map(sub.featureOrigin).toSet == Set("num", "color"))

    // transformer_weights scale exactly one stage's block and survive
    // the save/load round trip
    val weighted = model.copy(weights = Map("num" -> 2.0))
    ModelIO.save(weighted, s"$dir/encw.json")
    val weighted2 = ModelIO.loadEncoderizer(s"$dir/encw.json")
    assert(weighted2.weights == Map("num" -> 2.0))
    import org.apache.spark.ml.linalg.Vector
    def feats(m2: Encoderizer.EncoderizerModel) =
      m2.transform(df).select("id", "features").collect()
        .map(r => r.getLong(0) -> r.getAs[Vector](1).toArray).toMap
    val base = feats(model); val scaled = feats(weighted2)
    val numIdx = (0 until model.width).filter(i => model.featureOrigin(i) == "num")
    val restIdx = (0 until model.width).filterNot(numIdx.contains)
    assert(base.keys.forall { id =>
      numIdx.forall(i => scaled(id)(i) == base(id)(i) * 2.0) &&
        restIdx.forall(i => scaled(id)(i) == base(id)(i))
    }, "weight scales exactly the named stage's block")
  }
}
