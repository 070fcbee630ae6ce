package graft.exec

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Model-parallel executor: the engine's core inversion (SURVEY.md §1.1) —
  * the TRAINING DATA is broadcast once per node, the TASK axis (candidates
  * × folds × classes × seeds × subsets) is what Spark parallelizes.
  *
  * Scale story: this is the reference's regime (X fits in executor memory;
  * tasks are heavy and few), and it is exactly where task-parallelism beats
  * data-parallel fits by 10-100× (BASELINE.md). When X outgrows broadcast
  * (~the 100 TB data plane), the meta-estimators' relational skeletons
  * (fold columns, CvResults, rank/best) keep working over data-parallel
  * per-task fits — the planners and aggregations in graft.plan/graft.agg
  * are already pure DataFrame ops.
  */
object ModelParallel {

  /** Broadcast-able training matrix with per-row fold ids. */
  /** Driver-side training matrix + fold assignment. With
    * `precomputedKernel` (the reference's `utils.py:171-209` square-matrix
    * `_safe_split` corner) `x` is an n x n kernel/gram matrix and fold
    * slicing selects COLUMNS as well as rows — fit sees K[train, train],
    * scoring sees K[test, train] — so kernel-feature estimators (kernel
    * logistic, kernel SVM surrogates) CV correctly: a row-only slice
    * would leak test columns into the fit and misalign test features
    * against the fitted coefficients.
    */
  final case class TrainMatrix(x: Array[Array[Double]], y: Array[Double],
                               folds: Array[Int],
                               precomputedKernel: Boolean = false) {
    if (precomputedKernel)
      require(x.forall(_.length == x.length),
        s"precomputed kernel must be square (n x n), got rows of widths " +
          s"${x.map(_.length).distinct.take(3).mkString(",")} for n=${x.length}")
    def nRows: Int = x.length
    private def slice(rows: Seq[Int], trainIdx: Seq[Int]): Array[Array[Double]] =
      if (!precomputedKernel) rows.map(x).toArray
      else rows.map(i => trainIdx.map(j => x(i)(j)).toArray).toArray
    def trainOf(fold: Int): (Array[Array[Double]], Array[Double]) = {
      val idx = (0 until nRows).filter(folds(_) != fold)
      (slice(idx, idx), idx.map(y).toArray)
    }
    def testOf(fold: Int): (Array[Array[Double]], Array[Double]) = {
      val te = (0 until nRows).filter(folds(_) == fold)
      val tr = (0 until nRows).filter(folds(_) != fold)
      (slice(te, tr), te.map(y).toArray)
    }
  }

  /** Collect (featuresCol: array<numeric>, labelCol) to a driver matrix.
    * Explicit cast to array<double>/double so float parquet vectors and
    * int labels marshal uniformly.
    */
  def collectMatrix(df: DataFrame, featuresCol: String, labelCol: String,
                    cv: Int, seed: Long, stratified: Boolean = true): TrainMatrix = {
    val rows = df.select(col(featuresCol).cast("array<double>"),
      col(labelCol).cast("double")).collect()
    val x = rows.map(_.getSeq[Double](0).toArray)
    val y = rows.map(_.getDouble(1))
    TrainMatrix(x, y, if (stratified) stratifiedFolds(y, cv, seed) else shuffledFolds(y.length, cv, seed))
  }

  /** Estimated driver/broadcast footprint of collecting the matrix:
    * rows x (d doubles + row overhead). One cheap agg — the guard the
    * auto-routing fit surfaces use to decide broadcast vs data-parallel
    * BEFORE collecting anything.
    */
  def estimateMatrixBytes(df: DataFrame, featuresCol: String): Long = {
    val r = df.agg(count(lit(1)).as("n"),
      first(size(col(featuresCol)), ignoreNulls = true).as("d")).head()
    val n = r.getLong(0)
    val d = if (r.isNullAt(1)) 0L else r.getInt(1).toLong
    n * (d + 4L) * 8L
  }

  /** Group-aware matrix collection: folds from sklearn-GroupKFold
    * semantics over `groupCol` — every row of a group in ONE fold.
    */
  def collectMatrixGrouped(df: DataFrame, featuresCol: String,
                           labelCol: String, groupCol: String,
                           cv: Int): TrainMatrix = {
    val rows = df.select(col(featuresCol).cast("array<double>"),
      col(labelCol).cast("double"), col(groupCol).cast("string")).collect()
    val x = rows.map(_.getSeq[Double](0).toArray)
    val y = rows.map(_.getDouble(1))
    val groups = rows.map(_.getString(2))
    TrainMatrix(x, y, groupKFolds(groups, cv))
  }

  /** sklearn GroupKFold: deterministic greedy balancing — groups sorted
    * by sample count (largest first, key as tie-break) each go to the
    * currently-lightest fold. No group straddles folds.
    */
  def groupKFolds(groups: Array[String], k: Int): Array[Int] = {
    require(k > 1, "need k > 1 folds")
    val counts = groups.groupBy(identity).map { case (g, m) => (g, m.length) }
    require(counts.size >= k,
      s"need at least $k distinct groups for $k folds, got ${counts.size}")
    val loads = new Array[Long](k)
    val assign = scala.collection.mutable.Map.empty[String, Int]
    counts.toSeq.sortBy { case (g, n) => (-n, g) }.foreach { case (g, n) =>
      val f = loads.indices.minBy(loads(_))
      assign(g) = f
      loads(f) += n
    }
    groups.map(assign)
  }

  /** Seeded shuffled round-robin folds (sklearn KFold(shuffle=True)). */
  def shuffledFolds(n: Int, k: Int, seed: Long): Array[Int] = {
    val order = new Random(seed).shuffle((0 until n).toVector)
    val folds = new Array[Int](n)
    order.zipWithIndex.foreach { case (row, pos) => folds(row) = pos % k }
    folds
  }

  /** Stratified folds: round-robin within each class after a seeded
    * shuffle, so every fold sees the class distribution (sklearn
    * StratifiedKFold semantics, not bit-identical splits).
    */
  def stratifiedFolds(y: Array[Double], k: Int, seed: Long): Array[Int] = {
    val rng = new Random(seed)
    val folds = new Array[Int](y.length)
    y.zipWithIndex.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, members) =>
      val order = rng.shuffle(members.map(_._2).toVector)
      order.zipWithIndex.foreach { case (row, pos) => folds(row) = pos % k }
    }
    folds
  }

  final case class FitTask(taskId: Int, candidateId: Int, fold: Int,
                           params: Map[String, Double])

  final case class TaskResult(candidate_id: Int, fold_id: Int, score: Double,
                              n_test: Long, fit_time_ms: Double, score_time_ms: Double)

  final case class TaskResultMulti(candidate_id: Int, fold_id: Int,
                                   scores: Map[String, Double], n_test: Long,
                                   fit_time_ms: Double, score_time_ms: Double)

  /** Fan the task lattice out one-task-per-partition (the reference's
    * 'auto' heuristic, `base.py:53-64` — fit tasks are heavy and few, so
    * scheduling granularity IS the task) and fit+score each against the
    * broadcast matrix. Returns the per-(candidate, fold) score frame that
    * CvResults aggregates.
    *
    * `errorScore`: Some(v) fills failed fits with score=v (reference
    * `error_score`, `search.py:232-259`); None rethrows.
    */
  def run(spark: SparkSession, tasks: Seq[FitTask], bc: Broadcast[TrainMatrix],
          learner: Learner, scoring: String, seed: Long,
          errorScore: Option[Double] = None,
          side: FitSideData = FitSideData.empty): DataFrame = {
    import spark.implicits._
    val scorerName = scoring
    val sideData = side // rides each task closure (eval slices are small)
    val results = spark.sparkContext
      .parallelize(tasks, math.max(1, tasks.size))
      .map { t =>
        val m = bc.value
        val scorer = Metrics.scorer(scorerName)
        val (trainX, trainY) = m.trainOf(t.fold)
        val (testX, testY) = m.testOf(t.fold)
        val t0 = System.nanoTime()
        // error_score contains FIT failures only (sklearn semantics):
        // a scorer exception is a bug to surface, not a score to fake
        val fitted =
          try Right(learner.fit(trainX, trainY, t.params, seed + t.taskId, sideData))
          catch { case e: Exception => Left(e) }
        fitted match {
          case Right(model) =>
            val t1 = System.nanoTime()
            val score = scorer(model, testX, testY)
            val t2 = System.nanoTime()
            TaskResult(t.candidateId, t.fold, score, testX.length.toLong,
              (t1 - t0) / 1e6, (t2 - t1) / 1e6)
          case Left(e) => errorScore match {
            case Some(v) => TaskResult(t.candidateId, t.fold, v, 0L, 0.0, 0.0)
            case None    => throw e
          }
        }
      }
    results.toDS().toDF()
  }

  /** Multi-metric variant (`_multimetric_score` contract): each task fits
    * ONCE and scores under every metric; `scores` is a map column the
    * aggregation explodes into mean_test_<metric> columns.
    */
  def runMulti(spark: SparkSession, tasks: Seq[FitTask], bc: Broadcast[TrainMatrix],
               learner: Learner, scorings: Seq[String], seed: Long,
               errorScore: Option[Double] = None,
               side: FitSideData = FitSideData.empty): DataFrame = {
    import spark.implicits._
    val names = scorings
    val sideData = side
    val results = spark.sparkContext
      .parallelize(tasks, math.max(1, tasks.size))
      .map { t =>
        val m = bc.value
        val scorer = Metrics.multi(names)
        val (trainX, trainY) = m.trainOf(t.fold)
        val (testX, testY) = m.testOf(t.fold)
        val t0 = System.nanoTime()
        // fit failures only, as in run(): scorer errors re-raise
        val fitted =
          try Right(learner.fit(trainX, trainY, t.params, seed + t.taskId, sideData))
          catch { case e: Exception => Left(e) }
        fitted match {
          case Right(model) =>
            val t1 = System.nanoTime()
            val s = scorer(model, testX, testY)
            val t2 = System.nanoTime()
            TaskResultMulti(t.candidateId, t.fold, s, testX.length.toLong,
              (t1 - t0) / 1e6, (t2 - t1) / 1e6)
          case Left(e) => errorScore match {
            case Some(v) =>
              TaskResultMulti(t.candidateId, t.fold,
                names.map(_ -> v).toMap, 0L, 0.0, 0.0)
            case None => throw e
          }
        }
      }
    results.toDS().toDF()
  }
}
