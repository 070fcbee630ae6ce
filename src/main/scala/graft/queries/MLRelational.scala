package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.agg.{CvResults, Voting}
import graft.plan.{Expansions, Folds, ParamGrid, RemovalLadder}

/** Oracle-checked queries over the ML-relational modules — the
  * deterministic sub-computations of the reference's meta-estimators
  * (SURVEY.md §7.4 "oracle-checkability"): fold planning, grid expansion,
  * CV aggregation + ranking + best, OvR/OvO expansion stats, voting,
  * constant prediction, the removal ladder. Learner-dependent outputs are
  * covered by ScalaTest, not DuckDB.
  */
object MLRelational {

  /** Deterministic per-(candidate, fold) score frame used by the CV
    * queries: candidates are C ∈ {0.01, 0.1, 1.0}; folds from vec_id % k;
    * score = C * avg(label in fold) — arbitrary but engine-portable
    * arithmetic, so DuckDB reproduces it bit-for-bit after rounding.
    */
  private def scoreFrame(s: SparkSession, d: String, k: Int): DataFrame = {
    val folds = Folds.assignByKey(Tables.embeddings(s, d), "vec_id", k)
      .groupBy("fold_id")
      .agg(avg("label").as("fold_avg"), count(lit(1)).as("n_test"))
    val cands = s.createDataFrame(Seq((0, 0.01), (1, 0.1), (2, 1.0)))
      .toDF("candidate_id", "c")
    cands.crossJoin(folds)
      .withColumn("score", col("c") * col("fold_avg"))
  }

  private val scoreFrameSql =
    """WITH folds AS (
      |  SELECT CAST(vec_id %% %d AS INT) AS fold_id, avg(label) AS fold_avg,
      |         count(*) AS n_test
      |  FROM embeddings GROUP BY 1),
      |cands(candidate_id, c) AS (VALUES (0, 0.01), (1, 0.1), (2, 1.0)),
      |scores AS (
      |  SELECT candidate_id, c, fold_id, c * fold_avg AS score, n_test
      |  FROM cands CROSS JOIN folds)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fold planner: deterministic fold assignment + per-fold stats.
    "q20_fold_assign" -> ((s, d) => {
      Folds.assignByKey(Tables.embeddings(s, d), "vec_id", 5)
        .groupBy("fold_id")
        .agg(count(lit(1)).as("n_rows"), round(avg("label"), 6).as("avg_label"))
        .orderBy("fold_id")
    }),

    // Stratified fold planner: every fold sees each label ~equally.
    // Group K-fold planner over events GROUPED BY user: the fold is a
    // function of the group key, so no user's rows straddle folds
    // (leakage-free CV for grouped samples). n_groups counts distinct
    // users per fold.
    "q68_fold_groups" -> ((s, d) => {
      Folds.assignByGroup(Tables.events(s, d), "user_id", 5)
        .groupBy("fold_id")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct("user_id").as("n_groups"))
        .orderBy("fold_id")
    }),

    "q21_fold_stratified" -> ((s, d) => {
      Folds.stratified(Tables.embeddings(s, d), "label", "vec_id", 5)
        .groupBy("fold_id", "label")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("fold_id", "label")
    }),

    // Grid expansion: sorted-key product order, last key fastest.
    "q22_grid_expand" -> ((s, d) => {
      val cands = ParamGrid.expand(
        Map("c" -> Seq(0.01, 0.1, 1.0), "max_iter" -> Seq(10, 50)))
      val rows = cands.zipWithIndex.map { case (m, i) =>
        (i, m("c").asInstanceOf[Double], m("max_iter").asInstanceOf[Int])
      }
      s.createDataFrame(rows).toDF("candidate_id", "c", "max_iter")
        .orderBy("candidate_id")
    }),

    // CV aggregation: mean/std(pop)/min-rank per candidate (search._store).
    "q23_cv_results" -> ((s, d) => {
      CvResults.aggregate(scoreFrame(s, d, 5), Seq("candidate_id", "c"))
        .orderBy("candidate_id")
    }),

    // Best candidate: rank 1, tie-break lowest candidate_id, limit 1.
    "q24_cv_best" -> ((s, d) => {
      CvResults.best(
        CvResults.aggregate(scoreFrame(s, d, 5), Seq("candidate_id", "c")),
        Seq("candidate_id"))
    }),

    // iid-weighted CV aggregation over unequal folds (k=7).
    "q25_cv_weighted" -> ((s, d) => {
      CvResults.aggregate(scoreFrame(s, d, 7), Seq("candidate_id", "c"),
        iid = true)
        .orderBy("candidate_id")
    }),

    // OvR expansion stats: per-class positives/negatives/prevalence.
    "q26_ovr_stats" -> ((s, d) =>
      Expansions.ovrStats(Tables.embeddings(s, d), "label")),

    // OvO pair lattice: n(n-1)/2 pairs with binary-problem row counts.
    "q27_ovo_pairs" -> ((s, d) =>
      Expansions.ovoPairs(Tables.embeddings(s, d), "label")),

    // Tree-induction histogram kernel (data-parallel CART's level
    // aggregation) over fixed thresholds: per (feature, bin, class) row
    // counts on the first 4 embedding dims — the sufficient statistics a
    // PLANET-style split decision consumes, oracled cell-exact.
    "q69_split_histogram" -> ((s, d) => {
      val thr = Array(-0.15, -0.05, 0.05, 0.15)
      graft.search.DataParallelCART.histogram(
        Tables.embeddings(s, d), "embedding", "label",
        Array.fill(4)(thr), nClasses = 10)
        .orderBy("feature", "bin", "label")
    }),

    // GBT stage-1 kernel (Friedman's gradient boosting, the exact math
    // GBT.Classifier runs — GBTSpec pins the learner to these formulas on
    // a known stump): binary y = label < 5, fixed depth-1 stump on
    // embedding[0] at 0.0. Per leaf: Newton value sum(r)/sum(p0(1-p0))
    // over the prior's residuals and the stage-updated probability at
    // lr = 0.1, oracled cell-exact.
    "q91_gbt_stage" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(
        when(col("label") < 5, 1.0).otherwise(0.0).as("y"),
        col("embedding").getItem(0).cast("double").as("v"))
      val stats = e.agg(avg(col("y")).as("p0"))
      val den = col("n_rows") * col("_p0") * (lit(1.0) - col("_p0"))
      val f1 = log(col("_p0") / (lit(1.0) - col("_p0"))) +
        lit(0.1) * col("_num") / den
      e.crossJoin(broadcast(stats))
        .withColumn("leaf", when(col("v") <= 0.0, lit("L")).otherwise(lit("R")))
        .groupBy("leaf")
        .agg(count(lit(1)).as("n_rows"),
          min(col("p0")).as("_p0"),
          sum(col("y") - col("p0")).as("_num"))
        .select(col("leaf"), col("n_rows"),
          round(col("_num") / den, 6).as("leaf_value"),
          round(lit(1.0) / (lit(1.0) + exp(-f1)), 6).as("p_stage1"))
        .orderBy("leaf")
    }),

    // Multilabel binarization stats (MultiLabelBinarizer.fit over a
    // label-SET column): documents tagged with a derived label set
    // {lang, source, length-bucket}; per class -> positives/negatives/
    // prevalence. The fit surface of DistMultilabelOvR.
    "q67_multilabel_stats" -> ((s, d) => {
      val tagged = Tables.documents(s, d).withColumn("labels",
        array(col("lang"), col("source"),
          when(col("n_chars") > 400, lit("long")).otherwise(lit("short"))))
      Expansions.multilabelStats(tagged, "labels")
    }),

    // Hard vote: modal prediction of 3 pseudo-models, ties -> smallest.
    "q28_vote_hard" -> ((s, d) => {
      Tables.embeddings(s, d)
        .withColumn("preds", array(
          col("label").cast("long"),
          pmod(col("vec_id"), lit(10)),
          pmod(col("vec_id") + 3, lit(10))))
        .select(col("vec_id"), Voting.hardVote(col("preds")).as("vote"))
        .orderBy("vec_id")
    }),

    // Constant predictor: majority class broadcast to every row.
    "q29_constant_predict" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val majority = emb.groupBy("label").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("label").asc).limit(1)
        .select(col("label").as("pred"))
      emb.select("vec_id").crossJoin(broadcast(majority)).orderBy("vec_id")
    }),

    // Feature-elimination ladder over the embedding width.
    "q30_removal_ladder" -> ((s, d) => {
      val nf = Tables.embeddings(s, d)
        .select(max(size(col("embedding")))).head().getInt(0)
      val rows = RemovalLadder.dropCounts(nf, 5, 10).zipWithIndex
        .map { case (drop, i) => (i, drop, nf - drop) }
      s.createDataFrame(rows).toDF("step_id", "n_dropped", "n_kept")
        .orderBy("step_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q20_fold_assign" ->
      """SELECT CAST(vec_id % 5 AS INT) AS fold_id, count(*) AS n_rows,
        | round(avg(label),6) AS avg_label
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,

    "q68_fold_groups" ->
      """SELECT CAST(user_id % 5 AS INT) AS fold_id, count(*) AS n_rows,
        | count(DISTINCT user_id) AS n_groups
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q69_split_histogram" ->
      """WITH ex AS (
        |  SELECT 0 AS feature, CAST(embedding[1] AS DOUBLE) AS v, label FROM embeddings
        |  UNION ALL SELECT 1, CAST(embedding[2] AS DOUBLE), label FROM embeddings
        |  UNION ALL SELECT 2, CAST(embedding[3] AS DOUBLE), label FROM embeddings
        |  UNION ALL SELECT 3, CAST(embedding[4] AS DOUBLE), label FROM embeddings)
        |SELECT feature,
        |  CASE WHEN v <= -0.15 THEN 0 WHEN v <= -0.05 THEN 1
        |       WHEN v <= 0.05 THEN 2 WHEN v <= 0.15 THEN 3 ELSE 4 END AS bin,
        |  label, count(*) AS n_rows
        |FROM ex GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q91_gbt_stage" ->
      """WITH e AS (
        |  SELECT CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y,
        |         CAST(embedding[1] AS DOUBLE) AS v
        |  FROM embeddings),
        |s AS (SELECT avg(y) AS p0 FROM e),
        |l AS (
        |  SELECT CASE WHEN v <= 0.0 THEN 'L' ELSE 'R' END AS leaf,
        |         count(*) AS n_rows, min(p0) AS p0, sum(y - p0) AS num
        |  FROM e, s GROUP BY 1)
        |SELECT leaf, n_rows,
        |  round(num / (n_rows * p0 * (1 - p0)), 6) AS leaf_value,
        |  round(1.0 / (1.0 + exp(-(ln(p0 / (1 - p0))
        |    + 0.1 * num / (n_rows * p0 * (1 - p0))))), 6) AS p_stage1
        |FROM l ORDER BY leaf""".stripMargin,

    "q21_fold_stratified" ->
      """SELECT fold_id, label, count(*) AS n_rows FROM (
        |  SELECT label,
        |    CAST((row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1) % 5 AS INT) AS fold_id
        |  FROM embeddings) t
        |GROUP BY fold_id, label ORDER BY fold_id, label""".stripMargin,

    "q22_grid_expand" ->
      """SELECT * FROM (VALUES
        | (0, 0.01, 10), (1, 0.01, 50),
        | (2, 0.1,  10), (3, 0.1,  50),
        | (4, 1.0,  10), (5, 1.0,  50))
        | AS t(candidate_id, c, max_iter)
        |ORDER BY candidate_id""".stripMargin,

    "q23_cv_results" ->
      (scoreFrameSql.format(5) +
        """
          |SELECT candidate_id, c,
          | round(avg(score),6) AS mean_test_score,
          | round(stddev_pop(score),6) AS std_test_score,
          | CAST(count(*) AS BIGINT) AS n_folds,
          | CAST(rank() OVER (ORDER BY round(avg(score),6) DESC) AS INT) AS rank_test_score
          |FROM scores GROUP BY candidate_id, c
          |ORDER BY candidate_id""".stripMargin),

    "q24_cv_best" ->
      (scoreFrameSql.format(5) +
        """
          |SELECT * FROM (
          |  SELECT candidate_id, c,
          |   round(avg(score),6) AS mean_test_score,
          |   round(stddev_pop(score),6) AS std_test_score,
          |   CAST(count(*) AS BIGINT) AS n_folds,
          |   CAST(rank() OVER (ORDER BY round(avg(score),6) DESC) AS INT) AS rank_test_score
          |  FROM scores GROUP BY candidate_id, c) r
          |WHERE rank_test_score = 1
          |ORDER BY candidate_id LIMIT 1""".stripMargin),

    "q25_cv_weighted" ->
      (scoreFrameSql.format(7) +
        """
          |SELECT candidate_id, c,
          | round(sum(score*n_test)/sum(n_test),6) AS mean_test_score,
          | round(sqrt(greatest(
          |   sum(n_test*score*score)/sum(n_test)
          |   - (sum(score*n_test)/sum(n_test))*(sum(score*n_test)/sum(n_test)), 0.0)),6)
          |   AS std_test_score,
          | CAST(count(*) AS BIGINT) AS n_folds,
          | CAST(rank() OVER (ORDER BY round(sum(score*n_test)/sum(n_test),6) DESC) AS INT)
          |   AS rank_test_score
          |FROM scores GROUP BY candidate_id, c
          |ORDER BY candidate_id""".stripMargin),

    "q26_ovr_stats" ->
      """SELECT label, count(*) AS n_pos,
        | (SELECT count(*) FROM embeddings) - count(*) AS n_neg,
        | round(count(*) * 1.0 / (SELECT count(*) FROM embeddings), 6) AS prevalence
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q27_ovo_pairs" ->
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
        |SELECT a.label AS label_i, b.label AS label_j, a.n + b.n AS n_rows
        |FROM c a JOIN c b ON a.label < b.label
        |ORDER BY label_i, label_j""".stripMargin,

    // Same derived label set as the Spark side; a row is one positive per
    // DISTINCT label in its set (lang/source can collide with the bucket
    // names only if testdata grew such values — list_distinct guards the
    // set semantics either way).
    "q67_multilabel_stats" ->
      """WITH tagged AS (
        |  SELECT unnest(list_distinct([lang, source,
        |    CASE WHEN n_chars > 400 THEN 'long' ELSE 'short' END])) AS label
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM documents)
        |SELECT label, count(*) AS n_pos,
        | (SELECT n FROM tot) - count(*) AS n_neg,
        | round(count(*) * 1.0 / (SELECT n FROM tot), 6) AS prevalence
        |FROM tagged GROUP BY label ORDER BY label""".stripMargin,

    "q28_vote_hard" ->
      """SELECT vec_id, p AS vote FROM (
        |  SELECT vec_id, p,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cnt DESC, p ASC) AS rn
        |  FROM (
        |    SELECT vec_id, p, count(*) AS cnt FROM (
        |      SELECT vec_id, CAST(label AS BIGINT) AS p FROM embeddings
        |      UNION ALL SELECT vec_id, vec_id % 10 FROM embeddings
        |      UNION ALL SELECT vec_id, (vec_id + 3) % 10 FROM embeddings) t
        |    GROUP BY vec_id, p) c) r
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "q29_constant_predict" ->
      """SELECT vec_id,
        | (SELECT label FROM (
        |    SELECT label, count(*) AS n FROM embeddings
        |    GROUP BY label ORDER BY n DESC, label LIMIT 1)) AS pred
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q30_removal_ladder" ->
      """WITH nf AS (SELECT CAST(max(len(embedding)) AS INT) AS n FROM embeddings)
        |SELECT CAST(r.range AS INT) AS step_id,
        |       CAST(r.range * 5 AS INT) AS n_dropped,
        |       CAST(n - r.range * 5 AS INT) AS n_kept
        |FROM range(0, 1000) r, nf
        |WHERE n - r.range * 5 >= 10
        |ORDER BY step_id""".stripMargin
  )
}
