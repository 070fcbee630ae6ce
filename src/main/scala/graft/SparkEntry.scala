package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A real distributed MULTI-MODEL hyperparameter search (the reference's
    * headline usage: heterogeneous estimator families racing through one
    * candidates x folds fan-out against the broadcast embeddings matrix):
    * L-BFGS logistic vs squared-hinge LinearSVC, aggregated to one
    * cv_results frame (mean/std/rank per (model, candidate)).
    */
  def entry(spark: SparkSession): DataFrame = {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ms = new graft.search.DistMultiModelSearch(Seq(
      ("logreg", graft.exec.LogisticRegressionLBFGS,
        Map("c" -> Seq(0.1, 1.0), "max_iter" -> Seq(30.0))),
      ("linear_svc", graft.exec.LinearSVC,
        Map("c" -> Seq(0.1, 1.0), "max_iter" -> Seq(60.0)))),
      n = 2, cv = 3)
    ms.fit(spark, df, "embedding", "label").cvResults
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.MLRelational.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.EncodeQueries.queries ++
      graft.queries.MultimodalQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.MLRelational.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.EncodeQueries.oracles ++
      graft.queries.MultimodalQueries.oracles
}
