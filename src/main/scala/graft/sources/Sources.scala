package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers beyond plain parquet: hive-style partitioned
  * layout (the 100 TB must-have — a predicate on the partition column
  * prunes whole directories before any IO), plus CSV/JSON ingestion with
  * explicit schemas (schema inference costs a full extra pass at scale;
  * never rely on it in production paths).
  */
object Sources {

  /** Write hive-partitioned parquet: one directory per distinct value of
    * `partitionCols`. Readers filtering on those columns scan only
    * matching directories (PartitionFilters in the plan, not data IO).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    // the write may target a directory Tables.load has memoized a handle
    // for; drop the session's handles so the next load re-lists files
    graft.Tables.invalidate(Some(df.sparkSession))
  }

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    graft.Tables.invalidate(Some(df.sparkSession))
  }

  def writeJsonLines(df: DataFrame, path: String): Unit = {
    df.write.mode("overwrite").json(path)
    graft.Tables.invalidate(Some(df.sparkSession))
  }

  /** ORC round-trip — the other columnar format Spark ships natively.
    * Same pushdown/pruning properties as parquet (predicate pushdown via
    * ORC's row-group stats, column pruning via the reader schema).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit = {
    df.write.mode("overwrite").orc(path)
    graft.Tables.invalidate(Some(df.sparkSession))
  }
}
