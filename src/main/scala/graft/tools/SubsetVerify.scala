package graft.tools

import java.nio.file.{Files, Paths}

/** Verify-style dump for a SUBSET of registered queries — the loop for
  * re-crosschecking specific queries at larger scale factors (the exact
  * integer-unit sums only show their worth at sf1+, where double sums
  * flipped digits). Usage:
  * runMain graft.tools.SubsetVerify <sfDir> <outDir> <q1> [q2...]
  * then: python3 tools/crosscheck.py <sfDir> <outDir>
  */
object SubsetVerify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: SubsetVerify sfDir outDir q1 [q2...]")
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.sorted.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view
      .filterKeys(names.contains).toMap
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    ()
  }
}
