package graft.tools

/** Print the whole-stage-generated code of a registered query and count
  * the hot calls (split / regexp) per generated class — adjudicates
  * whether codegen subexpression elimination is sharing the tokenize/
  * regex work across output columns. Usage:
  *   runMain graft.tools.CodegenDump <sfDir> <query> [grepTerm...]
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val terms = if (args.length > 2) args.drop(2).toSeq
      else Seq(".split(", "regexp", "subExpr")
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val code = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    code.split("== Subtree").zipWithIndex.foreach { case (chunk, i) =>
      val counts = terms.map(t => s"$t=${chunk.sliding(t.length).count(_ == t)}")
      println(s"CODEGEN $name subtree $i: ${counts.mkString(" ")} (len=${chunk.length})")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/codegen_$name.txt"),
      code.getBytes("UTF-8"))
    println(s"CODEGEN wrote /tmp/codegen_$name.txt")
    spark.stop()
  }
}
