package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ToolsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("_GEN_SUCCESS marker records the generated table subset") {
    import graft.tools.ScaleDataGen
    val out = java.nio.file.Files.createTempDirectory("sfgen").toString
    val base = "/root/testdata/sf0.001"
    try {
      ScaleDataGen.generate(spark, base, 2, out, Set("region", "nation"))
      assert(new java.io.File(s"$out/region.parquet").exists)
      assert(!new java.io.File(s"$out/documents.parquet").exists)
      // a fuller request after a subset run must generate the MISSING
      // tables — a bare done-marker returned 'cached' here with the
      // documents table absent
      ScaleDataGen.generate(spark, base, 2, out, Set("region", "documents"))
      assert(new java.io.File(s"$out/documents.parquet").exists)
      val marker = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(out, "_GEN_SUCCESS"))
      assert(marker.contains("region") && marker.contains("nation") &&
        marker.contains("documents"), marker.toString)
      // a legacy empty marker claims nothing: the request regenerates
      java.nio.file.Files.write(java.nio.file.Paths.get(out, "_GEN_SUCCESS"),
        java.util.Collections.emptyList[String])
      ScaleDataGen.generate(spark, base, 2, out, Set("nation"))
      assert(java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(out, "_GEN_SUCCESS")).contains("nation"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
      ()
    }
  }
}
