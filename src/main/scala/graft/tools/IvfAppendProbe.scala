package graft.tools

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Append-vs-rebuild cost for the on-disk IVF index: build over N
  * vectors, then (a) append a 10% batch via appendToIvfIndex and (b)
  * rebuild the full index from scratch — the number that justifies the
  * incremental path for a growing corpus. Also re-checks that a probe
  * against the appended index finds a planted twin from the appended
  * batch (the assignment metric really matches the probe metric).
  *
  * Usage: runMain graft.tools.IvfAppendProbe [n] [dim]
  */
object IvfAppendProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.range(0, n).select(col("id").as("vec_id"),
      array((0 until dim).map(d =>
        sin(col("id") * (d * 37 + 13) + d).cast("double")): _*).as("embedding"))
      .cache()
    base.count()
    val batch = spark.range(n, n + n / 10).select(col("id").as("vec_id"),
      array((0 until dim).map(d =>
        sin(col("id") * (d * 37 + 13) + d).cast("double")): _*).as("embedding"))
      .cache()
    batch.count()

    val dir = java.nio.file.Files.createTempDirectory("ivf_append_probe").toString
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfappend] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    t("build")(Similarity.writeIvfIndex(base, "embedding", "vec_id", dir))
    val stats = t("append 10%")(
      Similarity.appendToIvfIndex(batch, "embedding", "vec_id", dir))
    println(s"[ivfappend] stats=$stats")
    // planted-twin probe from the APPENDED batch
    val q = batch.limit(1).select("embedding").head().getSeq[Double](0)
    val top = Similarity.probeIvfIndex(spark, dir, q, k = 1)
      .head()
    println(s"[ivfappend] appended-twin top1 id=${top.getLong(0)} cos=${top.getDouble(1)}")
    t("rebuild (union)")(
      Similarity.writeIvfIndex(base.unionByName(batch), "embedding", "vec_id",
        s"${dir}_rebuilt"))
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
    new Directory(new java.io.File(s"${dir}_rebuilt")).deleteRecursively()
    spark.stop()
  }
}
