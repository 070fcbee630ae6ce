package graft.tools

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Times IVF top-k and SRP cosine pairs on the sf0.1 embeddings. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    println(s"embeddings rows = ${emb.count()}")
    def timed(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"ANN $name%-28s ${ts.map(_._1).min}%8.3f s  rows=${ts.head._2}")
    }
    timed("ivf_k5_q20") {
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
        "embedding", "vec_id", 5).count()
    }
    for (planes <- Seq(16, 24, 32)) {
      timed(s"srp_pairs_p$planes") {
        Similarity.cosinePairs(emb, "embedding", "vec_id",
          minCosine = 0.95, planes = planes).count()
      }
    }

    // Synthetic vector-scale probe: N gaussian vectors + 1% planted
    // near-dups (tiny perturbation -> cos ~0.999); SRP pair recall and
    // runtime at two orders of magnitude beyond the testdata.
    val n = args.lift(1).map(_.toInt).getOrElse(100000)
    val dim = 64
    import org.apache.spark.sql.DataFrame
    def gauss(idCol: org.apache.spark.sql.Column, salt: Int) = {
      // deterministic pseudo-gaussian per (id, dim-index): sum of 4
      // xxhash-derived uniforms (Irwin-Hall), codegen'd
      array((0 until dim).map { j =>
        ((0 until 4).map(r =>
          pmod(xxhash64(idCol, lit(j * 4 + r + salt)), lit(10000)) / 10000.0)
          .reduce(_ + _) - lit(2.0)).cast("double")
      }: _*)
    }
    val base = spark.range(n.toLong).select(col("id"), gauss(col("id"), 0).as("v"))
    val dups = spark.range(n.toLong / 100).select(
      (col("id") + n).as("id"),
      zip_with(gauss(col("id"), 0),
        gauss(col("id") + n, 7), (x, e) => x + e * 0.01).as("v"))
    val corpus = base.union(dups)
    timed(s"srp_pairs_${n}v") {
      // planes scales with corpus: bits-per-band sets bucket density, and
      // candidate volume is sum(bucket^2) — 8-bit bands (planes=32) keep
      // ~n/256 per bucket where 6-bit bands produced ~320M candidate
      // pairs at 100k vectors and exhausted local shuffle disk.
      val pairs = Similarity.cosinePairs(corpus, "v", "id",
        minCosine = 0.98, planes = 32)
      val found = pairs
        .filter(col("id_b") === col("id_a") + n).count()
      println(s"ANN planted recall = $found / ${n / 100}")
      pairs.count()
    }
    spark.stop()
  }
}
