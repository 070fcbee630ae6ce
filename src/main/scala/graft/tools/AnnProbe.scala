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
    spark.stop()
  }
}
