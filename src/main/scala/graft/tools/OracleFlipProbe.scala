package graft.tools

import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.sim.Similarity

/** Probe behind the q62/q63 rows-only decision (round 4): IVF-vs-exact
  * overlap per nProbe, and SRP-vs-exhaustive equality per sf. Outcome:
  * neither equality is structural on the real embeddings (SRP per-pair
  * recall at cosine≈0.5 is probabilistic; IVF recall depends on cell
  * geometry), so their oracles stay rows-only — flipping them would pin
  * the gate on a coincidence, not a guarantee.
  */
object OracleFlipProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[16]", 16)
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf)
      val exact = SparkEntry.queries("q40_knn_exact")(spark, sf)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (nProbe <- Seq(3, 5, 8)) {
        val ivf = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
          "embedding", "vec_id", 5, nProbe = nProbe, maxIter = 5)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"$sf nProbe=$nProbe recall=${(exact & ivf).size.toDouble / exact.size}%.3f")
      }

      val ex = emb.select(col("vec_id").as("id_a"), col("embedding").cast("array<double>").as("_va"))
        .crossJoin(emb.select(col("vec_id").as("id_b"), col("embedding").cast("array<double>").as("_vb")))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.cosine(col("_va"), col("_vb")), 6).as("cos"))
        .filter(col("cos") >= 0.5)
        .collect().map(_.toSeq).toSet
      val srp = SparkEntry.queries("q63_srp_pairs")(spark, sf)
        .collect().map(_.toSeq).toSet
      println(s"$sf q63 recall=${(ex & srp).size}/${ex.size} spurious=${(srp -- ex).size}")
    }
    spark.stop()
  }
}
