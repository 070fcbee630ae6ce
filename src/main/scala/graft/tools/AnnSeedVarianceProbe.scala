package graft.tools

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Round-6 probe: run-to-run (seed-to-seed) variance of the ANN recall
  * metrics the AnnRecallSpec gates, on the same fixed sf0.01 embeddings
  * corpus the spec uses. Five quantizer/plane seeds per metric; prints
  * mean, population σ, min, and the mean − 3σ floor the spec should pin
  * (recorded in NOTES.md). The corpus and the truth sets are fixed — the
  * ONLY randomness is the quantizer init / SRP plane draw, which is
  * exactly what the floors are meant to bound.
  */
object AnnSeedVarianceProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select("vec_id", "embedding").cache()
    emb.count()

    val nnTruth: Set[(Long, Long)] =
      Similarity.bruteForceTopK(emb, emb, "embedding", "vec_id", 1)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          (math.min(a, b), math.max(a, b))
        }.toSet

    def ivfRecall(nClusters: Int, nProbe: Int, k: Int, seed: Long,
                  panel: Int = 20): Double = {
      val queries = emb.filter(col("vec_id") < panel)
      val truth =
        Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Similarity.ivfTopK(emb, queries, "embedding", "vec_id", k,
        nClusters = nClusters, nProbe = nProbe, seed = seed)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }

    def srpRecall(planes: Int, bands: Int, seed: Long): Double = {
      val got = Similarity.cosinePairs(emb, "embedding", "vec_id",
        minCosine = 0.25, planes = planes, seed = seed, bands = bands)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & nnTruth).size.toDouble / nnTruth.size
    }

    val seeds = Seq(1L, 42L, 101L, 777L, 9001L)
    def report(name: String)(f: Long => Double): Unit = {
      val xs = seeds.map(f)
      val mean = xs.sum / xs.size
      val sd = math.sqrt(xs.map(v => (v - mean) * (v - mean)).sum / xs.size)
      println(f"[annvar] $name%-28s mean $mean%.3f sd $sd%.3f min ${xs.min}%.3f " +
        f"floor(mean-3sd) ${mean - 3 * sd}%.3f  all ${xs.map(v => f"$v%.3f").mkString(",")}")
    }

    report("ivf_recall@10_np8/16")(s => ivfRecall(16, 8, 10, s))
    report("srp_nn_recall_16p4b")(s => srpRecall(16, 4, s))
    // 20-query panel: 0.05 recall granularity — σ is panel noise, not
    // quantizer noise. The 200-query panel is what the spec should gate.
    report("cell_recall@22_np1_p20")(s => ivfRecall(22, 1, 1, s))
    report("cell_recall@22_np4_p20")(s => ivfRecall(22, 4, 1, s))
    report("cell_recall@22_np1_p200")(s => ivfRecall(22, 1, 1, s, panel = 200))
    report("cell_recall@22_np4_p200")(s => ivfRecall(22, 4, 1, s, panel = 200))
    spark.stop()
  }
}
