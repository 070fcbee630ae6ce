package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** Natural-corpus recall gates for the ANN family (IVF, SRP, the shared
  * spherical quantizer SemDeDup rides). The planted-copy oracles prove
  * STRUCTURE (identical vectors collide whatever the quantizer); these
  * gates pin RECALL on the driver-generated sf0.01 embeddings — a fixed,
  * near-uniform 500x64 corpus (max pairwise cos 0.51, per-vector exact-NN
  * cos 0.27-0.51) — so a quantizer/banding regression that the structural
  * oracles can't see (bad normalization, broken band masks, drifted
  * centroid metric) fails a floor here. Each gate also runs a
  * deliberately degraded configuration and asserts it lands BELOW the
  * floor: proof the metric moves when the quantizer breaks.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val emb: DataFrame =
    Tables.embeddings(spark, sfDir).select("vec_id", "embedding").cache()

  /** Exact-NN truth pairs: every vector's top-1 cosine neighbor,
    * canonicalized (a < b) and dedup'd (mutual NNs collapse to one).
    */
  private lazy val nnTruth: Set[(Long, Long)] =
    Similarity.bruteForceTopK(emb, emb, "embedding", "vec_id", 1)
      .select(col("query_id"), col("neighbor_id"))
      .collect()
      .map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }.toSet

  private def ivfRecall(nClusters: Int, nProbe: Int, k: Int,
                        panel: Int = 20): Double = {
    val queries = emb.filter(col("vec_id") < panel)
    val truth = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfTopK(emb, queries, "embedding", "vec_id", k,
      nClusters = nClusters, nProbe = nProbe)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (got & truth).size.toDouble / truth.size
  }

  // Floors are set at mean − 3σ of the metric across 5 quantizer/plane
  // seeds (AnnSeedVarianceProbe, round 6 — numbers in NOTES.md): a
  // regression has to clear three standard deviations of seed luck to
  // slip past, and a merely-mediocre quantizer no longer fits under a
  // slack floor.
  test("IVF recall floor on the natural corpus (and the gate has teeth)") {
    val r = ivfRecall(nClusters = 16, nProbe = 8, k = 10)
    info(f"IVF recall@10 nProbe=8/16 cells: $r%.3f")
    // 5-seed measurement: mean 0.890, σ 0.011 → floor 0.855
    assert(r >= 0.855, f"IVF natural recall regressed: $r%.3f < 0.855")
    // degraded operating point: 1 of 64 cells probed — must sit clearly
    // below the floor, or this gate could never catch a regression
    val broken = ivfRecall(nClusters = 64, nProbe = 1, k = 10)
    info(f"IVF recall@10 nProbe=1/64 cells: $broken%.3f")
    assert(broken < 0.855, f"degraded config scored $broken%.3f — gate is blunt")
  }

  test("SRP pair recall floor at the corpus's NN operating point") {
    // truth: exact-NN pairs, all with cos >= 0.25 on this corpus; SRP at
    // the default operating point (16 planes, 4 bands) must recover a
    // stable fraction of them through band collisions + exact rerank
    def srpRecall(planes: Int, bands: Int): Double = {
      val got = Similarity.cosinePairs(emb, "embedding", "vec_id",
        minCosine = 0.25, planes = planes, bands = bands)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & nnTruth).size.toDouble / nnTruth.size
    }
    val r = srpRecall(planes = 16, bands = 4)
    info(f"SRP NN-pair recall (16 planes, 4 bands): $r%.3f")
    // 5-seed measurement: mean 0.447, σ 0.022 → floor 0.38
    assert(r >= 0.38, f"SRP natural NN recall regressed: $r%.3f < 0.38")
    // broken banding: one 64-bit band — collision probability collapses
    // for non-identical vectors, so recall must crater
    val broken = srpRecall(planes = 64, bands = 1)
    info(f"SRP NN-pair recall (64-bit single band): $broken%.3f")
    assert(broken < 0.38, f"degraded banding scored $broken%.3f — gate is blunt")
  }

  test("spherical-quantizer cell recall at SemDeDup's auto-k operating point") {
    // SemDeDup compares within-cell pairs only, and shares ONE quantizer
    // configuration with ivfTopK (fitSphericalKMeans) — so P(exact NN in
    // the probed cell) at auto-k ~ sqrt(n) ~ 22 cells IS the cell recall
    // that bounds SemDeDup's natural-pair recall. nProbe=1 isolates the
    // assignment quality; a few extra probes must recover most of the
    // remainder (quantizer health, not luck).
    // 200-query panel: the earlier 20-query panel had 0.05 recall
    // granularity, so seed σ was panel noise (σ 0.097), not quantizer
    // noise — floors on it were either slack or flaky. At 200 queries the
    // 5-seed spread tightens to σ 0.034 (np1) / 0.062 (np4).
    val r1 = ivfRecall(nClusters = 22, nProbe = 1, k = 1, panel = 200)
    val r4 = ivfRecall(nClusters = 22, nProbe = 4, k = 1, panel = 200)
    info(f"NN cell recall @22 cells (200q): nProbe=1 $r1%.3f, nProbe=4 $r4%.3f")
    // 5-seed measurement: np1 mean 0.302 σ 0.034 → floor 0.20;
    //                     np4 mean 0.657 σ 0.062 → floor 0.47
    assert(r1 >= 0.20, f"cell-assignment recall regressed: $r1%.3f < 0.20")
    assert(r4 >= 0.47, f"multi-probe recall regressed: $r4%.3f < 0.47")
    assert(r4 > r1, "probing more cells must not lose neighbors")
  }
}
