package graft.tools

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Re-measures the ANN recall floors at a larger corpus (default: the
  * ScaleDataGen sf1 set, 20k vectors = 10 orthogonally-transformed copies
  * of the sf0.1 corpus). The AnnRecallSpec floors are corpus-dependent
  * constants calibrated at sf0.01 (500 vectors, 16 cells); at 40× the
  * rows, cell occupancy and band collision rates shift, so this probe
  * answers two questions the spec can't:
  *  - do the calibrated operating points still clear their floors?
  *  - what does the SCALED operating point (nClusters ≈ √n, nProbe =
  *    nClusters/2 — the standard IVF sizing) deliver at this n?
  *
  * Caveat recorded with the numbers: the synthesized corpus is 10 rotated
  * copies, so within-copy NN structure repeats exactly; cross-copy
  * vectors land at ~random cosine (measured — the orthogonal transforms
  * decorrelate), which is the intended "fresh data" regime for occupancy,
  * but true-NN pairs are 10 repeats of the base corpus's, not 10× fresh
  * draws.
  */
object AnnScaleRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").cache()
    val n = emb.count()
    println(s"[annscale] corpus: $sfDir rows=$n")

    // panel: first 20 ids of copy 0 plus first 20 of a transformed copy —
    // recall must hold for queries in every rotation, not just base
    val queries = emb.filter(col("vec_id") < 20 ||
      (col("vec_id") >= 30000000L && col("vec_id") < 30000020L))

    def ivfRecall(nClusters: Int, nProbe: Int, k: Int): Double = {
      val truth = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Similarity.ivfTopK(emb, queries, "embedding", "vec_id", k,
        nClusters = nClusters, nProbe = nProbe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }

    // calibrated operating point (the sf0.01 floor's config)
    val cal = ivfRecall(16, 8, 10)
    println(f"[annscale] IVF recall@10 nProbe=8/16 (calibrated pt): $cal%.3f  (sf0.01 floor 0.855)")
    // scaled operating point: √n cells, half probed
    val scaledClusters = math.max(16, math.sqrt(n.toDouble).toInt)
    val scaled = ivfRecall(scaledClusters, scaledClusters / 2, 10)
    println(f"[annscale] IVF recall@10 nProbe=${scaledClusters / 2}/$scaledClusters (scaled pt): $scaled%.3f")
    // tighter probe budget at scaled cells: the 100 TB operating curve
    val tight = ivfRecall(scaledClusters, math.max(1, scaledClusters / 8), 10)
    println(f"[annscale] IVF recall@10 nProbe=${math.max(1, scaledClusters / 8)}/$scaledClusters (tight): $tight%.3f")
    // the engine's AUTO default (cells = sqrt(n), probe fraction 1/16,
    // floor 3) — what a caller gets with no tuning at this corpus size
    val autoProbe = math.max(3, math.ceil(scaledClusters / 16.0).toInt)
    val auto = ivfRecall(scaledClusters, autoProbe, 10)
    println(f"[annscale] IVF recall@10 nProbe=$autoProbe/$scaledClusters (AUTO default): $auto%.3f")

    // SRP NN-pair recall at the spec's operating point. Truth = exact
    // top-1 pairs over the full corpus (canonicalized, dedup'd).
    val nnTruth = Similarity.bruteForceTopK(emb, emb, "embedding", "vec_id", 1)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }.toSet
    def srpRecall(planes: Int, bands: Int): Double = {
      val got = Similarity.cosinePairs(emb, "embedding", "vec_id",
        minCosine = 0.25, planes = planes, bands = bands)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & nnTruth).size.toDouble / nnTruth.size
    }
    val srp = srpRecall(16, 4)
    println(f"[annscale] SRP NN-pair recall (16 planes, 4 bands): $srp%.3f  (sf0.01 floor 0.38)")

    // cross-copy decorrelation check: max cosine between copy-0 and a
    // rotated copy's images of the SAME base vectors should sit at
    // random-pair level, not near 1 — proves the fairness claim above
    val a = emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = emb.filter(col("vec_id") >= 30000000L && col("vec_id") < 30000200L)
      .select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val maxCross = a.crossJoin(b)
      .select(Similarity.cosine(col("ea"), col("eb")).as("cos"))
      .agg(max(abs(col("cos")))).head().getDouble(0)
    println(f"[annscale] max |cos| copy0 x copy3 (200x200): $maxCross%.3f (random-level expected)")
    spark.stop()
  }
}
