package graft.tools

import org.apache.spark.sql.functions._

/** Decomposes q38 (`Dedup.minhashPairs`) at two SFs to attribute its
  * sf0.1→sf1 time exponent (0.82, the highest non-streaming one in the
  * paired bench) to a stage: shingle build, signature+band self-join
  * candidate generation, or exact-Jaccard rerank. Reports row volumes at
  * each stage — if candidates grow ~10× at 10× docs the work is linear
  * (healthy LSH: within-copy structure scales, cross-copy collisions are
  * random 64-bit equality) and the exponent just reflects CPU-bound work
  * outgrowing the fixed plan floor; superlinear candidate growth would be
  * a real banding defect.
  */
object MinhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    for (d <- dirs) {
      val docs = graft.Tables.documents(spark, d).select("doc_id", "text").cache()
      val nDocs = docs.count()

      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
      }
      // stage 1: shingles + signatures only
      val sh = docs.select(col("doc_id").as("id"),
        graft.text.TextFunctions.distinctWordNGrams(col("text"), 3).as("shingles"))
        .filter(size(col("shingles")) > 0)
      val (nShingle, tSig) = time {
        sh.select(posexplode_outer(
            graft.functions.MinHashSig(col("shingles"), 8, 42)))
          .filter(col("col").isNotNull).count()
      }
      // stage 2: full candidate generation (pre-rerank pair count)
      val shP = sh.persist()
      val sigs = shP.select(col("id"), posexplode_outer(
          graft.functions.MinHashSig(col("shingles"), 8, 42)))
        .select(col("id"), col("pos").as("t"), col("col").as("h"))
        .filter(col("h").isNotNull)
      val p = spark.sparkContext.defaultParallelism
      val sigsP = sigs.repartition(p, col("t"), col("h"))
      val (nCand, tCand) = time {
        sigsP.as("a").hint("shuffle_hash")
          .join(sigsP.as("b"),
            col("a.t") === col("b.t") && col("a.h") === col("b.h") &&
              col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b")).agg(lit(1))
          .count()
      }
      // stage 3: end-to-end (adds the rerank joins + IntersectCount)
      val (nPairs, tAll) = time {
        graft.dedup.Dedup.minhashPairs(docs, "text", "doc_id",
          n = 3, numHashTables = 8, minJaccard = 0.2).count()
      }
      println(f"[mhscale] $d%-24s docs=$nDocs%6d sigRows=$nShingle%8d " +
        f"cand=$nCand%7d pairs=$nPairs%6d | sig=$tSig%5.2f s " +
        f"candJoin=$tCand%5.2f s e2e=$tAll%5.2f s")
      shP.unpersist(); docs.unpersist()
    }
    spark.stop()
  }
}
