package graft.tools

import org.apache.spark.sql.functions._

/** Decompose cosinePairs' cost at one SF into its three shuffles —
  * signature+banding, candidate join+dedup, exact rerank — plus the
  * candidate count, so a decade-exponent regression can be attributed to
  * the stage that actually grew. Mirrors the q63 registered query's shape
  * (embeddings + every-20th planted twin).
  *
  * Usage: runMain graft.tools.SrpStageProbe <dir> [dir2 ...]
  */
object SrpStageProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_docs_sf1", "/tmp/graft_docs_sf10")
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sim.Similarity

    dirs.foreach { d =>
      val emb = graft.Tables.embeddings(spark, d)
      val planted = emb.unionByName(
        emb.filter(pmod(col("vec_id"), lit(20)) === 0)
          .withColumn("vec_id", col("vec_id") + 100000))
      planted.count() // warm footers

      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[srpstage] $d  $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      // full query first (the reference number)
      t("full") {
        Similarity.cosinePairs(planted, "embedding", "vec_id", 0.9).count()
      }
      // decomposition via the public pieces: rebuild the internal stages
      val vecs = graft.ops.Par.pinLatest("srpprobe.vecs",
        graft.ops.Par.fanOut(planted.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("_v"))))
      val n = t("vecs.count")(vecs.count())
      val dim = vecs.select(size(col("_v"))).head().getInt(0)
      val bands = 4
      val bits = Similarity.autoBandBits(n, bands)
      println(s"[srpstage] $d  n=$n dim=$dim bitsPerBand=$bits")
      val pairs = Similarity.cosinePairs(planted, "embedding", "vec_id",
        minCosine = -1.0) // keep every reranked candidate: counts candidates
      val nCand = t("candidates")(pairs.count())
      println(f"[srpstage] $d  candidates=$nCand (${nCand.toDouble / n}%.1f per vector)")
      // bucket skew: the indivisible unit of the band join is one
      // (band,key) bucket (m² pairs); Σm² per shuffle partition bounds
      // the slowest task. Rebuild the band keys exactly as cosinePairs
      // does and report the tail.
      val sigs = vecs.select(col("id"),
          posexplode_outer(Similarity.bandKeys(col("_v"), dim, bits, 42))
            .as(Seq("band", "key")))
        .select(col("band"), col("key"))
      val buckets = sigs.groupBy("band", "key").count()
        .select(col("band"), col("key"), col("count").as("m"))
        .persist()
      val top = buckets.orderBy(col("m").desc).limit(5)
        .collect().map(_.getLong(2))
      val pairsPerPart = buckets
        .withColumn("part", pmod(hash(col("band"), col("key")), lit(32)))
        .groupBy("part").agg(sum(col("m") * col("m")).as("m2"))
        .orderBy(col("m2").desc).limit(5).collect().map(_.getLong(1))
      println(s"[srpstage] $d  topBuckets=${top.toSeq} topPartitionPairSums=${pairsPerPart.toSeq}")
      buckets.unpersist()
      graft.ops.Par.unpin("srpprobe.vecs", vecs)
    }
    spark.stop()
  }
}
