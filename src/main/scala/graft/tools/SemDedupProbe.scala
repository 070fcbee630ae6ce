package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level timing for Similarity.semanticDedup at a given SF dir:
  * quantizer fit vs pair join vs components vs survivors. Throwaway
  * profiling aid (like StageProfile / AnnProbe).
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val e = graft.Tables.embeddings(spark, sfDir)
    val planted = e.unionByName(
      e.filter(col("vec_id") < 25).withColumn("vec_id", col("vec_id") + 100000))

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }

    def normalized(c: org.apache.spark.sql.Column) =
      transform(c, x => x / sqrt(aggregate(
        transform(c, y => y * y), lit(0.0), (a, v) => a + v)))

    val vecs = planted.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("_v"))
      .withColumn("_nv", array_to_vector(normalized(col("_v")))).persist()
    val n = t("count+cache")(vecs.count())
    val k = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val model = t("kmeans_fit")(new KMeans().setK(k).setSeed(42).setMaxIter(4)
      .setInitMode("random").setFeaturesCol("_nv").setPredictionCol("_cell")
      .fit(vecs))
    val assigned = model.transform(vecs).select(col("id"), col("_v"), col("_cell"))
    val p = spark.sparkContext.defaultParallelism
    val cellP = assigned.repartition(p, col("_cell"))
    val pairs = cellP.as("a").hint("shuffle_hash")
      .join(cellP.as("b"),
        col("a._cell") === col("b._cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.sim.Similarity.cosine(col("a._v"), col("b._v")).as("cos"))
      .filter(col("cos") >= 0.9).select("id_a", "id_b").persist()
    println(s"pairs=${t("pair_join")(pairs.count())}")
    val comp = t("components")(graft.dedup.Dedup.components(pairs))
    t("survivors_agg") {
      val removed = comp.filter(col("id") =!= col("comp"))
        .select(col("id").as("vec_id"))
      planted.join(removed, Seq("vec_id"), "left_anti")
        .groupBy("label").agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
