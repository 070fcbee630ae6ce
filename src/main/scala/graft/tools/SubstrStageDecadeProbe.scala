package graft.tools

import org.apache.spark.sql.functions._

/** Stage decomposition of q83 (`SubstringDedup.duplicateSpans`) across
  * the Decade3Probe dirs — names the super-linear stage when the
  * composite exponent drifts above 1.0. For each dir it measures the
  * three data laws (anchor volume, candidate-pair volume Σ C(df,2) via
  * the df histogram, grouped-pair count + seed skew) and times the
  * anchor scan, the index self-join, and the full operator, so a
  * super-linear composite splits into "which volume grew" vs "which
  * stage's constant blew up" (shuffle spill, text join, extension).
  *
  * Usage: runMain graft.tools.SubstrStageDecadeProbe [dir ...]
  * (defaults to the Decade3Probe dirs /tmp/graft_docs_sf{10,100})
  */
object SubstrStageDecadeProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_docs_sf10", "/tmp/graft_docs_sf100")
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val (minLen, k) = (50, 16)
    val w = minLen - k + 1

    dirs.foreach { d =>
      val texts = graft.Tables.documents(spark, d)
        .select(col("doc_id").cast("long").as("doc"), col("text"))
        .filter(length(col("text")) >= minLen)
      var t0 = System.nanoTime()
      val an = texts.select(col("doc"),
          explode(graft.functions.WinnowAnchors(col("text"), k, w,
            graft.dedup.SubstringDedup.DefaultMaxPosPerHash)).as("a"))
        .select(col("doc"), col("a.pos").as("pos"), col("a.hash").as("h"))
      val nAnchors = an.count()
      val tAnchors = (System.nanoTime() - t0) / 1e9
      // df histogram over DISTINCT (doc, hash): candidate pairs between
      // distinct docs are Σ C(df,2) on doc-level df; within-doc
      // multiplicity multiplies seeds, not pairs
      t0 = System.nanoTime()
      val df = an.select("doc", "h").distinct()
        .groupBy("h").agg(count(lit(1)).as("df"))
      val stats = df.agg(max(col("df")).as("maxDf"),
        sum(col("df") * (col("df") - 1) / 2).as("candPairs"),
        count(lit(1)).as("hashes")).head()
      val tDf = (System.nanoTime() - t0) / 1e9
      // the top viral anchors, to see WHAT they are
      val viral = df.orderBy(col("df").desc).limit(5)
        .collect().map(r => r.getLong(1)).toSeq
      t0 = System.nanoTime()
      val pairs = an.as("a").hint("shuffle_hash")
        .join(an.as("b"),
          col("a.h") === col("b.h") && col("a.doc") < col("b.doc"))
        .groupBy(col("a.doc"), col("b.doc"))
        .agg(count(lit(1)).as("seeds"))
      val pStats = pairs.agg(count(lit(1)).as("nPairs"),
        max(col("seeds")).as("maxSeeds"),
        sum(col("seeds")).as("totSeeds")).head()
      val tPairs = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val spans = graft.dedup.SubstringDedup
        .duplicateSpans(texts, "text", "doc", minLen, k).count()
      val tFull = (System.nanoTime() - t0) / 1e9
      println(f"[sstage] $d")
      println(f"[sstage]   anchors=$nAnchors (${tAnchors}%.1f s)  " +
        f"hashes=${stats.getLong(2)}  maxDf=${stats.getLong(0)}  " +
        f"candPairs=${stats.getAs[Any](1)} (${tDf}%.1f s)  top5df=$viral")
      println(f"[sstage]   pairRows=${pStats.getLong(0)}  " +
        f"maxSeeds=${pStats.getLong(1)}  totSeeds=${pStats.getLong(2)}  " +
        f"(${tPairs}%.1f s)")
      println(f"[sstage]   spans=$spans  full=${tFull}%.1f s")
    }
    spark.stop()
  }
}
