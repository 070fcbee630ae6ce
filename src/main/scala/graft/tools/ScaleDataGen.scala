package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an sf1-scale testdata set (default 10× sf0.1) so the bench
  * can measure one more order of magnitude than the driver provides.
  *
  * Fairness model (the same one SubstringScaleProbe established): a naive
  * k-fold concatenation is UNFAIR for any pair-based operator — every row
  * gains k−1 verbatim clones and the probe measures duplication density,
  * not scale. Each copy therefore gets:
  *  - **key offsets** (copy × 10M on every entity/foreign key, applied
  *    consistently on both sides of each join) — join fan-out per entity
  *    stays exactly sf0.1's, which matches TPC-H's own scaling law
  *    (more entities, constant per-entity fan-out). Absolute-constant
  *    filters (e.g. `l_suppkey <= 5`) keep selecting copy-0's entities:
  *    matched work stays constant while scan volume grows 10× — also
  *    what the real generator would produce.
  *  - **documents**: copy-specific alphabet-rotation substitution cipher
  *    (length-preserving bijection) so cross-copy substring/shingle/
  *    simhash collisions stay at random-noise level; within-copy spans
  *    are preserved exactly → true duplicate structure scales ×k.
  *  - **embeddings**: copy-specific deterministic orthogonal transform
  *    (dimension permutation + sign flips, seeded by copy index) —
  *    within-copy geometry (norms, dot products, neighbor sets) is
  *    EXACT, cross-copy similarities drop to ~random, so top-k work
  *    scales like fresh data instead of k−1 exact duplicates per vector.
  *  - **region/nation copied as-is** (fixed 5/25-row dimensions at every
  *    SF, per TPC-H), and low-cardinality categoricals (brands, types,
  *    segments, langs) keep their values — their cardinality is
  *    SF-invariant in the real generator too.
  *
  * Known approximations (timing probe, not a correctness surface):
  * high-cardinality name strings repeat across copies (distinct-name
  * counts read k× low) and embeddings' label mix repeats per copy.
  *
  * Usage: runMain graft.tools.ScaleDataGen [baseDir] [factor] [outDir]
  */
object ScaleDataGen {
  private val Offset = 10000000L

  private val az =
    "abcdefghijklmnopqrstuvwxyz" + "ABCDEFGHIJKLMNOPQRSTUVWXYZ" + "0123456789"
  private def rot(s: String, c: Int) = s.drop(c % s.length) + s.take(c % s.length)
  /** Copy-specific substitution cipher alphabet (identity for copy 0).
    * ROTATION cipher — only valid for factors <= 10: rotations repeat mod
    * 26 on letters and mod 10 on digits, so e.g. copies 0 and 26 would be
    * VERBATIM-identical and every pair operator would measure duplication,
    * not scale. Kept for the fixed-single-copy uses (SubstringScaleProbe,
    * DecontaminationScaleProbe); `generate` uses [[cipherPerm]].
    */
  def cipherTo(c: Int): String =
    rot(az.take(26), c) + rot(az.slice(26, 52), c) + rot(az.drop(52), c)

  /** Seeded random permutation cipher (identity for copy 0): shuffles each
    * character class independently, so case/digit structure is preserved
    * but any two distinct copies differ in (62!-ish) ways — no repeat
    * period, safe at any factor.
    */
  def cipherPerm(c: Int): String =
    if (c == 0) az
    else {
      val rnd = new scala.util.Random(0x5eed + c.toLong * 104729L)
      def sh(s: String) = rnd.shuffle(s.toVector).mkString
      sh(az.take(26)) + sh(az.slice(26, 52)) + sh(az.drop(52))
    }

  /** k-fold union with per-copy transform. */
  private def fanOut(df: DataFrame, k: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(c => f(df, c)).reduce(_ unionAll _)

  private def offsetKeys(df: DataFrame, c: Int, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((acc, key) =>
      acc.withColumn(key, col(key) + lit(c * Offset)))

  /** Deterministic per-copy orthogonal transform of a float-array column:
    * permute dimensions then flip signs, both seeded by the copy index.
    * Copy 0 is the identity (the base data itself stays byte-identical).
    */
  private def orthoTransform(df: DataFrame, c: Int, colName: String, dim: Int): DataFrame = {
    if (c == 0) df else {
      val rnd = new scala.util.Random(c * 7919L)
      val perm = rnd.shuffle((0 until dim).toVector)
      val sign = Vector.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
      val permuted = array(perm.indices.map(i =>
        (col(colName).getItem(perm(i)) * lit(sign(i))).cast("float")): _*)
      df.withColumn(colName, permuted)
    }
  }

  private[tools] val AllTables = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def generate(spark: SparkSession, base: String, factor: Int, out: String,
               only: Set[String] = Set.empty): Unit = {
    import scala.jdk.CollectionConverters._
    val done = java.nio.file.Paths.get(out, "_GEN_SUCCESS")
    // The marker records WHICH tables were generated (one name per line),
    // not a bare "done": a subset run (`only`) followed by a fuller
    // request must generate the missing tables instead of returning
    // 'cached' with tables absent. A legacy empty marker records nothing
    // and triggers a full regenerate.
    val already: Set[String] =
      if (java.nio.file.Files.exists(done))
        java.nio.file.Files.readAllLines(done).asScala
          .map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val requested = if (only.isEmpty) AllTables.toSet else only
    if (requested.subsetOf(already)) { println(s"[sfgen] cached: $out"); return }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    def wanted(name: String): Boolean = requested(name) && !already(name)

    def write(name: String, df: => DataFrame, parts: Int = 32): Unit =
      if (wanted(name)) {
        df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[sfgen] wrote $name")
      }

    /** Streaming sources select files with `pathGlobFilter=<name>.parquet`,
      * which matches LEAF FILE names — a part-file directory named
      * `<name>.parquet` matches nothing and the stream sees zero files
      * (q65/q66/q81 failed to infer, q87 silently streamed nothing on the
      * first directory-layout attempt). Tables consumed by streams must
      * therefore mirror the driver's FLAT-FILE layout exactly: write a
      * single part, then move it to `$out/$name.parquet` as a plain file.
      */
    def writeFlat(name: String, df: => DataFrame): Unit = if (wanted(name)) {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val tmp = s"$out/_tmp_$name"
      // small row groups (8 MB vs the 128 MB default): coalesce(1)'s
      // single writer otherwise produces ONE row group per ~128 MB, and
      // parquet scans cannot split within a row group — every scan-stage
      // projection then runs on 1-2 tasks no matter the split count
      // (measured: q15's 10M-row JSON extract pinned to 2 cores, 49.5 s).
      // A real 100 TB corpus is thousands of files; small row groups
      // give the flat single-file layout (which the streaming globs
      // require) the same scan parallelism.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (8L << 20).toString)
        .parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      Files.move(part, Paths.get(s"$out/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      println(s"[sfgen] wrote $name (flat)")
    }

    // fixed dimensions: SF-invariant in TPC-H
    write("region", graft.Tables.region(spark, base), 1)
    write("nation", graft.Tables.nation(spark, base), 1)

    write("customer", fanOut(graft.Tables.customer(spark, base), factor)(
      (df, c) => offsetKeys(df, c, Seq("c_custkey"))), 4)
    write("supplier", fanOut(graft.Tables.supplier(spark, base), factor)(
      (df, c) => offsetKeys(df, c, Seq("s_suppkey"))), 1)
    write("part", fanOut(graft.Tables.part(spark, base), factor)(
      (df, c) => offsetKeys(df, c, Seq("p_partkey"))), 4)
    write("orders", fanOut(graft.Tables.orders(spark, base), factor)(
      (df, c) => offsetKeys(df, c, Seq("o_orderkey", "o_custkey"))), 8)
    write("lineitem", fanOut(graft.Tables.lineitem(spark, base), factor)(
      (df, c) => offsetKeys(df, c, Seq("l_orderkey", "l_partkey", "l_suppkey"))), 32)

    // events: the loader normalizes ts to TimestampType; write it back as
    // NTZ micros (what the driver's layout stores) so the generated dir
    // round-trips through Tables.load exactly like real testdata
    writeFlat("events", {
      val ev = graft.Tables.events(spark, base)
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      fanOut(ev, factor)((df, c) => offsetKeys(df, c, Seq("event_id", "user_id")))
    })

    writeFlat("documents", fanOut(
      graft.Tables.documents(spark, base), factor) { (df, c) =>
      val d = offsetKeys(df, c, Seq("doc_id"))
      if (c == 0) d
      else d.withColumn("text", translate(col("text"), az, cipherPerm(c)))
    })

    if (wanted("embeddings")) {
      val emb = graft.Tables.embeddings(spark, base)
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      write("embeddings", fanOut(emb, factor)((df, c) =>
        orthoTransform(offsetKeys(df, c, Seq("vec_id")), c, "embedding", dim)), 8)
    }

    java.nio.file.Files.write(done,
      (already ++ requested).toSeq.sorted.asJava)
    println(s"[sfgen] done: $out (${factor}x $base, " +
      s"tables=${requested.toSeq.sorted.mkString(",")})")
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val out = args.lift(2).getOrElse(
      "/tmp/graft_sfgen_" + factor + "x_" + base.replaceAll("[^A-Za-z0-9.]", "_"))
    // optional 4th arg: comma-separated table subset (e.g. "documents,embeddings")
    val only = args.lift(3).map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, factor, out, only)
    spark.stop()
  }
}
