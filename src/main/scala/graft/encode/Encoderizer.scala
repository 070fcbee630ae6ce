package graft.encode

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, HashingTF, NGram, RegexTokenizer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{functions, Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-inferring feature-union encoder (reference `Encoderizer`,
  * `encoder.py` + `_defaults.py`): probe each column, pick an encoder
  * per inferred kind, fit all encoders, transform to one assembled
  * feature vector. Width metadata supports `featureOrigin` (output index →
  * producing stage) and `extract` (sub-encoder by name), mirroring
  * `encoder.py:88-110, 209-230, 379-387`.
  *
  * Inference rules (`encoder.py:344-377`): all-null → drop; array →
  * multihot; map → key-expansion; castable-to-numeric → numeric UNLESS
  * distinct ratio < catThreshold (10%) → categorical one-hot; remaining
  * strings → hashed text n-grams ('small'/'medium'/'large' grids,
  * `_defaults.py:89-204`).
  *
  * Scale: inference is one stats pass (count/countDistinct per column);
  * numeric standardization is expression-only (codegen); categorical and
  * multihot vocabularies are freq-ordered groupBys; text hashing uses
  * Spark ML HashingTF (no vocab state at all) — nothing here collects row
  * data to the driver beyond vocabularies.
  */
object Encoderizer {

  final case class ColumnSpec(name: String, kind: String)

  final case class ColumnStats(name: String, nRows: Long, nNonNull: Long,
                               nDistinct: Long, numericCastable: Boolean) {
    def pctUnique: Double = if (nNonNull == 0) 0.0 else nDistinct.toDouble / nNonNull
  }

  def stats(df: DataFrame, cols: Seq[String]): Seq[ColumnStats] = {
    val aggs = cols.flatMap { c =>
      // try_cast, not cast: under ANSI mode a malformed string would throw
      // instead of yielding null.
      val base = df.schema(c).dataType match {
        // try_cast only exists for LEGAL casts: date/binary/struct/… to
        // double is an ANALYSIS error, not a runtime null — probe those
        // as non-numeric instead of crashing fit on any frame with e.g.
        // a date column. Timestamp→double IS legal (epoch seconds), so
        // timestamp columns keep probing numeric as they did before the
        // legal-cast restriction.
        case _: NumericType | StringType | BooleanType | TimestampType =>
          expr(s"try_cast(`$c` as double)")
        case _ => lit(null).cast("double")
      }
      Seq(
        count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        count(base).as(s"_num_$c"))
    }
    val row = df.agg(count(lit(1)).as("_n"), aggs: _*).head()
    val n = row.getAs[Long]("_n")
    cols.map { c =>
      val nn = row.getAs[Long](s"_nn_$c")
      ColumnStats(c, n, nn, row.getAs[Long](s"_nd_$c"),
        numericCastable = nn > 0 && row.getAs[Long](s"_num_$c") == nn)
    }
  }

  def inferSpec(df: DataFrame, s: ColumnStats, catThreshold: Double): ColumnSpec = {
    val kind = df.schema(s.name).dataType match {
      case _ if s.nNonNull == 0    => "drop"
      case _: MapType              => "map"
      case _: ArrayType            => "multihot"
      case _ if s.numericCastable && s.pctUnique >= catThreshold => "numeric"
      case _ if s.pctUnique < catThreshold                       => "categorical"
      case _                       => "text"
    }
    ColumnSpec(s.name, kind)
  }

  def inferSpecs(df: DataFrame, cols: Seq[String],
                 catThreshold: Double = 0.10): Seq[ColumnSpec] = {
    val st = stats(df, cols)
    st.map(inferSpec(df, _, catThreshold))
  }

  // ---- stages -------------------------------------------------------

  /** A fitted stage emits one `array<double>`/Vector column of fixed width. */
  trait FittedStage extends Serializable {
    def name: String
    def width: Int
    /** Adds `outCol` to df. */
    def transform(df: DataFrame, outCol: String): DataFrame
  }

  /** Numeric: median-impute + standardize, pure expressions (reference
    * `numeric_encoder`: SimpleImputer(median) + StandardScaler).
    */
  final case class NumericStage(name: String, median: Double, mean: Double,
                                std: Double) extends FittedStage {
    val width = 1
    def transform(df: DataFrame, outCol: String): DataFrame = {
      // try_cast, matching fit: under ANSI a malformed value imputes the
      // median (as the fit-side stats promised) instead of throwing.
      val v = coalesce(expr(s"try_cast(`$name` as double)"), lit(median))
      val scaled = if (std == 0.0) v - mean else (v - mean) / std
      df.withColumn(outCol, array(scaled))
    }
  }

  /** Categorical one-hot over a frequency-ordered vocabulary (StringIndexer
    * order: freq desc, value asc); unseen/null → all-zero row (the
    * reference's CountVectorizer-binary behavior, `_defaults.py:41-61`).
    */
  final case class OneHotStage(name: String, vocab: Seq[String]) extends FittedStage {
    val width = vocab.size
    // ONE fused hash-lookup expression, not width × CASE WHEN columns:
    // the composed form hits Janino's 64 KB cap past ~500 vocab entries,
    // silently drops the stage to interpreted evaluation, and then pays
    // O(vocab) per row — see graft.functions.VocabVector for numbers.
    def transform(df: DataFrame, outCol: String): DataFrame =
      df.withColumn(outCol,
        graft.functions.VocabVector(col(name).cast("string"), vocab))
  }

  /** Multi-hot over an array column with a frequency-ordered vocabulary
    * (reference `MultihotEncoder`; unseen labels silently ignored).
    */
  final case class MultihotStage(name: String, vocab: Seq[String]) extends FittedStage {
    val width = vocab.size
    // fused hash-lookup per member (null array → zero vector inside the
    // expression), replacing width × array_contains scans — O(members)
    // per row instead of O(vocab × members), and no 64 KB codegen cliff
    def transform(df: DataFrame, outCol: String): DataFrame =
      df.withColumn(outCol,
        graft.functions.VocabVector(col(name).cast("array<string>"), vocab))
  }

  /** Map/dict key-expansion (reference `dict_encoder` DictVectorizer):
    * one numeric output per fitted key, missing key → 0.
    */
  final case class MapStage(name: String, keys: Seq[String]) extends FittedStage {
    val width = keys.size
    // one pass over the row's OWN entries (each looked up in the fitted
    // key index), replacing width × element_at probes
    def transform(df: DataFrame, outCol: String): DataFrame =
      df.withColumn(outCol,
        graft.functions.VocabVector(col(name).cast("map<string,double>"), keys))
  }

  /** Hashed text n-grams (reference `HashingVectorizerChunked` + size
    * grids): word grams via tokenize + NGram + HashingTF, plus optional
    * character grams (`_defaults.py` char_wb analyzers of the medium/
    * large configs) via the TextFunctions shingle HOF. Stateless — no
    * vocabulary — which is exactly why it scales to 100 TB of text.
    */
  final case class TextHashStage(name: String, nGramRange: (Int, Int),
                                 numFeatures: Int,
                                 charNGramRange: Option[(Int, Int)] = None)
    extends FittedStage {
    private def wordSizes = nGramRange._2 - nGramRange._1 + 1
    private def charSizes = charNGramRange.map(r => r._2 - r._1 + 1).getOrElse(0)
    val width: Int = numFeatures * (wordSizes + charSizes)
    def transform(df: DataFrame, outCol: String): DataFrame = {
      // null-coalesce into a TEMP column: overwriting the user's column
      // would leak the mutation into the returned frame
      val txt = s"_txt_$name"
      val tok = new RegexTokenizer().setInputCol(txt).setOutputCol(s"_tok_$name")
        .setPattern("\\s+").setToLowercase(true)
      var out = tok.transform(df.withColumn(txt, coalesce(col(name), lit(""))))
      var tmpCols = Seq(txt, s"_tok_$name")
      val wordCols = (nGramRange._1 to nGramRange._2).map { g =>
        val gcol = s"_g${g}_$name"
        val hcol = s"_h${g}_$name"
        out =
          if (g == 1) out.withColumn(gcol, col(s"_tok_$name"))
          else new NGram().setN(g).setInputCol(s"_tok_$name").setOutputCol(gcol)
            .transform(out)
        out = new HashingTF().setInputCol(gcol).setOutputCol(hcol)
          .setNumFeatures(numFeatures).transform(out)
        tmpCols ++= Seq(gcol, hcol)
        hcol
      }
      val charCols = charNGramRange.toSeq.flatMap { case (lo, hi) =>
        (lo to hi).map { g =>
          val gcol = s"_cg${g}_$name"
          val hcol = s"_ch${g}_$name"
          out = out.withColumn(gcol,
            graft.text.TextFunctions.charNGrams(lower(col(txt)), g))
          out = new HashingTF().setInputCol(gcol).setOutputCol(hcol)
            .setNumFeatures(numFeatures).transform(out)
          tmpCols ++= Seq(gcol, hcol)
          hcol
        }
      }
      new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols((wordCols ++ charCols).toArray).setOutputCol(outCol)
        .transform(out)
        .drop(tmpCols: _*)
    }
  }

  // ---- fit ----------------------------------------------------------

  /** Size grids (reference `_defaults.py:89-204`): 'small' = word 1-2
    * grams; 'medium' adds char 3-4 grams; 'large' = word 1-3 + char 2-5
    * grams (the char_wb analyzers of the reference, hashed).
    */
  def textParams(size: String): ((Int, Int), Int, Option[(Int, Int)]) = size match {
    case "small"  => ((1, 2), 1 << 16, None)
    case "medium" => ((1, 2), 1 << 18, Some((3, 4)))
    case "large"  => ((1, 3), 1 << 20, Some((2, 5)))
    case other    => throw new IllegalArgumentException(s"unknown size: $other")
  }

  def fitStage(df: DataFrame, spec: ColumnSpec, size: String,
               maxVocab: Int = 1 << 16): Option[FittedStage] = spec.kind match {
    case "drop" => None
    case "numeric" =>
      // Backtick-quote the name (it may need quoting) and try_cast (an
      // overrides-forced numeric string column must yield null under ANSI,
      // not throw) — matching the stats() probe above.
      val numC = expr(s"try_cast(`${spec.name}` as double)")
      val r = df.agg(
        expr(s"percentile(try_cast(`${spec.name}` as double), 0.5)").as("med"),
        avg(numC).as("mean"),
        stddev_pop(numC).as("std")).head()
      val med = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      Some(NumericStage(spec.name, med,
        if (r.isNullAt(1)) 0.0 else r.getDouble(1),
        if (r.isNullAt(2)) 0.0 else r.getDouble(2)))
    case "categorical" =>
      val vocab = df.filter(col(spec.name).isNotNull)
        .groupBy(col(spec.name).cast("string").as("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("v").asc)
        .limit(maxVocab)
        .collect().map(_.getString(0)).toSeq
      Some(OneHotStage(spec.name, vocab))
    case "multihot" =>
      val vocab = df
        .select(explode(coalesce(col(spec.name).cast("array<string>"),
          array().cast("array<string>"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("v").asc)
        .limit(maxVocab)
        .collect().map(_.getString(0)).toSeq
      Some(MultihotStage(spec.name, vocab))
    case "map" =>
      val keys = df
        .select(explode(map_keys(col(spec.name))).as("k"))
        .distinct().orderBy("k")
        .limit(maxVocab)
        .collect().map(_.getString(0)).toSeq
      Some(MapStage(spec.name, keys))
    case "text" =>
      val (range, feats, charRange) = textParams(size)
      Some(TextHashStage(spec.name, range, feats, charRange))
    case other => throw new IllegalArgumentException(s"unknown kind: $other")
  }

  final case class EncoderizerModel(stages: Seq[FittedStage],
                                    featuresCol: String,
                                    weights: Map[String, Double] = Map.empty)
      extends Serializable {
    def width: Int = stages.map(_.width).sum
    private def offsets: Seq[(String, Int, Int)] = {
      val cum = stages.scanLeft(0)(_ + _.width)
      stages.zip(cum).map { case (s, off) => (s.name, off, off + s.width) }
    }
    /** Output feature index → producing stage name (`feature_origin`). */
    def featureOrigin(index: Int): String =
      offsets.find { case (_, lo, hi) => index >= lo && index < hi }
        .map(_._1)
        .getOrElse(throw new IndexOutOfBoundsException(s"$index >= $width"))
    /** Sub-encoder by stage names (`Encoderizer.extract`). */
    def extract(names: Seq[String]): EncoderizerModel =
      EncoderizerModel(stages.filter(s => names.contains(s.name)), featuresCol,
        weights.view.filterKeys(names.contains).toMap)

    // Sparse-aware vector scaling for `transformer_weights` on hashed-text
    // stages — never densifies the 2^18-wide vectors.
    private def scaleVec = udf((v: org.apache.spark.ml.linalg.Vector, w: Double) =>
      v match {
        case s: org.apache.spark.ml.linalg.SparseVector =>
          new org.apache.spark.ml.linalg.SparseVector(
            s.size, s.indices, s.values.map(_ * w))
        case d: org.apache.spark.ml.linalg.DenseVector =>
          new org.apache.spark.ml.linalg.DenseVector(d.values.map(_ * w))
      })

    def transform(df: DataFrame): DataFrame = {
      var out = df
      val outCols = stages.zipWithIndex.map { case (s, i) =>
        val c = s"_enc_$i"
        out = s.transform(out, c)
        // `transformer_weights` (reference `encoder.py:112`, FeatureUnion
        // semantics): scale the stage's whole output block.
        val w = weights.getOrElse(s.name, 1.0)
        out.schema(c).dataType match {
          case _: ArrayType if w == 1.0 => array_to_vector(col(c)).as(c)
          case _: ArrayType =>
            array_to_vector(functions.transform(col(c), e => e * w)).as(c)
          case _ if w == 1.0 => col(c).as(c)
          case _             => scaleVec(col(c), lit(w)).as(c)
        }
      }
      val withVecs = out.select((df.columns.map(col).toSeq ++ outCols): _*)
      new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(stages.indices.map(i => s"_enc_$i").toArray)
        .setOutputCol(featuresCol)
        .transform(withVecs)
        .drop(stages.indices.map(i => s"_enc_$i"): _*)
    }
  }

  def fit(df: DataFrame, cols: Seq[String], size: String = "small",
          catThreshold: Double = 0.10,
          overrides: Map[String, String] = Map.empty,
          featuresCol: String = "features",
          transformerWeights: Map[String, Double] = Map.empty): EncoderizerModel = {
    val specs = inferSpecs(df, cols, catThreshold)
      .map(s => overrides.get(s.name).map(k => s.copy(kind = k)).getOrElse(s))
    EncoderizerModel(specs.flatMap(fitStage(df, _, size)), featuresCol,
      transformerWeights)
  }
}
