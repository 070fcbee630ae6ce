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

  /** Column ref that survives DOTTED names: `col("a.b")` parses as
    * nested-field access and fails to resolve a literal column named
    * "a.b"; backticks make it a literal identifier. The expr() paths
    * already quote — every col() site must match.
    */
  private def qcol(n: String): Column = col(s"`${n.replace("`", "``")}`")

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
        count(qcol(c)).as(s"_nn_$c"),
        countDistinct(qcol(c)).as(s"_nd_$c"),
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
        graft.functions.VocabVector(qcol(name).cast("string"), vocab))
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
        graft.functions.VocabVector(qcol(name).cast("array<string>"), vocab))
  }

  /** Map/dict key-expansion (reference `dict_encoder` DictVectorizer):
    * one numeric output per fitted key, missing key → 0.
    */
  final case class MapStage(name: String, keys: Seq[String]) extends FittedStage {
    val width = keys.size
    // one pass over the row's OWN entries (each looked up in the fitted
    // key index), replacing width × element_at probes. try_cast, not
    // cast: a map<string,string> column (inference matches ANY MapType)
    // with a non-numeric value would otherwise THROW under ANSI at
    // transform time — try_cast nulls the bad entry and VocabVector
    // skips null values, the same malformed-value discipline as the
    // numeric stage.
    def transform(df: DataFrame, outCol: String): DataFrame =
      df.withColumn(outCol, graft.functions.VocabVector(
        expr(s"try_cast(`${name.replace("`", "``")}` as map<string,double>)"),
        keys))
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
      // temp-name suffix: bump until no fixed temp name collides with a
      // user column — a frame already holding e.g. "_txt_text" would
      // otherwise have that column silently overwritten and then dropped
      val sfx = Iterator.from(0)
        .map(i => if (i == 0) name else s"${name}_x$i")
        .find { cand =>
          val prefixes = Seq("_txt_", "_tok_", "_g", "_h", "_cg", "_ch")
          !df.columns.exists(c => prefixes.exists(p =>
            c.startsWith(p) && c.endsWith(cand)))
        }.get
      // null-coalesce AND cast to string into a TEMP column: overwriting
      // the user's column would leak the mutation into the returned
      // frame, and the cast makes the text stage total over ANY input
      // type — inference's fallback can route a high-cardinality date/
      // binary column here, and RegexTokenizer rejects non-string input
      val txt = s"_txt_$sfx"
      val tok = new RegexTokenizer().setInputCol(txt).setOutputCol(s"_tok_$sfx")
        .setPattern("\\s+").setToLowercase(true)
      var out = tok.transform(df.withColumn(txt,
        coalesce(qcol(name).cast("string"), lit(""))))
      var tmpCols = Seq(txt, s"_tok_$sfx")
      val wordCols = (nGramRange._1 to nGramRange._2).map { g =>
        val gcol = s"_g${g}_$sfx"
        val hcol = s"_h${g}_$sfx"
        out =
          if (g == 1) out.withColumn(gcol, col(s"_tok_$sfx"))
          else new NGram().setN(g).setInputCol(s"_tok_$sfx").setOutputCol(gcol)
            .transform(out)
        out = new HashingTF().setInputCol(gcol).setOutputCol(hcol)
          .setNumFeatures(numFeatures).transform(out)
        tmpCols ++= Seq(gcol, hcol)
        hcol
      }
      val charCols = charNGramRange.toSeq.flatMap { case (lo, hi) =>
        (lo to hi).map { g =>
          val gcol = s"_cg${g}_$sfx"
          val hcol = s"_ch${g}_$sfx"
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

  /** All requested numeric stages from ONE full-scan aggregation — a
    * frame with 50 numeric columns previously paid 50 separate scans on
    * top of the stats() pass.
    *
    * Backtick-quoted names and try_cast throughout (an overrides-forced
    * numeric string column must yield null under ANSI, not throw),
    * matching the stats() probe. NOTE on percentile: EXACT, by choice —
    * it is the reference's SimpleImputer(median) semantics and what the
    * q43 oracle pins; its aggregation buffers the column's values, so at
    * a scale where that matters swap to percentile_approx KNOWINGLY
    * (imputation tolerates an approximate median — exact is parity, not
    * necessity).
    *
    * The reference pipeline is SimpleImputer(median) THEN
    * StandardScaler: the scaler fits on the median-IMPUTED column, so
    * with nulls present the moments include the imputed entries via a
    * closed-form correction (no second pass); the null-free branch keeps
    * the aggregate values bit-identical.
    */
  private def fitNumericStages(df: DataFrame,
                               names: Seq[String]): Map[String, NumericStage] =
    if (names.isEmpty) Map.empty
    else {
      val aggs = names.flatMap { c =>
        val q = c.replace("`", "``")
        val numC = expr(s"try_cast(`$q` as double)")
        Seq(
          expr(s"percentile(try_cast(`$q` as double), 0.5)").as(s"_med_$c"),
          avg(numC).as(s"_mean_$c"),
          stddev_pop(numC).as(s"_std_$c"),
          count(numC).as(s"_nnn_$c"))
      } :+ count(lit(1)).as("_n")
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getAs[Long]("_n")
      names.map { c =>
        def d(field: String): Double = {
          val i = r.fieldIndex(field)
          if (r.isNullAt(i)) 0.0 else r.getDouble(i)
        }
        val med = d(s"_med_$c")
        val nn = r.getAs[Long](s"_nnn_$c")
        val meanNN = d(s"_mean_$c")
        val stdNN = d(s"_std_$c")
        val (mean, std) =
          if (n == 0 || nn == n) (meanNN, stdNN)
          else {
            val m = (nn * meanNN + (n - nn) * med) / n
            val ex2 = (nn * (stdNN * stdNN + meanNN * meanNN) +
              (n - nn) * med * med) / n
            (m, math.sqrt(math.max(0.0, ex2 - m * m)))
          }
        c -> NumericStage(c, med, mean, std)
      }.toMap
    }

  def fitStage(df: DataFrame, spec: ColumnSpec, size: String,
               maxVocab: Int = 1 << 16): Option[FittedStage] = spec.kind match {
    case "drop" => None
    case "numeric" =>
      Some(fitNumericStages(df, Seq(spec.name))(spec.name))
    case "categorical" =>
      val vocab = df.filter(qcol(spec.name).isNotNull)
        .groupBy(qcol(spec.name).cast("string").as("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("v").asc)
        .limit(maxVocab)
        .collect().map(_.getString(0)).toSeq
      Some(OneHotStage(spec.name, vocab))
    case "multihot" =>
      val vocab = df
        .select(explode(coalesce(qcol(spec.name).cast("array<string>"),
          array().cast("array<string>"))).as("v"))
        // explode KEEPS null array members: without the filter a null
        // becomes a vocab entry — a permanently-zero slot VocabVector
        // can never set, and a JString(null) in the persisted model
        .filter(col("v").isNotNull)
        .groupBy("v").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("v").asc)
        .limit(maxVocab)
        .collect().map(_.getString(0)).toSeq
      Some(MultihotStage(spec.name, vocab))
    case "map" =>
      val keys = df
        .select(explode(map_keys(qcol(spec.name))).as("k"))
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
          // codegen'd, sparsity-preserving [[graft.functions.ScaleVector]]
          // — never densifies the 2^18-wide hashed-text vectors
          case _             => graft.functions.ScaleVector(col(c), w).as(c)
        }
      }
      val withVecs = out.select((df.columns.map(qcol).toSeq ++ outCols): _*)
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
    // all numeric stages ride ONE aggregation pass; the vocab kinds each
    // need their own groupBy anyway
    val numeric = fitNumericStages(df,
      specs.filter(_.kind == "numeric").map(_.name))
    EncoderizerModel(specs.flatMap(s =>
      if (s.kind == "numeric") numeric.get(s.name)
      else fitStage(df, s, size)), featuresCol,
      transformerWeights)
  }
}
