package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data operators beyond per-document scoring:
  * sequence packing and repetition/boilerplate detection.
  *
  * Null handling: a NULL `textCol` reads as the EMPTY string everywhere
  * in this object (0 tokens, no chunks, fails the quality gate the same
  * way an empty document does). Token functions null-propagate, so
  * without the normalization a null-text row would drift through each
  * operator differently — e.g. a packOffsets row with a null pack_id
  * that belongs to no pack, or a gopherRules row whose scalar rules are
  * all null and whose failure is misattributed to the repetition rule.
  *
  * Id contract: the WINDOW operators (packOffsets, tokenBudget) order
  * by `idCol` on a ROWS frame and support duplicate id values — each
  * row keeps its own token range (spec-pinned). The PER-DOCUMENT
  * aggregators (repetitionStats, unigramLogProb, tfidfTopTerms, and
  * gopherRules' repetition leg) group by `idCol`: duplicate ids there
  * pool the duplicates' tokens into one pseudo-document and fan the
  * join back out — callers must pass a unique document id.
  */
object Corpus {

  private def textOrEmpty(textCol: String): Column =
    coalesce(col(textCol), lit(""))

  /** Concat-and-chunk sequence packing (the standard LLM pre-training
    * layout): within each `streamCol` stream, documents ordered by `idCol`
    * occupy contiguous token ranges of one concatenated stream; a training
    * sequence ("pack") is `budget` tokens, so a document starting at
    * offset o lands in pack `o div budget` at in-pack offset `o mod
    * budget`, possibly crossing into the next pack (`crosses`).
    *
    * Scale: the cumulative sum partitions by the stream key — per-stream
    * windows, never a global single-partition sort. Streams (language,
    * shard, source) are the natural parallel unit of a 100 TB corpus; a
    * single giant stream should be pre-sharded into `streamCol` values.
    */
  def packOffsets(df: DataFrame, textCol: String, idCol: String,
                  streamCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    // ROWS, not the default RANGE frame: duplicate id values are RANGE
    // peers whose tokens would all fold into each tied row's cumsum,
    // producing overlapping pack offsets.
    val w = Window.partitionBy(streamCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(streamCol),
      TextFunctions.tokenCount(textOrEmpty(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("pack_id", expr(s"start_off DIV $budget"))
      .withColumn("pack_off", col("start_off") % budget)
      .withColumn("crosses", col("pack_off") + col("n_tokens") > budget)
  }

  /** Gopher-style quality-rule battery (Rae et al. 2021, "Scaling Language
    * Models" — the published document-filter heuristics, thresholds scaled
    * to the corpus at hand): word-count bounds, mean-word-length bounds, a
    * minimum stopword presence, and a repetition cap on the most frequent
    * token. Returns one row per document with each rule's verdict and the
    * conjunctive `pass`.
    *
    * Scale: the three scalar rules are a narrow codegen'd projection over
    * the scan; the repetition ratio reuses the exploded two-phase
    * aggregation of [[repetitionStats]] (map-side partial combine, the
    * per-document key cannot run hot) and joins back on the id — one
    * equi-join shuffle, no row ever carries the token array through it.
    */
  def gopherRules(df: DataFrame, textCol: String, idCol: String,
                  minWords: Int = 20, maxWords: Int = 90,
                  minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
                  minStopwordHits: Int = 2,
                  maxTopTokenRatio: Double = 0.12): DataFrame = {
    // fanOut: scalar rules are a pure projection and otherwise run at
    // the scan's split parallelism (one task on a single-row-group
    // bench file; no-op at real scale) — same for the explode stages
    // of the sibling operators
    val scalars = graft.ops.Par.fanOut(df).select(col(idCol),
      TextFunctions.tokenCount(textOrEmpty(textCol)).as("n_words"),
      TextFunctions.avgWordLen(textOrEmpty(textCol)).as("_awl"),
      TextFunctions.stopwordCount(textOrEmpty(textCol)).as("_stop"))
    // judge repetition on repetitionStats' own UNROUNDED verdict, not a
    // re-derivation from the 4-dp display column: a boundary document
    // (true ratio 0.12004 at a 0.12 cap) rounds to exactly the cap and
    // would pass here while repetitionStats flags it repetitive — the
    // two public APIs must agree for the same threshold, and the
    // DuckDB oracle compares the unrounded ratio too
    val rep = repetitionStats(df, textCol, idCol, maxTopTokenRatio)
      .select(col(idCol), col("repetitive"))
    scalars.join(rep, Seq(idCol), "left")
      .select(col(idCol), col("n_words"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("r_words"),
        (col("_awl") >= minAvgWordLen && col("_awl") <= maxAvgWordLen)
          .as("r_word_len"),
        (col("_stop") >= minStopwordHits).as("r_stopwords"),
        // empty docs produce no repetition row: fail them explicitly
        coalesce(!col("repetitive"), lit(false)).as("r_repetition"))
      .withColumn("pass",
        col("r_words") && col("r_word_len") &&
          col("r_stopwords") && col("r_repetition"))
  }

  /** Token-budgeted corpus slice: within each `streamCol` stream, keep
    * documents in `idCol` order while the running token total stays within
    * `budget` — the standard way a per-source cap is applied when
    * composing a training mix. Returns NARROW kept rows
    * `(idCol, streamCol, n_tokens, cum_tokens)` — the same metadata
    * shape as [[packOffsets]]; callers that need the document payload
    * join the kept ids back against their source.
    *
    * Scale: same per-stream window as [[packOffsets]], and for the same
    * reason the window runs over this narrow projection, never the input
    * rows — the cumsum sort exchange carries ~24 bytes per document, not
    * the document text (an earlier version windowed the full input, so
    * every text payload rode the per-stream sort). The sort is
    * partitioned by the stream key, never global; a stream's documents
    * are the unit of parallelism, so pre-shard giant streams.
    */
  def tokenBudget(df: DataFrame, textCol: String, idCol: String,
                  streamCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    // ROWS frame for the same duplicate-id reason as packOffsets
    val w = Window.partitionBy(streamCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(streamCol),
        TextFunctions.tokenCount(textOrEmpty(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Token-window document chunking — the RAG/embedding-prep primitive:
    * each document's tokens split into windows of `window` tokens at
    * stride `window - overlap` (the final partial window is kept;
    * empty/whitespace-only documents emit no chunks). Output one row per
    * chunk: (id, chunk_idx, chunk_text, n_chunk_tokens).
    *
    * Scale: a narrow generate — rows multiply by ~n/stride with no
    * shuffle; the token array is built once per document and sliced per
    * chunk (all codegen'd built-ins, no UDFs).
    */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
                  window: Int, overlap: Int = 0): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window), got $overlap")
    val stride = window - overlap
    val n = size(col("_toks"))
    val nChunks = lit(1) + greatest(lit(0),
      ceil((n - lit(window)).cast("double") / lit(stride)).cast("int"))
    val start = col("chunk_idx") * stride + 1 // slice() is 1-based
    graft.ops.Par.fanOut(df)
      .select(col(idCol), TextFunctions.tokens(textOrEmpty(textCol)).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("_toks"), start, lit(window)), " ").as("chunk_text"),
        size(slice(col("_toks"), start, lit(window))).as("n_chunk_tokens"))
  }

  /** Line-level boilerplate dedup — the CCNet paragraph-dedup /
    * RefinedWeb line-removal curation step (Wenzek et al. 2020 §3;
    * Penedo et al. 2023 §3.1.3): a line occurring in at least `minDf`
    * DISTINCT documents is boilerplate (headers, footers, cookie
    * banners, nav menus) and ALL its occurrences are removed; document
    * text is reassembled from the surviving lines in original order.
    * Lines shorter than `minLineChars` after trim are exempt (blank
    * separator lines occur everywhere by construction — removing them
    * would mangle formatting, and they carry no content to dedup).
    * Returns every input document:
    * `(idCol, <outCol>, n_removed_lines)` — a doc whose every line was
    * boilerplate comes back with the empty string, not a dropped row.
    * `sep` sets the unit granularity: "\n" (default) = RefinedWeb
    * lines, "\n\n" = CCNet paragraphs; a literal string, not a regex.
    *
    * Scale design: lines explode as a narrow map (one shuffle to count
    * per-line document frequency, one anti-join of the line frame
    * against the boilerplate set, one per-doc reassembly aggregation).
    * The boilerplate set is NOT broadcast by construction: at corpus
    * scale the number of distinct duplicated lines is itself
    * corpus-sized, so the anti join must be shuffle-capable — AQE picks
    * broadcast at runtime when the set measures small. Exact-content
    * matching (no normalization) keeps the operator oracle-equal across
    * engines; callers wanting case-insensitive boilerplate pass a
    * pre-normalized column.
    */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
                 minDf: Int = 2, minLineChars: Int = 1,
                 outCol: String = "text_cleaned",
                 sep: String = "\n"): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    require(minLineChars >= 0, s"minLineChars must be >= 0, got $minLineChars")
    require(sep.nonEmpty, "separator must be non-empty")
    // `sep` is a LITERAL separator (quoted into the split regex), used
    // for both split and reassembly — "\n\n" gives CCNet's paragraph
    // granularity, "\n" (default) RefinedWeb's line granularity
    // -1 limit: trailing empty lines are real lines (SQL split drops
    // trailing empties by default, which would silently shift counts)
    val lines = graft.ops.Par.fanOut(df).select(col(idCol).as("_doc"),
        posexplode(split(textOrEmpty(textCol),
          java.util.regex.Pattern.quote(sep), -1)).as(Seq("_idx", "_line")))
    // boilerplate = eligible lines in >= minDf distinct docs; exempt
    // (short/blank) lines never enter this frame, so the anti join
    // below passes them through without a special case
    val hot = lines.filter(length(trim(col("_line"))) >= minLineChars)
      .groupBy("_line").agg(countDistinct(col("_doc")).as("_df"))
      .filter(col("_df") >= minDf)
      .select("_line")
    val kept = lines.join(hot, Seq("_line"), "left_anti")
      .groupBy("_doc")
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("_idx"),
          col("_line")))), x => x.getField("_line")), sep).as(outCol),
        count(lit(1)).as("_kept"))
    // every doc comes back; all-boilerplate docs rebuild as ""
    df.select(col(idCol), col(idCol).as("_doc0"),
        size(split(textOrEmpty(textCol),
          java.util.regex.Pattern.quote(sep), -1)).as("_total"))
      .join(kept, col("_doc0") === kept("_doc"), "left")
      .select(col(idCol),
        coalesce(col(outCol), lit("")).as(outCol),
        (col("_total") - coalesce(col("_kept"), lit(0L)))
          .cast("int").as("n_removed_lines"))
  }

  /** Corpus-unigram log-probability quality score (the shape of CCNet's
    * LM-perplexity filter with the corpus itself as the LM): a document's
    * score is the mean ln p(w) of its tokens under the corpus unigram
    * distribution. Degenerate/boilerplate text scores HIGH (its tokens
    * are globally frequent), rare-garble scores LOW — both tails are
    * filter targets.
    *
    * Scale: two exploded aggregations (map-side partial combine) plus one
    * join of the token stream against the vocabulary-sized frequency
    * table — vocabulary is orders of magnitude smaller than the corpus,
    * so AQE broadcasts it when it fits and falls back to a token-key
    * shuffle join when it does not. The grand total rides a broadcast
    * 1-row cross join, never a collect.
    */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // NO fanOut here, unlike tfidfTopTerms: measured at sf1 (QueryProbe
    // min-of-2 × 3 sessions, r15) the fan-out is a consistent LOSS
    // (2.4–3.3 s plain vs 3.0–5.3 s fanned) — `toks` feeds both the
    // freq aggregate and the join back onto itself, and the extra
    // repartition of raw docs costs more than the scan-stage
    // parallelism buys a double-consumed explode.
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(textOrEmpty(textCol))).as("_w"))
    val freq = toks.groupBy("_w").agg(count(lit(1)).as("_c"))
    val total = freq.agg(sum("_c").as("_t"))
    toks.join(freq, "_w")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("_c").cast("double") / col("_t"))), 4).as("avg_logp"))
  }

  /** Per-document top-k TF-IDF terms: tf = in-document count, idf =
    * ln(N / df_w) over the corpus, ranked per document by the ROUNDED
    * score (a cross-engine-stable ordering — ties broken by term) —
    * classic keyword extraction / relevance surfacing.
    *
    * Scale: (doc, term) counts and document frequencies are the same
    * two-phase exploded aggregations as [[unigramLogProb]]; the rank
    * window partitions by document, never global.
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    k: Int = 3): DataFrame = {
    // fanOut: the tokenize+explode+partial-agg otherwise runs on the
    // scan's split count (ONE task on a single-row-group corpus at any
    // SF — this operator never shuffled before its first groupBy).
    // Measured at sf1: ~5.9 → ~4.3 s (QueryProbe min-of-2 × 3
    // sessions); no-op at sf0.1 (5k rows < the 16384 row floor). The
    // nDocs count below deliberately rides the bare scan.
    val toks = graft.ops.Par.fanOut(df).select(col(idCol),
      explode(TextFunctions.tokens(textOrEmpty(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("_df"))
    val nDocs = df.agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(
        col("tf") * log(col("_n").cast("double") / col("_df")), 4))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("score"), col("rank"))
  }

  /** Deterministic source-weighted mix sampling: keep a row iff
    * `id mod 100 < pct` where `pct` is the caller-supplied per-row
    * sampling percentage (typically a CASE over the source column — the
    * mix weights). Systematic sampling on a uniform id is reproducible
    * run-over-run and join-free; at 100 TB substitute
    * `pmod(xxhash64(id), 100)` when ids are not uniformly distributed.
    * A narrow filter over the scan — no shuffle, pushdown-friendly.
    */
  def mixSample(df: DataFrame, idCol: String, pctCol: Column): DataFrame =
    df.filter(pmod(col(idCol), lit(100)) < pctCol)

  /** Per-document repetition stats: top-token frequency ratio and distinct
    * ratio — the classic boilerplate/degenerate-text detectors. Exploded
    * two-phase aggregation (doc,token) -> doc; partial aggregation
    * combines map-side, and the per-document key cannot run hot.
    * Documents with no tokens produce no row (nothing to measure).
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
                      topTokenThreshold: Double = 0.1): DataFrame =
    // plain explode: it drops empty/null token arrays, which IS the
    // "no tokens → no row" contract (an earlier explode_outer + isNotNull
    // filter pair was exactly equivalent, just wordier)
    graft.ops.Par.fanOut(df).select(col(idCol),
      explode(TextFunctions.tokens(textOrEmpty(textCol))).as("_tok"))
      .groupBy(col(idCol), col("_tok")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol)).agg(
        sum("_c").as("n_tokens"),
        max("_c").as("_mx"),
        count(lit(1)).as("n_distinct"))
      .select(col(idCol),
        col("n_tokens"),
        round(col("_mx").cast("double") / col("n_tokens"), 4).as("top_tok_ratio"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4).as("distinct_ratio"),
        (col("_mx").cast("double") / col("n_tokens") > topTokenThreshold)
          .as("repetitive"))
}
