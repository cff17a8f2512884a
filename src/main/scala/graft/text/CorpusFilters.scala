package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus-curation filters for LLM training-data pipelines — the quality /
  * contamination / mixture layer that runs between raw ingest and
  * tokenization (no reference counterpart; north-star operator family like
  * dedup and ANN).
  *
  * All three are pure relational plans (explode → hash agg → join), so at
  * 100 TB they inherit Catalyst's map-side partial aggregation and AQE;
  * nothing here touches a window over the corpus or a driver-side loop.
  * Every output is deterministic (hash-threshold sampling, not rand()), so
  * each query is oracle-gated against DuckDB.
  */
object CorpusFilters {

  /** ln(2⁴⁸) and ln(10¹⁷) as the single shared double literals the q125
    * Gumbel key subtracts — both derived from the engine-neutral shared
    * formula and embedded as identical text on both sides of the gate. */
  private[text] val GumLn2Pow48: Double =
    48.0 * graft.functions.SharedLnUtil.Ln2
  private[text] val GumLnScale: Double =
    graft.functions.SharedLnUtil.ln(100000000000000000L)

  // documentsFanned: every consumer of this frame is a compute-amplifying
  // explode/gram kernel — see Tables.fanned for the small-scan rationale
  private def docToks(s: SparkSession, dir: String): DataFrame =
    Tables.documentsFanned(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t"))

  // ------------------------------------------------ repetition quality (Gopher)
  /** Gopher-style repetition scores: fraction of the doc covered by its
    * most frequent unigram / bigram, plus distinct-token ratio. Repetitive
    * machine-generated text scores high and gets flagged (the thresholds
    * are the published Gopher ones for the closest measure, 0.30 / 0.18 —
    * Rae et al. 2021, "Scaling Language Models", table A1).
    *
    * Scale: two explode→(doc,gram) hash aggs with map-side combine; the
    * per-doc rollup keys on doc_id, so everything co-partitions after the
    * first shuffle. No windows, no driver state. */
  def q51_repetition(s: SparkSession, dir: String): DataFrame = {
    val toks = docToks(s, dir).filter(size(col("t")) >= 2)
    val uni = toks
      .select(col("doc_id"), explode(col("t")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("top_uni"),
        count(lit(1)).as("n_distinct"))
    val bi = toks
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t)-1), i -> concat(element_at(t,i), ' ', element_at(t,i+1)))"))
        .as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bi"))
    uni.join(bi, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        round(col("top_uni").cast(DoubleType) / col("n_tokens"), 6).as("top_uni_frac"),
        round(col("top_bi").cast(DoubleType) / col("n_bigrams"), 6).as("top_bi_frac"),
        round(col("n_distinct").cast(DoubleType) / col("n_tokens"), 6).as("distinct_frac"))
      .withColumn("flagged",
        col("top_uni_frac") > 0.30 || col("top_bi_frac") > 0.18)
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------- benchmark contamination
  /** Benchmark-contamination check: token-5-gram overlap of every corpus
    * document against a held-out "benchmark" set (docs whose md5 bucket is
    * 'f' — a stand-in for an eval suite; in production the benchmark grams
    * come from the eval corpora themselves). Reports per-doc distinct-gram
    * hit fraction — the decontamination signal used by GPT-3/PaLM-style
    * training-set filtering (13-gram in the papers; 5 here so the small
    * fixture corpus exercises nonzero overlap).
    *
    * Scale: the benchmark gram set is tiny relative to the corpus (eval
    * suites are MBs, the corpus is TBs) — broadcast it; the corpus side is
    * one explode → distinct → broadcast-hash lookup → per-doc agg. No
    * shuffle of corpus grams against each other. */
  def q52_contamination(s: SparkSession, dir: String): DataFrame = {
    val grams = docToks(s, dir).filter(size(col("t")) >= 5)
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
          .as("bucket"),
        explode(array_distinct(expr(
          "transform(sequence(1, size(t)-4), i -> concat_ws(' ', element_at(t,i), element_at(t,i+1), element_at(t,i+2), element_at(t,i+3), element_at(t,i+4)))")))
          .as("g"))
    val benchGrams = grams.filter(col("bucket") === "f")
      .select(col("g")).distinct().withColumn("hit", lit(1L))
    grams.filter(col("bucket") =!= "f")
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast(DoubleType) / col("n_grams"), 6).as("hit_frac"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------ domain-mix resample
  /** Deterministic domain-mix resampling: given per-source target weights,
    * subsample each source with rate C·w_s/n_s where C = min_s(n_s/w_s) —
    * the largest scale leaving every rate ≤ 1 — so the kept corpus follows
    * the target mixture exactly, using hash-threshold sampling (pure
    * function of doc_id: stable across engines, partitionings, cluster
    * sizes; the same primitive as q49). Weights here derive from the source
    * id (num mod 5 + 1) to keep the query self-contained.
    *
    * Scale: per-source counts are a tiny agg (|sources| rows) broadcast
    * back; the keep-filter is map-side. One corpus scan, one broadcast
    * join, no corpus shuffle. */
  def q53_domain_mix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4),
          16, 10).cast("long").as("h"))
    val weights = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_orig"))
      .withColumn("w",
        (regexp_extract(col("source"), "([0-9]+)", 1).cast("long") % 5 + 1)
          .cast(DoubleType))
    val c = weights
      .agg(min(col("n_orig").cast(DoubleType) / col("w")).as("c"))
    val rates = weights.crossJoin(c)
      .select(col("source"), col("n_orig"),
        (col("c") * col("w") / col("n_orig")).as("rate"))
    docs.join(broadcast(rates), "source")
      .filter(col("h") < col("rate") * 65536)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
      .join(rates, "source")
      .select(col("source"), col("n_orig"), col("n_kept"),
        round(col("rate"), 6).as("rate_r"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------- LM-score quality filter
  /** Unigram language-model scoring — the relational stand-in for the
    * KenLM-perplexity quality filter (CCNet/LLaMA-style): every document
    * gets its mean token log-probability under the corpus unigram model;
    * unusually improbable docs (gibberish, wrong-language, boilerplate)
    * score low. Flags the low tail via a fixed nats threshold (-3.5 sits
    * ~2% of docs below it on this corpus with ≥1e-4 margin to the nearest
    * doc, so the boolean is float-noise-proof; percentile cutoffs would
    * re-rank per run — a fixed threshold recalibrated offline is the
    * production shape).
    *
    * Scale: the model IS the term-frequency table (vocabulary-sized →
    * broadcast); scoring is one corpus scan + broadcast lookup + per-doc
    * avg. Swapping in a real KenLM means replacing the broadcast lookup
    * with a partition-batched scorer (multimodal.Media's codec pattern);
    * the surrounding plan is unchanged. */
  def q56_unigram_logprob(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Cleanse.tokens(col("text"))).as("term"))
    val freqs = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val total = toks.agg(count(lit(1)).as("total"))
    toks
      .join(broadcast(freqs.crossJoin(total)), "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("tf").cast(DoubleType) / col("total"))).as("lp"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("lp"), 6).as("avg_logprob"),
        (col("lp") < -3.5).as("flagged"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------ document chunking
  /** Fixed-size token chunking — the sequence-packing primitive: long
    * documents split into CHUNK-token pieces, each with an ordinal and a
    * content digest (tokenizer-ready rows for training-sequence assembly).
    * Pure per-row array math (sequence → slice → posexplode): map-side
    * only, no shuffle until the output sort; at 100 TB the chunk stream
    * feeds straight into the pack/shuffle stage with chunk counts known
    * from size(t) without materializing anything. */
  def q57_chunk(s: SparkSession, dir: String): DataFrame = {
    val chunk = 32
    Tables.documents(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(ceil(size(t) / $chunk.0) AS INT) - 1)," +
          s" i -> slice(t, i * $chunk + 1, $chunk))"))
        .as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id"),
        size(col("c")).as("n_tokens"),
        md5(array_join(col("c"), " ").cast("binary")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Sliding-window token chunking with OVERLAP — the RAG/context-window
    * chunker (length 32, stride 24 → 8-token overlap between adjacent
    * chunks). Starts run 1, 1+stride, …; a start past the first is
    * emitted only while the PREVIOUS chunk did not already reach the
    * document end, so the trailing fragment that would be a pure suffix
    * of its predecessor is never emitted (the duplicate-tail rule every
    * production chunker applies). q57 is the tumbling special case
    * (stride = length). Every chunk digests content-exact.
    *
    * Scale: pure per-doc array HOFs — one transform over a doc-length-
    * bounded start list, no corpus-position explode, no shuffle beyond
    * the dump sort. */
  def q102_chunk_sliding(s: SparkSession, dir: String): DataFrame = {
    val len = 32; val stride = 24
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), expr(
        s"""transform(
           |  filter(sequence(1, size(t), $stride),
           |         st -> st = 1 OR st + $len - $stride - 1 < size(t)),
           |  st -> struct(st AS st, slice(t, st, $len) AS c))""".stripMargin)
        .as("chunks"))
      .select(col("doc_id"),
        posexplode(col("chunks")).as(Seq("chunk_id", "sc")))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        col("sc.st").cast("int").as("start"),
        size(col("sc.c")).as("n_tokens"),
        md5(array_join(col("sc.c"), " ").cast("binary")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // ------------------------------------------------------ numeric profiling
  /** describe()-style numeric profile with DETERMINISTIC parallel floats:
    * mean and stddev come from DECIMAL sums (exact, association-free) cast
    * to DOUBLE at the end, so Spark's partition-order summation and
    * DuckDB's sequential one produce bit-identical statistics — the same
    * trick as the money aggregates, extended to second moments (x² of a
    * 2-decimal value is exactly 4 decimals). */
  def q58_numeric_profile(s: SparkSession, dir: String): DataFrame = {
    def d2(c: Column) = c.cast("decimal(18,2)")
    def prof(name: String, c: Column): Column = {
      val n = count(lit(1)).cast(DoubleType)
      val sm = sum(d2(c)).cast(DoubleType)
      val sq = sum(d2(c) * d2(c)).cast(DoubleType)
      struct(
        round(sm / n, 6).as("mean_r"),
        round(sqrt((sq - sm * sm / n) / (n - lit(1.0))), 6).as("std_r"),
        min(c).as("mn"), max(c).as("mx"))
        .as(name)
    }
    Tables.lineitem(s, dir)
      .agg(count(lit(1)).as("n"),
        prof("q", col("l_quantity")),
        prof("p", col("l_extendedprice")),
        prof("d", col("l_discount")))
      .select(col("n"),
        col("q.mean_r").as("qty_mean"), col("q.std_r").as("qty_std"),
        col("q.mn").as("qty_min"), col("q.mx").as("qty_max"),
        col("p.mean_r").as("price_mean"), col("p.std_r").as("price_std"),
        col("d.mean_r").as("disc_mean"), col("d.std_r").as("disc_std"))
  }

  // ----------------------------------------------------- lexical diversity
  /** Per-document lexical diversity: Shannon entropy of the token
    * distribution (nats) and type-token ratio — the complement of q51's
    * repetition coverage (entropy catches diffuse repetition that no
    * single gram dominates). One (doc, term) agg then a per-doc rollup,
    * both map-side-combining on the same doc_id keys. */
  def q63_lexical_diversity(s: SparkSession, dir: String): DataFrame =
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c") * log(col("c").cast(DoubleType))).as("clogc"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        // H = ln n - (1/n)·Σ c·ln c  (exact algebra of -Σ p·ln p)
        round(log(col("n_tokens").cast(DoubleType))
          - col("clogc") / col("n_tokens"), 6).as("entropy_r"),
        round(col("n_types").cast(DoubleType) / col("n_tokens"), 6).as("ttr"))
      .orderBy(col("doc_id"))

  // ----------------------------------------------------- span-level dedup
  /** C4-style sub-document exact dedup: the corpus is cut into tumbling
    * 8-token spans and every span that occurs anywhere else in the corpus
    * is removed EXCEPT its first occurrence (C4 does this with
    * three-sentence spans — Raffel et al. 2020 §2.2; spans here are
    * fixed-stride because the synthetic corpus has no sentence marks).
    * Output is the surviving span set: one row per distinct span content,
    * carrying the (doc_id, seg_id) of its first occurrence and its corpus
    * copy count. Doc-level dedup (q17) can't see this — boilerplate
    * repeats inside otherwise-unique pages.
    *
    * Scale: spans never all-pair — one hash shuffle on span digest, and
    * the "first occurrence" is an argmin INSIDE that same aggregation (the
    * (doc_id, seg_id) pair packs into one long, so min() is the argmin —
    * no join-back, no window over the corpus). Map-side partial aggs
    * shrink the shuffle to ~distinct-span cardinality. */
  private val Seg = 8

  /** (doc_id, seg_id, sg) tumbling-span stream shared by q66/q66b and the
    * q70 span stage (which feeds corpus-bucket toks only). */
  private def spanStreamOf(toks: DataFrame): DataFrame =
    toks.filter(size(col("t")) >= Seg)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(floor(size(t) / $Seg.0) AS INT) - 1)," +
          s" i -> array_join(slice(t, i * $Seg + 1, $Seg), ' '))"))
        .as(Seq("seg_id", "sg")))

  private def spanStream(s: SparkSession, dir: String): DataFrame =
    spanStreamOf(docToks(s, dir))

  /** seg_id < 1e6 AND doc_id ≤ (2^63−1−999999)/1e6, so the packed long's
    * min is the lexicographic min of (doc_id, seg_id). Docs are KB-scale —
    * even 100-TB corpora cap documents far below 8M tokens — and ids fit
    * 9.2e12 with margin, but a violation of EITHER bound would corrupt the
    * argmin SILENTLY, so both fail loudly instead (codegen'd branches,
    * never taken in practice). */
  private def posEnc(pos: Column): Column =
    when(pos >= 1000000,
      raise_error(concat(lit("span_dedup: doc "), col("doc_id"),
        lit(" exceeds the 8M-token packing bound"))).cast("long"))
    .when(col("doc_id") > 9223372036853L,
      raise_error(concat(lit("span_dedup: doc_id "), col("doc_id"),
        lit(" exceeds the long packing bound"))).cast("long"))
    .otherwise(col("doc_id") * 1000000L + pos)

  private def spanEnc: Column = posEnc(col("seg_id"))

  def q66_span_dedup(s: SparkSession, dir: String): DataFrame =
    spanStream(s, dir)
      .groupBy(md5(col("sg").cast("binary")).as("seg_md5"))
      .agg(min(spanEnc).as("enc"), count(lit(1)).as("n_copies"))
      // `div`, not `/`: SQL / is double division, exact only below 2^53 —
      // large doc ids would decode differently from the oracle's integer //
      .select(expr("enc div 1000000").as("doc_id"),
        (col("enc") % 1000000L).cast("int").as("seg_id"),
        col("seg_md5"), col("n_copies"))
      .orderBy(col("doc_id"), col("seg_id"))

  /** Content-defined-chunking span dedup — q66's fixed 8-token stride
    * re-cut with CDC boundaries (LBFS/FastCDC lineage, token-level): a
    * boundary falls wherever the local 4-gram's hash ≡ 0 (mod 8), so an
    * insertion near the top of a page shifts only the segment it lands
    * in — fixed-stride spans after the edit ALL change and the dedup
    * misses every one of them; CDC re-synchronizes at the next boundary.
    * Expected segment length is the modulus (8 tokens), matching q66's
    * stride for comparability. The per-doc boundary pass is pure array
    * HOFs (no explode until segments exist); winner-argmin and decode are
    * exactly q66's machinery, same packing guards.
    *
    * Scale: identical to q66 — one content shuffle at ~distinct-segment
    * cardinality; the boundary computation is map-side. */
  /** (doc_id, seg_id = 1-based token position, sg) CDC segment stream over
    * a (doc_id, t) token frame — exposed for the shift-robustness spec. */
  private[graft] def cdcSegments(toks: DataFrame): DataFrame = {
    // hash of the 4-gram starting at i (1-based), as a small bucket id
    val h4 = "pmod(conv(substring(md5(concat_ws(' ', element_at(t,CAST(i AS INT)), " +
      "element_at(t,CAST(i AS INT)+1), element_at(t,CAST(i AS INT)+2), " +
      "element_at(t,CAST(i AS INT)+3))), 1, 8), 16, 10), 8)"
    toks.filter(size(col("t")) >= 1)
      // internal boundaries: positions 2..n-3 whose 4-gram hash bucket is 0
      .withColumn("bp", expr(
        s"""filter(transform(sequence(1, greatest(size(t) - 3, 0)),
           |  i -> IF(i > 1 AND $h4 = 0, CAST(i AS INT), CAST(NULL AS INT))),
           |  x -> x IS NOT NULL)""".stripMargin))
      .withColumn("starts", expr("concat(array(1), bp)"))
      .withColumn("ends", expr("concat(bp, array(size(t) + 1))"))
      .select(col("doc_id"), col("t"), explode(expr(
        """transform(sequence(1, size(starts)), j -> struct(
          |  element_at(starts, j) AS pos,
          |  array_join(slice(t, element_at(starts, j),
          |    element_at(ends, j) - element_at(starts, j)), ' ') AS sg))""".stripMargin))
        .as("s"))
      .select(col("doc_id"), col("s.pos").as("seg_id"), col("s.sg").as("sg"))
  }

  def q75_cdc_span_dedup(s: SparkSession, dir: String): DataFrame =
    cdcSegments(docToks(s, dir))
      .groupBy(md5(col("sg").cast("binary")).as("seg_md5"))
      .agg(min(spanEnc).as("enc"), count(lit(1)).as("n_copies"))
      .select(expr("enc div 1000000").as("doc_id"),
        (col("enc") % 1000000L).cast("int").as("pos"),
        col("seg_md5"), col("n_copies"))
      .orderBy(col("doc_id"), col("pos"))

  /** C4's ACTUAL operator on top of q66's span table: rewrite the corpus
    * with every non-first span occurrence deleted and the text re-joined
    * (q66 only *reports* surviving spans; Raffel et al. 2020 §2.2 removes
    * the duplicates from the documents). A doc's cleaned text is its
    * surviving spans in original order plus the sub-span tail (the
    * trailing < 8 tokens that never entered a span — deleting content the
    * spans never covered would be over-filtering). Emitted as an md5
    * digest plus kept/dropped counts; short docs (< 8 tokens) pass through
    * untouched.
    *
    * Scale: the winner agg (grouped on the span content, carrying the
    * packed (doc, seg) argmin) IS the survivor set — the winning instance
    * decodes straight out of the argmin and the group key is its text, so
    * there is NO join-back to the span stream (which would re-execute its
    * scan+explode for the probe side; the first cut did exactly that).
    * One span scan, one content shuffle, then a per-doc sort_array over
    * that doc's own ≤1e6 spans. */
  def q66b_span_rewrite(s: SparkSession, dir: String): DataFrame = {
    val kept = spanStream(s, dir)
      .groupBy(col("sg")).agg(min(spanEnc).as("enc"))
      .select(expr("enc div 1000000").as("doc_id"),
        (col("enc") % 1000000L).cast("int").as("seg_id"), col("sg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(seg_id, sg))), x -> x.sg)"),
          " ").as("kept_txt"))
    docToks(s, dir)
      .select(col("doc_id"), size(col("t")).as("n_tokens"),
        expr(s"CAST(floor(size(t) / $Seg.0) AS INT)").as("n_spans"),
        expr(s"array_join(slice(t, CAST(floor(size(t) / $Seg.0) AS INT) * $Seg + 1, size(t)), ' ')")
          .as("tail_txt"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).cast("int").as("n_kept"),
        (col("n_spans") - coalesce(col("n_kept"), lit(0L))).cast("int").as("n_dropped"),
        (coalesce(col("n_kept"), lit(0L)) * Seg
          + (col("n_tokens") - col("n_spans") * Seg)).cast("int").as("n_clean_tokens"),
        md5(array_join(filter(array(col("kept_txt"), col("tail_txt")),
          x => x.isNotNull && x =!= ""), " ").cast("binary")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  // ----------------------------------------------------- per-source caps
  /** Per-domain document cap — the mixture guard that keeps one crawl
    * domain from dominating the corpus (every production web pipeline
    * caps pages-per-domain; cf. Gopher's per-domain limits): keep the top
    * N docs per source by a quality key (n_chars here; any score column
    * slots in), with doc_id as the deterministic tiebreak.
    *
    * Scale: rank-within-group ≤ N is exactly what Spark's WindowGroupLimit
    * optimization turns into a per-partition bounded heap (no full sort of
    * a giant domain's partition) — the window form IS the scale-safe form
    * on Spark ≥ 3.5. One shuffle on source. */
  /** ADAPTIVE per-source threshold — the dynamic twin of q67's fixed cap:
    * every source keeps only docs at or above its own median length, so
    * the cutoff tracks each domain's distribution instead of a global
    * constant (real curation pipelines threshold per-domain because a
    * "short" forum post and a "short" paper differ by 10×). The median is
    * EXACT (`percentile`) so the gate hash-matches DuckDB's
    * `quantile_cont` — identical linear-interpolation definition, and the
    * filter compares the identically-derived double, so there is no
    * knife-edge. At 100 TB swap in `approx_percentile` exactly as the
    * q41 → q41b pair documents (exact per-group percentile buffers each
    * group's values; the sketch doesn't) — the threshold table stays a
    * source-cardinality dim that broadcasts.
    *
    * Scale: one per-source agg (source cardinality ≪ corpus), broadcast
    * threshold dim, map-side filter, one rollup. */
  def q95_adaptive_threshold(s: SparkSession, dir: String): DataFrame = {
    val med = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(expr("percentile(n_chars, 0.5)").as("med"))
    Tables.documents(s, dir)
      .select(col("source"), col("n_chars"))
      .join(broadcast(med), "source")
      .filter(col("n_chars") >= col("med"))
      .groupBy(col("source"), col("med"))
      .agg(count(lit(1)).as("n_kept"),
        min(col("n_chars")).as("min_kept_chars"))
      .select(col("source"), round(col("med"), 6).as("med_r"),
        col("n_kept"), col("min_kept_chars"))
      .orderBy(col("source"))
  }

  def q67_source_cap(s: SparkSession, dir: String): DataFrame = {
    val cap = 20
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= cap)
      .orderBy(col("source"), col("rnk"))
  }

  /** Stratified uniform sample: exactly N documents per source, chosen by
    * HASH order (md5 of the id), not by a quality key — the unbiased
    * training-mix sampler next to q67's quality-ranked cap. Hash order
    * makes the sample deterministic, reshardable and engine-portable
    * (same contract as q49's hash-threshold sampling, but exact-N per
    * stratum rather than a fixed rate). Same WindowGroupLimit
    * bounded-heap shape as q67: rank ≤ N never sorts a whole domain. */
  def q77_stratified_sample(s: SparkSession, dir: String): DataFrame = {
    val n = 25
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= n)
      .orderBy(col("source"), col("rnk"))
  }

  /** TEMPERATURE-based mixture sampling — the multilingual/multi-source
    * rebalancing step every large multi-corpus training run applies
    * (Conneau et al. 2020, XLM-R §3.1; mT5 uses the same p_i ∝ p_i^α
    * law): raw source shares — measured in TOKENS, the quantity those
    * samplers actually balance — are exponentiated with temperature
    * α < 1 so high-resource sources are down-weighted and low-resource
    * sources up-weighted, then each source contributes its rebalanced
    * document quota of a fixed budget. α is FIXED AT 0.5 here deliberately: pow(x, α)
    * is not correctly rounded and differs across libm's (the q87
    * transcendental lesson), but sqrt IS IEEE-754 correctly rounded in
    * every engine — so with α = 0.5 the whole quota computation stays
    * bit-deterministic cross-engine. The remaining float work is scaled
    * to integers immediately (w_i = floor(1000·√n_i), one deterministic
    * double op per source), and quotas are pure integer arithmetic:
    * k_i = (B · w_i) div Σw_j with budget B = N div 2 — no double SUM
    * whose addition order could differ between engines.
    *
    * Within a source the quota fills in deterministic md5-hash order
    * (q77's unbiased sampler). Output per source: size, weight, quota,
    * sampled count and a 48-bit-md5-prefix id signature over the sampled
    * set — the gate fails if even one sampled doc differs.
    *
    * Scale: one source-cardinality agg (broadcast back), one corpus scan
    * with a WindowGroupLimit bounded-heap top-k_i per source — the q67/
    * q77 shape with a per-source quota instead of a constant. */
  def q107_temperature_mix(s: SparkSession, dir: String): DataFrame =
    temperatureMixOf(Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(Cleanse.tokens(col("text"))).cast("long").as("wt")))

  /** The by-frame kernel (any (source, doc_id, wt) frame; wt is the
    * per-doc size measure the shares balance over). The gated query
    * weights by TOKEN counts — the quantity XLM-R's sampler actually
    * balances, and the one that varies across the fixture's sources
    * (doc counts are uniform 25/source, token totals are not, so the
    * gate exercises real rebalancing); CorpusFiltersSpec drives the
    * kernel with wt = 1 (pure doc-count shares) on a skewed synthetic
    * mix to pin the rebalance and saturation properties. */
  private[graft] def temperatureMixOf(docs: DataFrame): DataFrame = {
    val counts = docs
      .groupBy(col("source")).agg(count(lit(1)).as("n"), sum(col("wt")).as("t"))
      .withColumn("w", floor(sqrt(col("t").cast("double")) * lit(1000.0)).cast("long"))
    val totals = counts.agg(sum(col("n")).as("n_total"), sum(col("w")).as("w_total"))
    // least(·, n): a heavily up-weighted tiny source's raw quota can
    // exceed its size — without-replacement sampling caps there (XLM-R
    // oversamples WITH replacement instead; a doc-unique corpus can't)
    val quotas = counts.crossJoin(broadcast(totals))
      .select(col("source"), col("n"), col("w"),
        least(expr("(n_total div 2) * w div w_total"), col("n")).as("quota"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    // LITERAL rank bound first: `rnk <= quota` compares against a column,
    // which InferWindowGroupLimit cannot bound — the window would sort
    // every source fully. The max quota is source-cardinality metadata
    // (one tiny collect, the q93/q98 discipline); as a literal conjunct
    // it turns the window into a bounded-heap WindowGroupLimit, and the
    // exact per-source quota filter runs after the broadcast join.
    val maxQuota = quotas.agg(max(col("quota"))).collect()(0).getLong(0)
    val sampled = docs
      .select(col("source"), col("doc_id"))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= lit(maxQuota))
      .join(broadcast(quotas.select(col("source"), col("quota"))), "source")
      .filter(col("rnk") <= col("quota"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 12),
          16, 10).cast("long")).cast("long").as("sample_sig"))
    // quotas drives the output (sources with quota 0 still report);
    // the sampled rollup is source-cardinality → broadcast, never a
    // sort-merge on the final stitch
    quotas.join(broadcast(sampled), Seq("source"), "left")
      .select(col("source"), col("n").as("n_docs"), col("w").as("weight"),
        col("quota"), coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("sample_sig"), lit(0L)).as("sample_sig"))
      .orderBy(col("source"))
  }

  /** WEIGHTED sampling without replacement, exact-k per stratum —
    * Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    * reservoir", public algorithm): each item draws key = u^(1/w) and the
    * k largest keys win; ordering by ln(u)/w is monotone-equivalent and
    * avoids the fractional power. Here w = the document's token count
    * (longer docs proportionally likelier — the shape a token-budget
    * sampler wants) and u is the q49 deterministic hash-uniform
    * ((md5-prefix + 1) / 2^48 — +1 keeps u > 0 so ln is finite), so the
    * draw is reproducible across engines, partitionings and cluster
    * sizes. q77 is the unweighted special case (uniform hash order).
    *
    * Scale: one corpus scan, map-side key computation, and the same
    * WindowGroupLimit bounded-heap top-k per stratum as q67/q77 — no
    * global sort, no per-source shuffle beyond the rank. */
  def q103_weighted_sample(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(Cleanse.tokens(col("text"))).cast("long").as("w"))
      .filter(col("w") >= 1)
      .withColumn("key",
        log((conv(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 12), 16, 10).cast("double") + 1.0) / lit(281474976710656.0))
          / col("w"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("key").desc, col("doc_id"))
    keyed.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("doc_id"), col("w"),
        round(col("key"), 6).as("key_r"))
      .orderBy(col("source"), col("rank"))
  }

  // ------------------------------------------------- bigram LM scoring
  /** Interpolated-bigram LM scoring — one rung up the n-gram ladder from
    * q56's unigram filter, and the closest relational shape to the
    * KenLM-perplexity filters CCNet/LLaMA actually run: each document is
    * scored by the mean log of λ·P(w2|w1) + (1−λ)·P(w2) over its bigrams
    * (λ = 0.7), so gibberish token ORDER now hurts a doc even when its
    * unigram mix looks normal.
    *
    * Scale: the bigram-count table is vocabulary²-BOUNDED but corpus-
    * independent in the limit; unlike q56's broadcastable unigram model it
    * may not fit a broadcast, so the score join shuffles on the bigram key
    * (both sides hash-partition; map-side combine shrinks the count side)
    * while the small unigram table still broadcasts. */
  def q68_bigram_lm(s: SparkSession, dir: String): DataFrame = {
    // both weights written as literals (NOT 1-λ: double 1-0.7 is
    // 0.30000000000000004, which would diverge from the SQL twin's 0.3)
    val lambda = 0.7
    val mu = 0.3
    val bi = docToks(s, dir).filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t)-1), i -> struct(element_at(t,i) AS w1, element_at(t,i+1) AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val biCounts = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uni = docToks(s, dir)
      .select(explode(col("t")).as("w"))
    val uniCounts = uni.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val total = uni.agg(count(lit(1)).as("tot"))
    bi
      .join(biCounts, Seq("w1", "w2"))
      .join(broadcast(uniCounts.withColumnRenamed("w", "w1")
        .withColumnRenamed("c1", "c_w1")), Seq("w1"))
      .join(broadcast(uniCounts.withColumnRenamed("w", "w2")
        .withColumnRenamed("c1", "c_w2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log(
          lit(lambda) * col("c12").cast(DoubleType) / col("c_w1")
            + lit(mu) * col("c_w2").cast(DoubleType) / col("tot")))
          .as("lp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("lp"), 6).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------- sequence packing
  /** Concat-and-slice sequence assembly — the stage after chunking (q57)
    * in a training pipeline: documents are laid end-to-end in a packed
    * token stream and cut into fixed-length training sequences; this
    * query emits each document's byte-of-the-stream accounting (start
    * offset, first/last sequence index) so the actual slicing is a pure
    * map over the assignments.
    *
    * Scale: one global stream would serialize the cumsum, so the corpus
    * packs into 32 INDEPENDENT streams keyed by doc_id mod 32 — each
    * bucket's running offset is a window cumsum over its own partition
    * (sequences never cross buckets; 32 boundary sequences of waste per
    * corpus is noise, and buckets scale with the cluster by raising the
    * modulus). All-integer output, so the gate is exact. */
  def q72_pack_offsets(s: SparkSession, dir: String): DataFrame = {
    val seqLen = 64
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), pmod(col("doc_id"), lit(32)).as("bucket"),
        size(col("t")).cast("long").as("n_tokens"))
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("off"),
        expr(s"off div $seqLen").as("seq_first"),
        expr(s"(off + n_tokens - 1) div $seqLen").as("seq_last"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer-aware packing: q72's accounting becomes meaningful for
    * training only if lengths are measured in TOKENIZER tokens, not
    * whitespace words (a 20-char identifier is ~5 BPE pieces, not 1).
    * Lengths are REAL subword counts (round-6 verdict item 7, replacing
    * the ceil(len/4) proxy): q28's BPE-ish lexer splits text into
    * word/digit/punctuation pieces, and each piece is segmented by the
    * WordPiece-style greedy longest-match tokenizer (`Subword` — a native
    * codegen expression over a fixed vocab; the DuckDB twin replays the
    * identical greedy walk as a recursive CTE over DISTINCT pieces, so
    * the gate is exact). Same 32-independent-bucket stream layout as q72
    * (no global serial cumsum); swapping in a production tokenizer's
    * vocab is a table change, not a plan change. */
  def q72b_pack_tokenized(s: SparkSession, dir: String): DataFrame = {
    val seqLen = 64
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select(col("doc_id"), pmod(col("doc_id"), lit(32)).as("bucket"),
        aggregate(
          regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)),
          lit(0L),
          (a, p) => a + Subword.subword_count(p).cast("long"))
          .as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("off"),
        expr(s"off div $seqLen").as("seq_first"),
        expr(s"(off + n_tokens - 1) div $seqLen").as("seq_last"))
      .orderBy(col("doc_id"))
  }

  /** The packed sequences THEMSELVES — q72 promises "the actual slicing
    * is a pure map over the assignments"; this query keeps that promise.
    * Every token takes its bucket-local stream position (doc offset from
    * the q72 cumsum + position in doc), sequences are pos div 64, and
    * each sequence row carries its token count plus an engine-neutral
    * digest of the space-joined token stream — the exact payload a
    * trainer's data loader reads, digested so the oracle gate is content-
    * exact without shipping token arrays through the dump.
    *
    * Scale: one corpus explode shuffled once on (bucket, seq_id) — the
    * same key the downstream loader partitions by; the offsets side is a
    * doc-count-sized join (co-keyed on doc_id). Tail sequences carry
    * n_tokens < 64 only at each bucket's end (32 partial sequences per
    * corpus — noise). */
  def q85_pack_sequences(s: SparkSession, dir: String): DataFrame = {
    val seqLen = 64
    val offs = q72_pack_offsets(s, dir)
      .select(col("doc_id"), col("bucket"), col("off"))
    docToks(s, dir).filter(size(col("t")) >= 1)
      .join(offs, "doc_id")
      .select(col("bucket"), col("off"), posexplode(col("t")).as(Seq("i", "tok")))
      .select(col("bucket"), (col("off") + col("i")).as("pos"), col("tok"))
      .groupBy(col("bucket"), expr(s"pos div $seqLen").as("seq_id"))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        md5(concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))
          .cast("binary")).as("toks_md5"))
      .orderBy(col("bucket"), col("seq_id"))
  }

  /** Packed sequences in TRAINER UNITS — the round-7 verdict's top gap:
    * q85 packs whitespace words, but a data loader reads SUBWORD ids, so
    * its table was denominated in the wrong units. Here every document is
    * lexed (q28's word/digit/punct pieces) and each piece segmented by the
    * WordPiece greedy longest-match tokenizer ([[SubwordPieces]] — the
    * piece-ARRAY twin of q72b's count), the flattened subword stream takes
    * bucket-local positions off the q72b cumsum, and each fixed-length
    * sequence row carries its piece count plus a content-exact digest of
    * the space-joined pieces. n_tokens here sums to q72b's accounting by
    * construction (pieces.length == subword_count — SubwordSpec asserts
    * it), so the offsets table and the sequence table finally agree on
    * units.
    *
    * Oracle: the identical greedy walk replayed as a recursive CTE over
    * DISTINCT lexer pieces, accumulating the segmentation STRING this
    * time (vocabulary-sized recursion, depth = longest word), then
    * word-level cumsums position every piece without a corpus-sized
    * recursion.
    *
    * Scale: same shape as q85 — one corpus explode shuffled once on
    * (bucket, seq_id); the subword segmentation is map-side codegen over
    * the lexer pieces (no join against a piece table; the vocab is a plan
    * constant). */
  def q85b_pack_subword(s: SparkSession, dir: String): DataFrame = {
    val seqLen = 64
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val lex = regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))
    Tables.documents(s, dir)
      .select(col("doc_id"), pmod(col("doc_id"), lit(32)).as("bucket"),
        flatten(transform(lex, p => Subword.subword_pieces(p))).as("sw"))
      .withColumn("n_tokens", size(col("sw")).cast("long"))
      .filter(col("n_tokens") >= 1)
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("bucket"), col("off"), posexplode(col("sw")).as(Seq("i", "tok")))
      .select(col("bucket"), (col("off") + col("i")).as("pos"), col("tok"))
      .groupBy(col("bucket"), expr(s"pos div $seqLen").as("seq_id"))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        md5(concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))
          .cast("binary")).as("toks_md5"))
      .orderBy(col("bucket"), col("seq_id"))
  }

  /** The last mile of the curation pipeline COMPOSED: sequence-packing
    * accounting over the span-DEDUPED corpus — q66b's cleaned lengths
    * (which need no text reassembly: n_clean = 8·kept + n mod 8) flow
    * into q72's 32-independent-bucket layout. This is the table a
    * training run actually consumes: offsets into the packed stream of
    * the corpus as it will be after dedup, not as it was ingested.
    * Zero-length rewrites (every span deleted, no tail) drop out — there
    * is nothing to pack. */
  def q76_pack_clean(s: SparkSession, dir: String): DataFrame = {
    val seqLen = 64
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    q66b_span_rewrite(s, dir)
      .select(col("doc_id"), pmod(col("doc_id"), lit(32)).as("bucket"),
        col("n_clean_tokens").cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("off"),
        expr(s"off div $seqLen").as("seq_first"),
        expr(s"(off + n_tokens - 1) div $seqLen").as("seq_last"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------- repeated-substring report
  /** EXACT-SUBSTRING repetition report (Lee et al. 2022, "Deduplicating
    * training data makes language models better" — public algorithm
    * family): find every maximal corpus region built from 8-token
    * substrings that occur ≥ 2 times ANYWHERE in the corpus (including
    * within the same document — the self-repetition case Gopher's
    * top-fraction scores miss). The suffix-array construction of the
    * paper is single-machine; the Spark-first equivalent is SLIDING
    * 8-grams (q66's spans are tumbling — they miss repeats straddling
    * span boundaries; sliding windows cannot): one explode with start
    * positions, a global occurrence count, and per-doc gaps-and-islands
    * merging of the surviving starts (new island when the next start
    * clears the previous covered range). Output per affected doc: span
    * count and repeated-token coverage — the table a dedup-rewrite pass
    * consumes.
    *
    * Scale: one corpus-sized gram explode; the count and the hit join key
    * on a 60-bit md5 prefix of the gram, not the ~50-char string — the
    * q79 verify-key lesson (8-byte compares and ~6× less shuffle); both
    * engines derive the SAME key, so the astronomically-unlikely
    * collision would at worst merge the same two grams in both, never
    * diverge the gate. Island merging windows per doc_id over
    * per-doc-bounded rows. All-integer arithmetic — the gate is exact. */
  def q97_repeated_substrings(s: SparkSession, dir: String): DataFrame = {
    val L = 8
    val grams = docToks(s, dir).filter(size(col("t")) >= L)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(t) - ${L - 1}),
           |  i -> conv(substring(md5(CAST(concat_ws(' ', slice(t, i, $L)) AS BINARY)),
           |    1, 15), 16, 10))""".stripMargin))
        .as(Seq("i0", "gh")))
      .select(col("doc_id"), (col("i0") + 1).as("i"),
        col("gh").cast("long").as("gh"))
    val repeated = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("gh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val islands = grams.join(repeated, "gh")
      .select(col("doc_id"), col("i"))
      .withColumn("new_island",
        when(col("i") - lag(col("i"), 1).over(w) > L, 1L).otherwise(
          when(lag(col("i"), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    islands.groupBy(col("doc_id"), col("island"))
      .agg((max(col("i")) - min(col("i")) + L).as("covered"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(col("covered")).cast("long").as("n_repeated_tokens"))
      .orderBy(col("doc_id"))
  }

  /** EXACT-SUBSTRING dedup REWRITE — the operator Lee et al. 2022 actually
    * run (q97 only *reports* repeated regions; the paper deletes the
    * non-first occurrences and keeps the rest of the corpus intact). A
    * sliding 8-gram occurrence is the WINNER of its content iff it is the
    * corpus-globally first instance — min packed (doc_id, start), the q66
    * argmin, so the tiebreak is deterministic in both engines. Every
    * non-winner occurrence marks its 8 covered token positions for
    * deletion; a token survives iff no non-winner occurrence covers it.
    * The winner survives its OWN gram's deletion rule (its gram never
    * marks it) — but a different, overlapping repeated gram whose
    * non-winner occurrence covers the winner's tokens can still delete
    * them, so "first occurrence always survives" is NOT guaranteed
    * corpus-wide under overlap; engine and oracle apply the identical
    * rule, so the gate is exact either way. CorpusFiltersSpec pins the
    * non-overlapping planted-duplicate case.
    * Output per doc: token counts before/after, deleted-region count, and
    * the content-exact md5 of the surviving text; docs with no repeats
    * (or < 8 tokens) pass through untouched.
    *
    * Scale: q97's machinery end-to-end — one corpus gram explode, the
    * occurrence count AND winner argmin in the SAME hash agg keyed on the
    * 60-bit gram prefix, per-doc-bounded island windows. The rewrite
    * itself never re-shuffles the corpus: deletion islands collapse to a
    * per-doc interval list (bounded by doc length / gram span), join back
    * to the token frame on doc_id once, and the position filter is a
    * map-side array HOF — no corpus-position explode, no range join. */
  def q97b_substring_rewrite(s: SparkSession, dir: String): DataFrame =
    substringRewriteOf(docToks(s, dir))

  /** q97b's core over a (doc_id, t) token frame — exposed for the
    * first-occurrence-keeps spec, which plants cross-doc and same-doc
    * duplicates on constructed docs (the cdcSegments pattern). */
  private[graft] def substringRewriteOf(toks: DataFrame): DataFrame = {
    val L = 8
    val grams = toks.filter(size(col("t")) >= L)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(t) - ${L - 1}),
           |  i -> conv(substring(md5(CAST(concat_ws(' ', slice(t, i, $L)) AS BINARY)),
           |    1, 15), 16, 10))""".stripMargin))
        .as(Seq("i0", "gh")))
      .select(col("doc_id"), (col("i0") + 1).cast("long").as("i"),
        col("gh").cast("long").as("gh"))
    val winners = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("c"), min(posEnc(col("i"))).as("wenc"))
      .filter(col("c") >= 2).select(col("gh"), col("wenc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val del = grams.join(winners, "gh")
      .filter(posEnc(col("i")) =!= col("wenc"))
      .select(col("doc_id"), col("i"))
      .withColumn("new_island",
        when(col("i") - lag(col("i"), 1).over(w) > L, 1L).otherwise(
          when(lag(col("i"), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val ivd = del.groupBy(col("doc_id"), col("island"))
      .agg(min(col("i")).as("s"), (max(col("i")) + (L - 1)).as("e"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_del_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("n_del_tokens"),
        collect_list(struct(col("s"), col("e"))).as("iv"))
    toks
      .join(ivd, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        coalesce(col("n_del_spans"), lit(0L)).as("n_del_spans"),
        coalesce(col("n_del_tokens"), lit(0L)).as("n_del_tokens"),
        (size(col("t")).cast("long")
          - coalesce(col("n_del_tokens"), lit(0L))).as("n_clean_tokens"),
        md5(expr(
          """array_join(filter(transform(sequence(1, size(t)),
            |  p -> IF(exists(coalesce(iv, CAST(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT>>)),
            |          x -> p >= x.s AND p <= x.e),
            |        CAST(NULL AS STRING), element_at(t, CAST(p AS INT)))),
            |  x -> x IS NOT NULL), ' ')""".stripMargin).cast("binary")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------- BPE merge learning
  /** BPE VOCABULARY TRAINING (Sennrich, Haddow, Birch 2016, "Neural
    * machine translation of rare words with subword units" — public
    * algorithm): learn the first K merges from corpus statistics. q72b/q85b
    * run subword INFERENCE against a fixed vocab; this is the training
    * side — the tokenizer-family counterpart of q87b's trained classifier
    * (round-7 verdict theme: engines that only score with frozen
    * constants aren't fitting anything).
    *
    * The real production shape: BPE learning never touches the corpus
    * after one word-frequency aggregation — it iterates on the DISTINCT
    * WORD table (Heaps-bounded) with frequency weights, exactly how HF
    * `tokenizers` trains. Each round: count adjacent symbol pairs
    * (weighted by word frequency), take the global argmax (count desc,
    * then lexicographic pair — deterministic), and apply the merge
    * left-to-right non-overlapping. The driver holds one scalar per
    * round (the argmax), like LDA's iteration coordination — O(1) in
    * corpus size.
    *
    * Merge application is the same primitive in BOTH engines: symbols
    * encode as `|a||b||c|` (every symbol individually wrapped), a merge
    * (a,b) is `replace(sym, '|a||b|', '|ab|')` — string replace is
    * left-to-right non-overlapping in Spark and DuckDB alike, so `aaa`
    * under merge (a,a) becomes `[aa, a]` identically, and consecutive
    * merge sites don't share delimiter characters. Tokens are [a-z0-9]+
    * so the delimiter never collides and SQL literals never need
    * escaping. The oracle replays all K rounds as generated CTE stages —
    * vocabulary-sized work per stage, zero corpus recursion. */
  private[graft] val BpeRounds = 10

  /** The (pairs → argmax → replace) merge-learning loop over a seeded
    * symbol table (word, cnt, sym) — shared by the char-level (q94) and
    * byte-level (q112) trainers; only the seed alphabet differs. `guard`
    * is the symbol charset: the learned symbols interpolate into SQL
    * string literals and the |-sentinel encoding — a symbol containing a
    * quote or '|' (possible with whitespace-split tokens on
    * non-synthetic text) would break the literal or silently corrupt the
    * merge in BOTH engines; fail loudly. */
  private def bpeMergeLoopOver(syms0: DataFrame, guard: String)
      : Seq[(Int, String, String, Long)] = {
    var syms = syms0.localCheckpoint() // vocabulary-sized (31 words at any SF)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (round <- 1 to BpeRounds) {
      val best = syms
        .select(col("cnt"),
          expr("split(substring(sym, 2, length(sym) - 2), '\\\\|\\\\|')").as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(ss) - 1)," +
            " i -> struct(element_at(ss, i) AS l, element_at(ss, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      assert(best.nonEmpty, s"BPE round $round found no pairs — vocabulary exhausted")
      val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      require(l.matches(guard) && r.matches(guard),
        s"BPE merge symbols must match $guard: '$l', '$r'")
      merges += ((round, l, r, c))
      val next = syms.withColumn("sym",
        expr(s"replace(sym, '|$l||$r|', '|$l$r|')")).localCheckpoint()
      graft.ml.Similarity.pinnedRdds(syms).foreach(_.unpersist(blocking = false))
      syms = next
    }
    graft.ml.Similarity.pinnedRdds(syms).foreach(_.unpersist(blocking = false))
    merges.toSeq
  }

  /** Session-scoped memo for deterministic tokenizer trainings — the
    * `ml.Similarity.dedupStage` materialize-once pattern applied to the
    * trainer family: keyed on (applicationId, family, CONTENT fingerprint
    * of the corpus dir), so an in-place corpus mutation re-trains instead
    * of serving a stale model. The LEARN queries (q94/q105/q112/q116)
    * stay self-contained — training cost remains bench-visible on its own
    * line — while apply/report consumers (q94b/q105b/q112b/q116b/q111)
    * read the memo; the first consumer to run pays the training if no
    * learn query preceded it. Values are vocabulary-sized driver tables
    * (merge lists, piece→score maps) — metadata, never corpus data.
    * Same sequential-session INVARIANT as dedupStage's _SUCCESS probe:
    * Bench/Verify run queries one at a time. */
  private val trainerMemo =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]
  private def memoTrained[T <: AnyRef](s: SparkSession, dir: String,
      family: String)(train: => T): T =
    trainerMemo.computeIfAbsent(
      s"${s.sparkContext.applicationId}|$family|" +
        graft.ml.Similarity.corpusFingerprint(s, dir),
      _ => train).asInstanceOf[T]

  private def bpeWordFreqs(s: SparkSession, dir: String): DataFrame =
    docToks(s, dir)
      .select(explode(col("t")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  def q94_bpe_learn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val syms0 = bpeWordFreqs(s, dir).select(col("word"), col("cnt"),
      expr("concat('|', array_join(transform(sequence(1, length(word))," +
        " i -> substring(word, i, 1)), '||'), '|')").as("sym"))
    bpeMergeLoopOver(syms0, "[a-z0-9]+")
      .toDF("round", "merge_left", "merge_right", "pair_count")
      .select(col("round"), col("merge_left"), col("merge_right"),
        concat(col("merge_left"), col("merge_right")).as("merged"),
        col("pair_count"))
      .orderBy(col("round"))
  }

  /** The shared learn chain as SQL CTEs: word frequencies, char-split
    * symbols, then K (pairs → argmax → replace) stages — composed by both
    * the q94 merge-table oracle and q94b's tokenize-with-learned-vocab
    * oracle (which re-LEARNS the merges so a data-dependent fit stays
    * fully gateable, the same move as q94 itself). */
  private def bpeStagesSqlGen(px: String, s0Sql: String): String = {
    val stages = (1 to BpeRounds).map { i =>
      val prev = s"${px}s${i - 1}"
      s"""${px}p$i AS (SELECT l, r, SUM(cnt) AS c FROM (
         |  SELECT cnt, ss[i] AS l, ss[i + 1] AS r FROM (
         |    SELECT cnt, string_split(sym[2:len(sym) - 1], '||') AS ss
         |    FROM $prev) q, unnest(range(1, len(ss))) u(i)
         |  WHERE len(ss) >= 2) GROUP BY l, r),
         |${px}b$i AS (SELECT l, r, c FROM ${px}p$i ORDER BY c DESC, l, r LIMIT 1),
         |${px}s$i AS (SELECT word, cnt,
         |    replace(sym, '|' || ${px}b$i.l || '||' || ${px}b$i.r || '|',
         |      '|' || ${px}b$i.l || ${px}b$i.r || '|') AS sym
         |  FROM $prev, ${px}b$i)""".stripMargin
    }.mkString(",\n")
    s"""${px}w AS (SELECT word, COUNT(*) AS cnt
       |  FROM (SELECT unnest($DToks) AS word FROM documents) GROUP BY word),
       |${px}s0 AS (SELECT word, cnt,
       |    $s0Sql AS sym
       |  FROM ${px}w),
       |$stages""".stripMargin
  }

  private lazy val bpeStagesSql: String = bpeStagesSqlGen("",
    """'|' || array_to_string(list_transform(range(1, len(word) + 1),
      |      i -> word[i:i]), '||') || '|'""".stripMargin)

  /** Generated twin of q94: K unrolled CTE stages, each re-deriving the
    * weighted pair counts, the deterministic argmax, and the sentinel
    * replace — identical merge semantics via identical string surgery. */
  private lazy val bpeLearnOracle: String = {
    val out = (1 to BpeRounds).map(i =>
      s"SELECT $i AS round, l AS merge_left, r AS merge_right, " +
        s"l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeStagesSql
       |$out
       |ORDER BY round""".stripMargin
  }

  /** Tokenize the corpus with the LEARNED vocabulary — the learn→apply
    * loop closed for the tokenizer family (q94 learns the merges; this
    * spends them): per word the K merges apply in learned order via the
    * same sentinel replace chain, the per-word piece count is
    * vocabulary-sized metadata (computed once over DISTINCT words,
    * broadcast to the exploded corpus — at 100 TB the piece table is a
    * dim, never a corpus recompute), and each document reports its
    * length in learned-BPE units next to its word count. Oracle:
    * re-learn the identical merges (the q94 CTE chain), re-apply, and
    * re-aggregate — data-dependent vocab, still hash-gated exactly. */
  /** Memoized learned BPE merges (consumer-side; q94 itself re-trains). */
  private def bpeMergesLearned(s: SparkSession, dir: String): Seq[(String, String)] =
    memoTrained(s, dir, "bpe") {
      q94_bpe_learn(s, dir).orderBy(col("round")).collect()
        .map(r => (r.getAs[String]("merge_left"), r.getAs[String]("merge_right")))
        .toSeq
    }

  def q94b_bpe_tokenize(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeMergesLearned(s, dir)
    merges.foreach { case (l, r) => // same literal-safety guard as q94
      require(l.matches("[a-z0-9]+") && r.matches("[a-z0-9]+"),
        s"BPE merge symbols must be [a-z0-9]+: '$l', '$r'")
    }
    val symInit = "concat('|', array_join(transform(sequence(1, length(word))," +
      " i -> substring(word, i, 1)), '||'), '|')"
    val chain = merges.foldLeft(symInit) { case (acc, (l, r)) =>
      s"replace($acc, '|$l||$r|', '|$l$r|')"
    }
    val wordPieces = docToks(s, dir)
      .select(explode(col("t")).as("word")).distinct()
      .withColumn("sym", expr(chain))
      .withColumn("n_pieces", expr(
        "size(split(substring(sym, 2, length(sym) - 2), '\\\\|\\\\|'))").cast("long"))
      .select(col("word"), col("n_pieces"))
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("word"))
      .join(broadcast(wordPieces), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility report by language (q204) — the comparison
    * table every multilingual tokenizer evaluation publishes (fertility
    * = pieces per word, cf. the XLM-R tokenizer analyses of Rust et al.
    * ACL 2021, "How Good is Your Tokenizer?"): per language, how many
    * BPE pieces the LEARNED q94 vocabulary spends per 100 words and how
    * many characters ride in each piece. A language the vocabulary
    * under-serves shows high fertility — the signal that reweights the
    * tokenizer-training mixture. Consumes the q94 trainer memo
    * (learn→apply consumer, the q94b pattern) and stays integer-exact:
    * fertility as (100·pieces) div words, piece width as
    * (1000·chars) div pieces.
    *
    * Scale shape: identical to q94b — the pieces table is vocabulary-
    * sized (Heaps-bounded distinct words, broadcast), the corpus pass
    * is one explode + broadcast join + per-lang aggregate. */
  def q204_tokenizer_fertility(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeMergesLearned(s, dir)
    merges.foreach { case (l, r) =>
      require(l.matches("[a-z0-9]+") && r.matches("[a-z0-9]+"),
        s"BPE merge symbols must be [a-z0-9]+: '$l', '$r'")
    }
    val symInit = "concat('|', array_join(transform(sequence(1, length(word))," +
      " i -> substring(word, i, 1)), '||'), '|')"
    val chain = merges.foldLeft(symInit) { case (acc, (l, r)) =>
      s"replace($acc, '|$l||$r|', '|$l$r|')"
    }
    val wordPieces = docToks(s, dir)
      .select(explode(col("t")).as("word")).distinct()
      .withColumn("sym", expr(chain))
      .withColumn("n_pieces", expr(
        "size(split(substring(sym, 2, length(sym) - 2), '\\\\|\\\\|'))").cast("long"))
      .withColumn("n_chars", length(col("word")).cast("long"))
      .select(col("word"), col("n_pieces"), col("n_chars"))
    Tables.documentsFanned(s, dir)
      .select(col("doc_id"), col("lang"), Cleanse.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), col("lang"), explode(col("t")).as("word"))
      .join(broadcast(wordPieces), "word")
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("pieces_per_100w", expr("(100 * n_pieces) div n_words"))
      .withColumn("chars_per_piece_milli", expr("(1000 * n_chars) div n_pieces"))
      .orderBy(col("lang"))
  }

  private lazy val fertilityOracle: String =
    s"""WITH $bpeStagesSql,
       |wp AS (SELECT word,
       |    CAST(len(string_split(sym[2:len(sym) - 1], '||')) AS BIGINT)
       |      AS n_pieces,
       |    CAST(length(word) AS BIGINT) AS n_chars
       |  FROM s$BpeRounds),
       |toks AS (SELECT doc_id, lang, unnest($DToks) AS word FROM documents),
       |g AS (SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |    CAST(COUNT(*) AS BIGINT) AS n_words,
       |    CAST(SUM(wp.n_pieces) AS BIGINT) AS n_pieces,
       |    CAST(SUM(wp.n_chars) AS BIGINT) AS n_chars
       |  FROM toks JOIN wp USING (word) GROUP BY 1)
       |SELECT lang, n_docs, n_words, n_pieces, n_chars,
       |  (100 * n_pieces) // n_words AS pieces_per_100w,
       |  (1000 * n_chars) // n_pieces AS chars_per_piece_milli
       |FROM g ORDER BY lang""".stripMargin

  private lazy val bpeTokenizeOracle: String =
    s"""WITH $bpeStagesSql,
       |wp AS (SELECT word,
       |    CAST(len(string_split(sym[2:len(sym) - 1], '||')) AS BIGINT)
       |      AS n_pieces
       |  FROM s$BpeRounds),
       |toks AS (SELECT doc_id, unnest($DToks) AS word FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_bpe_tokens
       |FROM toks JOIN wp USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------- byte-level BPE (byte fallback)
  /** BYTE-LEVEL BPE — the fourth tokenizer family (GPT-2's public scheme:
    * Radford et al. 2019 run Sennrich merge learning over the UTF-8 BYTE
    * sequence, so ANY input tokenizes with zero unk — no alphabet
    * assumption; the practical tokenizer a training-data pipeline meets
    * in GPT-2/RoBERTa/Llama vocabularies). Symbols here are uppercase hex
    * byte pairs ("68", "65"; merged "6865") — always [0-9A-F]+, so the
    * |-sentinel encoding and SQL literals stay collision-free, and the
    * byte split derives identically in both engines: Spark `hex()` and
    * DuckDB `hex()` both hex the UTF-8 encoding uppercase. The trainer is
    * the SAME Heaps-bounded distinct-word loop as q94
    * ([[bpeMergeLoopOver]]); only the seed alphabet differs (byte-level's
    * whole point: a 256-symbol closed alphabet). Round-trip totality —
    * any UTF-8 string re-assembles from its pieces with zero unk under
    * ANY merge table — is SubwordSpec's property over
    * [[byteBpeSegments]]/[[byteBpeDecode]]. */
  private[graft] val byteSymInitSpark =
    "concat('|', array_join(transform(sequence(1, length(hex(word)) div 2)," +
      " i -> substring(hex(word), 2 * i - 1, 2)), '||'), '|')"

  def q112_bytebpe_learn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val syms0 = bpeWordFreqs(s, dir)
      .select(col("word"), col("cnt"), expr(byteSymInitSpark).as("sym"))
    bpeMergeLoopOver(syms0, "[0-9A-F]+")
      .toDF("round", "merge_left", "merge_right", "pair_count")
      .select(col("round"), col("merge_left"), col("merge_right"),
        concat(col("merge_left"), col("merge_right")).as("merged"),
        col("pair_count"))
      .orderBy(col("round"))
  }

  /** Apply chain for the learned byte merges (shared by q112b and the
    * q111 report row). */
  private def byteBpeChain(s: SparkSession, dir: String): String = {
    val merges = memoTrained(s, dir, "bytebpe") {
      q112_bytebpe_learn(s, dir).orderBy(col("round")).collect()
        .map(r => (r.getAs[String]("merge_left"), r.getAs[String]("merge_right")))
        .toSeq
    }
    merges.foreach { case (l, r) =>
      require(l.matches("[0-9A-F]+") && r.matches("[0-9A-F]+"),
        s"byte-BPE merge symbols must be hex: '$l', '$r'")
    }
    merges.foldLeft(byteSymInitSpark) { case (acc, (l, r)) =>
      s"replace($acc, '|$l||$r|', '|$l$r|')"
    }
  }

  /** Tokenize the corpus with the learned byte-level vocabulary — q94b's
    * learn→apply loop for the byte family: per-word piece counts are a
    * broadcast dim over DISTINCT words; each document reports its length
    * in byte-BPE units next to its word count. Oracle re-learns the
    * merges (bb-prefixed CTE chain) and re-applies. */
  def q112b_bytebpe_tokenize(s: SparkSession, dir: String): DataFrame = {
    val chain = byteBpeChain(s, dir)
    val wordPieces = docToks(s, dir)
      .select(explode(col("t")).as("word")).distinct()
      .withColumn("sym", expr(chain))
      .withColumn("n_pieces", expr(
        "size(split(substring(sym, 2, length(sym) - 2), '\\\\|\\\\|'))").cast("long"))
      .select(col("word"), col("n_pieces"))
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("word"))
      .join(broadcast(wordPieces), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_byte_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Scala twins of the engine's sentinel surgery, for the totality
    * property (SubwordSpec): `String.replace` is left-to-right
    * non-overlapping exactly like Spark/DuckDB `replace`. */
  private[graft] def byteBpeSym(word: String): String =
    word.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString("|", "||", "|")

  private[graft] def byteBpeSegments(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    require(word.nonEmpty, "byte-BPE segments of the empty string")
    var sym = byteBpeSym(word)
    merges.foreach { case (l, r) => sym = sym.replace(s"|$l||$r|", s"|$l$r|") }
    sym.substring(1, sym.length - 1).split("\\|\\|").toSeq
  }

  private[graft] def byteBpeDecode(pieces: Seq[String]): String =
    new String(pieces.mkString.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8")

  private lazy val byteBpeStagesSql: String = bpeStagesSqlGen("bb",
    """'|' || array_to_string(list_transform(range(1, len(hex(word)) // 2 + 1),
      |      i -> substr(hex(word), 2 * i - 1, 2)), '||') || '|'""".stripMargin)

  /** Generated twin of q112: the same K-stage replay as q94's oracle over
    * the byte-mapped alphabet (bb-prefixed CTEs so char and byte
    * trainings can coexist in one WITH block for q111). */
  private lazy val byteBpeLearnOracle: String = {
    val out = (1 to BpeRounds).map(i =>
      s"SELECT $i AS round, l AS merge_left, r AS merge_right, " +
        s"l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM bbb$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $byteBpeStagesSql
       |$out
       |ORDER BY round""".stripMargin
  }

  private lazy val byteBpeTokenizeOracle: String =
    s"""WITH $byteBpeStagesSql,
       |bwp AS (SELECT word,
       |    CAST(len(string_split(sym[2:len(sym) - 1], '||')) AS BIGINT)
       |      AS n_pieces
       |  FROM bbs$BpeRounds),
       |btoks AS (SELECT doc_id, unnest($DToks) AS word FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_byte_tokens
       |FROM btoks JOIN bwp USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------- WordPiece vocabulary TRAINING (q116)
  /** WORDPIECE vocabulary TRAINING — the fifth tokenizer family, and the
    * training-side completion of q72b/q85b's fixed-vocab WordPiece
    * INFERENCE (reference `LDA_logic.py` tokenizes with a frozen spaCy
    * vocab; a pipeline that ships its own tokenizer trains one). Schuster
    * & Nakajima 2012 ("Japanese and Korean voice search"), as implemented
    * by the public HF `tokenizers` WordPiece trainer: identical merge
    * loop to BPE (q94) except the argmax rule — merge the adjacent pair
    * maximizing the LIKELIHOOD score count(l,r) / (count(l) · count(r)),
    * not the raw pair count — and non-initial symbols carry the `##`
    * continuation prefix, so `a ##b` merges to `ab` while `##a ##b`
    * merges to `##ab` (position-dependent vocabulary, WordPiece's
    * signature).
    *
    * Exactness: the score is a rational; both engines materialize it as
    * the EXACT integer floor(count(l,r) · 10^18 / (count(l) ·
    * count(r))) — DuckDB in HUGEINT, the driver in BigInt (the engine's
    * per-round pair/symbol stats are vocabulary-sized, the same
    * Heaps-bounded trainer state as q105's unigram EM) — with a
    * deterministic (score desc, l, r) tiebreak, so any two rationals
    * closer than 10^-18 resolve identically in both engines. Since
    * count(l) ≥ count(l,r) and count(r) ≥ count(l,r), the scaled score
    * is ≤ 10^18 and fits BIGINT.
    *
    * Scale: one corpus aggregation (word frequencies), then K rounds of
    * vocabulary-sized work — the distinct-word symbol table explodes to
    * (symbol, freq) and (pair, count) aggregates whose cardinality is
    * Heaps-bounded; driver state per round is those two small tables,
    * O(1) in corpus size. Merge application is the q94 sentinel-replace
    * primitive (`#` never collides with the `|` delimiter or a quote). */
  private[graft] val WpRounds = 10
  private val WpScale = BigInt(10).pow(18)

  private val wpSymInitSpark =
    "concat('|', array_join(transform(sequence(1, length(word))," +
      " i -> CASE WHEN i = 1 THEN substring(word, i, 1)" +
      " ELSE concat('##', substring(word, i, 1)) END), '||'), '|')"

  /** The learned merge table: (round, l, r, merged, pair_count,
    * score_key). Driver-side exact argmax over collected vocab-sized
    * round stats (BigInt cross-check of the HUGEINT oracle). */
  private[graft] def wpLearnMerges(s: SparkSession, dir: String)
      : Seq[(Int, String, String, String, Long, Long)] = {
    var syms = bpeWordFreqs(s, dir).select(col("word"), col("cnt"),
      expr(wpSymInitSpark).as("sym")).localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long, Long)]
    for (round <- 1 to WpRounds) {
      val ex = syms.select(col("cnt"),
        expr("split(substring(sym, 2, length(sym) - 2), '\\\\|\\\\|')").as("ss"))
      val f = ex.select(explode(col("ss")).as("s0"), col("cnt"))
        .groupBy(col("s0")).agg(sum(col("cnt")).as("f")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val pairs = ex.filter(size(col("ss")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(ss) - 1)," +
            " i -> struct(element_at(ss, i) AS l, element_at(ss, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(pairs.nonEmpty, s"WordPiece round $round: vocabulary exhausted")
      val best = pairs.map { case (l, r, c) =>
        val sk = (BigInt(c) * WpScale) / (BigInt(f(l)) * BigInt(f(r)))
        ((-sk, l, r), (l, r, c, sk.toLong))
      }.minBy(_._1)._2
      val (l, r, c, sk) = best
      require(l.matches("(##)?[a-z0-9]+") && r.matches("##[a-z0-9]+"),
        s"WordPiece merge symbols out of charset: '$l', '$r'")
      val merged = l + r.substring(2)
      merges += ((round, l, r, merged, c, sk))
      val next = syms.withColumn("sym",
        expr(s"replace(sym, '|$l||$r|', '|$merged|')")).localCheckpoint()
      graft.ml.Similarity.pinnedRdds(syms).foreach(_.unpersist(blocking = false))
      syms = next
    }
    graft.ml.Similarity.pinnedRdds(syms).foreach(_.unpersist(blocking = false))
    merges.toSeq
  }

  def q116_wordpiece_learn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    wpLearnMerges(s, dir)
      .toDF("round", "merge_left", "merge_right", "merged", "pair_count",
        "score_key")
      .orderBy(col("round"))
  }

  /** The training replay as CTE stages: per round the exploded symbol
    * table feeds BOTH the symbol-frequency and pair-count aggregates,
    * the argmax key is the exact HUGEINT floor-scaled likelihood, and
    * the merge drops r's `##` prefix. */
  private lazy val wpStagesSql: String = {
    val stages = (1 to WpRounds).map { i =>
      val prev = s"wps${i - 1}"
      s"""wpe$i AS MATERIALIZED (SELECT cnt,
         |    string_split(sym[2:len(sym) - 1], '||') AS ss FROM $prev),
         |wpf$i AS (SELECT s0, SUM(cnt) AS f FROM (
         |    SELECT cnt, unnest(ss) AS s0 FROM wpe$i) GROUP BY s0),
         |wpp$i AS (SELECT l, r, SUM(cnt) AS c FROM (
         |    SELECT cnt, ss[i] AS l, ss[i + 1] AS r FROM wpe$i,
         |      unnest(range(1, len(ss))) u(i)
         |    WHERE len(ss) >= 2) GROUP BY l, r),
         |wpb$i AS (SELECT l, r, c, CAST((CAST(c AS HUGEINT) *
         |      1000000000000000000) // (CAST(fl.f AS HUGEINT) *
         |      CAST(fr.f AS HUGEINT)) AS BIGINT) AS sk
         |  FROM wpp$i JOIN wpf$i fl ON fl.s0 = wpp$i.l
         |    JOIN wpf$i fr ON fr.s0 = wpp$i.r
         |  ORDER BY sk DESC, l, r LIMIT 1),
         |wps$i AS (SELECT word, cnt, replace(sym,
         |    '|' || b.l || '||' || b.r || '|',
         |    '|' || b.l || b.r[3:] || '|') AS sym
         |  FROM $prev, wpb$i b)""".stripMargin
    }.mkString(",\n")
    s"""wpw AS (SELECT word, COUNT(*) AS cnt
       |  FROM (SELECT unnest($DToks) AS word FROM documents) GROUP BY word),
       |wps0 AS (SELECT word, cnt,
       |    '|' || array_to_string(list_transform(range(1, len(word) + 1),
       |      i -> CASE WHEN i = 1 THEN word[i:i]
       |        ELSE '##' || word[i:i] END), '||') || '|' AS sym
       |  FROM wpw),
       |$stages""".stripMargin
  }

  private lazy val wpLearnOracle: String = {
    val out = (1 to WpRounds).map(i =>
      s"SELECT $i AS round, l AS merge_left, r AS merge_right, " +
        s"l || r[3:] AS merged, CAST(c AS BIGINT) AS pair_count, " +
        s"sk AS score_key FROM wpb$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $wpStagesSql
       |$out
       |ORDER BY round""".stripMargin
  }

  /** Tokenize with the LEARNED WordPiece vocabulary — unlike BPE, whose
    * inference replays the merges, WordPiece INFERENCE is greedy
    * longest-match (MaxMatch) against the final vocab: alphabet symbols
    * as seeded (word-initial chars plain, non-initial chars `##`-marked)
    * plus the K merged symbols. Zero unk over the training corpus by
    * construction — every char of every word is in the alphabet in the
    * form its position needs. Per-word piece counts are computed once
    * over DISTINCT words (Heaps-bounded dim, broadcast to the exploded
    * corpus); the oracle replays the training and walks each word with a
    * recursive CTE whose step length is the MAX matching piece length —
    * identical MaxMatch semantics. */
  /** Broadcast-vocab MaxMatch piece counter over one word — shared by
    * q116b and the q111 report's fifth row. */
  private def wpTrainedNPiecesUdf(s: SparkSession, dir: String)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val (plain, cont, maxP, maxC) = memoTrained(s, dir, "wordpiece") {
      val merged = wpLearnMerges(s, dir).map(_._4)
      // alphabet in positional form, from the same distinct-word table the
      // trainer seeds from (vocab-sized collect: ≤ 2 × charset)
      val alpha = bpeWordFreqs(s, dir)
        .select(explode(expr(
          "transform(sequence(1, length(word))," +
            " i -> CASE WHEN i = 1 THEN substring(word, i, 1)" +
            " ELSE concat('##', substring(word, i, 1)) END)")).as("p"))
        .distinct().collect().map(_.getString(0))
      val vocab = (alpha ++ merged).toSet
      val plain0 = vocab.filterNot(_.startsWith("##"))
      val cont0 = vocab.filter(_.startsWith("##"))
      (plain0, cont0,
        if (plain0.isEmpty) 1 else plain0.map(_.length).max,
        if (cont0.isEmpty) 3 else cont0.map(_.length - 2).max)
    }
    val bc = s.sparkContext.broadcast((plain, cont, maxP, maxC))
    udf { (word: String) =>
      val (pl, co, mp, mc) = bc.value
      var pos = 0; var n = 0L
      while (pos < word.length) {
        val first = pos == 0
        var len = math.min(if (first) mp else mc, word.length - pos)
        var found = 0
        while (len >= 1 && found == 0) {
          val cand =
            if (first) word.substring(pos, pos + len)
            else "##" + word.substring(pos, pos + len)
          if (if (first) pl(cand) else co(cand)) found = len
          len -= 1
        }
        require(found > 0, s"WordPiece walk stuck on '$word' at $pos")
        pos += found; n += 1
      }
      n
    }
  }

  def q116b_wordpiece_tokenize(s: SparkSession, dir: String): DataFrame = {
    val nPieces = wpTrainedNPiecesUdf(s, dir)
    val wordPieces = docToks(s, dir)
      .select(explode(col("t")).as("word")).distinct()
      .select(col("word"), nPieces(col("word")).as("n_pieces"))
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("word"))
      .join(broadcast(wordPieces), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_wp_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The learned vocab + MaxMatch walk as CTEs (shared by q116b's oracle
    * and the q111 report's fifth row). `wpv` = alphabet-in-position-form
    * ∪ merged symbols; the recursive step consumes the LONGEST matching
    * piece (plain form at pos 0, `##` form after). */
  private lazy val wpApplyCtes: String = {
    val mergedRows = (1 to WpRounds)
      .map(i => s"SELECT l || r[3:] AS piece FROM wpb$i")
      .mkString(" UNION ALL ")
    // wpv must NOT be MATERIALIZED: DuckDB 1.0 silently evaluates a
    // correlated subquery against a materialized CTE inside a recursive
    // term to NULL (observed; non-materialized correlates correctly)
    s"""wpv AS (SELECT DISTINCT piece FROM (
       |    SELECT CASE WHEN i = 1 THEN word[i:i]
       |      ELSE '##' || word[i:i] END AS piece
       |    FROM wpw, unnest(range(1, len(word) + 1)) u(i)
       |  UNION ALL $mergedRows)),
       |wtrec AS (
       |  SELECT word AS w, 0 AS pos, 0 AS n FROM wpw
       |  UNION ALL
       |  SELECT w, pos + ml, n + 1 FROM (
       |    SELECT b.w, b.pos, b.n, MAX(CASE WHEN b.pos = 0 THEN len(v.piece)
       |        ELSE len(v.piece) - 2 END) AS ml
       |    FROM wtrec b JOIN wpv v
       |      ON (b.pos = 0 AND v.piece NOT LIKE '##%'
       |          AND v.piece = b.w[1:len(v.piece)])
       |        OR (b.pos > 0 AND v.piece LIKE '##%'
       |          AND v.piece[3:] = b.w[b.pos + 1:b.pos + len(v.piece) - 2])
       |    WHERE b.pos < len(b.w)
       |    GROUP BY b.w, b.pos, b.n) q),
       |wtc AS MATERIALIZED (SELECT w AS word, n FROM wtrec
       |  WHERE pos = len(w))""".stripMargin
  }

  private lazy val wpTokenizeOracle: String =
    s"""WITH RECURSIVE $wpStagesSql,
       |$wpApplyCtes,
       |wttoks AS (SELECT doc_id, unnest($DToks) AS word FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n) AS BIGINT) AS n_wp_tokens
       |FROM wttoks JOIN wtc USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------- n-gram-LM quality scoring (CCNet, q117)
  /** N-GRAM-LM QUALITY SCORING — the CCNet stage (Wenzek et al. 2020:
    * train an LM on trusted text, order the crawl by perplexity, keep the
    * head/middle buckets; reference has no counterpart — its corpus is
    * assumed clean). LM = stupid-backoff n-gram membership (Brants et al.
    * 2007's backoff structure): trigram/bigram/unigram count tables
    * trained on the md5-even doc half (q87b's split convention),
    * min-count-2 pruned; each token position scores its backoff level —
    * 3 if its trigram is in-model, else 2 for the bigram, else 1 for the
    * unigram, else 0 — and a doc's mean level is its model-fit score
    * (higher = better modeled = lower perplexity). Docs rank globally by
    * (mean level desc, doc_id) into ntile(3) head/middle/tail buckets;
    * keep = not tail, exactly CCNet's bucket rule.
    *
    * Exactness: levels and sums are integers; the only double is the
    * ntile ordering key score_sum/n_tokens — one IEEE division, correctly
    * rounded identically in both engines, with doc_id breaking ties.
    * A REAL KenLM swaps the level for a log-prob sum; that stays an
    * engine-only accuracy-contract (log() isn't correctly rounded across
    * engines — the same reason q87 gates on the logit, not the sigmoid).
    *
    * Scale: the pruned gram tables are (key, count) dims co-partitioned
    * with the exploded positions on the gram key — three hash joins, no
    * driver state (Catalyst broadcasts them while small). The global
    * perplexity order is CCNet's own single corpus sort; at 100 TB the
    * ntile window becomes a range-partitioned sort, or the documented
    * q41/q41b swap: approx_percentile cutoffs on the ratio instead of
    * exact ranks. */
  private[graft] val LmMinCount = 2

  /** (doc_id, is_train, w1, g2, g3) position frame shared by q117 and the
    * streaming model export: posexplode i is 0-based, so w1 = token i,
    * prev = element_at(t, i) (1-based), prev2 = element_at(t, i - 1). */
  private def lmPositions(s: SparkSession, dir: String): DataFrame =
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), col("t"),
        (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1),
          16, 10).cast("int") % 2 === 0).as("is_train"))
      .select(col("doc_id"), col("is_train"), col("t"),
        posexplode(col("t")).as(Seq("i", "w1")))
      .select(col("doc_id"), col("is_train"), col("w1"),
        when(col("i") >= 1,
          concat_ws(" ", element_at(col("t"), col("i")), col("w1"))).as("g2"),
        when(col("i") >= 2,
          concat_ws(" ", element_at(col("t"), col("i") - 1),
            element_at(col("t"), col("i")), col("w1"))).as("g3"))
      .localCheckpoint(false) // one pass feeds the three gram dims + scoring

  private def lmTable(pos: DataFrame, key: String, as: String): DataFrame =
    pos.filter(col("is_train") && col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("c"))
      .filter(col("c") >= LmMinCount)
      .select(col(key).as(as))

  /** The trained LM as driver sets (tri, bi, uni) for the streaming gate
    * — memoized like any other training. Metadata-sized here; at 100 TB
    * a pruned trigram table outgrows a closure, and the documented swaps
    * are the stream-static gram join (the [[graft.streaming.Sessions
    * .decontaminateStream]] shape) or a constant-size Bloom of each gram
    * table (no false negatives on the keep side matters less than scale:
    * a Bloom false positive only inflates a token's level). */
  private[graft] def lmModelSets(s: SparkSession, dir: String)
      : (Set[String], Set[String], Set[String]) =
    memoTrained(s, dir, "ngramlm") {
      val pos = lmPositions(s, dir)
      def setOf(k: String): Set[String] =
        lmTable(pos, k, "x").collect().map(_.getString(0)).toSet
      (setOf("g3"), setOf("g2"), setOf("w1"))
    }

  def q117_ngramlm_quality(s: SparkSession, dir: String): DataFrame = {
    val pos = lmPositions(s, dir)
    def lm(key: String, as: String): DataFrame = lmTable(pos, key, as)
    val scored = pos
      .join(lm("g3", "t3"), col("g3") === col("t3"), "left")
      .join(lm("g2", "b2"), col("g2") === col("b2"), "left")
      .join(lm("w1", "u1"), col("w1") === col("u1"), "left")
      .select(col("doc_id"),
        when(col("t3").isNotNull, 3L).when(col("b2").isNotNull, 2L)
          .when(col("u1").isNotNull, 1L).otherwise(0L).as("level"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("level")).as("score_sum"),
        count_if(col("level") === 3).as("n_l3"),
        count_if(col("level") === 2).as("n_l2"),
        count_if(col("level") === 1).as("n_l1"),
        count_if(col("level") === 0).as("n_l0"))
    perDoc
      .withColumn("nt", expr(
        "ntile(3) OVER (ORDER BY score_sum / n_tokens DESC, doc_id)"))
      .select(col("doc_id"), col("n_tokens"), col("score_sum"),
        col("n_l3"), col("n_l2"), col("n_l1"), col("n_l0"),
        expr("element_at(array('head', 'middle', 'tail'), nt)")
          .as("ppl_bucket"),
        (col("nt") <= 2).as("keep"))
      .orderBy(col("doc_id"))
  }

  private lazy val ngramLmOracle: String =
    s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
       |base AS (SELECT doc_id, t,
       |    (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS INT)
       |      % 2 = 0) AS is_train
       |  FROM toks WHERE len(t) >= 1),
       |pos AS (SELECT doc_id, is_train, t[i] AS w1,
       |    CASE WHEN i >= 2 THEN t[i - 1] || ' ' || t[i] END AS g2,
       |    CASE WHEN i >= 3
       |      THEN t[i - 2] || ' ' || t[i - 1] || ' ' || t[i] END AS g3
       |  FROM base, unnest(range(1, len(t) + 1)) u(i)),
       |tri AS (SELECT g3 FROM pos WHERE is_train AND g3 IS NOT NULL
       |  GROUP BY g3 HAVING COUNT(*) >= $LmMinCount),
       |bi AS (SELECT g2 FROM pos WHERE is_train AND g2 IS NOT NULL
       |  GROUP BY g2 HAVING COUNT(*) >= $LmMinCount),
       |uni AS (SELECT w1 FROM pos WHERE is_train
       |  GROUP BY w1 HAVING COUNT(*) >= $LmMinCount),
       |lv AS (SELECT p.doc_id,
       |    CASE WHEN tri.g3 IS NOT NULL THEN 3
       |      WHEN bi.g2 IS NOT NULL THEN 2
       |      WHEN uni.w1 IS NOT NULL THEN 1 ELSE 0 END AS level
       |  FROM pos p LEFT JOIN tri ON p.g3 = tri.g3
       |    LEFT JOIN bi ON p.g2 = bi.g2
       |    LEFT JOIN uni ON p.w1 = uni.w1),
       |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(level) AS BIGINT) AS score_sum,
       |    CAST(SUM(CASE WHEN level = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_l3,
       |    CAST(SUM(CASE WHEN level = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_l2,
       |    CAST(SUM(CASE WHEN level = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_l1,
       |    CAST(SUM(CASE WHEN level = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_l0
       |  FROM lv GROUP BY doc_id),
       |r AS (SELECT *, ntile(3) OVER (ORDER BY score_sum / n_tokens DESC,
       |    doc_id) AS nt FROM d)
       |SELECT doc_id, n_tokens, score_sum, n_l3, n_l2, n_l1, n_l0,
       |  (['head', 'middle', 'tail'])[nt] AS ppl_bucket,
       |  (nt <= 2) AS keep
       |FROM r ORDER BY doc_id""".stripMargin

  // ----------------------------- packing-efficiency report (q121)
  /** PACKING-EFFICIENCY REPORT — the table a team reads before choosing a
    * sequence-assembly strategy (the trade-off studied by the
    * packing/truncation literature, e.g. Krell et al. 2021 and the
    * "fewer truncations" line): for each strategy at seqLen 64, total
    * training sequences, padding tokens burned, content tokens dropped,
    * and utilization. Three strategies over the same REAL subword
    * lengths (q72b's lexer + greedy WordPiece walk):
    * `concat_packed` (q72's 32-bucket concat-and-slice — pads only each
    * bucket's tail), `pad_per_doc` (doc-aligned sequences, each doc
    * padded to its own ceiling — no cross-doc attention contamination,
    * maximal padding), `truncate_one_seq` (one sequence per doc, BERT
    * style — drops every token past seqLen).
    *
    * All-integer except the one rounded utilization division, so the
    * gate is exact; the oracle replays the recursive tokenizer walk and
    * the three strategy aggregations. Scale: one subword-length pass
    * (the q115 expression) feeds three bounded aggregations —
    * strategy-cardinality output. */
  def q121_packing_efficiency(s: SparkSession, dir: String): DataFrame = {
    import graft.text.Subword
    val seqLen = 64L
    val perDoc = Tables.documentsFanned(s, dir)
      .select(col("doc_id"),
        aggregate(
          regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)),
          lit(0L),
          (a, p) => a + Subword.subword_count(p).cast("long")).as("n"))
      .filter(col("n") >= 1)
      .withColumn("bucket", pmod(col("doc_id"), lit(32)))
      .localCheckpoint(false) // one tokenizer pass feeds three strategies
    val concat = perDoc.groupBy(col("bucket")).agg(sum(col("n")).as("bt"))
      .agg(sum(expr("(bt + 63) div 64")).cast("long").as("n_sequences"),
        sum(col("bt")).cast("long").as("used"))
      .select(lit("concat_packed").as("strategy"), col("n_sequences"),
        lit(0L).as("n_dropped_tokens"), col("used"))
    val padded = perDoc
      .agg(sum(expr("(n + 63) div 64")).cast("long").as("n_sequences"),
        sum(col("n")).cast("long").as("used"))
      .select(lit("pad_per_doc").as("strategy"), col("n_sequences"),
        lit(0L).as("n_dropped_tokens"), col("used"))
    val trunc = perDoc
      .agg(count(lit(1)).as("n_sequences"),
        sum(least(col("n"), lit(seqLen))).cast("long").as("used"),
        sum(greatest(col("n") - seqLen, lit(0L))).cast("long")
          .as("n_dropped_tokens"))
      .select(lit("truncate_one_seq").as("strategy"), col("n_sequences"),
        col("n_dropped_tokens"), col("used"))
    concat.unionByName(padded).unionByName(trunc)
      .select(col("strategy"), col("n_sequences"),
        (col("n_sequences") * seqLen - col("used")).as("n_pad_tokens"),
        col("n_dropped_tokens"),
        round(col("used").cast("double") / (col("n_sequences") * seqLen), 6)
          .as("utilization_r"))
      .orderBy(col("strategy"))
  }

  private lazy val packingEfficiencyOracle: String =
    s"""WITH RECURSIVE lex AS (SELECT doc_id,
       |    regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS ps
       |  FROM documents),
       |pwords AS (SELECT DISTINCT unnest(ps) AS w FROM lex),
       |prec AS (
       |  SELECT w, 1 AS pos, 0 AS cnt FROM pwords
       |  UNION ALL
       |  SELECT w, pos + ${graft.text.Subword.matchLenSql("w", "pos")}, cnt + 1
       |  FROM prec WHERE pos <= len(w)),
       |pwc AS (SELECT w, cnt FROM prec WHERE pos > len(w)),
       |pdw AS (SELECT doc_id, unnest(ps) AS w FROM lex),
       |pc AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n
       |  FROM pdw JOIN pwc USING (w) GROUP BY doc_id),
       |pd AS (SELECT doc_id, n, doc_id % 32 AS bucket FROM pc WHERE n >= 1),
       |pb AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS bt FROM pd
       |  GROUP BY bucket),
       |u AS (
       |  SELECT 'concat_packed' AS strategy,
       |    CAST(SUM((bt + 63) // 64) AS BIGINT) AS n_sequences,
       |    CAST(0 AS BIGINT) AS n_dropped_tokens,
       |    CAST(SUM(bt) AS BIGINT) AS used
       |  FROM pb
       |  UNION ALL
       |  SELECT 'pad_per_doc', CAST(SUM((n + 63) // 64) AS BIGINT),
       |    CAST(0 AS BIGINT), CAST(SUM(n) AS BIGINT) FROM pd
       |  UNION ALL
       |  SELECT 'truncate_one_seq', CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(GREATEST(n - 64, 0)) AS BIGINT),
       |    CAST(SUM(LEAST(n, 64)) AS BIGINT) FROM pd)
       |SELECT strategy, n_sequences,
       |  n_sequences * 64 - used AS n_pad_tokens, n_dropped_tokens,
       |  round(CAST(used AS DOUBLE) / (n_sequences * 64), 6) AS utilization_r
       |FROM u ORDER BY strategy""".stripMargin

  // ----------------------------- source-divergence audit (q119)
  /** SOURCE-DIVERGENCE AUDIT — which tokens distinguish each source from
    * the corpus (Monroe-Colaresi-Quinn 2008 "Fightin' Words" family:
    * Dirichlet-smoothed frequency-ratio ranking; the domain-mix audit a
    * team reads before weighting sources). Per (source, token):
    * score = ((c_src + 1) · (n_all + V)) / ((c_all + 1) · (n_src + V)),
    * add-one smoothed over the vocab size V — a token's relative
    * over-representation in the source vs the whole corpus; top-10 per
    * source by (score desc, token).
    *
    * Exactness: counts are integers; both products stay below 2^53 at
    * test SFs so the one division is the only rounding, identical in
    * both engines (at 100 TB the products leave exact-integer range but
    * remain correctly-rounded identically — the ordering stays
    * cross-engine deterministic with the token tiebreak).
    *
    * Scale: three aggregates off one shared token frame (per-(source,
    * token), per-token, per-source), the corpus-wide scalars broadcast;
    * the per-source top-10 is a bounded-heap WindowGroupLimit (literal
    * rank bound). Vocabulary-sized frames everywhere after the first
    * aggregation — Heaps' law. */
  def q119_source_divergence(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documentsFanned(s, dir)
      .select(col("source"), explode(Cleanse.tokens(col("text"))).as("w"))
      .localCheckpoint(false) // one pass feeds the three count aggregates
    val bySrc = toks.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c_src"))
    val byTok = toks.groupBy(col("w")).agg(count(lit(1)).as("c_all"))
    val bySrcTot = toks.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val totals = byTok.agg(sum(col("c_all")).as("n_all"),
      count(lit(1)).as("v"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("score_r").desc, col("w"))
    bySrc.join(byTok, Seq("w")).join(bySrcTot, Seq("source"))
      .crossJoin(broadcast(totals))
      .select(col("source"), col("w"), col("c_src"), col("c_all"),
        round((col("c_src") + 1) * (col("n_all") + col("v")) /
          ((col("c_all") + 1) * (col("n_src") + col("v"))), 6).as("score_r"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= 10)
      .select(col("source"), col("rank"), col("w").as("token"),
        col("c_src"), col("c_all"), col("score_r"))
      .orderBy(col("source"), col("rank"))
  }

  private lazy val sourceDivergenceOracle: String =
    s"""WITH toks AS (SELECT source, unnest($DToks) AS w FROM documents),
       |bysrc AS (SELECT source, w, COUNT(*) AS c_src FROM toks
       |  GROUP BY source, w),
       |bytok AS (SELECT w, COUNT(*) AS c_all FROM toks GROUP BY w),
       |bysrctot AS (SELECT source, COUNT(*) AS n_src FROM toks
       |  GROUP BY source),
       |tot AS (SELECT CAST(SUM(c_all) AS BIGINT) AS n_all,
       |    CAST(COUNT(*) AS BIGINT) AS v FROM bytok),
       |scored AS (SELECT source, w, c_src, c_all,
       |    round((c_src + 1) * (n_all + v) /
       |      ((c_all + 1) * (n_src + v)), 6) AS score_r
       |  FROM bysrc JOIN bytok USING (w) JOIN bysrctot USING (source), tot),
       |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
       |    ORDER BY score_r DESC, w) AS rank FROM scored)
       |SELECT source, CAST(rank AS INTEGER) AS rank, w AS token,
       |  CAST(c_src AS BIGINT) AS c_src, CAST(c_all AS BIGINT) AS c_all,
       |  score_r
       |FROM ranked WHERE rank <= 10 ORDER BY source, rank""".stripMargin

  // ------------------------------------- unigram-LM tokenizer training
  /** Unigram-LM (SentencePiece-style) tokenizer TRAINING — the third
    * tokenizer family next to BPE merge LEARNING (q94) and WordPiece
    * INFERENCE (q72b/q85b). Kudo 2018 ("Subword regularization", public
    * algorithm): seed a candidate vocabulary from frequent substrings,
    * alternate (E) segmenting the corpus under the current model with (M)
    * re-estimating piece scores from the segmentations, and prune the
    * least-useful pieces each round until the vocabulary reaches size.
    *
    * This implementation is the deterministic hard-EM (Viterbi-EM)
    * variant, integer-exact so the whole trajectory hash-gates cross-
    * engine (the q87 lesson: no transcendentals through a gate — float
    * log-likelihoods would differ in final ulps between libm's):
    *  - segmentation objective: fewest pieces, tie-broken by highest
    *    total piece score, then lexicographically smallest piece
    *    sequence. Encoded as one sortable string key
    *    (zeropad(n_pieces) ++ zeropad(1e12 - score_sum) ++ path) so the
    *    DP argmin is MIN(key) in both engines — no float compares, no
    *    ordering ambiguity anywhere.
    *  - M-step: piece score := Viterbi usage count (frequency-weighted).
    *  - prune: the `UniPrunePerRound` multi-char pieces with the lowest
    *    usage (ties by piece) drop each round; single chars never drop,
    *    so every word stays segmentable.
    *
    * Production shape, exactly SentencePiece's trainer: the corpus is
    * touched ONCE (word-frequency agg); every EM round runs on the
    * DISTINCT WORD table (Heaps-bounded) with the model broadcast. The
    * E-step is map-side per word (a compiled UDF doing the O(len ×
    * maxPiece) DP with the broadcast vocab — the hot loop is per-row
    * imperative, the one place a UDF beats any expression tree), the
    * M-step is one vocabulary-sized agg, and the driver holds only the
    * pruned-piece rows per round (q94's one-scalar-per-round
    * discipline). Output: the full prune trajectory + final vocabulary,
    * hash-gated; the oracle re-runs ALL rounds as generated CTE stages
    * with the DP unrolled per position (bpeStagesSql discipline). */
  private[graft] val UniMaxPiece = 6
  private[graft] val UniSeedMulti = 32
  private[graft] val UniRounds = 4
  private[graft] val UniPrunePerRound = 6
  private[graft] val UniMaxWordLen = 12

  /** Viterbi key for one word under a (piece → score) model: the encoded
    * best-segmentation key (see q105 scaladoc); `null` never occurs while
    * every char stays in the vocabulary. Shared by the trainer UDF and
    * SubwordSpec's brute-force oracle. */
  private[graft] def uniSegmentKey(word: String,
      vocab: scala.collection.Map[String, Long]): String = {
    val L = word.length
    val dp = new Array[String](L + 1)
    dp(0) = "00" + "1000000000000"
    var p = 1
    while (p <= L) {
      var j = math.max(0, p - UniMaxPiece)
      while (j < p) {
        if (dp(j) != null) {
          val piece = word.substring(j, p)
          vocab.get(piece) match {
            case Some(score) =>
              val np = dp(j).substring(0, 2).toInt + 1
              val inv = dp(j).substring(2, 15).toLong - score
              val cand = f"$np%02d" + f"$inv%013d" + dp(j).substring(15) + "|" + piece
              if (dp(p) == null || cand < dp(p)) dp(p) = cand
            case None => ()
          }
        }
        j += 1
      }
      p += 1
    }
    dp(L)
  }

  /** The training loop shared by q105 (emits the trajectory) and q105b
    * (spends the final vocabulary): returns (prune trajectory rows,
    * final piece → score model). */
  private[graft] def uniTrain(s: SparkSession, dir: String)
      : (Seq[(Int, String, String, Long)], Map[String, Long]) = {
    val words = docToks(s, dir)
      .select(explode(col("t")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // distinct-word table: Heaps-bounded metadata
    val maxLen = words.agg(max(length(col("word")))).collect()(0).getInt(0)
    require(maxLen <= UniMaxWordLen,
      s"word length $maxLen exceeds the unrolled DP bound $UniMaxWordLen")
    // seed candidates: every substring up to UniMaxPiece chars, scored by
    // frequency-weighted occurrence count (each occurrence counts)
    val subs = words.select(col("cnt"), explode(expr(
      s"""flatten(transform(sequence(1, length(word)), i ->
         |  transform(sequence(i, least(length(word), i + ${UniMaxPiece - 1})),
         |    j -> substring(word, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("score"))
    val seed = subs.filter(length(col("piece")) === 1).unionByName(
      subs.filter(length(col("piece")) > 1)
        .orderBy(col("score").desc, col("piece")).limit(UniSeedMulti))
    // the model is vocabulary-sized (chars + UniSeedMulti) — collect and
    // broadcast, exactly how a real trainer ships its piece table
    var vocab = seed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // The DP key's inverted-score field is `1e12 - score_sum` zero-padded
    // to 13 digits (uniSegmentKey / the oracle's lpad(...,13,'0')): a
    // cumulative score above 1e12 goes NEGATIVE, the lexicographic
    // ordering inverts, and Scala's %013d diverges from DuckDB's lpad —
    // a silent cross-engine drift at corpus scales where char-frequency
    // scores are corpus-cardinality (round-12 advice). Guard the worst
    // case (max piece score × max pieces per word) like the maxLen guard;
    // a production trainer at 100 TB rescales scores (they are relative
    // weights — dividing all by a constant preserves every argmin).
    def requireScoreBound(m: Map[String, Long]): Unit = {
      val worst = m.values.max * UniMaxWordLen.toLong
      require(worst < 1000000000000L,
        s"unigram piece score bound exceeded: max score ${m.values.max} x " +
          s"$UniMaxWordLen pieces = $worst >= 1e12 breaks the inverted-key " +
          "encoding; rescale corpus frequencies before training")
    }
    requireScoreBound(vocab)
    val trajectory = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (round <- 1 to UniRounds) {
      val bc = s.sparkContext.broadcast(vocab)
      val segKey = udf((w: String) => uniSegmentKey(w, bc.value))
      val usage = words.withColumn("key", segKey(col("word")))
        .select(col("cnt"),
          explode(expr("filter(split(substring(key, 16), '\\\\|'), x -> x <> '')"))
            .as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("usage"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // prune: lowest-usage multi-char pieces (usage asc, piece asc)
      val dropped = vocab.keysIterator.filter(_.length > 1).toSeq
        .map(p => (p, usage.getOrElse(p, 0L)))
        .sortBy { case (p, u) => (u, p) }
        .take(UniPrunePerRound)
      dropped.foreach { case (p, u) => trajectory += ((round, "drop", p, u)) }
      // M-step: score := usage; survivors only
      val droppedSet = dropped.map(_._1).toSet
      vocab = vocab.keysIterator.filterNot(droppedSet)
        .map(p => p -> usage.getOrElse(p, 0L)).toMap
      requireScoreBound(vocab) // M-step scores are usage counts — re-check
      bc.destroy()
    }
    graft.ml.Similarity.pinnedRdds(words).foreach(_.unpersist(blocking = false))
    (trajectory.toSeq, vocab)
  }

  def q105_unigram_learn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (trained, vocab) = uniTrain(s, dir)
    val trajectory = trained ++ vocab.toSeq.sortBy(_._1)
      .map { case (p, u) => (UniRounds + 1, "keep", p, u) }
    trajectory.toDF("stage", "action", "piece", "usage")
      .select(col("stage"), col("action"), col("piece"),
        col("usage").cast("long").as("usage"),
        (length(col("piece")) === 1).as("is_char"))
      .orderBy(col("stage"), col("piece"))
  }

  /** Generated twin of q105: seed CTEs + per-round DP unrolled by
    * position (d{r}_{p}), usage, prune and M-step stages — the oracle
    * re-RUNS the whole training, so the data-dependent trajectory stays
    * hash-gated exactly (q94's oracle-replays-training discipline).
    * Every stage is AS MATERIALIZED: each DP stage references up to
    * UniMaxPiece prior stages, and DuckDB inlines plain CTEs per
    * reference — Fibonacci-style expansion that re-opened documents
    * .parquet thousands of times ("Too many open files") before the
    * explicit materialization. */
  /** One unrolled Viterbi DP pass (round r against vocabulary CTE v) +
    * its per-word best-key CTE seg$r — shared by the training rounds and
    * q105b's apply round. */
  private def uniDpCtes(r: Int, v: String): String = {
    val dpStages = (1 to UniMaxWordLen).map { p =>
      val prior = (math.max(0, p - UniMaxPiece) until p)
        .map(j => s"SELECT word, cnt, pos, key FROM d${r}_$j")
        .mkString(" UNION ALL ")
      s"""d${r}_$p AS MATERIALIZED (SELECT word, cnt, $p AS pos, MIN(
         |    lpad(CAST(CAST(key[1:2] AS INT) + 1 AS VARCHAR), 2, '0') ||
         |    lpad(CAST(CAST(key[3:15] AS BIGINT) - vv.score AS VARCHAR), 13, '0') ||
         |    key[16:] || '|' || vv.piece) AS key
         |  FROM ($prior) b JOIN $v vv
         |    ON vv.piece = substr(b.word, b.pos + 1, $p - b.pos)
         |  WHERE len(b.word) >= $p
         |  GROUP BY word, cnt)""".stripMargin
    }.mkString(",\n")
    val allPos = (0 to UniMaxWordLen)
      .map(p => s"SELECT word, cnt, pos, key FROM d${r}_$p")
      .mkString(" UNION ALL ")
    s"""d${r}_0 AS MATERIALIZED (SELECT word, cnt, 0 AS pos, '001000000000000' AS key FROM uw),
       |$dpStages,
       |seg$r AS MATERIALIZED (SELECT word, cnt, key FROM ($allPos) WHERE pos = len(word))""".stripMargin
  }

  /** Seed + all training rounds: the shared CTE chain ending at the
    * final vocabulary v$UniRounds and the per-round drop tables. */
  private lazy val unigramTrainCtes: String = {
    val rounds = (1 to UniRounds).map { r =>
      val v = s"v${r - 1}"
      s"""${uniDpCtes(r, v)},
         |u$r AS MATERIALIZED (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS usage FROM (
         |    SELECT cnt, unnest(string_split(key[16:], '|')) AS piece FROM seg$r)
         |  WHERE piece <> '' GROUP BY piece),
         |drop$r AS MATERIALIZED (SELECT vv.piece, COALESCE(u$r.usage, 0) AS usage
         |  FROM $v vv LEFT JOIN u$r ON vv.piece = u$r.piece
         |  WHERE len(vv.piece) > 1
         |  ORDER BY usage, vv.piece LIMIT $UniPrunePerRound),
         |v$r AS MATERIALIZED (SELECT vv.piece, COALESCE(u$r.usage, 0) AS score
         |  FROM $v vv LEFT JOIN u$r ON vv.piece = u$r.piece
         |  WHERE vv.piece NOT IN (SELECT piece FROM drop$r))""".stripMargin
    }.mkString(",\n")
    s"""uw AS MATERIALIZED (SELECT word, COUNT(*) AS cnt
       |  FROM (SELECT unnest($DToks) AS word FROM documents) GROUP BY word),
       |sub AS MATERIALIZED (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS score FROM (
       |    SELECT cnt, unnest(flatten(list_transform(range(1, len(word) + 1),
       |      i -> list_transform(range(i, least(len(word), i + ${UniMaxPiece - 1}) + 1),
       |        j -> word[i:j])))) AS piece
       |    FROM uw) GROUP BY piece),
       |v0 AS MATERIALIZED (SELECT piece, score FROM sub WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, score FROM (SELECT piece, score FROM sub
       |    WHERE len(piece) > 1 ORDER BY score DESC, piece LIMIT $UniSeedMulti)),
       |$rounds""".stripMargin
  }

  private lazy val unigramLearnOracle: String = {
    val dropOut = (1 to UniRounds).map(r =>
      s"SELECT $r AS stage, 'drop' AS action, piece, usage FROM drop$r")
      .mkString("\nUNION ALL\n")
    s"""WITH $unigramTrainCtes
       |SELECT stage, action, piece, usage, (len(piece) = 1) AS is_char FROM (
       |$dropOut
       |UNION ALL
       |SELECT ${UniRounds + 1} AS stage, 'keep' AS action, piece, score AS usage
       |FROM v$UniRounds)
       |ORDER BY stage, piece""".stripMargin
  }

  /** Tokenize the corpus with the LEARNED unigram vocabulary — the
    * learn→apply loop closed for the third tokenizer family (q94b's move
    * on q94): one more Viterbi pass over the DISTINCT words with the
    * final model, per-word piece counts broadcast to the exploded
    * corpus, per-doc length in learned-unigram units next to the word
    * count. n_pieces decodes straight off the DP key's first two digits.
    * Oracle: re-TRAIN the identical model (the shared CTE chain), re-run
    * the apply DP round against the final vocabulary, re-aggregate —
    * the data-dependent vocabulary stays hash-gated exactly. */
  /** Memoized unigram model (consumer-side; q105 itself re-trains). */
  private def uniTrained(s: SparkSession, dir: String): Map[String, Long] =
    memoTrained(s, dir, "unigram")(uniTrain(s, dir)._2)

  def q105b_unigram_tokenize(s: SparkSession, dir: String): DataFrame = {
    val vocab = uniTrained(s, dir)
    val bc = s.sparkContext.broadcast(vocab)
    val segKey = udf((w: String) => uniSegmentKey(w, bc.value))
    val wordPieces = docToks(s, dir)
      .select(explode(col("t")).as("word")).distinct()
      .withColumn("key", segKey(col("word")))
      .select(col("word"),
        expr("CAST(substring(key, 1, 2) AS BIGINT)").as("n_pieces"))
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("word"))
      .join(broadcast(wordPieces), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_unigram_tokens"))
      .orderBy(col("doc_id"))
  }

  private lazy val unigramTokenizeOracle: String = {
    val applyRound = UniRounds + 1
    s"""WITH $unigramTrainCtes,
       |${uniDpCtes(applyRound, s"v$UniRounds")},
       |wp AS MATERIALIZED (SELECT word, CAST(key[1:2] AS BIGINT) AS n_pieces
       |  FROM seg$applyRound),
       |toks AS (SELECT doc_id, unnest($DToks) AS word FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_unigram_tokens
       |FROM toks JOIN wp USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------ tokenizer comparison report
  /** TOKENIZER COMPARISON REPORT — the table a team looks at when picking
    * a tokenizer for a corpus: for each implemented family (fixed-vocab
    * WordPiece inference, learned BPE, learned byte-BPE, learned
    * unigram-LM, and — r13 — likelihood-trained WordPiece),
    * the corpus' total subword-token count, the total characters the
    * tokenizer consumed, and the compression ratio in integer form
    * (chars per 1000 tokens). All-integer, so one hash-exact gate covers
    * the three families end to end — the oracle REPLAYS both trainings
    * (the shared BPE and unigram CTE chains) plus the WordPiece
    * recursive greedy walk in a single composed WITH block.
    *
    * Denominators are each family's own established input convention
    * (the one its gated queries use): WordPiece consumes the q28 lexer's
    * word/digit/punct pieces; BPE and unigram consume whitespace words.
    * The chars column records exactly what each consumed, so the ratios
    * are per-family honest rather than force-normalized.
    *
    * Scale: each family's per-unit piece count is computed once over the
    * DISTINCT unit table (Heaps-bounded) and broadcast to the exploded
    * corpus — three dim joins, no corpus recompute; the trainings
    * themselves are the q94/q105 loops. */
  def q111_tokenizer_report(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // WordPiece over lexer pieces: distinct piece dim -> broadcast join
    val lexed = Tables.documents(s, dir)
      .select(explode(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("u"))
    val wpDim = lexed.distinct()
      .select(col("u"), graft.text.Subword.subword_count(col("u")).cast("long").as("np"),
        length(col("u")).cast("long").as("len"))
    val wp = lexed.join(broadcast(wpDim), "u")
      .agg(sum(col("np")).as("n_tokens"), sum(col("len")).as("n_chars"))
      .select(lit("wordpiece").as("tokenizer"), col("n_tokens"), col("n_chars"))
    // BPE and unigram over whitespace words: (word, cnt) table + per-word
    // piece counts from each trained model
    val words = docToks(s, dir).select(explode(col("t")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val merges = bpeMergesLearned(s, dir)
    val symInit = "concat('|', array_join(transform(sequence(1, length(word))," +
      " i -> substring(word, i, 1)), '||'), '|')"
    val bpeChain = merges.foldLeft(symInit) { case (acc, (l, r)) =>
      s"replace($acc, '|$l||$r|', '|$l$r|')"
    }
    val bpe = words
      .withColumn("np", expr(
        s"size(split(substring($bpeChain, 2, length($bpeChain) - 2), '\\\\|\\\\|'))")
        .cast("long"))
      .agg(sum(col("cnt") * col("np")).as("n_tokens"),
        sum(col("cnt") * length(col("word"))).cast("long").as("n_chars"))
      .select(lit("bpe").as("tokenizer"), col("n_tokens"), col("n_chars"))
    val uniVocab = s.sparkContext.broadcast(uniTrained(s, dir))
    val uniSeg = udf((w: String) =>
      uniSegmentKey(w, uniVocab.value).substring(0, 2).toLong)
    val uni = words
      .withColumn("np", uniSeg(col("word")))
      .agg(sum(col("cnt") * col("np")).as("n_tokens"),
        sum(col("cnt") * length(col("word"))).cast("long").as("n_chars"))
      .select(lit("unigram").as("tokenizer"), col("n_tokens"), col("n_chars"))
    // fourth family (r13): byte-level BPE — n_chars stays CHAR count so
    // chars_per_1k_tokens compares across families on one scale
    val byteChain = byteBpeChain(s, dir)
    val bbpe = words
      .withColumn("np", expr(
        s"size(split(substring($byteChain, 2, length($byteChain) - 2), '\\\\|\\\\|'))")
        .cast("long"))
      .agg(sum(col("cnt") * col("np")).as("n_tokens"),
        sum(col("cnt") * length(col("word"))).cast("long").as("n_chars"))
      .select(lit("byte_bpe").as("tokenizer"), col("n_tokens"), col("n_chars"))
    // fifth family (r13): TRAINED WordPiece — likelihood-merged vocab,
    // MaxMatch inference, over the same whitespace words as BPE/unigram
    val wpNp = wpTrainedNPiecesUdf(s, dir)
    val wpt = words
      .withColumn("np", wpNp(col("word")))
      .agg(sum(col("cnt") * col("np")).as("n_tokens"),
        sum(col("cnt") * length(col("word"))).cast("long").as("n_chars"))
      .select(lit("wordpiece_trained").as("tokenizer"), col("n_tokens"),
        col("n_chars"))
    wp.unionByName(bpe).unionByName(uni).unionByName(bbpe).unionByName(wpt)
      .select(col("tokenizer"), col("n_tokens"), col("n_chars"),
        expr("n_chars * 1000 div n_tokens").as("chars_per_1k_tokens"))
      .orderBy(col("tokenizer"))
  }

  /** Composed twin: WordPiece recursive walk + the BPE stage chain + the
    * unigram training chain (word CTE renamed `uw` precisely so the two
    * trainings coexist in one WITH block) + the unigram apply round. */
  private lazy val tokenizerReportOracle: String = {
    val applyRound = UniRounds + 1
    s"""WITH RECURSIVE lex AS (SELECT doc_id,
       |    regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS ps
       |  FROM documents),
       |wpwords AS (SELECT DISTINCT unnest(ps) AS u FROM lex),
       |wprec AS (
       |  SELECT u AS w, 1 AS pos, 0 AS cnt FROM wpwords
       |  UNION ALL
       |  SELECT w, pos + ${graft.text.Subword.matchLenSql("w", "pos")}, cnt + 1
       |  FROM wprec WHERE pos <= len(w)),
       |wpc AS (SELECT w, cnt FROM wprec WHERE pos > len(w)),
       |wpstream AS (SELECT unnest(ps) AS u FROM lex),
       |wpt AS (SELECT CAST(SUM(wpc.cnt) AS BIGINT) AS n_tokens,
       |    CAST(SUM(len(wpstream.u)) AS BIGINT) AS n_chars
       |  FROM wpstream JOIN wpc ON wpstream.u = wpc.w),
       |$bpeStagesSql,
       |bpet AS (SELECT
       |    CAST(SUM(cnt * len(string_split(sym[2:len(sym) - 1], '||'))) AS BIGINT)
       |      AS n_tokens,
       |    CAST(SUM(cnt * len(word)) AS BIGINT) AS n_chars
       |  FROM s$BpeRounds),
       |$byteBpeStagesSql,
       |bbt AS (SELECT
       |    CAST(SUM(cnt * len(string_split(sym[2:len(sym) - 1], '||'))) AS BIGINT)
       |      AS n_tokens,
       |    CAST(SUM(cnt * len(word)) AS BIGINT) AS n_chars
       |  FROM bbs$BpeRounds),
       |$unigramTrainCtes,
       |${uniDpCtes(applyRound, s"v$UniRounds")},
       |unit AS (SELECT
       |    CAST(SUM(cnt * CAST(key[1:2] AS BIGINT)) AS BIGINT) AS n_tokens,
       |    CAST(SUM(cnt * len(word)) AS BIGINT) AS n_chars
       |  FROM seg$applyRound),
       |$wpStagesSql,
       |$wpApplyCtes,
       |wtt AS (SELECT
       |    CAST(SUM(cnt * n) AS BIGINT) AS n_tokens,
       |    CAST(SUM(cnt * len(word)) AS BIGINT) AS n_chars
       |  FROM wpw JOIN wtc USING (word))
       |SELECT tokenizer, n_tokens, n_chars,
       |  n_chars * 1000 // n_tokens AS chars_per_1k_tokens
       |FROM (
       |  SELECT 'bpe' AS tokenizer, n_tokens, n_chars FROM bpet
       |  UNION ALL SELECT 'byte_bpe', n_tokens, n_chars FROM bbt
       |  UNION ALL SELECT 'unigram', n_tokens, n_chars FROM unit
       |  UNION ALL SELECT 'wordpiece', n_tokens, n_chars FROM wpt
       |  UNION ALL SELECT 'wordpiece_trained', n_tokens, n_chars FROM wtt)
       |ORDER BY tokenizer""".stripMargin
  }

  // ---------------------------------------- model-based quality classifier
  /** Linear quality-classifier INFERENCE at corpus scale — the GPT-3-style
    * "quality filter" stage (Brown et al. 2020 appendix A documents a
    * linear classifier over hashed features; fastText's
    * hashed-bag-of-words architecture, Joulin et al. 2016, is the public
    * template): each token hashes to one of 256 feature buckets
    * (md5-derived, so both engines agree), the per-doc logit is
    * bias + mean bucket weight (bias 0 here so the flag splits the corpus), and docs keep iff logit ≥ 0 (≡ sigmoid ≥
    * 0.5 — the comparison stays on the PURE-ARITHMETIC logit; running
    * exp() through two engines invites last-ulp divergence the gate
    * doesn't need). Weights are a seeded draw standing in for trained
    * parameters — swapping in a real model is a literal-table change.
    *
    * Scale: the model is a 256-double literal (broadcast-by-constant);
    * inference is explode → map-side weight lookup → one per-doc agg with
    * partial sums. No joins, no shuffle beyond the doc rollup — classifier
    * scoring at 100 TB is exactly as parallel as word count. */
  private[graft] val ClassifierBuckets = 256
  /** Seeded stand-in for trained weights — shared by the batch query and
    * the streaming gate so both score identically. */
  private[graft] lazy val ClassifierWeights: IndexedSeq[Double] = {
    val rnd = new scala.util.Random(17)
    IndexedSeq.fill(ClassifierBuckets)(rnd.nextGaussian() * 0.1)
  }
  /** Weight lookup for one token: md5-derived feature bucket → literal
    * weight table (broadcast-by-constant). */
  private[graft] def tokenWeight(t: Column): Column =
    tokenWeightOf(t, ClassifierWeights)

  /** Parameterized weight lookup — the trained-coefficient twin of
    * [[tokenWeight]]: same md5 bucket derivation, caller-supplied table
    * (broadcast-by-constant once the fit is done). */
  private[graft] def tokenWeightOf(t: Column, ws: IndexedSeq[Double]): Column =
    element_at(typedlit(ws),
      (conv(substring(md5(t.cast("binary")), 1, 4), 16, 10)
        .cast("long") % ClassifierBuckets).cast("int") + 1)

  // ----------------------------------------- TRAINED quality classifier
  /** Filler-token set behind the q87b label: the stopword-ratio quality
    * score (length/punct/stopword ratios are the classic heuristic family;
    * the corpus' 31-token synthetic vocabulary has no true stopwords, so
    * its highest-frequency function-ish tokens stand in). The label is
    * INTEGER arithmetic end to end (100·n_filler ≥ 13·n_tokens, the
    * measured corpus median) — exact in both engines, no float knife-edge
    * for the oracle's label recount. */
  private[graft] val FillerTokens = Seq("the", "a", "value", "data")

  /** Held-out accuracy floors for the q87b contract, measured before
    * fixing (verify-skill rule: bounds need clear margin from data):
    * MLlib LBFGS on the md5-split train half scored 0.910 held-out at
    * sf0.01 and 0.959 at sf0.001 against a ~0.51 base rate, so 0.62 /
    * +0.08 leave ≥ 0.29 accuracy and ≥ 0.31 lift headroom
    * (CorpusFiltersSpec re-measures both and fails if margin erodes
    * below floor + 0.05). */
  private[graft] val AccFloor = 0.62
  private[graft] val LiftFloor = 0.08

  /** (doc_id, n_tokens, label, is_train): the seeded-labeled subset.
    * Label = filler-ratio quality score (integer-exact); split = first
    * md5 hex digit of doc_id, even → train — both DuckDB-recomputable, so
    * the oracle re-derives every count in the q87b contract row. */
  private[graft] def qualityLabels(s: SparkSession, dir: String): DataFrame =
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        size(filter(col("t"), w => w.isInCollection(FillerTokens)))
          .cast("long").as("n_filler"))
      .select(col("doc_id"), col("n_tokens"),
        (lit(100L) * col("n_filler") >= lit(13L) * col("n_tokens")).as("label"),
        (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1),
          16, 10).cast("int") % 2 === 0).as("is_train"))

  /** Fit MLlib LogisticRegression on the train half: per-doc features are
    * the SAME 256 hashed-bucket mean frequencies q87 scores with, so the
    * learned (coefficients, intercept) drop straight into the per-token
    * lookup scorer — train once, broadcast coefficients, score at corpus
    * scale with zero model machinery on the hot path (the Brown et al.
    * 2020 appendix-A linear quality filter, actually TRAINED this time —
    * round-7 verdict item 3: q87's seeded weights exercised only the
    * scoring plumbing). */
  private[graft] def trainQualityWeights(s: SparkSession, dir: String)
      : (IndexedSeq[Double], Double) = {
    val labels = qualityLabels(s, dir)
    val bucketed = docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("term"))
      .withColumn("b",
        (conv(substring(md5(col("term").cast("binary")), 1, 4), 16, 10)
          .cast("long") % ClassifierBuckets).cast("int"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    val toVec = udf { (n: Long, pairs: Seq[org.apache.spark.sql.Row]) =>
      val sorted = pairs.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      org.apache.spark.ml.linalg.Vectors.sparse(ClassifierBuckets,
        sorted.map(_._1).toArray, sorted.map(_._2.toDouble / n).toArray)
    }
    val train = bucketed
      .join(labels.filter(col("is_train")), "doc_id")
      .groupBy(col("doc_id"), col("n_tokens"), col("label"))
      .agg(collect_list(struct(col("b"), col("c"))).as("bc"))
      .select(toVec(col("n_tokens"), col("bc")).as("features"),
        col("label").cast("double").as("y"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("features").setLabelCol("y")
      .setMaxIter(100).setRegParam(1e-3).setElasticNetParam(0.0)
    val model = lr.fit(train)
    (model.coefficients.toArray.toIndexedSeq, model.intercept)
  }

  /** Per-doc scoring with TRAINED weights — identical plan shape to q87
    * (explode → map-side literal-table lookup → one doc rollup); shared by
    * the q87b contract and the streaming-parity spec. */
  private[graft] def scoreQualityTrained(s: SparkSession, dir: String,
      ws: IndexedSeq[Double], bias: Double): DataFrame =
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("term"))
      .withColumn("w", tokenWeightOf(col("term"), ws))
      .groupBy(col("doc_id"))
      .agg((lit(bias) + sum(col("w")) / count(lit(1))).as("z"))

  /** The train→broadcast→score loop CLOSED, with a held-out contract: fit
    * on the md5-even half, score every doc map-side with the learned
    * coefficients as plan constants, and emit ONE row the oracle can
    * fully adjudicate — label/split counts recomputed exactly by DuckDB
    * (integer label, md5 split), held-out accuracy and lift-over-base
    * asserted as literal-TRUE booleans (floors measured with margin, see
    * [[AccFloor]]). The oracle cannot embed the coefficients themselves:
    * `oracleSql` is static SQL with no SparkSession, and a fit's
    * coefficients are data-dependent — the accuracy-contract pattern
    * (q80-q84) is the gate that works for any trained model.
    *
    * Scale: training touches only the labeled subset (in production: a
    * sampled, human- or heuristic-labeled slice); inference is the q87
    * shape — no joins, classifier scoring as parallel as word count. */
  def q87b_quality_trained(s: SparkSession, dir: String): DataFrame = {
    val (ws, bias) = trainQualityWeights(s, dir)
    val eval = scoreQualityTrained(s, dir, ws, bias)
      .join(qualityLabels(s, dir), "doc_id")
      .select(col("is_train"), col("label"), (col("z") >= 0).as("pred"))
    eval.agg(
        sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
        sum(when(!col("is_train"), 1L).otherwise(0L)).as("n_eval"),
        sum(when(!col("is_train") && col("label"), 1L).otherwise(0L))
          .as("n_pos_eval"),
        avg(when(!col("is_train"),
          when(col("pred") === col("label"), 1.0).otherwise(0.0))).as("acc"))
      .select(col("n_train"), col("n_eval"), col("n_pos_eval"),
        (col("acc") >= AccFloor).as("acc_ok"),
        (col("acc") >= greatest(
          col("n_pos_eval").cast(DoubleType) / col("n_eval"),
          lit(1.0) - col("n_pos_eval").cast(DoubleType) / col("n_eval"))
          + LiftFloor).as("lift_ok"))
  }

  /** Cumulative-gains / lift curve (q238) — eval loop #11, the "how much
    * of the good stuff do the top deciles hold?" chart that decides a
    * classifier-thresholded keep-rate (the marketing-science gains chart
    * applied to the q87 scorer against the q87b filler-ratio label).
    * Deciles assign by the logit value-group's START rank from the
    * descending ECDF — ties move as a BLOCK, which is what makes the
    * assignment exact in both engines (a row_number over tied doubles
    * would be nondeterministic); ranks ride the bucketedPrefixSum
    * two-phase machinery, never a global corpus window. Gains and lift
    * are floor-permilles of exact counts: lift = (1000·cum_pos·N) div
    * (P·cum_n).
    *
    * Scale shape: one scored pass (the q87 chain), a distinct-logit
    * value-group table, the bucketed prefix sum, and a ≤10-row decile
    * rollup. The lift cross-product caps BIGINT near cum_pos·N ≈ 2⁶³ —
    * the loud assert names the DECIMAL swap. */
  def q238_gains_curve(s: SparkSession, dir: String): DataFrame = {
    val scored = q87_quality_classifier(s, dir)
      .select(col("doc_id"), col("logit_r"))
      .join(qualityLabels(s, dir).select(col("doc_id"), col("label")),
        Seq("doc_id"))
    val n = scored.count()
    val p = scored.filter(col("label")).count()
    val groups = scored.groupBy(col("logit_r"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"))
    val cum = Budget.bucketedPrefixSum(groups,
      expr("CAST(floor(-logit_r * 10) AS INT)"),
      Seq(col("logit_r").desc), col("cnt"))
    val deciles = cum
      .withColumn("decile",
        expr(s"((cum - cnt) * 10) div ${math.max(n, 1L)}L"))
      .groupBy(col("decile"))
      .agg(sum(col("cnt")).as("n"), sum(col("pos")).as("n_pos"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    deciles
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      // numerator 1000·cum_pos·N AND denominator P·cum_n must both fit
      // — the denominator is N²-shaped so it wraps first at lake scale
      .filter(coalesce(assert_true(
        expr(s"cum_pos <= (${Long.MaxValue}L div 1000L " +
          s"div ${math.max(n, 1L)}L) " +
          s"and cum_n <= (${Long.MaxValue}L div ${math.max(p, 1L)}L)"),
        lit("gains lift cross-product would overflow BIGINT: move to " +
          "DECIMAL(38,0) at this corpus scale")), lit(true)))
      .select(col("decile"), col("n"), col("n_pos"), col("cum_n"),
        col("cum_pos"),
        expr(s"(1000 * cum_pos) div ${math.max(p, 1L)}L")
          .as("gain_permille"),
        expr(s"(1000 * cum_pos * ${n}L) div (${math.max(p, 1L)}L * cum_n)")
          .as("lift_permille"))
      .orderBy(col("decile"))
  }

  private lazy val gainsOracle: String = {
    val clf = qualityClassifierOracle
    s"""WITH clf AS ($clf),
       |lab AS (SELECT doc_id,
       |    (100 * CAST(len(list_filter($DToks,
       |      w -> list_contains(${FillerTokens.map(w => s"'$w'")
                 .mkString("[", ",", "]")}, w))) AS BIGINT)
       |      >= 13 * CAST(len($DToks) AS BIGINT)) AS label
       |  FROM documents WHERE len($DToks) >= 1),
       |sc AS (SELECT c.logit_r, lab.label
       |  FROM clf c JOIN lab USING (doc_id)),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS p
       |  FROM sc),
       |g AS (SELECT logit_r, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
       |  FROM sc GROUP BY 1),
       |c AS (SELECT logit_r, cnt, pos, CAST(SUM(cnt) OVER (
       |    ORDER BY logit_r DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    AS cum FROM g),
       |d AS (SELECT ((cum - cnt) * 10) // (SELECT n FROM tot) AS decile,
       |    cnt, pos FROM c),
       |r AS (SELECT decile, CAST(SUM(cnt) AS BIGINT) AS n,
       |    CAST(SUM(pos) AS BIGINT) AS n_pos FROM d GROUP BY 1),
       |f AS (SELECT decile, n, n_pos,
       |    CAST(SUM(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum_n,
       |    CAST(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED
       |      PRECEDING) AS BIGINT) AS cum_pos FROM r)
       |SELECT decile, n, n_pos, cum_n, cum_pos,
       |  (1000 * cum_pos) // greatest((SELECT p FROM tot), 1)
       |    AS gain_permille,
       |  (1000 * cum_pos * (SELECT n FROM tot))
       |    // (greatest((SELECT p FROM tot), 1) * cum_n) AS lift_permille
       |FROM f ORDER BY decile""".stripMargin
  }

  def q87_quality_classifier(s: SparkSession, dir: String): DataFrame = {
    // bias 0: the seeded mean-weight signal has per-doc std ~0.1/sqrt(n);
    // a large bias would saturate the flag one way and leave the keep
    // decision untested in the gate
    val bias = 0.0
    docToks(s, dir).filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("term"))
      .withColumn("w", tokenWeight(col("term")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (lit(bias) + sum(col("w")) / count(lit(1))).as("z"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("z"), 6).as("logit_r"), (col("z") >= 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Generated twin of q87: same seeded weight table as a SQL literal,
    * same md5-bucket derivation, same composition order. */
  private[graft] lazy val qualityClassifierOracle: String = {
    val buckets = ClassifierBuckets
    val w = ClassifierWeights
    s"""WITH toks AS (SELECT doc_id, unnest($DToks) AS term FROM documents),
       |b AS (SELECT doc_id,
       |    CAST(CAST('0x' || substr(md5(term), 1, 4) AS INT) % $buckets AS INT) AS b
       |  FROM toks),
       |wt AS (SELECT doc_id,
       |    (${w.mkString("[", ", ", "]")})[b + 1] AS w
       |  FROM b),
       |z AS (SELECT doc_id, COUNT(*) AS n_tokens,
       |    0.0 + SUM(w) / COUNT(*) AS z
       |  FROM wt GROUP BY doc_id)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  round(z, 6) AS logit_r, (z >= 0) AS keep
       |FROM z ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------- BM25 retrieval
  /** BM25 document scoring for a fixed query-term set — the retrieval
    * primitive behind quality-by-relevance selection (e.g. "keep docs
    * resembling these seed queries", the DSIR-style targeted-corpus
    * move). Standard Robertson/Sparck-Jones form: k1 = 1.2, b = 0.75,
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)); top 20 docs by score with
    * doc_id as the deterministic tiebreak.
    *
    * Scale: one (doc, term) tf agg over the filtered query-term stream —
    * map-side combine, and only query-matching tokens survive the first
    * filter; df and avgdl are vocabulary/constant-sized broadcasts; the
    * final top-k is a TakeOrderedAndProject, not a global sort. */
  def q71_bm25(s: SparkSession, dir: String): DataFrame = {
    val qterms = Seq("spark", "query", "table")
    val (k1, b) = (1.2, 0.75)
    val toks = docToks(s, dir)
      .select(col("doc_id"), size(col("t")).as("dl"), explode(col("t")).as("term"))
    val stats = Tables.documents(s, dir)
      .select(size(Cleanse.tokens(col("text"))).as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("dl").cast(DoubleType)).as("avgdl"))
    val dfs = toks.filter(col("term").isin(qterms: _*))
      .groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val tf = toks.filter(col("term").isin(qterms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // literal structure mirrors the SQL twin op-for-op so both engines
    // evaluate the identical double expression tree
    tf.join(broadcast(dfs.crossJoin(stats)), "term")
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * (lit(k1) + lit(1.0)))
          / (col("tf") + lit(k1) * (lit(1.0) - lit(b)
            + lit(b) * col("dl") / col("avgdl")))).as("sc"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("sc")), 6).as("bm25_r"))
      .orderBy(col("bm25_r").desc, col("doc_id"))
      .limit(20)
  }

  /** COUNT-MIN SKETCH heavy hitters (Cormode & Muthukrishnan 2005, "An
    * improved data stream summary: the count-min sketch" — public
    * algorithm): a d=4 × w=1024 counter matrix summarizes the token
    * stream in fixed memory; est(x) = min over rows of the x-hashed
    * cell, and est ≥ exact ALWAYS (counters only ever overcount on
    * collision — the deterministic half of the CMS guarantee, emitted as
    * the never_under contract column). Unlike Misra-Gries, CMS is
    * ORDER-INDEPENDENT (cells are sums), so the whole sketch is exactly
    * reproducible from SQL and the gate is hash-exact, not a tolerance
    * contract — the q54 KMV trick applied to frequency sketching. The
    * probe set is the exact top-20 (the gate needs the truth anyway);
    * production keeps only the 4096-cell sketch and probes ad hoc.
    *
    * Scale: the sketch build is word-count × d with map-side combine —
    * the aggregated frame is ≤ d·w rows no matter the corpus; the exact
    * side is one vocabulary-bounded agg + a global top-k over the vocab
    * (WindowGroupLimit bounded heap). At 100 TB the sketch is THE way to
    * answer "how often does this token appear" without materializing the
    * vocab table. */
  def q104_countmin_hh(s: SparkSession, dir: String): DataFrame = {
    val d = 4; val wdt = 1024; val topK = 20
    val toks = docToks(s, dir).select(explode(col("t")).as("tok"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("exact").desc, col("tok"))
    val top = exact.withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= topK)
    val cellOf = (j: Column, tok: Column) =>
      conv(substring(md5(concat(j.cast("string"), lit(" "), tok)
        .cast("binary")), 1, 12), 16, 10).cast("long") % wdt
    val sketch = toks
      .select(explode(expr(s"sequence(0, ${d - 1})")).as("j"), col("tok"))
      .select(col("j"), cellOf(col("j"), col("tok")).as("cell"))
      .groupBy(col("j"), col("cell")).agg(count(lit(1)).as("cnt"))
    val probes = top.select(col("rnk"), col("tok"), col("exact"),
        explode(expr(s"sequence(0, ${d - 1})")).as("j"))
      .withColumn("cell", cellOf(col("j"), col("tok")))
    probes.join(sketch, Seq("j", "cell"))
      .groupBy(col("rnk"), col("tok"), col("exact"))
      .agg(min(col("cnt")).as("est"))
      .select(col("rnk"), col("tok"), col("exact"), col("est"),
        (col("est") >= col("exact")).as("never_under"))
      .orderBy(col("rnk"))
  }

  // ------------------------------------------------- Zipf corpus profile
  /** Zipf rank-frequency fit — the corpus-health diagnostic: natural text
    * follows freq ∝ rank^(−s) with s ≈ 1; machine-generated or templated
    * corpora bend the curve. Least-squares slope/intercept of ln(freq) on
    * ln(rank) over the top-100 terms, plus R². One vocabulary-sized agg,
    * a top-k (bounded heap under WindowGroupLimit), and a 100-row fold —
    * corpus size only enters through the first hash agg. */
  def q69_zipf_profile(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("term"))
    val ranked = docToks(s, dir)
      .select(explode(col("t")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 100)
      .select(log(col("rank").cast(DoubleType)).as("x"),
        log(col("freq").cast(DoubleType)).as("y"))
    ranked.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        round((col("sxy") - col("sx") * col("sy") / col("n"))
          / (col("sxx") - col("sx") * col("sx") / col("n")), 6).as("slope_r"),
        round((col("sy") - (col("sxy") - col("sx") * col("sy") / col("n"))
          / (col("sxx") - col("sx") * col("sx") / col("n")) * col("sx"))
          / col("n"), 6).as("intercept_r"),
        round(pow(col("sxy") - col("sx") * col("sy") / col("n"), 2)
          / ((col("sxx") - col("sx") * col("sx") / col("n"))
            * (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("r2_r"))
  }

  // --------------------------------------------------- curation funnel
  /** The whole curation pipeline as ONE funnel: documents flow through
    * length bounds → repetition gate (q51) → LM-quality gate (q56) →
    * exact first-occurrence dedup → NEAR dedup (the q33/q55 keep-list) →
    * span dedup (q66b's rewrite must leave ≥ the length floor) →
    * benchmark decontamination (q52, zero overlapping 5-grams) →
    * model-based quality (q87's classifier logit ≥ 0 — its weight lookup
    * rides the pass-1 unigram rollup, so the 8th rule costs one agg
    * column, not a corpus pass), and each
    * stage reports its cumulative survivor count — the per-rule attrition
    * table every corpus-curation run ships with (what fraction did each
    * filter cost?). The rule semantics are the gated signal queries' own
    * (q51's rounded-frac thresholds, q56's −3.5 nats, q33's Jaccard ≥ 0.5
    * → non-canonical drop, q66's first-occurrence spans, q52's bench
    * bucket), and the DuckDB twin recomputes each signal independently —
    * drift in either encoding fails the gate.
    *
    * Scale: deliberately NOT a composition of the signal queries — that
    * plan scanned the corpus 18 times. FIVE specialized corpus passes,
    * each computing only what it needs: (1) the corpus docs emit their
    * unigrams, bigrams and distinct 5-grams in ONE tagged explode, one
    * shuffle counts them all, one per-doc rollup computes every token-
    * level flag; (2) a unigram-only pass builds the LM model (over ALL
    * docs, matching q56 — vocabulary-sized, broadcast back); (3) a
    * bench-bucket-only pass collects the protected 5-gram set (1/16 of
    * docs tokenized, broadcast back); (4) a corpus shingle pass feeds the
    * q33 inverted-index kernel + component fixpoint for the near-dup
    * keep-list; (5) a corpus span pass feeds q66's winner argmin for the
    * span-survival counts. Plus column-pruned (doc_id, text) scans for
    * the md5 dedup spine. Passes (4) and (5) are NOT folded into the
    * tagged explode of pass (1): their downstream aggregations key on the
    * gram (global winner / inverted index), not (doc, gram), and filter
    * pushdown through a shared tagged stream specializes the branches and
    * defeats exchange reuse — the exact round-5 lesson that turned 5
    * "shared" scans into 18 real ones. Writing the passes specialized by
    * hand means each is consumed the way its shuffle key wants. Adding a
    * token-level rule still costs one kind tag in pass (1), not a corpus
    * pass. */
  def q70_curation_funnel(s: SparkSession, dir: String): DataFrame = {
    // ONE tokenize for all six consumers (tagged explode, LM unigrams,
    // token total, bench 5-grams, near-dup shingles, span stream): the
    // passes stay specialized — each keeps its own explode keyed the way
    // its shuffle wants — but they now share the pinned PRE-explode token
    // frame instead of re-running scan+tokenize per pass (round-6 verdict).
    // On a cluster this is a reliable checkpoint of the tokenized corpus.
    val toksAll = q70TokenFrame(s, dir).localCheckpoint()
    // Eagerly pin the 8-row funnel table, then drop the corpus-sized token
    // pin — callers (and long-lived sessions) hold only the result rows.
    val out = q70FunnelOver(s, toksAll).localCheckpoint()
    graft.ml.Similarity.pinnedRdds(toksAll).foreach(_.unpersist(blocking = false))
    out.orderBy(col("stage"))
  }

  /** The (doc_id, bucket, text_md5, t) frame every q70 pass derives from —
    * text_md5 rides along so the exact-dup spine needs no second corpus
    * scan. */
  private[graft] def q70TokenFrame(s: SparkSession, dir: String): DataFrame =
    Tables.documentsFanned(s, dir).select(col("doc_id"),
      substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
        .as("bucket"),
      md5(col("text").cast("binary")).as("text_md5"),
      Cleanse.tokens(col("text")).as("t"))

  private val q70EmptyKG =
    "CAST(array() AS ARRAY<STRUCT<kind: STRING, gram: STRING>>)"
  private val q70FiveGrams =
    "transform(array_distinct(transform(sequence(1, size(t)-4)," +
      " i -> concat_ws(' ', element_at(t,i), element_at(t,i+1)," +
      " element_at(t,i+2), element_at(t,i+3), element_at(t,i+4))))"

  // The five corpus passes of the q70 funnel, extracted as named
  // builders (r16: so ProfQ70 can time each pass individually against
  // the same token frame the funnel uses — a pure refactor, the funnel
  // plan is unchanged).

  /** pass 1: corpus docs only, every gram kind tagged in one explode —
    * 'u' unigram, 'b' bigram, '5' distinct 5-gram (decontamination
    * unit); aggregated per (doc, kind, gram). */
  private[graft] def q70TaggedCounts(toksAll: DataFrame): DataFrame =
    toksAll.filter(col("bucket") =!= "f")
      .select(col("doc_id"), explode(concat(
        expr("transform(t, x -> struct('u' AS kind, x AS gram))"),
        expr("CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t)-1)," +
          " i -> struct('b' AS kind, concat(element_at(t,i), ' ', element_at(t,i+1)) AS gram))" +
          s" ELSE $q70EmptyKG END"),
        expr(s"CASE WHEN size(t) >= 5 THEN $q70FiveGrams," +
          s" g -> struct('5' AS kind, g AS gram)) ELSE $q70EmptyKG END")))
        .as("kg"))
      .select(col("doc_id"), col("kg.kind").as("kind"), col("kg.gram").as("gram"))
      .groupBy(col("doc_id"), col("kind"), col("gram"))
      .agg(count(lit(1)).as("c"))

  /** pass 2: unigram-only, ALL docs — the q56 LM model
    * (vocabulary-sized). */
  private[graft] def q70Freqs(toksAll: DataFrame): DataFrame =
    toksAll.select(explode(col("t")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("tf"))

  /** Σ tf without re-exploding: total token instances is a map-side size
    * sum (aggregating freqs would re-run the unigram pass — its subtree
    * has two consumers and no exchange to reuse). */
  private[graft] def q70Total(toksAll: DataFrame): DataFrame =
    toksAll.agg(sum(size(col("t"))).cast("long").as("total"))

  /** pass 3: bench bucket only — the protected 5-gram set. */
  private[graft] def q70Bench(toksAll: DataFrame): DataFrame =
    toksAll.filter(col("bucket") === "f" && size(col("t")) >= 5)
      .select(explode(expr(s"$q70FiveGrams, g -> g)")).as("gram"))
      .distinct().withColumn("hit", lit(1L))

  /** pass 4: near-dup keep-list — the q33 shingle kernel + the q55
    * component fixpoint, corpus-scoped; a doc is dropped iff it is the
    * non-canonical member of a Jaccard ≥ 0.5 cluster.
    * componentsAdaptive: the funnel's pair graph is THRESHOLDED output
    * (jaccard ≥ 0.5 survivors), metadata-scale at any corpus size that
    * dedups well — the local union-find path erases ~2.4 s of fixpoint
    * job scheduling measured at sf0.1; corpus-scale graphs take the
    * distributed fixpoint unchanged. */
  private[graft] def q70NearLabels(toksAll: DataFrame): DataFrame =
    graft.ml.Similarity.componentsAdaptive(
      graft.ml.Similarity.ngramJaccardPairs(
        toksAll.filter(col("bucket") =!= "f")
          .select(col("doc_id"), col("t")))
        .select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("is_canonical"))

  /** pass 5: span survival — q66's winner argmin, corpus-scoped; a doc
    * survives iff its q66b rewrite keeps at least the length floor. The
    * winner's doc decodes straight out of the packed argmin, so kept
    * counts need NO join-back to the span stream (which would re-execute
    * its explode for the probe side) — one explode, two aggs. */
  private[graft] def q70SpanKept(toksAll: DataFrame): DataFrame =
    spanStreamOf(toksAll.filter(col("bucket") =!= "f")
      .select(col("doc_id"), col("t")))
      .groupBy(col("sg")).agg(min(spanEnc).as("enc"))
      .groupBy(expr("enc div 1000000").as("doc_id"))
      .agg(count(lit(1)).as("n_kept"))

  /** The lazy funnel plan over a supplied token frame — package-visible so
    * ScaleSpec can assert the specialized-pass shape (explode count, join
    * strategies) on the real plan rather than the pinned result. */
  private[graft] def q70FunnelOver(s: SparkSession, toksAll: DataFrame): DataFrame = {
    def docs(s: SparkSession) = toksAll
    val counts = q70TaggedCounts(toksAll)
    val freqs = q70Freqs(toksAll)
    val total = q70Total(toksAll)
    val bench = q70Bench(toksAll)
    val nearLabels = q70NearLabels(toksAll)
    val spanKept = q70SpanKept(toksAll)
    val rollup = counts
      .join(broadcast(freqs.crossJoin(total)), Seq("gram"), "left")
      .join(broadcast(bench), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("kind") === "u", col("c"))).as("n_tokens"),
        max(when(col("kind") === "u", col("c"))).as("top_uni"),
        sum(when(col("kind") === "b", col("c"))).as("n_bigrams"),
        max(when(col("kind") === "b", col("c"))).as("top_bi"),
        sum(when(col("kind") === "u",
          col("c") * log(col("tf").cast(DoubleType) / col("total")))).as("lpsum"),
        // q87's classifier logit numerator rides the SAME rollup: weight
        // lookup is a literal element_at on the gram — an 8th rule costs
        // one agg column here, not a corpus pass (the extensibility claim
        // in the scaladoc, now load-bearing)
        sum(when(col("kind") === "u", col("c") * tokenWeight(col("gram"))))
          .as("wsum"),
        sum(when(col("kind") === "5", col("hit"))).as("n_hit"))
    // the doc spine: every non-benchmark document (including zero-token
    // ones the explode drops) with its exact-dup key — read off the shared
    // token frame (text_md5 rides along), no extra corpus scan
    val spine = docs(s).filter(col("bucket") =!= "f")
      .select(col("doc_id"), col("text_md5"))
    val firsts = spine.groupBy(col("text_md5")).agg(min(col("doc_id")).as("first_id"))
    val flags = spine
      .join(firsts, "text_md5")
      .join(rollup, Seq("doc_id"), "left")
      .join(nearLabels, Seq("doc_id"), "left")
      .join(spanKept, Seq("doc_id"), "left")
      .select(
        coalesce(col("n_tokens").between(20, 1000), lit(false)).as("f_len"),
        // q51's gate on the ROUNDED fractions, inverted; under-2-token
        // docs (null bigram side) fall to false, masked by f_len
        coalesce(
          !(round(col("top_uni").cast(DoubleType) / col("n_tokens"), 6) > 0.30
            || round(col("top_bi").cast(DoubleType) / col("n_bigrams"), 6) > 0.18),
          lit(false)).as("f_rep"),
        // mean token log-prob = Σ c·ln p / n (same instance-average q56 takes)
        coalesce(col("lpsum") / col("n_tokens") >= -3.5, lit(false)).as("f_lm"),
        (col("doc_id") === col("first_id")).as("f_dup"),
        // docs outside every near-dup cluster carry no label — they pass
        coalesce(col("is_canonical"), lit(true)).as("f_near"),
        // the q66b rewrite keeps n_kept spans + the n%8 tail; survival
        // means the cleaned doc still meets the length floor
        coalesce(coalesce(col("n_kept"), lit(0L)) * 8
          + (col("n_tokens") % 8) >= 20, lit(false)).as("f_span"),
        // engine-identical encoding regardless of masks (round-5 advice):
        // clean ⇔ a ≥5-token doc with zero bench-gram hits — n_hit is null
        // for both no-overlap and under-5-token docs, so gate on length
        // explicitly (DuckDB's n_hit=0 rows exist only for ≥5-token docs)
        coalesce(col("n_hit").isNull && col("n_tokens") >= 5, lit(false))
          .as("f_cont"),
        // q87's keep decision (mean hashed-bucket weight ≥ 0, bias 0);
        // zero-token docs carry null wsum → false, masked by f_len
        coalesce(col("wsum") / col("n_tokens") >= 0, lit(false)).as("f_qual"))
    // cumulative survivors (the funnel) AND independent per-rule passes
    // (which filter is expensive REGARDLESS of stage order — only safe to
    // report because every flag encoding is engine-identical unmasked;
    // the corpus/"all rules" rows carry the total as their solo count)
    def kept(c: Column) = sum(when(c, 1L).otherwise(0L))
    val allRules = col("f_len") && col("f_rep") && col("f_lm") &&
      col("f_dup") && col("f_near") && col("f_span") && col("f_cont")
    flags.agg(
      count(lit(1)).as("s0"),
      kept(col("f_len")).as("s1"),
      kept(col("f_len") && col("f_rep")).as("s2"),
      kept(col("f_len") && col("f_rep") && col("f_lm")).as("s3"),
      kept(col("f_len") && col("f_rep") && col("f_lm") && col("f_dup")).as("s4"),
      kept(col("f_len") && col("f_rep") && col("f_lm") && col("f_dup")
        && col("f_near")).as("s5"),
      kept(col("f_len") && col("f_rep") && col("f_lm") && col("f_dup")
        && col("f_near") && col("f_span")).as("s6"),
      kept(allRules).as("s7"),
      kept(allRules && col("f_qual")).as("s8"),
      kept(col("f_rep")).as("a2"),
      kept(col("f_lm")).as("a3"),
      kept(col("f_dup")).as("a4"),
      kept(col("f_near")).as("a5"),
      kept(col("f_span")).as("a6"),
      kept(col("f_cont")).as("a7"),
      kept(col("f_qual")).as("a8"))
      .select(expr(
        """stack(9,
          | 0, 'corpus',         s0, s0,
          | 1, 'length',         s1, s1,
          | 2, 'repetition',     s2, a2,
          | 3, 'lm_quality',     s3, a3,
          | 4, 'exact_dedup',    s4, a4,
          | 5, 'near_dedup',     s5, a5,
          | 6, 'span_dedup',     s6, a6,
          | 7, 'decontaminated', s7, a7,
          | 8, 'quality',        s8, a8) AS (stage, rule, n_kept, n_pass_alone)""".stripMargin))
      .orderBy(col("stage"))
  }

  // --------------------------------------- DSIR importance resampling
  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): select raw-corpus documents that look like a
    * TARGET domain by importance weights under two hashed bag-of-ngrams
    * language models. Here the target is the `lang = 'en'` slice (the
    * "looks like the high-quality domain" stand-in on this corpus);
    * features are unigram tokens hashed into [[DsirBuckets]] md5 buckets
    * (the q87 classifier's derivation). Per-bucket log-odds
    * λ_b = ln( ((c_t+1)/(N_t+B)) / ((c_r+1)/(N_r+B)) ) — Laplace-smoothed
    * target vs raw — are INTEGERIZED to micro-nats
    * (CAST(round(1e6·λ) AS BIGINT)) so the per-document score
    * Σ_tokens λ_{b(token)} is an exact BIGINT dot product: summation
    * order cannot perturb it in either engine (the q116 integer-score
    * discipline; the only knife-edge is a bucket whose 1e6·λ lands
    * within one ulp of a .5 boundary — data-dependent, absent here, and
    * the same risk class every ln-using oracle in this file carries).
    * Resampling is the paper's Gumbel-top-k: key = score + g_i with
    * g_i = −ln(−ln(u_i)) in micro-nats and u_i the q103 hash-uniform
    * (deterministic md5 of doc_id — no rand()), global top
    * [[DsirK]] by key with doc_id tiebreak.
    *
    * Scale: bucket stats are one map-side-combined agg to B rows; λ and
    * the totals are broadcast joins; the top-k is a
    * TakeOrderedAndProject. Nothing corpus-global but the final k-row
    * heap — the 100 TB shape. */
  private[graft] val DsirBuckets = 512
  private val DsirK = 20

  /** Full per-document DSIR frame (every doc scored, pre-top-k) — the
    * kernel behind [[q125_dsir_resample]], exposed for the spec's
    * target-uplift invariant. */
  private[graft] def dsirScores(s: SparkSession, dir: String): DataFrame = {
    // lang rides the scan (no join against the exploded token frame)
    val tb = dsirTb(s, dir)
    tb.join(broadcast(dsirLambdaOf(tb)), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lam")).as("score_unat"))
  }

  /** The trained per-bucket micro-nat λ table, exported for the streaming
    * gate ([[graft.streaming.Sessions.dsirGateStream]]) through the
    * trainer memo — 512 entries, a broadcast-scale model like
    * [[lmModelSets]]. Buckets absent from the training corpus have no
    * entry; the stream scores them 0 (an unseen feature is evidence for
    * neither distribution). */
  private[graft] def dsirLambda(s: SparkSession, dir: String): Map[Int, Long] =
    memoTrained(s, dir, "dsir") {
      dsirScoresLambda(s, dir).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    }

  /** Shared token→bucket frame (doc_id, lang, b). */
  private def dsirTb(s: SparkSession, dir: String): DataFrame =
    Tables.documentsFanned(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(Cleanse.tokens(col("text"))).as("term"))
      .withColumn("b",
        (conv(substring(md5(col("term").cast("binary")), 1, 4), 16, 10)
          .cast("long") % DsirBuckets).cast("int"))
      .select(col("doc_id"), col("lang"), col("b"))

  /** The λ sub-plan (bucket → integer micro-nats) off a token frame. */
  private def dsirLambdaOf(tb: DataFrame): DataFrame = {
    val b = DsirBuckets
    val bucketCounts = tb.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    // corpus totals are the bucket table's own marginals — no extra pass
    val totals = bucketCounts.agg(
      sum(col("cr")).as("nr"),
      sum(col("ct")).as("nt"))
    // shared ln (r18 verdict item 4): the log-odds ratio decomposes into
    // four INTEGER shared-ln terms — ln(((ct+1)/(nt+b)) / ((cr+1)/(nr+b)))
    // = (ln(ct+1) − ln(nt+b)) − (ln(cr+1) − ln(nr+b)) — evaluated in this
    // exact association order on both sides, so every double (and the
    // rounded micro-nat) is engine-identical with no product overflow
    import graft.functions.SharedLn.{ln => lnsh}
    bucketCounts.crossJoin(broadcast(totals))
      .select(col("b"),
        round(lit(1e6) * ((lnsh(col("ct") + lit(1L)) -
          lnsh(col("nt") + lit(b.toLong))) -
          (lnsh(col("cr") + lit(1L)) - lnsh(col("nr") + lit(b.toLong)))))
          .cast("long").as("lam"))
  }

  private def dsirScoresLambda(s: SparkSession, dir: String): DataFrame =
    dsirLambdaOf(dsirTb(s, dir))

  def q125_dsir_resample(s: SparkSession, dir: String): DataFrame = {
    // Gumbel key via SHARED ln only (r18 verdict item 4): with integer
    // x = md5-prefix + 1 and u = x/2^48, −ln u = 48·ln2 − ln_shared(x)
    // (every op IEEE-correctly rounded, engine-identical). The OUTER ln
    // takes that double; the key is DEFINED through an explicit 1e-17
    // quantization w = max(1, round((−ln u)·10¹⁷)) so the outer ln is
    // again integer-argument shared: −ln(−ln u) ≐ ln(10¹⁷) − ln_shared(w).
    // Quantization error ≤ 1e-17 absolute on −ln u — far below the
    // micro-nat resolution the key is rounded to; u = 1 (prob 2^-48)
    // now yields the deterministic max key instead of a NULL edge.
    val x1 = conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 12), 16, 10).cast("long") + lit(1L)
    val vln = lit(CorpusFilters.GumLn2Pow48) - graft.functions.SharedLn.ln(x1)
    val w = greatest(round(vln * lit(1e17)).cast("long"), lit(1L))
    val gum = round(lit(1e6) * (lit(CorpusFilters.GumLnScale) -
      graft.functions.SharedLn.ln(w))).cast("long")
    val keyed = dsirScores(s, dir)
      .withColumn("gumbel_unat", gum)
      .withColumn("key_unat", col("score_unat") + col("gumbel_unat"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("key_unat").desc, col("doc_id"))
    keyed.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= DsirK)
      .join(Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .select(col("rank").cast("int").as("rank"), col("doc_id"),
        col("lang"), col("source"), col("n_tokens"),
        col("score_unat"), col("gumbel_unat"), col("key_unat"))
      .orderBy(col("rank"))
  }

  /** Oracle: the λ table, dot product, and Gumbel key mirrored op-for-op;
    * every cross-row SUM is over BIGINTs. */
  private lazy val dsirOracle: String = {
    val b = DsirBuckets
    s"""WITH toks AS (SELECT doc_id, unnest($DToks) AS term FROM documents),
       |tb AS (SELECT t.doc_id,
       |    CAST(CAST('0x' || substr(md5(term), 1, 4) AS INT) % $b AS INT) AS b,
       |    lang
       |  FROM toks t JOIN documents d ON t.doc_id = d.doc_id),
       |bc AS (SELECT b, COUNT(*) AS cr,
       |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
       |  FROM tb GROUP BY b),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nt FROM tb),
       |lam0 AS (SELECT b, ct + 1 AS a1, nt + $b AS a2, cr + 1 AS a3,
       |    nr + $b AS a4 FROM bc, tot),
       |laml AS (${graft.functions.SharedLn.oracleLn("lam0", Seq("b"),
          Seq(("__l1", "a1"), ("__l2", "a2"), ("__l3", "a3"),
            ("__l4", "a4")))}),
       |lam AS (SELECT b, CAST(round(1000000.0 *
       |      ((__l1 - __l2) - (__l3 - __l4)))
       |    AS BIGINT) AS lam
       |  FROM laml),
       |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(lam) AS BIGINT) AS score_unat
       |  FROM tb JOIN lam USING (b) GROUP BY doc_id),
       |k0 AS (SELECT doc_id, n_tokens, score_unat,
       |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
       |      AS BIGINT) + 1 AS x1
       |  FROM sc),
       |kl AS (${graft.functions.SharedLn.oracleLn("k0",
          Seq("doc_id", "n_tokens", "score_unat"), Seq(("__lx", "x1")))}),
       |k1 AS (SELECT doc_id, n_tokens, score_unat,
       |    greatest(CAST(round((${CorpusFilters.GumLn2Pow48} - __lx) *
       |      ${(1e17).toString}) AS BIGINT), 1) AS w
       |  FROM kl),
       |k2 AS (${graft.functions.SharedLn.oracleLn("k1",
          Seq("doc_id", "n_tokens", "score_unat"), Seq(("__lw", "w")))}),
       |k AS (SELECT doc_id, n_tokens, score_unat,
       |    CAST(round(1000000.0 * (${CorpusFilters.GumLnScale} - __lw))
       |      AS BIGINT) AS gumbel_unat
       |  FROM k2),
       |r AS (SELECT *, score_unat + gumbel_unat AS key_unat,
       |    ROW_NUMBER() OVER (ORDER BY score_unat + gumbel_unat DESC,
       |      doc_id) AS rank
       |  FROM k)
       |SELECT CAST(rank AS INTEGER) AS rank, r.doc_id, lang, source,
       |  n_tokens, score_unat, gumbel_unat, key_unat
       |FROM r JOIN documents d ON r.doc_id = d.doc_id
       |WHERE rank <= $DsirK ORDER BY rank""".stripMargin
  }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q125_dsir_resample" -> (q125_dsir_resample _),
    "q51_repetition"    -> (q51_repetition _),
    "q52_contamination" -> (q52_contamination _),
    "q53_domain_mix"    -> (q53_domain_mix _),
    "q56_unigram_logprob" -> (q56_unigram_logprob _),
    "q57_chunk"           -> (q57_chunk _),
    "q58_numeric_profile" -> (q58_numeric_profile _),
    "q63_lexical_diversity" -> (q63_lexical_diversity _),
    "q66_span_dedup"      -> (q66_span_dedup _),
    "q66b_span_rewrite"   -> (q66b_span_rewrite _),
    "q75_cdc_span_dedup"  -> (q75_cdc_span_dedup _),
    "q76_pack_clean"      -> (q76_pack_clean _),
    "q77_stratified_sample" -> (q77_stratified_sample _),
    "q67_source_cap"      -> (q67_source_cap _),
    "q68_bigram_lm"       -> (q68_bigram_lm _),
    "q69_zipf_profile"    -> (q69_zipf_profile _),
    "q70_curation_funnel" -> (q70_curation_funnel _),
    "q71_bm25"            -> (q71_bm25 _),
    "q72_pack_offsets"    -> (q72_pack_offsets _),
    "q72b_pack_tokenized" -> (q72b_pack_tokenized _),
    "q85_pack_sequences"  -> (q85_pack_sequences _),
    "q85b_pack_subword"   -> (q85b_pack_subword _),
    "q87_quality_classifier" -> (q87_quality_classifier _),
    "q87b_quality_trained" -> (q87b_quality_trained _),
    "q238_gains_curve"    -> (q238_gains_curve _),
    "q94_bpe_learn"       -> (q94_bpe_learn _),
    "q94b_bpe_tokenize"   -> (q94b_bpe_tokenize _),
    "q204_tokenizer_fertility" -> (q204_tokenizer_fertility _),
    "q112_bytebpe_learn"  -> (q112_bytebpe_learn _),
    "q112b_bytebpe_tokenize" -> (q112b_bytebpe_tokenize _),
    "q95_adaptive_threshold" -> (q95_adaptive_threshold _),
    "q97_repeated_substrings" -> (q97_repeated_substrings _),
    "q97b_substring_rewrite" -> (q97b_substring_rewrite _),
    "q102_chunk_sliding"  -> (q102_chunk_sliding _),
    "q103_weighted_sample" -> (q103_weighted_sample _),
    "q104_countmin_hh"    -> (q104_countmin_hh _),
    "q105_unigram_learn"  -> (q105_unigram_learn _),
    "q105b_unigram_tokenize" -> (q105b_unigram_tokenize _),
    "q107_temperature_mix" -> (q107_temperature_mix _),
    "q111_tokenizer_report" -> (q111_tokenizer_report _),
    "q116_wordpiece_learn" -> (q116_wordpiece_learn _),
    "q116b_wordpiece_tokenize" -> (q116b_wordpiece_tokenize _),
    "q117_ngramlm_quality" -> (q117_ngramlm_quality _),
    "q119_source_divergence" -> (q119_source_divergence _),
    "q121_packing_efficiency" -> (q121_packing_efficiency _))

  private[graft] val DToks =
    "list_filter(string_split(trim(text), ' '), t -> t <> '')"

  /** q66b's CTE chain (span winners → per-doc kept text/counts + base),
    * shared with q76's packing of the cleaned lengths. */
  private lazy val SpanRewriteCtes: String =
    s"""toks AS (SELECT doc_id, $DToks AS t FROM documents),
       |seg AS (SELECT doc_id, CAST(i AS INT) AS seg_id,
       |    array_to_string(t[i*8+1 : i*8+8], ' ') AS sg
       |  FROM toks, unnest(range(0, CAST(floor(len(t) / 8.0) AS INT))) AS u(i)
       |  WHERE len(t) >= 8),
       |k AS (SELECT md5(sg) AS seg_md5, MIN(doc_id * 1000000 + seg_id) AS enc
       |  FROM seg GROUP BY md5(sg)),
       |kept AS (SELECT s.doc_id, s.seg_id, s.sg
       |  FROM seg s JOIN k ON md5(s.sg) = k.seg_md5
       |  WHERE s.doc_id * 1000000 + s.seg_id = k.enc),
       |ka AS (SELECT doc_id, COUNT(*) AS n_kept,
       |    string_agg(sg, ' ' ORDER BY seg_id) AS kept_txt
       |  FROM kept GROUP BY doc_id),
       |base AS (SELECT doc_id, len(t) AS n_tokens,
       |    CAST(floor(len(t) / 8.0) AS INT) AS n_spans,
       |    array_to_string(t[CAST(floor(len(t) / 8.0) AS INT) * 8 + 1 : len(t)], ' ') AS tail_txt
       |  FROM toks)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q51_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |d AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
         |uni AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_uni,
         |    COUNT(*) AS n_distinct
         |  FROM (SELECT doc_id, g, COUNT(*) AS c
         |        FROM (SELECT doc_id, unnest(t) AS g FROM d) GROUP BY 1, 2)
         |  GROUP BY doc_id),
         |bi AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_bi
         |  FROM (SELECT doc_id, g, COUNT(*) AS c
         |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |          i -> t[i] || ' ' || t[i+1])) AS g FROM d) GROUP BY 1, 2)
         |  GROUP BY doc_id)
         |SELECT uni.doc_id, n_tokens,
         |  round(CAST(top_uni AS DOUBLE) / n_tokens, 6) AS top_uni_frac,
         |  round(CAST(top_bi AS DOUBLE) / n_bigrams, 6) AS top_bi_frac,
         |  round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_frac,
         |  (round(CAST(top_uni AS DOUBLE) / n_tokens, 6) > 0.30
         |   OR round(CAST(top_bi AS DOUBLE) / n_bigrams, 6) > 0.18) AS flagged
         |FROM uni JOIN bi ON uni.doc_id = bi.doc_id
         |ORDER BY uni.doc_id""".stripMargin,
    "q52_contamination" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |grams AS (SELECT DISTINCT doc_id,
         |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
         |    unnest(list_transform(range(1, len(t) - 3),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS g
         |  FROM toks WHERE len(t) >= 5),
         |bench AS (SELECT DISTINCT g FROM grams WHERE bucket = 'f')
         |SELECT doc_id, COUNT(*) AS n_grams,
         |  CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  round(CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |        / COUNT(*), 6) AS hit_frac
         |FROM (SELECT * FROM grams WHERE bucket <> 'f') c
         |LEFT JOIN bench ON c.g = bench.g
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q56_unigram_logprob" ->
      s"""WITH toks AS (SELECT doc_id, unnest($DToks) AS term FROM documents),
         |freqs AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
         |tot AS (SELECT COUNT(*) AS total FROM toks),
         |scored AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |    AVG(ln(CAST(tf AS DOUBLE) / total)) AS lp
         |  FROM toks JOIN freqs USING (term), tot GROUP BY doc_id)
         |SELECT doc_id, n_tokens, round(lp, 6) AS avg_logprob,
         |  (lp < -3.5) AS flagged
         |FROM scored ORDER BY doc_id""".stripMargin,
    "q57_chunk" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |d AS (SELECT doc_id, t FROM toks WHERE len(t) >= 1),
         |ch AS (SELECT doc_id, i AS chunk_id,
         |    t[i * 32 + 1 : least((i + 1) * 32, len(t))] AS c
         |  FROM d, unnest(range(0, CAST(ceil(len(t) / 32.0) AS INT))) AS u(i))
         |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         |  CAST(len(c) AS INTEGER) AS n_tokens,
         |  md5(array_to_string(c, ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    // same start-list filter, same slice bounds; DuckDB list slicing is
    // 1-based inclusive, so the chunk end clamps with least()
    "q102_chunk_sliding" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 1),
         |st AS (SELECT doc_id, t, n,
         |    list_filter(range(1, n + 1, 24),
         |      st -> st = 1 OR st + 32 - 24 - 1 < n) AS starts
         |  FROM d),
         |ch AS (SELECT doc_id, i - 1 AS chunk_id, starts[i] AS start,
         |    t[starts[i] : least(starts[i] + 31, n)] AS c
         |  FROM st, unnest(range(1, len(starts) + 1)) AS u(i))
         |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         |  CAST(start AS INTEGER) AS start,
         |  CAST(len(c) AS INTEGER) AS n_tokens,
         |  md5(array_to_string(c, ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    // the ENTIRE count-min sketch rebuilt in SQL (cells are sums — order-
    // independent), same md5 cell hash, same d=4 w=1024; est = min over
    // the 4 probed cells, and never_under re-derived, not assumed
    "q104_countmin_hh" ->
      s"""WITH toks AS (SELECT unnest($DToks) AS tok FROM documents),
         |exact AS (SELECT tok, COUNT(*) AS exact FROM toks GROUP BY tok),
         |top AS (SELECT tok, exact,
         |    ROW_NUMBER() OVER (ORDER BY exact DESC, tok) AS rnk
         |  FROM exact QUALIFY rnk <= 20),
         |cells AS (SELECT j,
         |    CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ' ' || tok), 1, 12)
         |      AS BIGINT) % 1024 AS cell,
         |    COUNT(*) AS cnt
         |  FROM toks, unnest(range(0, 4)) AS u(j) GROUP BY 1, 2),
         |ph AS (SELECT t.rnk, t.tok, t.exact, j,
         |    CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ' ' || t.tok), 1, 12)
         |      AS BIGINT) % 1024 AS cell
         |  FROM top t, unnest(range(0, 4)) AS u(j)),
         |probe AS (SELECT rnk, tok, exact, MIN(cnt) AS est
         |  FROM ph JOIN cells USING (j, cell) GROUP BY 1, 2, 3)
         |SELECT CAST(rnk AS INTEGER) AS rnk, tok, exact, est,
         |  (est >= exact) AS never_under
         |FROM probe ORDER BY rnk""".stripMargin,
    // identical A-ES key: ln((md5-prefix + 1) / 2^48) / w, same literal
    // 2^48, same +1 guard; ROW_NUMBER with the same (key DESC, doc_id)
    // tiebreak — mirrored op-for-op so the rounded doubles hash-match
    "q103_weighted_sample" ->
      s"""WITH w AS (SELECT doc_id, source,
         |    CAST(len($DToks) AS BIGINT) AS w FROM documents),
         |k AS (SELECT doc_id, source, w,
         |    ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
         |      AS BIGINT) + 1.0) / 281474976710656.0) / w AS key
         |  FROM w WHERE w >= 1),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY source ORDER BY key DESC, doc_id) AS rank FROM k)
         |SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, w,
         |  round(key, 6) AS key_r
         |FROM r WHERE rank <= 10 ORDER BY source, rank""".stripMargin,
    "q58_numeric_profile" ->
      """WITH a AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qq,
        |  MIN(l_quantity) AS qmn, MAX(l_quantity) AS qmx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS pp,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS dd
        | FROM lineitem)
        |SELECT n,
        | round(sq / n, 6) AS qty_mean,
        | round(sqrt((qq - sq * sq / n) / (n - 1.0)), 6) AS qty_std,
        | qmn AS qty_min, qmx AS qty_max,
        | round(sp / n, 6) AS price_mean,
        | round(sqrt((pp - sp * sp / n) / (n - 1.0)), 6) AS price_std,
        | round(sd / n, 6) AS disc_mean,
        | round(sqrt((dd - sd * sd / n) / (n - 1.0)), 6) AS disc_std
        |FROM a""".stripMargin,
    "q63_lexical_diversity" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |g AS (SELECT doc_id, g, COUNT(*) AS c FROM (
         |  SELECT doc_id, unnest(t) AS g FROM toks WHERE len(t) >= 1)
         |  GROUP BY doc_id, g),
         |d AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    COUNT(*) AS n_types,
         |    SUM(c * ln(CAST(c AS DOUBLE))) AS clogc
         |  FROM g GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_types,
         | round(ln(CAST(n_tokens AS DOUBLE)) - clogc / n_tokens, 6) AS entropy_r,
         | round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr
         |FROM d ORDER BY doc_id""".stripMargin,
    "q66_span_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |seg AS (SELECT doc_id, CAST(i AS INT) AS seg_id,
         |    array_to_string(t[i*8+1 : i*8+8], ' ') AS sg
         |  FROM toks, unnest(range(0, CAST(floor(len(t) / 8.0) AS INT))) AS u(i)
         |  WHERE len(t) >= 8),
         |k AS (SELECT md5(sg) AS seg_md5,
         |    MIN(doc_id * 1000000 + seg_id) AS enc,
         |    COUNT(*) AS n_copies
         |  FROM seg GROUP BY md5(sg))
         |SELECT CAST(enc // 1000000 AS BIGINT) AS doc_id,
         |  CAST(enc % 1000000 AS INT) AS seg_id, seg_md5, n_copies
         |FROM k ORDER BY doc_id, seg_id""".stripMargin,
    "q66b_span_rewrite" ->
      s"""WITH $SpanRewriteCtes
         |SELECT b.doc_id,
         |  CAST(COALESCE(ka.n_kept, 0) AS INT) AS n_kept,
         |  CAST(b.n_spans - COALESCE(ka.n_kept, 0) AS INT) AS n_dropped,
         |  CAST(COALESCE(ka.n_kept, 0) * 8 + (b.n_tokens - b.n_spans * 8) AS INT) AS n_clean_tokens,
         |  md5(COALESCE(array_to_string(list_filter([ka.kept_txt, b.tail_txt],
         |    x -> x IS NOT NULL AND x <> ''), ' '), '')) AS clean_md5
         |FROM base b LEFT JOIN ka ON b.doc_id = ka.doc_id
         |ORDER BY b.doc_id""".stripMargin,
    "q76_pack_clean" ->
      s"""WITH $SpanRewriteCtes,
         |lens AS (SELECT b.doc_id, b.doc_id % 32 AS bucket,
         |    CAST(COALESCE(ka.n_kept, 0) * 8 + (b.n_tokens - b.n_spans * 8) AS BIGINT) AS n_tokens
         |  FROM base b LEFT JOIN ka ON b.doc_id = ka.doc_id),
         |f AS (SELECT * FROM lens WHERE n_tokens >= 1),
         |o AS (SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM f)
         |SELECT doc_id, bucket, n_tokens, off,
         |  off // 64 AS seq_first,
         |  (off + n_tokens - 1) // 64 AS seq_last
         |FROM o ORDER BY doc_id""".stripMargin,
    "q77_stratified_sample" ->
      """SELECT source, doc_id, n_chars,
        |  CAST(rnk AS INTEGER) AS rnk
        |FROM (SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents)
        |WHERE rnk <= 25 ORDER BY source, rnk""".stripMargin,
    "q75_cdc_span_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |b AS (SELECT doc_id, t, len(t) AS n,
         |    list_filter(list_transform(range(1, greatest(len(t) - 3, 0) + 1),
         |      i -> CASE WHEN i > 1 AND
         |          (CAST('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]), 1, 8) AS BIGINT) % 8) = 0
         |        THEN CAST(i AS INT) END), x -> x IS NOT NULL) AS bp
         |  FROM toks WHERE len(t) >= 1),
         |s AS (SELECT doc_id, t, [CAST(1 AS INT)] || bp AS starts,
         |    bp || [CAST(n + 1 AS INT)] AS ends FROM b),
         |seg AS (SELECT doc_id, CAST(starts[CAST(j AS INT)] AS INT) AS pos,
         |    array_to_string(t[starts[CAST(j AS INT)] : ends[CAST(j AS INT)] - 1], ' ') AS sg
         |  FROM s, unnest(range(1, len(starts) + 1)) AS u(j)),
         |k AS (SELECT md5(sg) AS seg_md5,
         |    MIN(doc_id * 1000000 + pos) AS enc,
         |    COUNT(*) AS n_copies
         |  FROM seg GROUP BY md5(sg))
         |SELECT CAST(enc // 1000000 AS BIGINT) AS doc_id,
         |  CAST(enc % 1000000 AS INT) AS pos, seg_md5, n_copies
         |FROM k ORDER BY doc_id, pos""".stripMargin,
    "q68_bigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |  FROM toks, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
         |bic AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
         |unic AS (SELECT w, COUNT(*) AS c1
         |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS tot FROM (SELECT unnest(t) FROM toks)),
         |scored AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |    AVG(ln(CAST(0.7 AS DOUBLE) * CAST(c12 AS DOUBLE) / u1.c1
         |      + CAST(0.3 AS DOUBLE) * CAST(u2.c1 AS DOUBLE) / tot)) AS lp
         |  FROM bi JOIN bic USING (w1, w2)
         |  JOIN unic u1 ON bi.w1 = u1.w
         |  JOIN unic u2 ON bi.w2 = u2.w, tot
         |  GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, round(lp, 6) AS avg_logprob
         |FROM scored ORDER BY doc_id""".stripMargin,
    "q69_zipf_profile" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |f AS (SELECT term, COUNT(*) AS freq
         |  FROM (SELECT unnest(t) AS term FROM toks) GROUP BY term),
         |rk AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, term) AS rank FROM f),
         |r AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
         |  FROM rk WHERE rank <= 100),
         |a AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         |    SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy FROM r)
         |SELECT n,
         |  round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope_r,
         |  round((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n, 6)
         |    AS intercept_r,
         |  round(pow(sxy - sx * sy / n, 2)
         |    / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2_r
         |FROM a""".stripMargin,
    "q70_curation_funnel" ->
      s"""WITH RECURSIVE toksall AS (SELECT doc_id, text, $DToks AS t FROM documents),
         |base AS (SELECT doc_id, len(t) AS n_tokens, md5(text) AS text_md5
         |  FROM toksall
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> 'f'),
         |firsts AS (SELECT text_md5, MIN(doc_id) AS first_id
         |  FROM base GROUP BY 1),
         |d2 AS (SELECT doc_id, t FROM toksall WHERE len(t) >= 2),
         |uni AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_uni
         |  FROM (SELECT doc_id, g, COUNT(*) AS c
         |        FROM (SELECT doc_id, unnest(t) AS g FROM d2) GROUP BY 1, 2)
         |  GROUP BY doc_id),
         |bi AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_bi
         |  FROM (SELECT doc_id, g, COUNT(*) AS c
         |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |          i -> t[i] || ' ' || t[i+1])) AS g FROM d2) GROUP BY 1, 2)
         |  GROUP BY doc_id),
         |rep AS (SELECT uni.doc_id,
         |    (round(CAST(top_uni AS DOUBLE) / uni.n_tokens, 6) > 0.30
         |     OR round(CAST(top_bi AS DOUBLE) / n_bigrams, 6) > 0.18) AS rep_flag
         |  FROM uni JOIN bi ON uni.doc_id = bi.doc_id),
         |utoks AS (SELECT doc_id, unnest(t) AS term FROM toksall),
         |freqs AS (SELECT term, COUNT(*) AS tf FROM utoks GROUP BY term),
         |tot AS (SELECT COUNT(*) AS total FROM utoks),
         |lm AS (SELECT doc_id,
         |    (AVG(ln(CAST(tf AS DOUBLE) / total)) < -3.5) AS lm_flag
         |  FROM utoks JOIN freqs USING (term), tot GROUP BY doc_id),
         |qual AS (SELECT doc_id,
         |    (SUM((${ClassifierWeights.mkString("[", ", ", "]")})[
         |       CAST(CAST('0x' || substr(md5(term), 1, 4) AS INT) % $ClassifierBuckets AS INT) + 1])
         |     / COUNT(*) >= 0) AS qual_ok
         |  FROM utoks GROUP BY doc_id),
         |grams AS (SELECT DISTINCT doc_id,
         |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
         |    unnest(list_transform(range(1, len(t) - 3),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS g
         |  FROM toksall WHERE len(t) >= 5),
         |bench AS (SELECT DISTINCT g FROM grams WHERE bucket = 'f'),
         |cont AS (SELECT doc_id,
         |    CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM (SELECT * FROM grams WHERE bucket <> 'f') c
         |  LEFT JOIN bench ON c.g = bench.g GROUP BY doc_id),
         |ctoks AS (SELECT doc_id, t FROM toksall
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> 'f'),
         |csh AS (SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
         |  FROM ctoks WHERE len(t) >= 3),
         |csizes AS (SELECT doc_id, COUNT(*) AS n FROM csh GROUP BY doc_id),
         |crare AS (SELECT shingle FROM (SELECT shingle, COUNT(*) AS df
         |  FROM csh GROUP BY 1) WHERE df BETWEEN 2 AND 20),
         |cshj AS (SELECT doc_id, csh.shingle FROM csh
         |  JOIN crare ON csh.shingle = crare.shingle),
         |cinter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM cshj a JOIN cshj b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |cpairs AS (SELECT doc_a, doc_b
         |  FROM cinter JOIN csizes x ON cinter.doc_a = x.doc_id
         |              JOIN csizes y ON cinter.doc_b = y.doc_id
         |  WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) >= 0.5),
         |cedges AS (SELECT doc_a AS src, doc_b AS dst FROM cpairs
         |  UNION SELECT doc_b, doc_a FROM cpairs),
         |creach AS (SELECT src, dst FROM cedges
         |  UNION SELECT r.src, e.dst FROM creach r JOIN cedges e ON r.dst = e.src),
         |clab AS (SELECT src AS id, LEAST(src, MIN(dst)) AS component
         |  FROM creach GROUP BY src),
         |cseg AS (SELECT doc_id, CAST(i AS INT) AS seg_id,
         |    array_to_string(t[i*8+1 : i*8+8], ' ') AS sg
         |  FROM ctoks, unnest(range(0, CAST(floor(len(t) / 8.0) AS INT))) AS u(i)
         |  WHERE len(t) >= 8),
         |ck AS (SELECT sg, MIN(doc_id * 1000000 + seg_id) AS enc
         |  FROM cseg GROUP BY sg),
         |ckept AS (SELECT CAST(enc // 1000000 AS BIGINT) AS doc_id,
         |    COUNT(*) AS n_kept
         |  FROM ck GROUP BY 1),
         |flags AS (SELECT
         |    (b.n_tokens BETWEEN 20 AND 1000) AS f_len,
         |    coalesce(NOT r.rep_flag, false) AS f_rep,
         |    coalesce(NOT l.lm_flag, false) AS f_lm,
         |    (b.doc_id = f.first_id) AS f_dup,
         |    coalesce(nn.id = nn.component, true) AS f_near,
         |    coalesce(COALESCE(kp.n_kept, 0) * 8 + (b.n_tokens % 8) >= 20,
         |      false) AS f_span,
         |    coalesce(c.n_hit = 0, false) AS f_cont,
         |    coalesce(q.qual_ok, false) AS f_qual
         |  FROM base b JOIN firsts f USING (text_md5)
         |  LEFT JOIN rep r ON b.doc_id = r.doc_id
         |  LEFT JOIN lm l ON b.doc_id = l.doc_id
         |  LEFT JOIN clab nn ON b.doc_id = nn.id
         |  LEFT JOIN ckept kp ON b.doc_id = kp.doc_id
         |  LEFT JOIN cont c ON b.doc_id = c.doc_id
         |  LEFT JOIN qual q ON b.doc_id = q.doc_id),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS s0,
         |  CAST(SUM(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         |  CAST(SUM(CASE WHEN f_len AND f_rep THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         |  CAST(SUM(CASE WHEN f_len AND f_rep AND f_lm THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         |  CAST(SUM(CASE WHEN f_len AND f_rep AND f_lm AND f_dup THEN 1 ELSE 0 END) AS BIGINT) AS s4,
         |  CAST(SUM(CASE WHEN f_len AND f_rep AND f_lm AND f_dup AND f_near THEN 1 ELSE 0 END) AS BIGINT) AS s5,
         |  CAST(SUM(CASE WHEN f_len AND f_rep AND f_lm AND f_dup AND f_near AND f_span THEN 1 ELSE 0 END) AS BIGINT) AS s6,
         |  CAST(SUM(CASE WHEN f_len AND f_rep AND f_lm AND f_dup AND f_near AND f_span AND f_cont THEN 1 ELSE 0 END) AS BIGINT) AS s7,
         |  CAST(SUM(CASE WHEN f_len AND f_rep AND f_lm AND f_dup AND f_near AND f_span AND f_cont AND f_qual THEN 1 ELSE 0 END) AS BIGINT) AS s8,
         |  CAST(SUM(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT) AS a2,
         |  CAST(SUM(CASE WHEN f_lm THEN 1 ELSE 0 END) AS BIGINT) AS a3,
         |  CAST(SUM(CASE WHEN f_dup THEN 1 ELSE 0 END) AS BIGINT) AS a4,
         |  CAST(SUM(CASE WHEN f_near THEN 1 ELSE 0 END) AS BIGINT) AS a5,
         |  CAST(SUM(CASE WHEN f_span THEN 1 ELSE 0 END) AS BIGINT) AS a6,
         |  CAST(SUM(CASE WHEN f_cont THEN 1 ELSE 0 END) AS BIGINT) AS a7,
         |  CAST(SUM(CASE WHEN f_qual THEN 1 ELSE 0 END) AS BIGINT) AS a8
         | FROM flags)
         |SELECT stage, rule, n_kept, n_pass_alone FROM (
         |  SELECT 0 AS stage, 'corpus' AS rule, s0 AS n_kept, s0 AS n_pass_alone FROM a
         |  UNION ALL SELECT 1, 'length', s1, s1 FROM a
         |  UNION ALL SELECT 2, 'repetition', s2, a2 FROM a
         |  UNION ALL SELECT 3, 'lm_quality', s3, a3 FROM a
         |  UNION ALL SELECT 4, 'exact_dedup', s4, a4 FROM a
         |  UNION ALL SELECT 5, 'near_dedup', s5, a5 FROM a
         |  UNION ALL SELECT 6, 'span_dedup', s6, a6 FROM a
         |  UNION ALL SELECT 7, 'decontaminated', s7, a7 FROM a
         |  UNION ALL SELECT 8, 'quality', s8, a8 FROM a)
         |ORDER BY stage""".stripMargin,
    "q72_pack_offsets" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |c AS (SELECT doc_id, doc_id % 32 AS bucket,
         |    CAST(len(t) AS BIGINT) AS n_tokens
         |  FROM toks WHERE len(t) >= 1),
         |o AS (SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM c)
         |SELECT doc_id, bucket, n_tokens, off,
         |  off // 64 AS seq_first,
         |  (off + n_tokens - 1) // 64 AS seq_last
         |FROM o ORDER BY doc_id""".stripMargin,
    "q87_quality_classifier" -> qualityClassifierOracle,
    "q94_bpe_learn" -> bpeLearnOracle,
    // sliding 8-grams, occurrence count >= 2, gaps-and-islands merge —
    // the LAG/SUM island detection mirrored column-for-column
    "q97_repeated_substrings" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
         |    CAST('0x' || substr(md5(array_to_string(t[i:i + 7], ' ')), 1, 15)
         |      AS BIGINT) AS gh
         |  FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
         |  WHERE len(t) >= 8),
         |rep AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
         |h AS (SELECT doc_id, i FROM g JOIN rep USING (gh)),
         |isl AS (SELECT doc_id, i,
         |    CASE WHEN LAG(i) OVER w IS NULL THEN 1
         |         WHEN i - LAG(i) OVER w > 8 THEN 1 ELSE 0 END AS new_island
         |  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         |lab AS (SELECT doc_id, i,
         |    SUM(new_island) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM isl),
         |sp AS (SELECT doc_id, island, MAX(i) - MIN(i) + 8 AS covered
         |  FROM lab GROUP BY doc_id, island)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         |  CAST(SUM(covered) AS BIGINT) AS n_repeated_tokens
         |FROM sp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q94b_bpe_tokenize" -> bpeTokenizeOracle,
    "q204_tokenizer_fertility" -> fertilityOracle,
    "q112_bytebpe_learn" -> byteBpeLearnOracle,
    "q112b_bytebpe_tokenize" -> byteBpeTokenizeOracle,
    "q116_wordpiece_learn" -> wpLearnOracle,
    "q116b_wordpiece_tokenize" -> wpTokenizeOracle,
    "q117_ngramlm_quality" -> ngramLmOracle,
    "q119_source_divergence" -> sourceDivergenceOracle,
    "q121_packing_efficiency" -> packingEfficiencyOracle,
    "q125_dsir_resample" -> dsirOracle,
    "q105_unigram_learn" -> unigramLearnOracle,
    "q105b_unigram_tokenize" -> unigramTokenizeOracle,
    "q111_tokenizer_report" -> tokenizerReportOracle,
    // integer quota arithmetic mirrored op-for-op; sqrt is correctly
    // rounded in both engines, SUMs are over BIGINTs only
    "q107_temperature_mix" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n,
        |    SUM(CAST(len($DToks) AS BIGINT)) AS t
        |  FROM documents GROUP BY source),
        |cw AS (SELECT source, n,
        |    CAST(floor(sqrt(CAST(t AS DOUBLE)) * 1000.0) AS BIGINT) AS w
        |  FROM c),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
        |    CAST(SUM(w) AS BIGINT) AS w_total FROM cw),
        |quo AS (SELECT source, n, w,
        |    least((n_total // 2) * w // w_total, n) AS quota
        |  FROM cw, t),
        |ranked AS (SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents),
        |sampled AS (SELECT r.source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |    CAST(SUM(CAST('0x' || substr(md5(CAST(r.doc_id AS VARCHAR)), 1, 12)
        |      AS BIGINT)) AS BIGINT) AS sample_sig
        |  FROM ranked r JOIN quo ON r.source = quo.source
        |  WHERE r.rnk <= quo.quota GROUP BY r.source)
        |SELECT quo.source, quo.n AS n_docs, quo.w AS weight, quo.quota,
        |  COALESCE(sampled.n_sampled, 0) AS n_sampled,
        |  COALESCE(sampled.sample_sig, 0) AS sample_sig
        |FROM quo LEFT JOIN sampled ON quo.source = sampled.source
        |ORDER BY quo.source""".stripMargin,
    // q97's machinery + the rewrite: winner = MIN packed (doc_id, start)
    // per repeated gram; non-winner occurrences become deletion islands;
    // kept text replayed relationally (position anti-join — DuckDB lambdas
    // can't hold subqueries, so the oracle expands islands to positions
    // instead of the engine's per-doc interval HOF; same surviving set)
    "q97b_substring_rewrite" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
         |    CAST('0x' || substr(md5(array_to_string(t[i:i + 7], ' ')), 1, 15)
         |      AS BIGINT) AS gh
         |  FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
         |  WHERE len(t) >= 8),
         |rep AS (SELECT gh, MIN(doc_id * 1000000 + i) AS wenc
         |  FROM g GROUP BY gh HAVING COUNT(*) >= 2),
         |del AS (SELECT doc_id, i FROM g JOIN rep USING (gh)
         |  WHERE doc_id * 1000000 + i <> wenc),
         |isl AS (SELECT doc_id, i,
         |    CASE WHEN LAG(i) OVER w IS NULL THEN 1
         |         WHEN i - LAG(i) OVER w > 8 THEN 1 ELSE 0 END AS new_island
         |  FROM del WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         |lab AS (SELECT doc_id, i,
         |    SUM(new_island) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM isl),
         |iv AS (SELECT doc_id, island, MIN(i) AS s, MAX(i) + 7 AS e
         |  FROM lab GROUP BY doc_id, island),
         |ivd AS (SELECT doc_id, COUNT(*) AS n_del_spans,
         |    SUM(e - s + 1) AS n_del_tokens FROM iv GROUP BY doc_id),
         |dp AS (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p
         |  FROM del, unnest(range(i, i + 8)) AS u(p)),
         |tp AS (SELECT doc_id, CAST(p AS BIGINT) AS p, t[CAST(p AS INT)] AS tok
         |  FROM toks, unnest(range(1, len(t) + 1)) AS u(p)),
         |kept AS (SELECT tp.doc_id, string_agg(tp.tok, ' ' ORDER BY tp.p) AS ktxt
         |  FROM tp LEFT JOIN dp ON tp.doc_id = dp.doc_id AND tp.p = dp.p
         |  WHERE dp.p IS NULL GROUP BY tp.doc_id)
         |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(ivd.n_del_spans, 0) AS BIGINT) AS n_del_spans,
         |  CAST(COALESCE(ivd.n_del_tokens, 0) AS BIGINT) AS n_del_tokens,
         |  CAST(len(t.t) - COALESCE(ivd.n_del_tokens, 0) AS BIGINT) AS n_clean_tokens,
         |  md5(COALESCE(kept.ktxt, '')) AS clean_md5
         |FROM toks t LEFT JOIN ivd ON t.doc_id = ivd.doc_id
         |LEFT JOIN kept ON t.doc_id = kept.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    "q95_adaptive_threshold" ->
      """WITH m AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
        |  FROM documents GROUP BY source)
        |SELECT d.source, round(m.med, 6) AS med_r,
        |  COUNT(*) AS n_kept, MIN(d.n_chars) AS min_kept_chars
        |FROM documents d JOIN m USING (source)
        |WHERE d.n_chars >= m.med
        |GROUP BY d.source, m.med ORDER BY d.source""".stripMargin,
    "q238_gains_curve" -> gainsOracle,
    // label + split counts recomputed exactly (integer filler-ratio label,
    // md5 split); the trained model's held-out accuracy/lift are contract
    // booleans (coefficients are data-dependent, static SQL can't hold them)
    "q87b_quality_trained" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |c AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(t,
         |      w -> w IN (${FillerTokens.map(f => s"'$f'").mkString(", ")})))
         |      AS BIGINT) AS n_filler
         |  FROM toks WHERE len(t) >= 1),
         |l AS (SELECT doc_id,
         |    (100 * n_filler >= 13 * n_tokens) AS label,
         |    (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS INT)
         |      % 2 = 0) AS is_train
         |  FROM c)
         |SELECT
         |  CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |  CAST(SUM(CASE WHEN NOT is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
         |  CAST(SUM(CASE WHEN NOT is_train AND label THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pos_eval,
         |  TRUE AS acc_ok, TRUE AS lift_ok
         |FROM l""".stripMargin,
    // q72's bucket-local cumsum re-derived, every token positioned, the
    // sequence stream digested content-exact (space-joined, pos order)
    "q85_pack_sequences" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |c AS (SELECT doc_id, doc_id % 32 AS bucket, t,
         |    CAST(len(t) AS BIGINT) AS n_tokens
         |  FROM toks WHERE len(t) >= 1),
         |o AS (SELECT doc_id, bucket, t,
         |    CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM c),
         |tok AS (SELECT bucket, off + i - 1 AS pos, t[i] AS tok
         |  FROM o, unnest(range(1, len(t) + 1)) AS u(i))
         |SELECT bucket, pos // 64 AS seq_id,
         |  CAST(COUNT(*) AS INTEGER) AS n_tokens,
         |  md5(string_agg(tok, ' ' ORDER BY pos)) AS toks_md5
         |FROM tok GROUP BY bucket, pos // 64
         |ORDER BY bucket, seq_id""".stripMargin,
    // q72b's greedy walk accumulating the segmentation STRING: DISTINCT
    // lexer words segment once (vocabulary-sized recursion), word-level
    // cumsums position every piece, the stream digests content-exact
    "q85b_pack_subword" ->
      s"""WITH RECURSIVE lex AS (SELECT doc_id,
         |    regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS ps
         |  FROM documents),
         |words AS (SELECT DISTINCT unnest(ps) AS w FROM lex),
         |rec AS (
         |  SELECT w, 1 AS pos, CAST('' AS VARCHAR) AS seg FROM words
         |  UNION ALL
         |  SELECT w, pos + ${Subword.matchLenSql("w", "pos")},
         |    seg || (CASE WHEN seg = '' THEN '' ELSE ' ' END)
         |      || substr(w, pos, ${Subword.matchLenSql("w", "pos")})
         |  FROM rec WHERE pos <= len(w)),
         |wseg AS (SELECT w, string_split(seg, ' ') AS sl
         |  FROM rec WHERE pos > len(w)),
         |dw AS (SELECT doc_id, wi, ps[wi] AS w
         |  FROM lex, unnest(range(1, len(ps) + 1)) AS u(wi)),
         |j AS (SELECT doc_id, wi, sl, CAST(len(sl) AS BIGINT) AS cnt
         |  FROM dw JOIN wseg USING (w)),
         |wo AS (SELECT doc_id, wi, sl,
         |    CAST(coalesce(SUM(cnt) OVER (PARTITION BY doc_id ORDER BY wi
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS woff
         |  FROM j),
         |c AS (SELECT doc_id, doc_id % 32 AS bucket,
         |    CAST(SUM(cnt) AS BIGINT) AS n_tokens
         |  FROM j GROUP BY doc_id),
         |f AS (SELECT * FROM c WHERE n_tokens >= 1),
         |o AS (SELECT doc_id, bucket,
         |    CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM f),
         |p AS (SELECT o.bucket, o.off + wo.woff + pi - 1 AS pos, wo.sl[pi] AS tok
         |  FROM wo JOIN o USING (doc_id),
         |    unnest(range(1, len(wo.sl) + 1)) AS v(pi))
         |SELECT bucket, pos // 64 AS seq_id,
         |  CAST(COUNT(*) AS INTEGER) AS n_tokens,
         |  md5(string_agg(tok, ' ' ORDER BY pos)) AS toks_md5
         |FROM p GROUP BY bucket, pos // 64
         |ORDER BY bucket, seq_id""".stripMargin,
    // the greedy longest-match walk replayed as a recursive CTE over the
    // DISTINCT lexer pieces (vocabulary-sized recursion, depth = longest
    // piece), generated from the same Subword.Vocab the engine matches
    "q72b_pack_tokenized" ->
      s"""WITH RECURSIVE lex AS (SELECT doc_id,
         |    regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS ps
         |  FROM documents),
         |words AS (SELECT DISTINCT unnest(ps) AS w FROM lex),
         |rec AS (
         |  SELECT w, 1 AS pos, 0 AS cnt FROM words
         |  UNION ALL
         |  SELECT w, pos + ${Subword.matchLenSql("w", "pos")}, cnt + 1
         |  FROM rec WHERE pos <= len(w)),
         |wc AS (SELECT w, cnt FROM rec WHERE pos > len(w)),
         |dw AS (SELECT doc_id, unnest(ps) AS w FROM lex),
         |c AS (SELECT doc_id, doc_id % 32 AS bucket,
         |    CAST(SUM(cnt) AS BIGINT) AS n_tokens
         |  FROM dw JOIN wc USING (w) GROUP BY doc_id),
         |f AS (SELECT * FROM c WHERE n_tokens >= 1),
         |o AS (SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM f)
         |SELECT doc_id, bucket, n_tokens, off,
         |  off // 64 AS seq_first,
         |  (off + n_tokens - 1) // 64 AS seq_last
         |FROM o ORDER BY doc_id""".stripMargin,
    "q71_bm25" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |tk AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
         |stats AS (SELECT COUNT(*) AS n_docs,
         |    AVG(CAST(len(t) AS DOUBLE)) AS avgdl FROM toks),
         |dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tk
         |  WHERE term IN ('spark', 'query', 'table') GROUP BY term),
         |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM tk
         |  WHERE term IN ('spark', 'query', 'table') GROUP BY 1, 2, 3),
         |sc AS (SELECT doc_id,
         |    ln(CAST(1.0 AS DOUBLE) + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
         |      * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |      / (tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
         |        + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS sc
         |  FROM tf JOIN dfs USING (term), stats)
         |SELECT doc_id, round(SUM(sc), 6) AS bm25_r FROM sc
         |GROUP BY doc_id ORDER BY bm25_r DESC, doc_id LIMIT 20""".stripMargin,
    "q67_source_cap" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS INT) AS rnk
        |  FROM documents)
        |SELECT source, doc_id, n_chars, rnk FROM r
        |WHERE rnk <= 20 ORDER BY source, rnk""".stripMargin,
    "q53_domain_mix" ->
      """WITH docs AS (SELECT doc_id, source,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) AS h
        |  FROM documents),
        |weights AS (SELECT source, COUNT(*) AS n_orig,
        |    CAST(CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 5 + 1
        |      AS DOUBLE) AS w
        |  FROM docs GROUP BY source),
        |c AS (SELECT MIN(CAST(n_orig AS DOUBLE) / w) AS c FROM weights),
        |rates AS (SELECT source, n_orig, (c.c * w / n_orig) AS rate
        |  FROM weights, c),
        |kept AS (SELECT d.source, COUNT(*) AS n_kept
        |  FROM docs d JOIN rates r ON d.source = r.source
        |  WHERE d.h < r.rate * 65536 GROUP BY d.source)
        |SELECT r.source, r.n_orig, k.n_kept, round(r.rate, 6) AS rate_r
        |FROM rates r JOIN kept k ON r.source = k.source
        |ORDER BY r.source""".stripMargin)
}
