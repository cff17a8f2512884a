package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2, each a
  * pure `(SparkSession, sfDir) => DataFrame`.
  * `oracleSql`: DuckDB-equivalent ANSI SQL per query (omitted for
  * non-SQL-expressible engine-only operators).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The §7.2 corpus pipeline: cleanse → tokenize → stopword-filter →
    * per-language term frequency → top-k. */
  def entry(spark: SparkSession): DataFrame =
    text.TextOps.q32_corpus_pipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rel.Relational.queries ++ rel.Behavior.queries ++
      rel.Linkage.queries ++ rel.Graph.queries ++ rel.Triangles.queries ++
      rel.Expectations.queries ++ rel.Coreness.queries ++
      rel.SkewAdvisor.queries ++ rel.JoinCard.queries ++ rel.Lpa.queries ++
      rel.Walks.queries ++ rel.LinkPred.queries ++ rel.Itemsets.queries ++
      text.TextOps.queries ++ text.Tokenize.queries ++ text.Phrases.queries ++
      text.Entropy.queries ++ text.Budget.queries ++ text.Overlap.queries ++
      text.CorpusFilters.queries ++ text.Retrieval.queries ++
      text.KneserNey.queries ++ text.Keywords.queries ++
      text.Eval.queries ++ text.Privacy.queries ++ text.Drift.queries ++
      ml.Vocab.queries ++ ml.Hdr.queries ++ ml.Hll.queries ++
      ml.LshPlanner.queries ++
      ml.Projection.queries ++
      ml.Similarity.queries ++ ml.Lda.queries ++ ml.Bloom.queries ++
      ml.Cluster.queries ++ ml.Bitext.queries ++ ml.Pca.queries ++
      ml.Quantize.queries ++ ingest.Tickets.queries ++ ingest.Wet.queries ++
      multimodal.Media.queries ++ sink.Orc.queries ++ sink.Avro.queries ++
      sink.Lake.queries ++ sink.Skipping.queries ++ sink.Dpp.queries ++
      sink.RangeLayout.queries ++ streaming.Sessions.queries

  def oracleSql: Map[String, String] =
    rel.Relational.oracle ++ rel.Behavior.oracle ++
      rel.Linkage.oracle ++ rel.Graph.oracle ++ rel.Triangles.oracle ++
      rel.Expectations.oracle ++ rel.Coreness.oracle ++
      rel.SkewAdvisor.oracle ++ rel.JoinCard.oracle ++ rel.Lpa.oracle ++
      rel.Walks.oracle ++ rel.LinkPred.oracle ++ rel.Itemsets.oracle ++
      text.TextOps.oracle ++ text.Tokenize.oracle ++ text.Phrases.oracle ++
      text.Entropy.oracle ++ text.Budget.oracle ++ text.Overlap.oracle ++
      text.CorpusFilters.oracle ++ text.Retrieval.oracle ++
      text.KneserNey.oracle ++ text.Keywords.oracle ++
      text.Eval.oracle ++ text.Privacy.oracle ++ text.Drift.oracle ++
      ml.Vocab.oracle ++ ml.Hdr.oracle ++ ml.Hll.oracle ++
      ml.LshPlanner.oracle ++
      ml.Projection.oracle ++
      ml.Similarity.oracle ++ ml.Lda.oracle ++ ml.Cluster.oracle ++ ml.Bitext.oracle ++ ml.Pca.oracle ++
      ml.Bloom.oracle ++ ml.Quantize.oracle ++
      ingest.Tickets.oracle ++ ingest.Wet.oracle ++
      multimodal.Media.oracle ++ sink.Orc.oracle ++
      sink.Avro.oracle ++ sink.Lake.oracle ++ sink.Skipping.oracle ++
      sink.Dpp.oracle ++ sink.RangeLayout.oracle

  /** Engine-only residue, made provably residual (r15 verdict item 2):
    * every registry entry WITHOUT a DuckDB oracle, annotated with the
    * oracle-GATED contract twin that covers the same kernel — or the
    * documented reason no SQL replay can exist. The engine-only rows
    * stay registered because they exercise the REAL library surface
    * (MLlib fits, codec plumbing, the streaming protocol) that the
    * integerized twins gate from the outside. */
  val contractTwin: Map[String, String] = Map(
    "m_ann_quantized" -> ("q81_ann_quantized_recall gates the same int8 " +
      "SQ kernel under a recall contract"),
    "m_ann_ivf" -> ("q82_ann_ivf_recall gates the same IVF index (fitted " +
      "KMeans centroids) under a recall contract"),
    "m_ann_pq_fitted" -> ("q99_pq_fitted_recall gates the same PQ/ADC " +
      "index under a recall contract"),
    "m_dedup_minhash_lsh" -> ("q84_minhash_lsh_recall gates the MLlib " +
      "MinHashLSH pipeline against the oracle-gated q30/q31 native " +
      "MinHash under a recall contract"),
    "m_bloom_decontaminate" -> ("q80_bloom_decontaminate is the " +
      "hash-gated twin (deterministic integer Bloom arithmetic); this " +
      "entry keeps the spark.util.sketch.BloomFilter plumbing exercised"),
    "m_ingest_nested" -> ("q74_ingest_nested gates the same nested " +
      "reshape through the engine-neutral line digest"),
    "m_image_text_pairs" -> ("q83_image_text_pairs gates the same join " +
      "through the engine-neutral digest"),
    "m_vocab_countvectorizer" -> ("q24_dictionary/q25_doc2bow gate the " +
      "same vocabulary + doc2bow semantics natively; this entry keeps " +
      "the MLlib CountVectorizer path exercised"),
    "m_lda_topics" -> ("q155_lda_recovery is the oracle-gated planted-" +
      "topic recovery contract over the same seeded EM fit"),
    "m_lda_sweep" -> "q155_lda_recovery (see m_lda_topics)",
    "m_lda_coherence" -> ("q155_lda_recovery for the fit; MlSpec's " +
      "brute-force sliding-window oracle gates the coherence arithmetic"),
    "m_lda_doc_topics" -> "q155_lda_recovery (see m_lda_topics)",
    "m_lda_relevance" -> "q155_lda_recovery (see m_lda_topics)",
    "m_media_dedup" -> ("q154_media_frames hash-gates the same generated " +
      "media source + frame tiling; the pHash kernel is spec-gated " +
      "(MediaSpec) — its bit-level image fold has no tractable SQL " +
      "replay, same boundary as m_media_features"),
    "m_media_features" -> ("documented-impossible: the feature seed " +
      "folds over every content byte — no tractable SQL replay " +
      "(multimodal/Media.scala scaladoc); MediaSpec gates it"),
    "m_stem_agreement" -> ("a MEASUREMENT row (Porter2 vs lemma-lite " +
      "token agreement, consumed by SURVEY §2's M1 row); both stemmers " +
      "it compares are gated — q38_lemma_tokens and Porter2Spec's " +
      "published-vector suite"),
    "m_hll_stream" -> ("bounded replay of the streaming micro-batch " +
      "protocol; the register arithmetic is the oracle-gated q219, " +
      "batch parity + determinism in SessionsSpec, and the driver " +
      "digest-gates the deterministic replay round-over-round"),
    "m_session_stream" -> ("bounded replay of the watermarked " +
      "session_window protocol; the gap-sessionization arithmetic is " +
      "the oracle-gated q16/q16b, batch parity + determinism in " +
      "SessionsSpec, and the driver digest-gates the replay"),
    "m_psi_stream" -> ("bounded replay of the streaming PSI drift " +
      "gate; the PSI arithmetic is the oracle-gated q203, exact " +
      "replay + alert sensitivity + batch parity in SessionsSpec, " +
      "and the driver digest-gates the replay"))
}
