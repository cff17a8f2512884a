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
}
