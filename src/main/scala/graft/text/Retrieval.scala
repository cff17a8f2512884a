package graft.text

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Lexical retrieval over the document corpus — the query side of a
  * training-data pipeline (decontamination lookups, eval-set retrieval,
  * RAG context fetch all reduce to "score documents against a term
  * query"). Reference scope: the wrangler exposes corpus search only as
  * pandas `str.contains` filters (`wrangler.py:331-340`); this module is
  * the engine-grade generalization: ranked BM25 retrieval through an
  * inverted-postings join.
  *
  * Scoring is Robertson BM25 in Lucene's non-negative idf form
  * (`idf = ln(1 + (N - df + 0.5)/(df + 0.5)) = ln((N+1)/(df+0.5))`,
  * Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework")
  * with k1 = 1.2, b = 0.75. Cross-engine exactness follows the q125
  * discipline: the only transcendental is the per-term idf, integerized
  * once to micro-nats (`round(1e6·ln(...))`, same knife-edge class as
  * every ln-using oracle); the tf normalization is kept EXACTLY rational
  * — with k1 = 6/5 and b = 3/4,
  *
  *   tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/S))
  *     = 44·tf·S / (20·tf·S + 6·S + 18·dl·N)
  *
  * over integers (S = Σ dl), so each term's impact is ONE integer
  * division `idf_unat·44·tf·S div (...)` — Lucene's impact-quantization
  * shape (scores quantized before summation), summed as exact BIGINTs in
  * both engines. No float accumulates anywhere, so parallelism and
  * summation order cannot perturb ranks.
  *
  * Scale shape: the corpus is touched once (postings agg with map-side
  * combine); query terms broadcast; df/idf are query-vocabulary-sized;
  * the per-query top-10 is a WindowGroupLimit bounded heap (literal rank
  * bound), never a global sort. At 100 TB the posting-list join keys on
  * term — the inverted-index access path — and the BIGINT impact product
  * swaps to DECIMAL(38,0) before `idf·44·tf·S` exceeds 2^63 (documented,
  * not hit at bench scale: max ≈ 1e7·44·tf·S ≈ 1e17 at sf0.1).
  */
object Retrieval {

  /** Fixed probe queries over the synthetic corpus vocabulary. */
  private val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("spark", "join", "merge"),
    2 -> Seq("window", "stream", "batch"),
    3 -> Seq("hash", "sort", "filter", "vector"))

  private def docToks(s: SparkSession, dir: String): DataFrame =
    Tables.documentsFanned(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t"))

  // ---------------------------------------------------- BM25 top-k search
  def q129_bm25_topk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docToks(s, dir)
    // postings: one row per (doc, term) with tf; dl rides along so the
    // scoring join needs no per-doc side table
    val posts = toks
      .select(col("doc_id"), size(col("t")).as("dl"),
        explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("t"))).as("sum_dl"))
    val qterms = Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "term")
    // df over the query vocabulary only — postings are unique per
    // (doc, term) so df is a plain count
    val dfT = posts
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = dfT.crossJoin(broadcast(stats))
      .withColumn("idf_unat",
        round(lit(1e6) * log((lit(2.0) * col("n_docs") + lit(2.0)) /
          (lit(2) * col("df") + lit(1)))).cast("long"))
    val scored = posts
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(idf.select(col("term"), col("idf_unat"),
        col("n_docs"), col("sum_dl"))), Seq("term"))
      .withColumn("impact_unat", expr(
        """(idf_unat * (44L * tf * sum_dl)) div
          |(20L * tf * sum_dl + 6L * sum_dl + 18L * dl * n_docs)"""
          .stripMargin.replace('\n', ' ')))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("impact_unat")).as("score_unat"))
    val win = Window.partitionBy(col("qid"))
      .orderBy(col("score_unat").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= 10) // literal bound → WindowGroupLimit heap
      .select(col("qid"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("n_terms_hit"), col("score_unat"))
      .orderBy(col("qid"), col("rank"))
  }

  private val DToks =
    "list_filter(string_split(trim(text), ' '), t -> t <> '')"

  private lazy val bm25Values: String = Bm25Queries
    .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
    .mkString(", ")

  private lazy val bm25Oracle: String =
    s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
       |posts AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM posts GROUP BY 1, 2, 3),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(t)) AS BIGINT) AS sum_dl FROM toks),
       |q(qid, term) AS (VALUES $bm25Values),
       |dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
       |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
       |idf AS (SELECT term, CAST(round(1000000.0 *
       |      ln((2.0 * n_docs + 2.0) / (2 * df + 1))) AS BIGINT) AS idf_unat
       |  FROM dft, stats),
       |sc AS (SELECT qid, doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
       |    CAST(SUM((idf_unat * (44 * tf * sum_dl)) //
       |      (20 * tf * sum_dl + 6 * sum_dl + 18 * dl * n_docs))
       |      AS BIGINT) AS score_unat
       |  FROM tf JOIN q USING (term) JOIN idf USING (term), stats
       |  GROUP BY 1, 2),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY score_unat DESC, doc_id) AS rank FROM sc)
       |SELECT CAST(qid AS INTEGER) AS qid, CAST(rank AS INTEGER) AS rank,
       |  doc_id, n_terms_hit, score_unat
       |FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q129_bm25_topk" -> (q129_bm25_topk _))

  val oracle: Map[String, String] = Map(
    "q129_bm25_topk" -> bm25Oracle)
}
