package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kneser-Ney-smoothed bigram LM scoring — the exact-arithmetic form of
  * the KenLM perplexity filter that CCNet / LLaMA / RedPajama run as the
  * primary quality gate (Wenzek et al. 2020 §4.3; Heafield 2011; smoothing
  * from Kneser & Ney 1995 / Chen & Goodman 1999). One rung up from q68's
  * interpolated bigram (which needs float λ mixing): absolute discounting
  * with d = 3/4 and the CONTINUATION unigram as the backoff makes the
  * whole probability a single rational with integer numerator and
  * denominator, so the score integerizes without any float seam.
  *
  * With c(v,w) bigram counts, c(v·) = Σ_w c(v,w), N1+(v·) = |{w : c(v,w)
  * > 0}|, N1+(·w) = |{v : c(v,w) > 0}|, B = |{(v,w) : c(v,w) > 0}| and
  * d = 3/4:
  *
  *   P_KN(w|v) = max(c(v,w) − d, 0)/c(v·) + d·N1+(v·)/c(v·) · N1+(·w)/B
  *             = [ max(4c − 3, 0)·B + 3·N1+(v·)·N1+(·w) ] / [ 4·c(v·)·B ]
  *
  * Both sides of the fraction are exact BIGINTs; per-bigram micro-nat
  * log-probs follow the house quantize-before-sum rule (q203/q125):
  * round(10⁶·ln num) − round(10⁶·ln den), two integer-ln roundings, then
  * an exact per-document sum. The keep flag is an integer cross-
  * multiplication (2·Σlp ≥ −19·10⁶·n ⇔ mean lp ≥ −9.5 nats) — both
  * engines compare identical BIGINTs, so there is no knife-edge at all.
  *
  * Exactness witness (spec-asserted): Σ_{w : c(v,w)>0} num(v,w) =
  * 4·c(v·)·B − 3·N1+(v·)·B + 3·N1+(v·)·Σ_w N1+(·w) = den(v), because
  * Σ_w N1+(·w) = B — the KN normalization identity survives the integer
  * lift EXACTLY (the mass that discounting removes is precisely what the
  * continuation backoff redistributes).
  *
  * Scale shape: the model tables are vocabulary-bounded (ctx/cont) and
  * vocabulary²-bounded (bigram types) — corpus-independent in the limit
  * (Heaps). The score join shuffles on the bigram key exactly like q68
  * (map-side combine shrinks the count side); ctx and cont broadcast. The
  * products c·B reach BIGINT limits when corpus-bigrams × bigram-types
  * ≳ 2⁶¹ — the loud assert below names the DECIMAL(38,0) swap, the q202
  * protocol.
  */
object KneserNey {

  private def docToks(s: SparkSession, dir: String): DataFrame =
    Tables.documentsFanned(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t"))

  def q212_kneser_ney(s: SparkSession, dir: String): DataFrame = {
    val bi = docToks(s, dir).filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t)-1), i -> struct(element_at(t,i) AS w1, element_at(t,i+1) AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bic = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val ctx = bic.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1v"), count(lit(1)).as("n1f"))
    val cont = bic.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    // total distinct bigram types — catalog-sized count (vocab²-bounded)
    val b = bic.count()
    bi
      .join(bic, Seq("w1", "w2"))
      .join(broadcast(ctx), Seq("w1"))
      .join(broadcast(cont), Seq("w2"))
      // 4·c·B and 3·N1f·N1b must fit a BIGINT; past that scale the
      // rational moves to DECIMAL(38,0) — fail loudly, never wrap
      .filter(coalesce(assert_true(
        expr(s"4 * c12 <= (${Long.MaxValue}L div ${math.max(b, 1L)}L) " +
          s"and 4 * c1v <= (${Long.MaxValue}L div ${math.max(b, 1L)}L) " +
          s"and 3 * n1f <= (${Long.MaxValue}L div greatest(n1b, 1L))"),
        lit("KN rational would overflow BIGINT: swap numerator/denominator " +
          "to DECIMAL(38,0) at this corpus scale")), lit(true)))
      .withColumn("lp",
        round(lit(1e6) * log(
          expr(s"greatest(4 * c12 - 3, 0L) * ${b}L + 3 * n1f * n1b")))
          .cast("long") -
          round(lit(1e6) * log(expr(s"4 * c1v * ${b}L"))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("sum_lp_micro"))
      .withColumn("keep",
        lit(2L) * col("sum_lp_micro") >= lit(-19000000L) * col("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_lp_micro"),
        col("keep"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- oracle

  private val DToks =
    "list_filter(string_split(trim(text), ' '), t -> t <> '')"

  private lazy val knOracle: String =
    s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
       |bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       |  FROM toks, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
       |bic AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
       |  FROM bi GROUP BY 1, 2),
       |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1v,
       |    CAST(COUNT(*) AS BIGINT) AS n1f FROM bic GROUP BY 1),
       |cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b
       |  FROM bic GROUP BY 1),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM bic),
       |terms AS (SELECT doc_id,
       |    CAST(round(1000000.0 * ln(
       |      greatest(4 * c12 - 3, 0) * b + 3 * n1f * n1b)) AS BIGINT)
       |    - CAST(round(1000000.0 * ln(4 * c1v * b)) AS BIGINT) AS lp
       |  FROM bi JOIN bic USING (w1, w2) JOIN ctx USING (w1)
       |  JOIN cont USING (w2), tot),
       |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(lp) AS BIGINT) AS sum_lp_micro FROM terms GROUP BY 1)
       |SELECT doc_id, n_bigrams, sum_lp_micro,
       |  (2 * sum_lp_micro >= -19000000 * n_bigrams) AS keep
       |FROM d ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q212_kneser_ney" -> (q212_kneser_ney _))

  val oracle: Map[String, String] = Map(
    "q212_kneser_ney" -> knOracle)
}
