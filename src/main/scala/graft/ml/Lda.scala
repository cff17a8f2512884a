package graft.ml

import graft.Tables
import graft.text.Cleanse
import org.apache.spark.ml.clustering.{LDA, LDAModel}
import org.apache.spark.ml.feature.CountVectorizerModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LDA topic modeling (SURVEY.md §2.6 M2/M3/M5/M6) — the Spark-native
  * replacement for gensim `LdaMulticore` (LDA_logic.py:69-95, 338-341).
  *
  * MLlib's online variational optimizer is the same algorithm family as
  * LdaMulticore; seeds are fixed (M6 — the reference seeds from
  * random.randint, LDA_logic.py:59-67, which is untestable; determinism is
  * a correctness-gate requirement). All engine-only: topic-term weights are
  * optimizer-specific, never DuckDB-oracle-gated (SURVEY §5.2).
  */
object Lda {

  val Seed = 42L
  val MaxIter = 20 // reference UI caps iterations < 200, passes < 20

  /** P5 `validate_params` (LDA_logic.py:145-168): the reference rejects
    * non-int input and requires passes < 20, iterations < 200. Driver-side
    * precondition — fails fast before any cluster work is scheduled. */
  def validateParams(passes: Int, iterations: Int, numTopics: Int): Unit = {
    require(passes > 0 && passes < 20,
      s"passes must be in (0, 20), got $passes")
    require(iterations > 0 && iterations < 200,
      s"iterations must be in (0, 200), got $iterations")
    require(numTopics > 0, s"num_topics must be positive, got $numTopics")
  }

  /** Corpus → (docs with features, fitted vocabulary). */
  def prepare(s: SparkSession, dir: String): (DataFrame, CountVectorizerModel) = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("tokens"))
    val cv = new org.apache.spark.ml.feature.CountVectorizer()
      .setInputCol("tokens").setOutputCol("features")
      .setMinDF(Vocab.MinDF).setVocabSize(Vocab.VocabSize)
      .fit(docs)
    (cv.transform(docs), cv)
  }

  def train(features: DataFrame, k: Int, maxIter: Int = MaxIter): LDAModel =
    new LDA().setK(k).setMaxIter(maxIter).setSeed(Seed)
      .setFeaturesCol("features")
      .fit(features)

  /** M5: topics described as (topic, rank, term, weight). */
  def describe(s: SparkSession, model: LDAModel,
      vocab: Array[String], topN: Int = 5): DataFrame = {
    val vocabCol = typedlit(vocab.toSeq)
    model.describeTopics(topN)
      .select(col("topic"), posexplode(col("termIndices")).as(Seq("rank", "term_idx")),
        col("termWeights"))
      .select(col("topic"), (col("rank") + 1).as("rank"),
        element_at(vocabCol, col("term_idx") + 1).as("term"),
        round(element_at(col("termWeights"), col("rank") + 1), 6).as("weight"))
  }

  /** Engine query: k=5 LDA, top-5 terms per topic (the reference's
    * `top_k_topics`, LDA_logic.py:124-134). */
  def m_lda_topics(s: SparkSession, dir: String): DataFrame = {
    val (feats, cv) = prepare(s, dir)
    val model = train(feats, k = 5)
    describe(s, model, cv.vocabulary).orderBy(col("topic"), col("rank"))
  }

  /** Top-N topic words for coherence, driver-side (tiny). */
  private def topWords(model: LDAModel, vocab: Array[String], topN: Int): Seq[Seq[String]] =
    model.describeTopics(topN).select("termIndices").collect()
      .map(_.getSeq[Int](0).map(vocab(_)).toSeq).toSeq

  /** M3 model-selection sweep (reference trains k=1..19 per click,
    * LDA_logic.py:338-350): k=2..6 here, scoring each k by log-likelihood,
    * log-perplexity and c_v coherence. Sweep models train at half MaxIter
    * (model *selection* needs ranking stability, not convergence), and all
    * ks' topics go through ONE combined coherence computation — one corpus
    * co-occurrence pass instead of one per k. */
  def m_lda_sweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (feats, cv) = prepare(s, dir)
    feats.cache()
    val tokensDf = feats.select(col("doc_id"), col("tokens"))
    val ks = (2 to 6).toSeq
    val trained = ks.map { k =>
      val model = train(feats, k, maxIter = MaxIter / 2)
      (k, model, topWords(model, cv.vocabulary, 10))
    }
    // global topic index -> k, then a single cv() over every topic
    val topicK: Seq[Int] = trained.flatMap { case (k, _, tws) => tws.map(_ => k) }
    val kOf = typedlit(topicK)
    val cohByK = Coherence.cv(s, tokensDf, trained.flatMap(_._3))
      .select(element_at(kOf, col("topic").cast("int") + 1).as("k"), col("coherence"))
      .groupBy(col("k")).agg(avg(col("coherence")).as("coherence_cv"))
    val scores = trained.map { case (k, m, _) =>
      (k, m.logLikelihood(feats), m.logPerplexity(feats))
    }.toDF("k", "log_likelihood", "log_perplexity")
    feats.unpersist()
    scores.join(cohByK, Seq("k"), "left_outer").orderBy(col("k"))
  }

  /** M4 standalone: c_v coherence of the k=5 model's topics. */
  def m_lda_coherence(s: SparkSession, dir: String): DataFrame = {
    val (feats, cv) = prepare(s, dir)
    val model = train(feats, k = 5)
    Coherence.cv(s, feats.select(col("doc_id"), col("tokens")),
      topWords(model, cv.vocabulary, 10))
  }

  /** M7 completion — per-document topic distributions, the projection the
    * reference's results surface is actually built from (pyLDAvis consumes
    * doc-topic AND topic-term matrices, LDA_logic.py:97-122; `describe`
    * covers only the latter). `LDAModel.transform` scores every document
    * against the fitted model — a broadcast of the topic-term matrix +
    * one map-side variational E-step per document, no shuffle until the
    * final sort — and this emits the per-doc argmax topic, its weight,
    * the full distribution rounded (as an array digest) and its entropy.
    * Engine-only: variational doc-topic posteriors are optimizer-specific
    * (SURVEY §5.2), same rationale as m_lda_topics. */
  def m_lda_doc_topics(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val (feats, _) = prepare(s, dir)
    val model = train(feats, k = 5)
    model.transform(feats)
      .select(col("doc_id"), vector_to_array(col("topicDistribution")).as("td"))
      .select(
        col("doc_id"),
        (expr("array_position(td, array_max(td))") - 1).cast("int").as("top_topic"),
        round(array_max(col("td")), 6).as("top_weight"),
        // JSON digest, not a raw array<double>: the driver's pandas
        // comparator sorts result columns and cannot hash numpy arrays,
        // so the distribution ships as a scalar string.
        to_json(expr("transform(td, x -> round(x, 6))")).as("dist"),
        round(expr(
          "-aggregate(td, 0D, (a, x) -> a + if(x > 0D, x * ln(x), 0D))"), 6)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** The last pyLDAvis projection (completing the reference's
    * `visualize_results` surface next to topic-term weights and doc-topic
    * distributions): RELEVANCE-ranked terms per topic —
    * relevance(w,t | λ) = λ·ln p(w|t) + (1−λ)·ln(p(w|t)/p(w)), λ = 0.6
    * (Sievert & Shirley 2014, the pyLDAvis default) — plus each topic's
    * corpus-wide proportion (mean doc-topic mass). Mechanics: the k×V
    * topic-term matrix is a driver-side model object by MLlib design
    * (tiny — vocab is capped); p(w) and topic proportions are distributed
    * aggregations; ranking is a window over k×V rows. */
  def m_lda_relevance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    import s.implicits._
    val k = 5
    val lambda = 0.6
    val topN = 5
    val (feats, cv) = prepare(s, dir)
    val model = train(feats, k)
    val vocab = cv.vocabulary

    // p(w|t): normalized columns of the fitted topic-term matrix (V × k)
    val tm = model.topicsMatrix
    val colSums = (0 until k).map(t =>
      (0 until vocab.length).map(w => tm(w, t)).sum)
    val pwt = (for (t <- 0 until k; w <- vocab.indices)
      yield (t, vocab(w), tm(w, t) / colSums(t)))
      .toDF("topic", "term", "p_wt")

    // p(w): corpus unigram probability over the model's vocabulary —
    // distributed explode + agg, vocabulary-sized result (broadcastable)
    val toks = feats.select(explode(col("tokens")).as("term"))
      .filter(col("term").isin(vocab.map(x => x: Any): _*))
    val pw = toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .withColumn("p_w", col("n") / sum(col("n")).over(Window.partitionBy()))
      .select(col("term"), col("p_w"))

    // topic proportions: mean doc-topic mass (distributed transform + agg)
    val props = model.transform(feats)
      .select(posexplode(vector_to_array(col("topicDistribution")))
        .as(Seq("topic", "mass")))
      .groupBy(col("topic")).agg(avg(col("mass")).as("topic_prop"))

    val w = Window.partitionBy(col("topic"))
      .orderBy(col("relevance").desc, col("term"))
    pwt.join(broadcast(pw), "term")
      .select(col("topic"), col("term"), col("p_wt"), col("p_w"),
        (lit(lambda) * log(col("p_wt")) +
          lit(1 - lambda) * log(col("p_wt") / col("p_w"))).as("relevance"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .join(props, "topic")
      .select(col("topic"), col("rank"), col("term"),
        round(col("relevance"), 6).as("relevance"),
        round(col("p_wt"), 6).as("p_wt"),
        round(col("topic_prop"), 6).as("topic_prop"))
      .orderBy(col("topic"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_lda_topics"     -> (m_lda_topics _),
    "m_lda_sweep"      -> (m_lda_sweep _),
    "m_lda_coherence"  -> (m_lda_coherence _),
    "m_lda_doc_topics" -> (m_lda_doc_topics _),
    "m_lda_relevance"  -> (m_lda_relevance _))
}
