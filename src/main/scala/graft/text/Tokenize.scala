package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M1 `tokenize_lemmatize` (SURVEY §2.6; LDA_logic.py:230-261) — the
  * Spark-native stand-in for the reference's spaCy `en_core_web_lg`
  * pipeline: keep alphabetic, non-stopword tokens, lowercased, lemmatized.
  *
  * Declared fidelity gap (SURVEY §7.4): true statistical POS tagging and
  * lemmatization need a model we neither ship nor depend on. We implement
  * the deterministic subset — word-boundary tokenization, alpha filter,
  * stopword removal (MLlib's English list, same family as NLTK's), and a
  * suffix-rule lemmatizer (Porter-step-1-flavored) — entirely as builtin
  * expressions, so the whole pipe stays inside whole-stage codegen; there
  * is no UDF and no per-row interpreter work.
  */
object Tokenize {

  /** MLlib's bundled English stopwords (Snowball-derived, same lineage as
    * the NLTK list the reference loads at app.py:37). */
  val EnglishStopwords: Seq[String] =
    org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords("english").toSeq

  /** Ordered suffix rules (first match wins), shared verbatim with the
    * DuckDB oracle: (pattern, replacement). Guards keep short roots intact. */
  val LemmaRules: Seq[(String, String)] = Seq(
    "(....)ingly$" -> "$1",   // amazingly -> amaz
    "(...)edly$"   -> "$1",   // supposedly -> suppos
    "(..)ies$"     -> "$1y",  // queries -> query
    "(..)sses$"    -> "$1ss", // classes -> class
    "(...)ing$"    -> "$1",   // loading -> load
    "(...)ed$"     -> "$1",   // loaded -> load
    "(..)ly$"      -> "$1",   // slowly -> slow
    "([^s])s$"     -> "$1")   // errors -> error (not 'ss')

  /** \W+ word split, lowercase, alpha-only, stopword filter. */
  def words(text: Column): Column =
    filter(split(lower(text), "[^a-zA-Z]+"),
      t => t.rlike("^[a-z]+$") && length(t) >= 2 &&
        !t.isin(EnglishStopwords.map(x => x: Any): _*))

  /** Apply the first matching suffix rule to one token: a flat
    * first-non-null `coalesce` over `when(rlike, replace)` arms — linear
    * expression size. (A fold threading a "done" flag re-nests every prior
    * arm into each next one: O(rules²) tree growth, measured 91 s for q38
    * at sf0.01 vs ~1 s for this form.) */
  def lemma(token: Column): Column =
    coalesce(
      (LemmaRules.map { case (pat, rep) =>
        when(token.rlike(pat), regexp_replace(token, pat, rep))
      } :+ token): _*)

  /** Full M1 pipe: text → lemmatized content tokens. */
  def lemmaTokens(text: Column): Column = transform(words(text), t => lemma(t))

  /** Oracle-gated query: per-document lemma stream digest + per-corpus
    * top lemmas (checks tokenization, stopwords and rules end-to-end). */
  def q38_lemma_tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), lemmaTokens(col("text")).as("lemmas"))
      .select(col("doc_id"),
        size(col("lemmas")).as("n_lemmas"),
        md5(array_join(col("lemmas"), " ").cast("binary")).as("lemmas_md5"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_lemma_tokens" -> (q38_lemma_tokens _))

  private def sqlIn(xs: Seq[String]): String =
    xs.map(x => "'" + x.replace("'", "''") + "'").mkString("(", ",", ")")

  // DuckDB twin: same split/filter/rules. list_transform + chained CASE.
  private val DWords =
    s"""list_filter(string_split_regex(lower(text), '[^a-zA-Z]+'),
       | t -> regexp_matches(t, '^[a-z]+$$') AND len(t) >= 2
       |      AND t NOT IN ${sqlIn(EnglishStopwords)})""".stripMargin
  private val DLemma = LemmaRules.zipWithIndex.reverse.foldLeft("t") {
    case (acc, ((pat, rep), _)) =>
      val drep = rep.replace("$1", "\\1")
      s"CASE WHEN regexp_matches(t, '$pat') THEN regexp_replace(t, '$pat', '$drep') ELSE $acc END"
  }

  val oracle: Map[String, String] = Map(
    "q38_lemma_tokens" ->
      s"""WITH w AS (SELECT doc_id, $DWords AS ws FROM documents),
         |l AS (SELECT doc_id, list_transform(ws, t -> $DLemma) AS lemmas FROM w)
         |SELECT doc_id, CAST(len(lemmas) AS INTEGER) AS n_lemmas,
         | md5(coalesce(array_to_string(lemmas, ' '), '')) AS lemmas_md5
         |FROM l ORDER BY doc_id""".stripMargin)
}
