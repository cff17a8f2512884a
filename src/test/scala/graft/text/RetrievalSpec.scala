package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BM25 retrieval (q129) against a driver-side brute-force oracle: the
  * whole sf0.001 corpus is re-scored with plain double-precision BM25 and
  * the integer micro-nat impact ranking must agree wherever the
  * double-precision gap exceeds the quantization noise. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val result =
    Retrieval.q129_bm25_topk(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  private val queries = Map(
    1 -> Seq("spark", "join", "merge"),
    2 -> Seq("window", "stream", "batch"),
    3 -> Seq("hash", "sort", "filter", "vector"))

  /** Driver-side double BM25 (Lucene idf, k1=1.2, b=0.75). */
  private lazy val brute: Map[Int, Seq[(Long, Double)]] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split(" ").filter(_.nonEmpty).toSeq))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.size).sum / n
    val dfMap = queries.values.flatten.toSet.map { (t: String) =>
      t -> docs.count(_._2.contains(t)).toDouble
    }.toMap
    queries.map { case (qid, terms) =>
      qid -> docs.flatMap { case (id, toks) =>
        val dl = toks.size.toDouble
        val score = terms.map { t =>
          val tf = toks.count(_ == t).toDouble
          if (tf == 0) 0.0
          else {
            val idf = math.log((n + 1.0) / (dfMap(t) + 0.5))
            idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
          }
        }.sum
        if (score > 0) Some((id, score)) else None
      }.sortBy { case (id, sc) => (-sc, id) }.toSeq
    }
  }

  test("ranks are 1..k, scores non-increasing, hits contain query terms") {
    assert(result.nonEmpty)
    queries.keys.foreach { qid =>
      val rows = result.filter(_._1 == qid).sortBy(_._2)
      assert(rows.map(_._2).toSeq == (1 to rows.length))
      assert(rows.map(_._5).toSeq == rows.map(_._5).sortBy(-_).toSeq)
      assert(rows.forall(_._4 >= 1)) // n_terms_hit
    }
  }

  test("integer impact ranking agrees with double BM25 brute force") {
    queries.keys.foreach { qid =>
      val got = result.filter(_._1 == qid).sortBy(_._2).map(_._3).toSeq
      val want = brute(qid).take(got.length)
      // compare as score-ordered sets allowing swaps only between docs
      // whose double scores are within the quantization noise
      got.zip(want).zipWithIndex.foreach { case ((g, (w, wScore)), i) =>
        if (g != w) {
          val gScore = brute(qid).find(_._1 == g).map(_._2).getOrElse(0.0)
          assert(math.abs(gScore - wScore) < 1e-4 * math.max(1.0, wScore),
            s"qid=$qid rank=${i + 1}: got doc $g (brute $gScore), " +
              s"want doc $w (brute $wScore)")
        }
      }
    }
  }

  test("every returned doc actually contains at least one query term") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    result.foreach { case (qid, _, docId, _, _) =>
      val toks = docs(docId).trim.split(" ").filter(_.nonEmpty).toSet
      assert(queries(qid).exists(toks.contains))
    }
  }

  test("q147 PRF: expansion terms are novel, mined from feedback, ranking valid") {
    val out = Retrieval.q147_prf_expansion(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(5)))
    assert(out.nonEmpty)
    // per query: ranks are 1..k contiguous, expansion column constant
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
      assert(rows.map(_._4).toSet.size == 1, s"exp_terms must be per-query")
      val exp = rows.head._4
      if (exp.nonEmpty) {
        val terms = exp.split(",").toSeq
        assert(terms == terms.sorted, "audit column is sorted")
        assert(terms.size <= 3)
        // novel: never one of the original query terms
        queries(qid).foreach(orig => assert(!terms.contains(orig)))
      }
    }
    // the fixture must actually expand something, or the op is vacuous
    assert(out.exists(_._4.nonEmpty))
  }

  test("q225 retrieval eval: relevance label and graded metrics replay " +
    "over the gated ranking; NDCG bounds hold") {
    val sf = "/root/testdata/sf0.001"
    val queries = Map(
      1 -> Seq("spark", "join", "merge"),
      2 -> Seq("window", "stream", "batch"),
      3 -> Seq("hash", "sort", "filter", "vector"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // relevance: every distinct query term appears >= 3 times
    def relevant(qid: Int): Set[Long] = {
      val terms = queries(qid).distinct
      docs.filter { case (_, text) =>
        val tc = text.trim.split(" ").filter(_.nonEmpty)
          .groupBy(identity).map { case (k, v) => k -> v.length }
        terms.forall(t => tc.getOrElse(t, 0) >= 3)
      }.map(_._1).toSet
    }
    // the ranking under evaluation is q129's (itself oracle-gated)
    val ranked = Retrieval.q129_bm25_topk(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val disc = (1 to 10).map(i =>
      math.round(1e6 / (math.log(1.0 + i) / math.log(2.0))))
    val idcgPrefix = disc.scanLeft(0L)(_ + _).tail
    val out = Retrieval.q225_retrieval_eval(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out.keySet == queries.keySet)
    for (qid <- queries.keys) {
      val rel = relevant(qid)
      val top = ranked.filter(_._1 == qid).sortBy(_._2)
      val (nRel, frr, rr, hits, dcg, idcg, ndcg) = out(qid)
      assert(nRel == rel.size.toLong, s"q$qid n_rel")
      val hitRanks = top.filter(t => rel(t._3)).map(_._2)
      assert(hits == hitRanks.length.toLong, s"q$qid hits@10")
      assert(frr == hitRanks.headOption.getOrElse(0), s"q$qid first rank")
      assert(rr == (if (frr > 0) 1000000L / frr else 0L))
      assert(dcg == hitRanks.map(r => disc(r - 1)).sum, s"q$qid dcg")
      assert(idcg == (if (rel.nonEmpty)
        idcgPrefix(math.min(rel.size, 10) - 1) else 0L))
      assert(ndcg == (if (idcg > 0) 1000L * dcg / idcg else 0L))
      assert(dcg <= idcg && ndcg >= 0 && ndcg <= 1000, s"q$qid bounds")
    }
    // the label must discriminate: not every judged doc is relevant
    assert(out.values.exists(_._4 < 10L),
      "degenerate label: all top-10 relevant for every query")
  }

  test("q242 QLM: decomposed micro-nat scores replay; float Dirichlet " +
    "QL agrees within quantization") {
    val mu = 2000L
    val rows = Retrieval.q242_qlm_topk(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split(" ").filter(_.nonEmpty).toSeq))
    val cc = docs.map(_._2.size.toLong).sum
    val cfMap = queries.values.flatten.toSet.map { (t: String) =>
      t -> docs.map(_._2.count(_ == t).toLong).sum
    }.toMap
    def lm(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    for ((qid, rank, docId, hits, score) <- rows) {
      val terms = queries(qid).filter(cfMap(_) > 0L)
      val toks = docs.find(_._1 == docId).get._2
      val dl = toks.size.toLong
      val hitTerms = terms.filter(t => toks.contains(t))
      assert(hits == hitTerms.size.toLong, s"hits q$qid d$docId")
      // the operator's decomposed integer arithmetic, replayed
      val hitSum = hitTerms.map { t =>
        val tf = toks.count(_ == t).toLong
        lm(tf * cc + mu * cfMap(t)) - lm(mu * cfMap(t))
      }.sum
      val kqV = terms.map(t => lm(mu * cfMap(t))).sum -
        terms.size.toLong * lm(cc)
      val expected = hitSum + kqV - terms.size.toLong * lm(dl + mu)
      assert(score == expected, s"score q$qid d$docId")
      // float Dirichlet QL over the same terms, within quantization
      val floatQl = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        math.log((tf + mu * cfMap(t).toDouble / cc) / (dl + mu))
      }.sum
      assert(math.abs(score / 1e6 - floatQl) < 1e-4 * terms.size,
        s"float agreement q$qid d$docId")
    }
    // ranking coherent per query
    queries.keys.foreach { qid =>
      val rs = rows.filter(_._1 == qid).sortBy(_._2)
      assert(rs.map(_._2).toSeq == (1 to rs.length))
      rs.sliding(2).foreach {
        case Array(a, b) => assert(a._5 > b._5 ||
          (a._5 == b._5 && a._3 < b._3), "order")
        case _ => ()
      }
    }
  }
}
