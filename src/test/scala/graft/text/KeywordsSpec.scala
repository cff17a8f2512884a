package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q213: the full RAKE pipeline (segmentation → word graph → phrase
  * scores → top-10) replays brutally on the driver. */
class KeywordsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val stop = TextOps.Stopwords.toSet

  private def brute(): Seq[(String, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val phrases = docs.toSeq.flatMap { text =>
      val t = text.trim.split(" ").filter(_.nonEmpty).toSeq
      if (t.isEmpty) Seq.empty
      else {
        // maximal stopword-free runs, capped at 4 tokens
        val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
        var cur = scala.collection.mutable.ArrayBuffer.empty[String]
        for (w <- t) {
          if (stop(w)) { if (cur.nonEmpty) runs += cur.toSeq; cur.clear() }
          else cur += w
        }
        if (cur.nonEmpty) runs += cur.toSeq
        runs.filter(r => r.nonEmpty && r.length <= 4).toSeq
      }
    }
    val freq = phrases.flatten.groupBy(identity)
      .map { case (w, v) => w -> v.size.toLong }
    val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).map { case (w, v) => w -> v.map(_._2).sum }
    val wscore = freq.keys.map(w => w -> (1000L * deg(w)) / freq(w)).toMap
    phrases.groupBy(_.mkString(" ")).toSeq.map { case (ph, occ) =>
      val words = ph.split(" ").toSeq
      (ph, occ.size.toLong, words.length.toLong, words.map(wscore).sum)
    }.sortBy { case (ph, nOcc, _, score) => (-score, -nOcc, ph) }.take(10)
  }

  test("q213 RAKE: top-10 phrases replay brutally, scores exact") {
    val got = Keywords.q213_rake_keywords(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val want = brute()
    assert(got == want, s"RAKE top-10 mismatch:\n got=$got\nwant=$want")
    // degree/freq >= phrase-length floor: a word's degree counts at
    // least its own occurrences, so every word score is >= 1000
    assert(got.forall(_._4 >= 1000L * 1), "scores bounded below")
    assert(got.map(_._1).distinct.length == got.length, "phrases unique")
  }

  test("q237 burstiness: dispersion indices replay brutally; a Poisson " +
    "process would sit near 1000") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
      .map(_.trim.split(" ").filter(_.nonEmpty))
      .filter(_.nonEmpty)
    val n = docs.length.toLong
    val stats = docs.flatMap(_.groupBy(identity)
        .map { case (t, v) => (t, v.length.toLong) })
      .groupBy(_._1).collect { case (t, v) if v.length >= 20 =>
        (t, v.length.toLong, v.map(_._2).sum, v.map(x => x._2 * x._2).sum)
      }
    val want = stats.map { case (t, df, cf, sq) =>
      (t, df, cf, sq, 1000L * (n * sq - cf * cf) / (cf * (n - 1)))
    }.toSeq.sortBy { case (t, _, _, _, d) => (-d, t) }.take(20)
    val got = Keywords.q237_term_burstiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"burstiness mismatch:\n got=$got\nwant=$want")
    // D is variance/mean: non-negative, and the repeated-token synthetic
    // corpus must show SOME over-dispersion (D > 1) at the top
    assert(got.head._5 > 1000L, "top term should be over-dispersed")
    assert(got.forall(_._5 >= 0L))
  }

  test("q246 TextRank: integer PageRank driver replay on the budgeted " +
    "word graph") {
    val rows = Keywords.q246_textrank(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty && rows.length <= 20)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).trim.split(" ").filter(_.nonEmpty).toSeq)
    val freq = docs.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val vocab = freq.toSeq.sortBy { case (w, c) => (-c, w) }.take(300)
      .map(_._1).toSet
    val pairs = docs.flatMap(t => t.zip(t.drop(1)))
      .filter { case (a, b) => a != b && vocab(a) && vocab(b) }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val adj = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Set[String]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val nodes = adj.keys.toSeq.sorted
    val deg = nodes.map(n => n -> adj(n).size.toLong).toMap
    val mass = 1000000000000L
    val init = mass / nodes.length
    val base = (15L * init) / 100L
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to 10) {
      r = nodes.map { n =>
        n -> (base + (85L * adj(n).toSeq.map(u => r(u) / deg(u)).sum) / 100L)
      }.toMap
    }
    val expected = r.toSeq.sortBy { case (w, rv) => (-rv, w) }.take(20)
    rows.zip(expected).foreach { case ((rk, term, dg, ru, _), (ew, er)) =>
      assert(term == ew, s"rank $rk term")
      assert(ru == er, s"rank $rk rank_u")
      assert(dg == deg(ew), s"rank $rk degree")
    }
    assert(rows.map(_._1).toSeq == (1 to rows.length))
  }
}
