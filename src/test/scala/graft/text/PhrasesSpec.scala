package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** q161/q162: the word2vec phrase score's integer form and the greedy
  * leftmost non-overlapping merge semantics (the oracle gates both
  * end-to-end at sf0.01; these pin the kernel behaviors on fixtures). */
class PhrasesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def mergeOne(tokens: Seq[String],
      phrases: Seq[(String, String)]): (Long, Long, Seq[String]) = {
    import spark.implicits._
    val docs = Seq((1L, tokens)).toDF("doc_id", "t")
    val ph = phrases.toDF("w1", "w2")
    val row = Phrases.greedyMerge(docs, ph)
      .select(col("n_after"), col("n_merges"), col("digest")).head()
    // re-derive the digest from the expected token stream downstream
    (row.getLong(0), row.getLong(1), Seq(row.getString(2)))
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("greedy merge: run of identical pairs merges at even offsets") {
    val (nAfter, nMerges, d) = mergeOne(Seq("a", "a", "a", "a"),
      Seq(("a", "a")))
    assert((nAfter, nMerges) == (2L, 2L))
    assert(d.head == md5Of("a_a a_a"))
  }

  test("greedy merge: overlap resolves leftmost-first") {
    val (nAfter, nMerges, d) = mergeOne(Seq("a", "b", "c"),
      Seq(("a", "b"), ("b", "c")))
    assert((nAfter, nMerges) == (2L, 1L))
    assert(d.head == md5Of("a_b c"))
  }

  test("greedy merge: adjacent distinct phrases both merge") {
    val (nAfter, nMerges, d) = mergeOne(Seq("a", "b", "c", "d"),
      Seq(("a", "b"), ("c", "d")))
    assert((nAfter, nMerges) == (2L, 2L))
    assert(d.head == md5Of("a_b c_d"))
  }

  test("greedy merge: no phrase hits leaves the stream intact") {
    val (nAfter, nMerges, d) = mergeOne(Seq("x", "y", "z"),
      Seq(("a", "b")))
    assert((nAfter, nMerges) == (3L, 0L))
    assert(d.head == md5Of("x y z"))
  }

  test("mining: ranks strictly ordered, counts respect the discount floor") {
    val rows = Phrases.q161_phrase_mining(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.forall(_.getAs[Long]("c12") >= 5L))
    val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("score_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("skip-gram pairs: symmetric window yields a symmetric pair table") {
    val rows = Phrases.q170_skipgram_pairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), c) =>
      assert(rows.getOrElse((b, a), -1L) == c,
        s"pair ($a,$b)=$c lacks the mirror count")
    }
    assert(rows.values.forall(_ >= 1L))
  }

  test("negative sampling: boundary margins, completeness, Madow bound") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Phrases.q171_negative_sampling(spark, sf).collect()
      assert(rows.nonEmpty)
      // pow is not correctly rounded: assert every vocab count's
      // micro-weight sits clear of the .5 rounding boundary (q151 rule)
      rows.foreach { r =>
        val x = 1e6 * math.pow(r.getAs[Long]("c").toDouble, 0.75)
        val margin = math.abs(x % 1.0 - 0.5)
        assert(margin > 1e-4, s"${r.getAs[String]("w")}: margin $margin")
      }
      assert(rows.map(_.getAs[Long]("n_draws")).sum == 1000L)
      assert(rows.forall(_.getAs[Boolean]("draws_complete")))
      // systematic sampling: every word within 1 of its expectation
      val wTot = rows.map(_.getAs[Long]("w_micro")).sum
      rows.foreach { r =>
        val diff = r.getAs[Long]("n_draws") * wTot -
          1000L * r.getAs[Long]("w_micro")
        assert(math.abs(diff) < wTot,
          s"${r.getAs[String]("w")}: draws off expectation by ${
            diff.toDouble / wTot}")
      }
    }
  }

  test("merge conserves tokens: n_before = n_after + n_merges") {
    val out = Phrases.q162_phrase_merge(spark, dir)
      .filter(col("n_before") =!= col("n_after") + col("n_merges"))
    assert(out.count() == 0)
  }

  test("q211 distinctive terms: brute-force log-odds replay picks the " +
    "same top-10 in the same order") {
    val rows = Phrases.q211_distinctive_terms(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable
      .Map.empty[(String, String), Long].withDefaultValue(0L)
    docs.foreach { case (src, text) =>
      text.trim.split(" ").filter(_.nonEmpty)
        .foreach(t => counts((src, t)) += 1)
    }
    val yAll = counts.groupBy(_._1._2).map { case (t, m) =>
      t -> m.values.sum
    }
    val nS = counts.groupBy(_._1._1).map { case (s0, m) =>
      s0 -> m.values.sum
    }
    val nAll = yAll.values.sum
    val vocab = yAll.size.toLong
    def lnMicro(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    def delta(src: String, term: String): Long = {
      val ys = counts((src, term)); val yr = yAll(term) - ys
      val ns = nS(src); val nr = nAll - ns
      (lnMicro(ys + 1) - lnMicro(ns + vocab - ys - 1)) -
        (lnMicro(yr + 1) - lnMicro(nr + vocab - yr - 1))
    }
    rows.groupBy(_._1).foreach { case (src, got) =>
      val expected = counts.keys.filter(_._1 == src).map(_._2).toSeq
        .map(t => (t, delta(src, t)))
        .sortBy { case (t, d) => (-d, t) }.take(10)
      assert(got.sortBy(_._2).map(r => (r._3, r._6)).toSeq == expected,
        s"top-10 for $src")
      got.foreach { r =>
        assert(r._4 == counts((src, r._3)), "y_s replay")
        assert(r._5 == yAll(r._3) - counts((src, r._3)), "y_r replay")
      }
    }
    assert(rows.groupBy(_._1).forall(_._2.length == 10))
  }

  test("q221 PPMI: ordered-pair counts, marginals and micro-nat scores " +
    "replay brutally; support floor applied") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for (text <- docs) {
      val t = text.trim.split(" ").filter(_.nonEmpty)
      if (t.length >= 2)
        for (i <- t.indices; d <- Seq(-2, -1, 1, 2); j = i + d
             if j >= 0 && j < t.length)
          pairs((t(i), t(j))) += 1
    }
    val n = pairs.values.sum
    val ca = pairs.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val kb = pairs.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    def lnM(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    val scored = pairs.toSeq.filter(_._2 >= 5).map { case ((a, b), nab) =>
      val p = math.max(0L, lnM(nab) + lnM(n) - lnM(ca(a)) - lnM(kb(b)))
      (a, b, nab, ca(a), kb(b), p)
    }.sortBy { case (a, b, _, _, _, p) => (-p, a, b) }.take(20)
    val got = Phrases.q221_ppmi_pairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == scored, s"PPMI top-20 mismatch:\n got=$got\nwant=$scored")
    // window symmetry makes the two marginals coincide per word
    got.foreach { case (a, _, _, cA, _, _) => assert(cA == kb(a)) }
    assert(got.forall(_._6 >= 0L))
  }

  test("q253 Dunning G2: 2x2 cell replay; float-LLR agreement; " +
    "positive on top collocations") {
    val sf = "/root/testdata/sf0.001"
    val rows = Phrases.q253_dunning_collocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty && rows.length <= 20)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).trim.split(" ").filter(_.nonEmpty).toSeq)
    val bis = docs.filter(_.size >= 2)
      .flatMap(t => t.zip(t.drop(1)))
    val bic = bis.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ra = bic.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cbm = bic.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = bis.length.toLong
    def lmx(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    def cell(c: Long, r: Long, cs: Long): Long =
      if (c > 0) c * (lmx(c * nn) - lmx(r * cs)) else 0L
    for ((a, b, c11, ca, cb, g2, g2micro) <- rows) {
      assert(c11 == bic((a, b)) && ca == ra(a) && cb == cbm(b))
      val exp = 2L * (cell(c11, ca, cb) +
        cell(ca - c11, ca, nn - cb) +
        cell(cb - c11, nn - ca, cb) +
        cell(nn - ca - cb + c11, nn - ca, nn - cb))
      assert(g2 == exp, s"G2 of ($a,$b)")
      assert(g2micro == g2 / nn)
      // float LLR agreement within quantization
      val cells = Seq((c11, ca, cb), (ca - c11, ca, nn - cb),
        (cb - c11, nn - ca, cb), (nn - ca - cb + c11, nn - ca, nn - cb))
      val floatG2 = 2.0 * cells.map { case (c, r, cs) =>
        if (c == 0) 0.0
        else c.toDouble * math.log(c.toDouble * nn / (r.toDouble * cs))
      }.sum
      assert(math.abs(g2.toDouble / 1e6 - floatG2) < 1.0,
        s"float agreement ($a,$b): ${g2 / 1e6} vs $floatG2")
    }
    // the top collocation is genuinely associated (positive LLR)
    assert(rows.head._6 > 0L)
    // descending order with (a, b) tiebreak
    rows.sliding(2).foreach {
      case Array(x, y) => assert(x._6 > y._6 ||
        (x._6 == y._6 && (x._1 < y._1 || (x._1 == y._1 && x._2 <= y._2))))
      case _ => ()
    }
  }
}
