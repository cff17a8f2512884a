package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q144 eval-set decontamination vs an in-memory brute-force twin. */
class OverlapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("n-gram overlap equals the brute-force twin; eval slice is the md5 rule") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def toks(t: String): Seq[String] =
      t.trim.split(" ").filter(_.nonEmpty).toSeq
    val withGrams = docs.map { case (id, text) =>
      (id, Integer.parseInt(md5hex(id.toString).substring(0, 1), 16) % 8 == 0,
        toks(text).sliding(5).filter(_.size == 5)
          .map(_.mkString(" ")).toSet)
    }.filter(_._3.nonEmpty)
    val evalGrams = withGrams.filter(_._2).flatMap(_._3).toSet
    val expected = withGrams.filterNot(_._2).map { case (id, _, gs) =>
      id -> (gs.size.toLong, gs.count(evalGrams).toLong)
    }.toMap
    val got = Overlap.q144_ngram_decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == expected.keySet,
      "training docs with >= 1 gram must appear exactly once")
    got.foreach { case (id, (n, hits, flag)) =>
      val (en, ehits) = expected(id)
      assert(n == en, s"doc $id gram count")
      assert(hits == ehits, s"doc $id hit count")
      assert(flag == (hits > 0))
    }
    // the fixture must exercise BOTH outcomes or the gate is vacuous
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "need contaminated AND clean docs in the fixture")
  }

  test("q150 containment equals exhaustive pair scan; prefix filter is lossless") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val gsets = docs.map { case (id, text) =>
      id -> text.trim.split(" ").filter(_.nonEmpty).toSeq
        .sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val expected = (for {
      (a, ga) <- gsets.toSeq; (b, gb) <- gsets.toSeq if a != b
      inter = (ga & gb).size
      if inter * 1000 >= 900 * ga.size
    } yield (a, b) -> (ga.size.toLong, gb.size.toLong, inter.toLong)).toMap
    val got = Overlap.q150_containment_join(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
    assert(expected.nonEmpty, "fixture must contain containment pairs")
  }

  test("q186 contamination matrix: ordered pairs, bounded containments") {
    val rows = Overlap.q186_source_contamination(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs ordered a < b")
      val (ga, gb, in) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(in >= 1 && in <= math.min(ga, gb),
        "intersection bounded by either gram set")
      assert(r.getLong(5) <= 1000 && r.getLong(6) <= 1000)
      // directed containments derive from the same intersection
      assert(r.getLong(5) == 1000 * in / ga)
      assert(r.getLong(6) == 1000 * in / gb)
    }
  }

  test("q206 novelty: brute-force first-occurrence sweep agrees exactly") {
    val rows = Overlap.q206_novelty_curve(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // driver twin: tokenize (the DToks split), build 3-gram sets,
    // first-occurrence by id
    val collected = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val gramSets = collected.map { case (id, src, text) =>
      val t = text.trim.split(" ").filter(_.nonEmpty)
      val grams =
        if (t.length < 3) Set.empty[String]
        else t.sliding(3).map(_.mkString(" ")).toSet
      (id, src, grams)
    }
    val firstOf = scala.collection.mutable.Map.empty[String, Long]
    gramSets.sortBy(_._1).foreach { case (id, _, gs) =>
      gs.foreach(g => if (!firstOf.contains(g)) firstOf(g) = id)
    }
    val expected = gramSets.filter(_._3.nonEmpty).map { case (id, src, gs) =>
      val novel = gs.count(g => firstOf(g) == id).toLong
      id -> (src, gs.size.toLong, novel, 1000L * novel / gs.size)
    }.toMap
    assert(rows == expected)
    // the earliest doc with grams is all-novel by construction
    val firstDoc = expected.keys.min
    assert(expected(firstDoc)._4 == 1000L)
  }

  test("q243 winnowing: brute replay; every window covered; density " +
    "tracks 2/(w+1)") {
    val (k, w) = (4, 4)
    val rows = Overlap.q243_winnowing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s0: String): Long = {
      val hex = md.digest(s0.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._2.size >= k + w - 1).toMap
    assert(rows.map(_._1).toSet == docs.keySet)
    var densSum = 0.0
    for ((docId, nGrams, nWins, nFp, dens, digest) <- rows) {
      val toks = docs(docId)
      val hs = toks.sliding(k).map(g => h60(g.mkString(" "))).toArray
      assert(nGrams == hs.length.toLong)
      val nW = hs.length - w + 1
      assert(nWins == nW.toLong)
      // rightmost-min selection per window
      val sel = (0 until nW).map { i =>
        val win = (i until i + w).map(p => (hs(p), p))
        win.minBy { case (hv, p) => (hv, -p) }
      }.distinct
      assert(nFp == sel.size.toLong, s"fp count doc $docId")
      assert(dens == 1000L * sel.size / nW, s"density doc $docId")
      val dg = sel.map { case (hv, p) => hv ^ ((p + 1).toLong << 20) }
        .reduce(_ ^ _)
      assert(digest == dg, s"digest doc $docId")
      // the winnowing coverage invariant: every window holds a selection
      (0 until nW).foreach { i =>
        assert(sel.exists { case (_, p) => p >= i && p < i + w },
          s"window $i of doc $docId uncovered")
      }
      densSum += nFp.toDouble / nW
    }
    // expected density 2/(w+1) = 0.4 — allow wide corpus variance
    val mean = densSum / rows.length
    assert(mean > 0.3 && mean < 0.55, s"mean density $mean off 2/(w+1)")
  }

  test("q276 distinct-n: gram counts replay brutally; diversity bounds") {
    val sfd = "/root/testdata/sf0.001"
    val rows = Overlap.q276_distinct_n(spark, sfd).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sfd/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split(" ")
        .filter(_.nonEmpty).toSeq))
    val bySrc = docs.groupBy(_._1)
    for ((src, nU, dU, nB, dB, d1, d2) <- rows) {
      val ts = bySrc(src).map(_._2)
      val unis = ts.flatten
      val bis = ts.filter(_.length >= 2)
        .flatMap(t => t.sliding(2).map(_.mkString(" ")))
      assert(nU == unis.length.toLong && dU == unis.distinct.length.toLong)
      assert(nB == bis.length.toLong && dB == bis.distinct.length.toLong)
      assert(d1 == 1000L * dU / nU && d2 == 1000L * dB / math.max(nB, 1L))
      // bigrams are strictly more diverse than unigrams on natural text
      assert(d2 >= d1, s"$src bigram diversity dominates")
    }
  }
}
