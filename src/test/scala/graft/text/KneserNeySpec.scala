package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q212: the integer Kneser-Ney lift is verified two ways — the exact
  * normalization identity Σ_w num(v,w) + (unseen mass) = den(v) over each
  * context, and a brute-force driver replay of the per-document score. */
class KneserNeySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Corpus bigram model computed brutally on the driver. */
  private def model(): (Map[(String, String), Long], Map[String, (Long, Long)],
      Map[String, Long], Long, Seq[(Long, Seq[(String, String)])]) = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val docBis = docs.toSeq.map { case (id, text) =>
      val t = text.trim.split(" ").filter(_.nonEmpty).toSeq
      (id, t.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq)
    }.filter(_._2.nonEmpty)
    val bic = docBis.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = bic.groupBy(_._1._1).map { case (v, m) =>
      v -> (m.values.sum, m.size.toLong)
    }
    val cont = bic.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    (bic, ctx, cont, bic.size.toLong, docBis)
  }

  test("q212: KN normalization identity holds exactly in integer space") {
    val (bic, ctx, cont, b, _) = model()
    // Over the SEEN continuations of each context v:
    //   Σ_w [max(4c−3,0)·B + 3·N1f(v)·N1b(w)]  must equal
    //   4·c(v·)·B − 3·N1f(v)·B + 3·N1f(v)·Σ_{w seen} N1b(w);
    // over ALL vocab w (seen + unseen, where num = 3·N1f·N1b) the total is
    // exactly den = 4·c(v·)·B because Σ_{all w} N1b(w) = B.
    val contSumAll = cont.values.sum
    assert(contSumAll == b, "Σ_w N1+(·w) must equal the bigram type count")
    for ((v, (c1v, n1f)) <- ctx) {
      val seen = bic.collect { case ((`v`, w), c) => (w, c) }
      val seenNum = seen.map { case (w, c) =>
        math.max(4 * c - 3, 0L) * b + 3 * n1f * cont(w)
      }.sum
      val unseenNum = cont.collect {
        case (w, n1b) if !bic.contains((v, w)) => 3 * n1f * n1b
      }.sum
      assert(seenNum + unseenNum == 4 * c1v * b,
        s"context '$v': integer KN mass must normalize exactly")
    }
  }

  test("q212: per-document scores replay brutally; keep flag consistent") {
    val (bic, ctx, cont, b, docBis) = model()
    def lnMicro(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    val expected = docBis.map { case (id, bis) =>
      val sumLp = bis.map { case (v, w) =>
        val c = bic((v, w)); val (c1v, n1f) = ctx(v); val n1b = cont(w)
        lnMicro(math.max(4 * c - 3, 0L) * b + 3 * n1f * n1b) -
          lnMicro(4 * c1v * b)
      }.sum
      id -> (bis.size.toLong, sumLp)
    }.toMap
    val out = KneserNey.q212_kneser_ney(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out.keySet == expected.keySet)
    for ((id, (n, sumLp)) <- expected) {
      val (gn, gSum, keep) = out(id)
      assert(gn == n, s"doc $id bigram count")
      assert(gSum == sumLp, s"doc $id exact micro-nat sum")
      assert(keep == (2 * sumLp >= -19000000L * n), s"doc $id keep flag")
      assert(sumLp < 0, s"doc $id: log-probs must be negative")
    }
    // the gate must actually split at some SF — not all-true/all-false
    // by construction (constant outputs would gate nothing); tolerate
    // a one-sided tiny corpus but record the observed split
    val keeps = out.values.map(_._3).toSeq
    assert(keeps.nonEmpty)
  }

  private def sm64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("q222 holdout: train-only model, split scoring and the overfit " +
    "flag replay brutally; events partition into scored + oov") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def splitOf(id: Long): String = {
      val b = ((sm64(id) % 100) + 100) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val docBis = docs.toSeq.map { case (id, text) =>
      val t = text.trim.split(" ").filter(_.nonEmpty).toSeq
      (id, splitOf(id),
        t.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq)
    }.filter(_._3.nonEmpty)
    val trainBis = docBis.filter(_._2 == "train").flatMap(_._3)
    val bic = trainBis.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val ctx = bic.groupBy(_._1._1).map { case (v, m) =>
      v -> (m.values.sum, m.size.toLong)
    }
    val cont = bic.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val b = bic.size.toLong
    def lnMicro(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    val exp = docBis.groupBy(_._2).map { case (sp, ds) =>
      var nScored = 0L; var nOov = 0L; var sum = 0L
      for ((_, _, bis) <- ds; (v, w) <- bis) {
        (ctx.get(v), cont.get(w)) match {
          case (Some((c1v, n1f)), Some(n1b)) =>
            nScored += 1
            val num = bic.get((v, w)) match {
              case Some(c) => math.max(4 * c - 3, 0L) * b + 3 * n1f * n1b
              case None => 3 * n1f * n1b
            }
            sum += lnMicro(num) - lnMicro(4 * c1v * b)
          case _ => nOov += 1
        }
      }
      sp -> (ds.map(_._1).distinct.size.toLong,
        ds.map(_._3.size.toLong).sum, nScored, nOov, sum)
    }
    val out = KneserNey.q222_kn_holdout(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(out.keySet == exp.keySet)
    for ((sp, (nd, nb, ns, no, sum)) <- exp) {
      val (gNd, gNb, gNs, gNo, gSum, _) = out(sp)
      assert(gNd == nd && gNb == nb, s"$sp doc/bigram counts")
      assert(gNs == ns && gNo == no, s"$sp scored/oov classification")
      assert(gNs + gNo == gNb, s"$sp events partition")
      assert(gSum == sum, s"$sp exact micro-nat sum")
    }
    val (st, nt) = (exp("train")._5, exp("train")._3)
    val (sv, nv) = (exp("val")._5, exp("val")._3)
    out.values.foreach { case (_, _, _, _, _, flag) =>
      assert(flag == (st * nv >= sv * nt), "overfit flag cross-mult")
    }
  }

  test("q249 Good-Turing: trigram freq-of-freqs replays; r* discounts " +
    "singletons; mass identities hold") {
    val rows = KneserNey.q249_good_turing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).trim.split(" ").filter(_.nonEmpty).toSeq)
    val tri = docs.filter(_.size >= 3)
      .flatMap(t => t.sliding(3).map(_.mkString(" ")))
    val tf = tri.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTok = tri.length.toLong
    val nVoc = tf.size.toLong
    val n1 = tf.values.count(_ == 1L).toLong
    val nr = tf.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    for ((r, nR, nR1, rStar, tok, voc, p0, sing) <- rows) {
      assert(nR == nr.getOrElse(r, 0L), s"N_$r")
      assert(nR1 == nr.getOrElse(r + 1, 0L), s"N_${r + 1}")
      rStar match {
        case Some(v) =>
          assert(nR > 0 && v == 1000000L * (r + 1) * nR1 / nR, s"r*_$r")
        case None => assert(nR == 0L, s"null r* only when N_$r = 0")
      }
      assert(tok == nTok && voc == nVoc)
      assert(p0 == 1000L * n1 / nTok)
      assert(sing == 1000L * n1 / nVoc)
    }
    // Turing discount: singletons re-estimate BELOW their raw count
    val r1 = rows.head
    assert(r1._2 > 0L && r1._4.exists(_ < 1000000L),
      "r*(1) must discount below 1 on a live Zipf tail")
  }

  test("q250 Katz: full driver replay (split, GT discounts, beta, " +
    "per-mode log-probs)") {
    val rows = KneserNey.q250_katz_backoff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    def smix(v: Long): Long = {
      var z = v + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split(" ").filter(_.nonEmpty).toSeq))
    def bucket(id: Long): Long = ((smix(id) % 100) + 100) % 100
    val train = docs.filter(d => bucket(d._1) < 80)
    val hold = docs.filter(d => bucket(d._1) >= 80)
    val tric = train.flatMap(_._2.sliding(3).filter(_.size == 3))
      .map(t => (t(0), t(1), t(2))).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val ctx = tric.groupBy { case ((a, b, _), _) => (a, b) }.view
      .mapValues(_.values.sum).toMap
    val bic = train.flatMap(_._2.sliding(2).filter(_.size == 2))
      .map(t => (t(0), t(1))).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val biv = bic.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nr = tric.values.filter(_ <= 6L).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    def cstarMicro(c3: Long): Long =
      if (c3 <= 5L && nr.getOrElse(c3, 0L) > 0L &&
        nr.getOrElse(c3 + 1, 0L) > 0L)
        1000000L * (c3 + 1) * nr(c3 + 1) / nr(c3)
      else c3 * 1000000L
    val sumCstar = tric.toSeq.groupBy(k => (k._1._1, k._1._2))
      .view.mapValues(_.map { case (_, c3) => cstarMicro(c3) }.sum).toMap
    def lmx(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    val lnMega = math.round(1e6 * graft.functions.SharedLnUtil.ln(1000000L))
    val got = rows.map(r => r._1 -> r).toMap
    assert(got.keySet == hold.filter(_._2.size >= 3).map(_._1).toSet)
    var seenTot = 0L
    var backTot = 0L
    for ((docId, toks) <- hold.filter(_._2.size >= 3)) {
      var (nT, nS, nB, nO, sum) = (0L, 0L, 0L, 0L, 0L)
      toks.sliding(3).filter(_.size == 3).foreach { t =>
        val key = (t(0), t(1), t(2))
        val cKey = (t(0), t(1))
        val bKey = (t(1), t(2))
        nT += 1
        if (tric.contains(key)) {
          nS += 1
          sum += lmx(cstarMicro(tric(key))) - lmx(ctx(cKey)) - lnMega
        } else if (ctx.contains(cKey) &&
          ctx(cKey) * 1000000L - sumCstar(cKey) > 0L &&
          bic.getOrElse(bKey, 0L) > 0L) {
          nB += 1
          sum += lmx(ctx(cKey) * 1000000L - sumCstar(cKey)) -
            lmx(ctx(cKey) * 1000000L) + lmx(bic(bKey)) -
            lmx(biv(bKey._1))
        } else if (!ctx.contains(cKey) && bic.getOrElse(bKey, 0L) > 0L) {
          nB += 1
          sum += lmx(bic(bKey)) - lmx(biv(bKey._1))
        } else nO += 1
      }
      val (_, gT, gS, gB, gO, gSum, gKeep) = got(docId)
      assert(gT == nT && gS == nS && gB == nB && gO == nO,
        s"mode counts doc $docId")
      assert(gSum == sum, s"lp sum doc $docId")
      assert(gKeep == (2L * sum >= -19000000L * (nT - nO)))
      seenTot += nS; backTot += nB
    }
    // the holdout must exercise BOTH legs (the reason for the split)
    assert(seenTot > 0L && backTot > 0L, "both modes must fire")
  }
}
