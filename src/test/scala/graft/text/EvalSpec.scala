package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q173-q184 evaluation kernels: brute-force pairwise AUC oracle, closed
  * forms for kappa/MCC on a hand confusion matrix, rank-machinery
  * bit-identity, Heaps-forecast shape, and cell invariants. */
class EvalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("confusion cells partition the labeled corpus (q173)") {
    val r = Eval.q173_classifier_eval(spark, sf).head()
    val Seq(tp, fp, fn, tn) = (0 to 3).map(r.getLong)
    val nDocs = CorpusFilters.qualityLabels(spark, sf).count()
    assert(tp + fp + fn + tn == nDocs)
    assert(tp >= 0 && fp >= 0 && fn >= 0 && tn >= 0)
    val acc = r.getLong(r.fieldIndex("acc_permille"))
    assert(acc == 1000L * (tp + tn) / nDocs)
    val kappa = r.getDouble(r.fieldIndex("kappa_r"))
    assert(kappa >= -1.0 && kappa <= 1.0)
    val mcc = r.getDouble(r.fieldIndex("mcc_r"))
    assert(mcc >= -1.0 && mcc <= 1.0)
  }

  test("kappa and MCC closed forms on a hand-built confusion matrix") {
    // tp=40 fp=10 fn=20 tn=30, n=100: po=.7,
    // pe=(50*60+50*40)/10000=.5 -> kappa=.4;
    // mcc=(1200-200)/sqrt(50*60*40*50)=1000/sqrt(6e6)
    import spark.implicits._
    val cm = Seq((40L, 10L, 20L, 30L)).toDF("tp", "fp", "fn", "tn")
    // same expression texts the operator ships (via its selectExpr path):
    val out = cm.selectExpr("tp", "fp", "fn", "tn",
      "round(((CAST(tp+tn AS DOUBLE) / CAST(tp+fp+fn+tn AS DOUBLE)) - " +
        "((CAST(tp+fp AS DOUBLE)*CAST(tp+fn AS DOUBLE) + " +
        "CAST(fn+tn AS DOUBLE)*CAST(fp+tn AS DOUBLE)) / " +
        "(CAST(tp+fp+fn+tn AS DOUBLE)*CAST(tp+fp+fn+tn AS DOUBLE)))) / " +
        "(1.0 - ((CAST(tp+fp AS DOUBLE)*CAST(tp+fn AS DOUBLE) + " +
        "CAST(fn+tn AS DOUBLE)*CAST(fp+tn AS DOUBLE)) / " +
        "(CAST(tp+fp+fn+tn AS DOUBLE)*CAST(tp+fp+fn+tn AS DOUBLE)))), 6)" +
        " AS kappa_r",
      "round((CAST(tp AS DOUBLE)*CAST(tn AS DOUBLE) - " +
        "CAST(fp AS DOUBLE)*CAST(fn AS DOUBLE)) / " +
        "sqrt((CAST(tp+fp AS DOUBLE)*CAST(tp+fn AS DOUBLE))*" +
        "(CAST(tn+fp AS DOUBLE)*CAST(tn+fn AS DOUBLE))), 6) AS mcc_r").head()
    assert(out.getDouble(4) == 0.4)
    assert(out.getDouble(5) == math.rint(1e6 * 1000.0 / math.sqrt(6e6)) / 1e6)
  }

  test("rank-sum AUC equals the brute-force pairwise count (q174)") {
    val r = Eval.q174_auc_exact(spark, sf).head()
    val (nPos, nNeg, num2, den2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(den2 == 2 * nPos * nNeg)
    assert(num2 >= 0 && num2 <= den2, "AUC in [0,1]")
    // brute force over all pos x neg pairs on the tiny fixture:
    // 2*[#(pos>neg) + 0.5*#(pos==neg)] must equal auc_num2
    val scored = CorpusFilters.q87_quality_classifier(spark, sf)
      .select("doc_id", "logit_r")
      .join(CorpusFilters.qualityLabels(spark, sf)
        .select("doc_id", "label"), "doc_id")
      .select("logit_r", "label")
      .collect().map(x => (x.getDouble(0), x.getBoolean(1)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    assert(pos.length.toLong == nPos && neg.length.toLong == nNeg)
    val brute2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(brute2 == num2, s"pairwise 2xAUC numerator: $brute2 != $num2")
  }

  test("chi2 terms are non-negative, df-bounded, and <= 20 (q175)") {
    val rows = Eval.q175_chi2_terms(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("chi2_r")) >= 0.0)
      assert(r.getLong(r.fieldIndex("a")) + r.getLong(r.fieldIndex("b")) >= 5)
    }
  }

  test("language slices sum back to the q173 totals (q176)") {
    val langs = Eval.q176_lang_quality(spark, sf).collect()
    val cm = Eval.q173_classifier_eval(spark, sf).head()
    val n = (0 to 3).map(cm.getLong).sum
    assert(langs.map(_.getLong(1)).sum == n)
    langs.foreach { r =>
      val acc = r.getLong(r.fieldIndex("acc_permille"))
      assert(acc >= 0 && acc <= 1000)
    }
  }

  test("fused ranks are valid and the RRF sum is reproducible (q183)") {
    val rows = Eval.q183_quality_fusion(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val n = CorpusFilters.qualityLabels(spark, sf).count()
    rows.foreach { r =>
      val Seq(r1, r2, r3) = (1 to 3).map(r.getLong)
      assert(r1 >= 1 && r1 <= n && r2 >= 1 && r2 <= n && r3 >= 1 && r3 <= n)
      assert(r.getLong(4) ==
        1000000L / (60 + r1) + 1000000L / (60 + r2) + 1000000L / (60 + r3))
    }
  }

  test("distributed descRank is bit-identical to the global window") {
    // the q183 ranking claim: two-phase bucketed rank == ROW_NUMBER
    import org.apache.spark.sql.expressions.Window
    val pred = CorpusFilters.q87_quality_classifier(spark, sf)
      .selectExpr("doc_id",
        "CAST(round(logit_r * 1000000.0) AS BIGINT) AS logit_u")
    val w = Window.orderBy(col("logit_u").desc, col("doc_id"))
    val global = pred
      .withColumn("rk_g", row_number().over(w).cast("long"))
      .select("doc_id", "rk_g")
    val fused = Eval.q183_quality_fusion(spark, sf)
      .select(col("doc_id"), col("r_logit"))
    val mism = fused.join(global, "doc_id")
      .filter(col("r_logit") =!= col("rk_g")).count()
    assert(mism == 0L)
  }

  test("Heaps prefixes nest and the forecast extrapolates upward (q184)") {
    val rows = Eval.q184_heaps_forecast(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val nt = rows.map(_.getLong(2))
    val vb = rows.map(_.getLong(3))
    assert(nt.zip(nt.tail).forall(p => p._1 < p._2), "token counts grow")
    assert(vb.zip(vb.tail).forall(p => p._1 <= p._2), "vocab monotone")
    // the synthetic corpus has a CLOSED ~31-token vocabulary: it
    // saturates by the 1/8 prefix, so beta = 0 (a flat forecast) is the
    // correct fit here — open-vocabulary corpora give beta in ~(0.4, 0.8)
    val beta = rows.head.getLong(6)
    assert(beta >= 0 && beta <= 1000, s"Heaps beta in [0,1]: $beta")
    val lnv8 = rows.last.getLong(5)
    assert(rows.head.getLong(7) >= lnv8, "100x forecast >= observed")
  }

  test("threshold advisor picks the exact order statistic (q185)") {
    val r = Eval.q185_threshold_advisor(spark, sf).head()
    val (n, k, thr, kept) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getBoolean(5), "target keep-rate met")
    assert(kept >= k && 1000 * kept >= 600 * n)
    // brute force: threshold must be the k-th largest logit
    val logits = CorpusFilters.q87_quality_classifier(spark, sf)
      .selectExpr("CAST(round(logit_r * 1000000.0) AS BIGINT) AS u")
      .collect().map(_.getLong(0)).sorted(Ordering[Long].reverse)
    assert(thr == logits(k.toInt - 1), "k-th largest logit")
    assert(kept == logits.count(_ >= thr))
    // apply side reconciles with the advisor
    val applied = Eval.q185b_threshold_apply(spark, sf).collect()
    assert(applied.map(_.getLong(2)).sum == kept)
    assert(applied.map(_.getLong(1)).sum == n)
  }

  test("signal correlations replay in driver-side exact moments (q187)") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("n_chars", "text").collect()
      .map { r =>
        val text = r.getString(1)
        val toks = text.trim.split(" ").count(_.nonEmpty).toLong
        val ent = EntropyKernel.charEntropyUnat(
          UTF8String.fromString(text)) / 1000L
        (r.getLong(0), toks, ent)
      }
    val n = docs.length.toLong
    def r(xa: Array[Long], xb: Array[Long]): Double = {
      val (sa, sb) = (xa.sum, xb.sum)
      val (saa, sbb) = (xa.map(x => x * x).sum, xb.map(x => x * x).sum)
      val sab = xa.zip(xb).map(p => p._1 * p._2).sum
      val num = (n * sab - sa * sb).toDouble
      math.rint(1e6 * num / (math.sqrt((n * saa - sa * sa).toDouble) *
        math.sqrt((n * sbb - sb * sb).toDouble))) / 1e6
    }
    val (x1, x2, x3) = (docs.map(_._1), docs.map(_._2), docs.map(_._3))
    val got = Eval.q187_signal_correlation(spark, sf).collect()
      .map(row => row.getString(0) -> row.getDouble(2)).toMap
    assert(got("chars_tokens") == r(x1, x2))
    assert(got("chars_entropy") == r(x1, x3))
    assert(got("tokens_entropy") == r(x2, x3))
    assert(got("chars_tokens") > 0.5, "length signals must correlate")
  }

  test("MAD outliers replay against a driver-side robust twin (q190)") {
    def medianQ(xs: Array[Long]): Double = {
      val s2 = xs.sorted
      if (s2.length % 2 == 1) s2(s2.length / 2).toDouble
      else (s2(s2.length / 2 - 1) + s2(s2.length / 2)) / 2.0
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (src, xs) => src -> xs.map(_._2) }
    val got = Eval.q190_mad_outliers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (src, xs) =>
      val med4 = math.round(medianQ(xs) * 4)
      val devQ = xs.map(x => math.abs(4 * x - med4))
      val madq2 = math.round(medianQ(devQ) * 2)
      val out = devQ.count(d => 2 * d > 3 * madq2).toLong
      val (n, m4, m2, o) = got(src)
      assert(n == xs.length.toLong && m4 == med4 && m2 == madq2 && o == out,
        s"$src: got ${got(src)} want (${xs.length}, $med4, $madq2, $out)")
    }
  }

  test("dataset card metrics cross-check against direct counts (q198)") {
    val card = Eval.q198_dataset_card(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(card("n_docs") == docs.count())
    assert(card("n_langs") == docs.select("lang").distinct().count())
    assert(card("n_sources") == docs.select("source").distinct().count())
    assert(card("total_chars") ==
      docs.agg(sum(col("n_chars"))).head().getLong(0))
    assert(card("n_empty") >= 0 && card("n_empty") <= card("n_docs"))
    assert(card("n_exact_dup_docs") != 1L,
      "a doc is either unique or in a >=2 group")
    assert(card("n_tokens") > 0 && card("med4_chars") > 0)
  }

  test("Heaps fit closed form on a planted 2-point curve") {
    // V ~ n^(2/3): n 1000->8000, V 100->400 (ln4/ln8 = 2/3)
    import spark.implicits._
    val df = Seq((6907755L, 4605170L, 8987197L, 5991465L))
      .toDF("lnn1", "lnv1", "lnn8", "lnv8")
    val r = df.selectExpr(
      "(1000 * (lnv8 - lnv1)) div (lnn8 - lnn1) AS beta",
      "lnv8 + ((lnv8 - lnv1) * 4605170) div (lnn8 - lnn1) AS pred").head()
    assert(r.getLong(0) == 666L)
    // 100x tokens at beta=2/3 -> ln V grows by (2/3)*ln(100)
    assert(math.abs(r.getLong(1) - (5991465L + 2L * 4605170L / 3L)) <= 2L)
  }

  test("calibration bins partition docs and bound positives (q177)") {
    val bins = Eval.q177_calibration_bins(spark, sf).collect()
    val cm = Eval.q173_classifier_eval(spark, sf).head()
    val n = (0 to 3).map(cm.getLong).sum
    assert(bins.map(_.getLong(1)).sum == n)
    bins.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_pos <= n per bin")
      // bin b holds logits in [0.02*b, 0.02*(b+1)): mean must sit inside
      val b = r.getLong(0)
      val meanU = r.getLong(3).toDouble / r.getLong(1)
      assert(meanU >= 20000.0 * b - 1 && meanU <= 20000.0 * (b + 1) + 1)
    }
  }

  test("q210 trimmed/winsorized: brute-force sorted-trim agrees exactly") {
    val out = Eval.q210_trimmed_stats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.keySet == docs.map(_._1).toSet)
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val vs = rows.map(_._2).sorted
      val n = vs.length
      val k = n / 20
      val trimmed = vs.slice(k, n - k)
      val lo = vs(k) // the (k+1)-th order statistic
      val hi = vs(n - k - 1)
      val (oN, oK, oLo, oHi, tMean, wMean) = out(src)
      assert(oN == n.toLong && oK == k.toLong, s"$src sizes")
      assert(oLo == lo && oHi == hi, s"$src clamps")
      assert(tMean == 1000L * trimmed.sum / trimmed.length, s"$src trimmed")
      assert(wMean ==
        1000L * (trimmed.sum + k * lo + k * hi) / n, s"$src winsorized")
    }
  }

  test("q236 langid eval: confusion cells replay off the marker argmax; " +
    "the unprofiled language can never be correct") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextOps.q236_langid_eval(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val markers = TextOps.LangMarkers.toMap
    def predict(text: String): String = {
      val toks = text.trim.split(" ").filter(_.nonEmpty).distinct.toSet
      markers.toSeq.map { case (l, ws) => (l, ws.count(toks)) }
        .sortBy { case (l, h) => (-h, l) }.head._1
    }
    val cells = docs.groupBy(d => (d._3, predict(d._2)))
      .map { case (k, v) => k -> v.length.toLong }
    assert(rows.keySet == cells.keySet)
    val byLang = cells.groupBy(_._1._1).map { case (l, m) =>
      l -> m.values.sum
    }
    val correct = cells.collect { case ((l, g), n) if l == g => n }.sum
    val total = cells.values.sum
    for (((lang, guess), (n, cellP, overall)) <- rows) {
      assert(n == cells((lang, guess)), s"($lang,$guess) cell")
      assert(cellP == 1000L * n / byLang(lang))
      assert(overall == 1000L * correct / total)
    }
    // zh has no marker profile — its diagonal cell cannot exist
    assert(!rows.contains(("zh", "zh")),
      "an unprofiled language must never be predicted")
  }

  test("q245 token MI: 2x2 plogp replay; nonnegative up to " +
    "quantization; float agreement") {
    val rows = Eval.q245_token_mi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.length <= 20)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._2.nonEmpty)
    val fillers = CorpusFilters.FillerTokens.toSet
    val lab = docs.map { case (id, t) =>
      id -> (100L * t.count(fillers) >= 13L * t.size)
    }.toMap
    val nP = lab.values.count(identity).toLong
    val nN = lab.size.toLong - nP
    val nn = nP + nN
    def lmx(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    for ((term, df, a, stat, miMicro) <- rows) {
      val withT = docs.filter(_._2.contains(term)).map(_._1)
      assert(df == withT.size.toLong, s"df of $term")
      val aa = withT.count(lab).toLong
      assert(a == aa, s"n_pos_with of $term")
      val b = df - aa
      def cell(c: Long, r: Long, cs: Long): Long =
        if (c > 0) c * (lmx(c * nn) - lmx(r * cs)) else 0L
      val exp = cell(aa, df, nP) + cell(b, df, nN) +
        cell(nP - aa, nn - df, nP) + cell(nN - b, nn - df, nN)
      assert(stat == exp, s"stat of $term")
      assert(miMicro == stat / nn, s"mi_micro of $term")
      // MI >= 0 in exact math; integer quantization can dip by at most
      // ~2 micro-nats per cell boundary
      assert(stat >= -8L * nn, s"stat of $term below quantization floor")
      // float MI agreement
      val floatMi = Seq((aa, df, nP), (b, df, nN),
        (nP - aa, nn - df, nP), (nN - b, nn - df, nN)).map {
        case (c, r, cs) =>
          if (c == 0) 0.0
          else (c.toDouble / nn) *
            math.log(c.toDouble * nn / (r.toDouble * cs))
      }.sum
      assert(math.abs(stat.toDouble / nn / 1e6 - floatMi) < 1e-4,
        s"float agreement of $term")
    }
    // descending by stat, term tiebreak
    rows.sliding(2).foreach {
      case Array(x, y) =>
        assert(x._4 > y._4 || (x._4 == y._4 && x._1 < y._1))
      case _ => ()
    }
  }

  test("q257 McNemar: cells partition; statistic replays; float-chi2 " +
    "agreement on the continuity-corrected form") {
    val r = Eval.q257_mcnemar(spark, sf).collect().head
    val (n, bc, bw, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(bc + bw + b + c == n, "cells partition the joined docs")
    assert(r.getLong(5) == 1000L * (bc + b) / n)
    assert(r.getLong(6) == 1000L * (bc + c) / n)
    val sig = r.getBoolean(7)
    assert(sig == (b + c > 0 &&
      10000L * (math.abs(b - c) - 1) * (math.abs(b - c) - 1) >
        38416L * (b + c)), "integer form")
    if (b + c > 0) {
      val chi2 = math.pow(math.abs(b - c) - 1.0, 2) / (b + c).toDouble
      assert(sig == (chi2 > 3.8416), "float equivalence")
    }
  }

  test("q284 stump: winner replays against a brute train sweep; " +
    "holdout beats majority; split is the q217 hash") {
    val sf = "/root/testdata/sf0.001"
    val r = Eval.q284_decision_stump(spark, sf).collect().head
    val (feat, thr, dir, nTr, nTe, trAcc, teAcc, majTe) =
      (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1).trim.split(" ")
        .filter(_.nonEmpty).toSeq))
      .filter(_._2.nonEmpty)
    val fill = Set("the", "a", "value", "data")
    val rows = docs.map { case (id, t) =>
      val n = t.length.toLong
      val feats = Map(
        "the_pm" -> 1000L * t.count(_ == "the") / n,
        "data_pm" -> 1000L * t.count(_ == "data") / n,
        "dtr_pm" -> 1000L * t.distinct.length / n)
      val label = 100L * t.count(fill) >= 13L * n
      val h = graft.rel.SplitMix64Kernel.mix(id)
      val train = ((h % 5) + 5) % 5 != 0
      (feats, label, train)
    }
    val tr = rows.filter(_._3)
    val te = rows.filterNot(_._3)
    assert(nTr == tr.length.toLong && nTe == te.length.toLong)
    // brute sweep over every (feature, threshold, direction)
    var best: (Long, String, String, Long) = (-1L, "", "", 0L)
    for (f <- Seq("data_pm", "dtr_pm", "the_pm").sorted;
         t <- tr.map(_._1(f)).distinct.sorted;
         d <- Seq("gt", "le")) {
      val corr = tr.count { case (fe, lb, _) =>
        (if (d == "le") fe(f) <= t else fe(f) > t) == lb
      }.toLong
      // total order: correct desc, fname asc, dir asc, thr asc
      val cand = (corr, f, d, t)
      val better = corr > best._1 ||
        (corr == best._1 && (f < best._2 ||
          (f == best._2 && (d < best._3 ||
            (d == best._3 && t < best._4)))))
      if (better) best = cand
    }
    assert(feat == best._2 && thr == best._4 && dir == best._3,
      s"winner $best")
    assert(trAcc == 1000L * best._1 / nTr)
    val teCorr = te.count { case (fe, lb, _) =>
      (if (dir == "le") fe(feat) <= thr else fe(feat) > thr) == lb
    }.toLong
    assert(teAcc == 1000L * teCorr / nTe)
    val posTe = te.count(_._2).toLong
    assert(majTe == 1000L * math.max(posTe, nTe - posTe) / nTe)
    // the learnability contract: the stump generalizes above majority
    assert(teAcc > majTe, s"stump $teAcc must beat majority $majTe")
  }

  test("q283 Cronbach: alpha replays from the gated fusion dump's rank " +
    "space; covariance identity holds in float") {
    val sf = "/root/testdata/sf0.001"
    val r = Eval.q283_cronbach_alpha(spark, sf).collect().head
    val (n, k, v1, v2, v3, vt, alpha) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getLong(6))
    assert(k == 3L)
    // item variances are variances of rank PERMUTATIONS 1..n — all
    // three must equal the exact permutation variance n(n+1)/12
    val permVar = (BigInt(n) * n * (n + 1) * (n + 1) / 4 -
      BigInt(n) * (n + 1) / 2 * (BigInt(n) * (n + 1) / 2)) /
      (BigInt(n) * (n - 1))
    // n·Σi² − (Σi)² with Σi² = n(n+1)(2n+1)/6
    val s1 = BigInt(n) * (n + 1) / 2
    val q1 = BigInt(n) * (n + 1) * (2 * n + 1) / 6
    val vExp = ((BigInt(n) * q1 - s1 * s1) / (BigInt(n) * (n - 1))).toLong
    assert(v1 == vExp && v2 == vExp && v3 == vExp,
      s"rank-permutation variance $vExp")
    val _ = permVar
    // alpha from the float covariance identity: alpha = 3/2·(1−ΣVi/Vt)
    val alphaF = 1.5 * (1.0 - (v1 + v2 + v3).toDouble / vt)
    assert(math.abs(alpha / 1000.0 - alphaF) < 0.005, s"float alpha $alphaF")
    assert(alpha <= 1500L, "alpha bounded above by k/(k-1)")
  }

  test("q280 OOV audit: top-K vocabulary and coverage ratios replay; " +
    "type OOV dominates token OOV") {
    val sf = "/root/testdata/sf0.001"
    val rows = Eval.q280_oov_audit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.nonEmpty)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val global = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val vocab = global.toSeq.sortBy { case (t, g) => (-g, t) }
      .take(1000).map(_._1).toSet
    for ((src, nTok, nTypes, oovTok, oovType) <- rows) {
      val mine = toks.filter(_._1 == src).map(_._2)
      val counts = mine.groupBy(identity).view.mapValues(_.length.toLong)
        .toMap
      assert(nTok == mine.length.toLong && nTypes == counts.size.toLong)
      val covTok = counts.filter(c => vocab(c._1)).values.sum
      val covTypes = counts.keys.count(vocab).toLong
      assert(oovTok == 1000L - 1000L * covTok / nTok, s"$src token OOV")
      assert(oovType == 1000L - 1000L * covTypes / nTypes, s"$src type")
      // frequent terms cover more tokens than types: type OOV >= token
      assert(oovType >= oovTok, s"$src Zipf direction")
    }
  }

  test("q275 Chao1: singleton/doubleton profile replays; lower-bound " +
    "and coverage invariants hold") {
    val sf = "/root/testdata/sf0.001"
    val rows = Eval.q275_chao1(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(rows.nonEmpty)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val byLang = toks.groupBy(_._1)
    for ((lang, nTok, d, f1, f2, chao, cov) <- rows) {
      val counts = byLang(lang).map(_._2).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      assert(nTok == byLang(lang).length.toLong)
      assert(d == counts.size.toLong)
      assert(f1 == counts.values.count(_ == 1L).toLong)
      assert(f2 == counts.values.count(_ == 2L).toLong)
      val expChao = 1000L * d + (if (f2 > 0) 1000L * f1 * f1 / (2 * f2)
        else 1000L * f1 * (f1 - 1) / 2)
      assert(chao == expChao, s"$lang chao1")
      assert(cov == 1000L - 1000L * f1 / nTok, s"$lang coverage")
      // Chao1 is a lower-bound estimate of richness >= observed types
      assert(chao >= 1000L * d, s"$lang lower bound")
      assert(cov >= 0L && cov <= 1000L)
    }
  }

  test("q270 Brier: score and Murphy terms replay; binned identity " +
    "brier_binned = rel - res + unc holds in float") {
    val sf = "/root/testdata/sf0.001"
    val r = Eval.q270_brier(spark, sf).collect().head
    val (n, pos, nBins, brier, rel, res, unc) = (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))
    val pl = CorpusFilters.q87_quality_classifier(spark, sf)
      .select(col("doc_id"), col("logit_r"))
      .join(CorpusFilters.qualityLabels(spark, sf)
        .select(col("doc_id"), col("label")), "doc_id")
      .selectExpr("CAST(round(logit_r * 1000000.0) AS BIGINT) AS p",
        "CASE WHEN label THEN 1L ELSE 0L END AS y")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(n == pl.length.toLong && pos == pl.map(_._2).sum)
    val sq = pl.map { case (p, y) =>
      BigInt(p - 1000000 * y) * (p - 1000000 * y)
    }.sum
    assert(BigInt(brier) == sq / n, "raw Brier")
    val bins = pl.groupBy(_._1 / 20000)
    assert(nBins == bins.size.toLong)
    var relNum = BigInt(0); var resNum = BigInt(0)
    for ((_, g) <- bins) {
      val nB = g.length.toLong
      val posB = g.map(_._2).sum
      val aB = g.map(_._1).sum
      relNum += BigInt(aB - 1000000 * posB) * (aB - 1000000 * posB) / nB
      val d = BigInt(1000000) * (posB * n - pos * nB)
      resNum += d * d / (BigInt(nB) * n * n)
    }
    assert(BigInt(rel) == relNum / n, "reliability")
    assert(BigInt(res) == resNum / n, "resolution")
    assert(BigInt(unc) ==
      BigInt("1000000000000") * pos * (n - pos) / (BigInt(n) * n))
    // Murphy identity at bin granularity (forecast = bin mean):
    // brier_binned = REL - RES + UNC exactly in the rationals
    val brierBinned = bins.values.map { g =>
      val nB = g.length
      val pBar = g.map(_._1).sum.toDouble / nB
      g.map { case (_, y) => (pBar - 1e6 * y) * (pBar - 1e6 * y) }.sum
    }.sum / n
    val idLhs = brierBinned / 1e12
    val idRhs = (rel - res + unc) / 1e12
    assert(math.abs(idLhs - idRhs) < 1e-4, s"Murphy identity $idLhs $idRhs")
  }

  test("q266 Cramér's V: full-grid chi-square replays brutally; float " +
    "agreement; V² bounds") {
    val sf = "/root/testdata/sf0.001"
    val r = Eval.q266_cramers_v(spark, sf).collect().head
    val (nDocs, nS, nL, dof, chi2M, v2M, sig) = (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getBoolean(6))
    val cells = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("lang")).collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = cells.length.toLong
    assert(nDocs == n)
    val rm = cells.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = cells.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(nS == rm.size.toLong && nL == cm.size.toLong)
    assert(dof == (nS - 1) * (nL - 1))
    val oCnt = cells.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    var chi2Exp = 0L
    var chi2F = 0.0
    for (src <- rm.keys; lg <- cm.keys) {
      val o = oCnt.getOrElse((src, lg), 0L)
      val det = BigInt(o * n) - BigInt(rm(src)) * cm(lg)
      chi2Exp += (BigInt(1000000) * det * det /
        (BigInt(n) * rm(src) * cm(lg))).toLong
      val e = rm(src).toDouble * cm(lg) / n
      chi2F += (o - e) * (o - e) / e
    }
    assert(chi2M == chi2Exp, "chi2 replay")
    assert(math.abs(chi2M / 1e6 - chi2F) < 0.01 * (nS * nL),
      "float chi2 agreement up to per-cell quantization")
    assert(v2M == chi2Exp / (n * (math.min(nS, nL) - 1)), "V2")
    // V² ∈ [0, 1] up to quantization
    assert(v2M >= 0L && v2M <= 1000001L)
    assert(sig == (chi2M > 97350970L))
  }
}
