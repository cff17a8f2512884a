package graft.rel

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** Funnel/cohort kernels (q133/q134) on adversarial orderings the big
  * corpus may not exercise. */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val D = 86400L * 1000000L // one day in micros
  private val sf = "/root/testdata/sf0.001"

  private def funnel(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    Behavior.funnelFrame(rows.toDF("user_id", "ts_us", "event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
  }

  test("funnel: click BEFORE the first view never counts") {
    val rows = Seq(
      (1L, 100L, "click"), (1L, 200L, "view"), // click precedes view
      (2L, 100L, "view"), (2L, 200L, "click")) // proper order
    val got = funnel(rows)
    assert(got.length == 1)
    val (_, entered, clicked, converted, _) = got.head
    assert(entered == 2 && clicked == 1 && converted == 0)
  }

  test("funnel: purchase before the qualifying click never counts") {
    val rows = Seq(
      (1L, 100L, "view"), (1L, 150L, "purchase"), (1L, 200L, "click"))
    val got = funnel(rows)
    val (_, entered, clicked, converted, _) = got.head
    assert(entered == 1 && clicked == 1 && converted == 0)
  }

  test("funnel: conversion window excludes late steps") {
    val rows = Seq(
      // converts at the window edge: click day 3, purchase exactly day 7
      (1L, 0L, "view"), (1L, 3 * D, "click"), (1L, 7 * D, "purchase"),
      // click inside, purchase one micro past the 7-day window
      (2L, 0L, "view"), (2L, 3 * D, "click"), (2L, 7 * D + 1, "purchase"),
      // click itself out of window
      (3L, 0L, "view"), (3L, 7 * D + 1, "click"), (3L, 7 * D + 2, "purchase"))
    val got = funnel(rows)
    val (_, entered, clicked, converted, sumConv) = got.head
    assert(entered == 3 && clicked == 2 && converted == 1)
    assert(sumConv == 7 * D)
  }

  test("funnel: simultaneous timestamps satisfy the >= ordering") {
    val rows = Seq((1L, 500L, "view"), (1L, 500L, "click"),
      (1L, 500L, "purchase"))
    val got = funnel(rows)
    val (_, entered, clicked, converted, sumConv) = got.head
    assert(entered == 1 && clicked == 1 && converted == 1 && sumConv == 0)
  }

  test("retention: offsets count distinct users relative to first day") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L), (1L, 10L), (1L, 11L), (1L, 13L), // dupes collapse
      (2L, 11L), (2L, 12L),
      (3L, 10L), (3L, 30L)) // offset 20 > 13 drops
    val got = Behavior.retentionFrame(rows.toDF("user_id", "day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 0L, 2L), (10L, 1L, 1L), (10L, 3L, 1L),
      (11L, 0L, 1L), (11L, 1L, 1L)))
  }

  test("q193 transitions: row-stochastic permilles, mass conservation") {
    val rows = Behavior.q193_markov_transitions(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val events = graft.Tables.events(spark, sf).count()
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // every event except each user's first contributes one transition
    assert(total == events - users)
    rows.groupBy(_.getString(0)).foreach { case (src, g) =>
      val p = g.map(_.getLong(3)).sum
      // floor-division permilles sum to (1000 - residue), residue < fanout
      assert(p <= 1000 && p > 1000 - g.length, s"$src row sums $p")
    }
  }

  test("q194 RFM: segment counts partition the customer base, scores in 1..5") {
    val rows = Behavior.q194_rfm_segments(spark, sf).collect()
    val nCust = graft.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCust)
    rows.foreach { r =>
      (0 to 2).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 5))
    }
    // quintiles are balanced per dimension to within interpolation ties
    val byR = rows.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(3)).sum)
    assert(byR.keySet.size >= 4, "recency quintiles populated")
  }

  test("q195 paths: session totals conserved, path arity bounded") {
    val rows = Behavior.q195_session_paths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val steps = r.getString(0).split(">")
      assert(steps.length >= 1 && steps.length <= 5)
      assert(r.getLong(1) >= 1)
    }
  }

  test("q196 Gini: exact integer replay against a sorted driver twin") {
    val r = Behavior.q196_revenue_concentration(spark, sf).head()
    val cents = graft.Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(o_totalprice AS DECIMAL(18,2)) AS p")
      .groupBy("o_custkey")
      .agg(expr("CAST(SUM(p) * 100 AS BIGINT)").as("c"))
      .collect().map(_.getLong(1)).sorted
    val n = cents.length.toLong
    val total = cents.sum
    val num = cents.zipWithIndex.map { case (x, i0) =>
      x * (2L * (i0 + 1) - n - 1)
    }.sum
    assert(r.getLong(0) == n && r.getLong(1) == total)
    assert(r.getLong(2) == 1000L * num / (n * total), "exact Gini permille")
    // top decile: threshold is the k-th largest; share consistent
    val k = math.max(n / 10, 1L)
    val thr = cents.sorted(Ordering[Long].reverse)(k.toInt - 1)
    assert(r.getLong(3) == thr)
    val top = cents.filter(_ >= thr)
    assert(r.getLong(4) == top.length.toLong)
    assert(r.getLong(5) == 1000L * top.sum / total)
  }

  test("q209 traffic profile: mass conserved, epoch dow matches the " +
    "calendar, peak flag is exactly the max") {
    val sf = "/root/testdata/sf0.001"
    val rows = Behavior.q209_traffic_profile(spark, sf).collect()
    val total = rows.head.getLong(6)
    assert(rows.map(_.getLong(2)).sum == total, "cell mass conserved")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 6))
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 23))
    val maxCell = rows.map(_.getLong(2)).max
    rows.foreach(r => assert(r.getBoolean(4) == (r.getLong(2) == maxCell)))
    val weekend = rows.filter(r => r.getLong(0) == 0 || r.getLong(0) == 6)
      .map(_.getLong(2)).sum
    rows.foreach(r => assert(r.getLong(5) == 1000L * weekend / total))
    // epoch arithmetic vs java.time on the raw events (UTC)
    val sample = graft.Tables.events(spark, sf).select("ts_us")
      .limit(200).collect().map(_.getLong(0))
    sample.foreach { us =>
      val ins = java.time.Instant.ofEpochSecond(us / 1000000L)
      val utc = ins.atZone(java.time.ZoneOffset.UTC)
      val dowCal = utc.getDayOfWeek.getValue % 7 // ISO Mon=1..Sun=7 → Sun=0
      val dowQ = (us / 86400000000L + 4) % 7
      assert(dowQ == dowCal, s"dow mismatch at $us")
      assert((us % 86400000000L) / 3600000000L == utc.getHour.toLong)
    }
  }

  test("q214 CUSUM: brute-force sweep over the filled day grid agrees") {
    val sf = "/root/testdata/sf0.001"
    val row = Behavior.q214_cusum_changepoint(spark, sf).collect().head
    val (nDays, nEvents, dayAtMax, dNum, permille, leftR, rightR) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6))
    val days = graft.Tables.events(spark, sf).select("ts_us").collect()
      .map(_.getLong(0) / 86400000000L)
    val byDay = days.groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val (d0, d1) = (days.min, days.max)
    val grid = (d0 to d1).map(d => d -> byDay.getOrElse(d, 0L))
    assert(nDays == grid.length.toLong && nEvents == days.length.toLong)
    var s = 0L; var best = -1L; var bestDay = Long.MaxValue
    var iAt = 0L; var sAt = 0L
    for (((d, c), idx) <- grid.zipWithIndex; i = idx + 1L) {
      s += c
      if (i < nDays) {
        val stat = math.abs(nDays * s - i * nEvents)
        if (stat > best) { best = stat; bestDay = d; iAt = i; sAt = s }
      }
    }
    assert(dNum == best, "CUSUM numerator")
    assert(dayAtMax == bestDay, "argmax day (min day on ties)")
    assert(permille == (1000L * best) / (nDays * nEvents))
    assert(leftR == (1000L * sAt) / iAt)
    assert(rightR == (1000L * (nEvents - sAt)) / (nDays - iAt))
    assert(permille >= 0 && permille <= 1000)
  }

  test("q215 attribution: per-purchase mass conserves exactly; " +
    "remainder lands on the last touch") {
    val sf = "/root/testdata/sf0.001"
    val out = Behavior.q215_revenue_attribution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val purchases = ev.filter(_._3 == "purchase")
    val touches = ev.filter(_._3 != "purchase")
    val look = 7L * 86400000000L
    var expCents = Map.empty[String, Long].withDefaultValue(0L)
    var expTouches = Map.empty[String, Long].withDefaultValue(0L)
    var expConv = Map.empty[String, Set[Long]].withDefaultValue(Set.empty)
    var convertedCents = 0L
    for ((pid, uid, _, pts, v) <- purchases) {
      val cents = math.round(v * 100)
      val ts = touches.filter(t => t._2 == uid && t._4 < pts &&
        t._4 >= pts - look)
      if (ts.nonEmpty) {
        convertedCents += cents
        val k = ts.length.toLong
        val last = ts.maxBy(t => (t._4, t._1))
        for (t <- ts) {
          val credit = cents / k +
            (if (t._1 == last._1) cents - k * (cents / k) else 0L)
          expCents += t._3 -> (expCents(t._3) + credit)
          expTouches += t._3 -> (expTouches(t._3) + 1L)
          expConv += t._3 -> (expConv(t._3) + pid)
        }
      }
    }
    assert(out.keySet == expCents.keySet)
    for ((tt, cents) <- expCents) {
      val (nT, nC, c) = out(tt)
      assert(c == cents, s"$tt attributed cents")
      assert(nT == expTouches(tt), s"$tt touch count")
      assert(nC == expConv(tt).size.toLong, s"$tt conversions")
    }
    // the global invariant the operator exists for: attribution is a
    // PARTITION of converted revenue — nothing created, nothing lost
    assert(out.values.map(_._3).sum == convertedCents,
      "attributed cents must sum exactly to converted cents")
  }

  test("q220 seasonal decomposition: additive identity exact, trend " +
    "windows replay, seasonal is a pure dow function") {
    val sf = "/root/testdata/sf0.001"
    val rows = Behavior.q220_seasonal_decompose(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val days = graft.Tables.events(spark, sf).select("ts_us").collect()
      .map(_.getLong(0) / 86400000000L)
    val byDay = days.groupBy(identity)
      .map { case (d, v) => d -> v.length.toLong }
    val (d0, d1) = (days.min, days.max)
    val grid = (d0 to d1).map(d => d -> byDay.getOrElse(d, 0L))
    assert(rows.length == grid.length - 6, "interior excludes 3+3 edges")
    assert(rows.forall(_._7 == grid.length.toLong))
    val cOf = grid.toMap
    for ((day, dow, c, trend7, seasonal7, rem7, _) <- rows) {
      assert(dow == (day + 4) % 7)
      assert(c == cOf(day))
      assert(trend7 == (-3L to 3L).map(k => cOf(day + k)).sum,
        s"day $day trend window")
      assert(7 * c == trend7 + seasonal7 + rem7,
        s"day $day additive identity")
    }
    // seasonal7 is a function of dow alone, and equals the floor-mean
    // of the detrended series over that dow
    for ((dow, g) <- rows.groupBy(_._2)) {
      assert(g.map(_._5).distinct.length == 1, s"dow $dow seasonal varies")
      val det = g.map(r => 7 * r._3 - r._4)
      val floorMean = {
        val off = 1000000000000L
        (det.sum + off * det.length) / det.length - off
      }
      assert(g.head._5 == floorMean, s"dow $dow seasonal mean")
    }
  }

  test("q231 Kaplan-Meier: gaps + censored tails replay brutally; " +
    "survival is monotone and both branches fire") {
    val sf = "/root/testdata/sf0.001"
    val rows = Behavior.q231_survival_curve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val p = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "ts_us div 3600000000L AS hr", "event_type")
      .where("event_type = 'purchase'")
      .select("user_id", "hr")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val h = p.map(_._2).max
    val obs = p.groupBy(_._1).toSeq.flatMap { case (_, v) =>
      val hrs = v.map(_._2).sorted
      hrs.sliding(2).filter(_.length == 2)
        .map(w => (w(1) - w(0), true)).toSeq :+ ((h - hrs.last, false))
    }
    val byDur = obs.groupBy(_._1).map { case (dur, v) =>
      dur -> (v.count(_._2).toLong, v.count(!_._2).toLong)
    }
    def lnM(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    val durs = byDur.keys.toSeq.sorted
    var atRisk = obs.length.toLong
    var logS = 0L
    val expected = durs.map { dur =>
      val (d, c) = byDur(dur)
      val term = if (d == 0) 0L
        else if (atRisk == d) -1000000000L
        else lnM(atRisk - d) - lnM(atRisk)
      logS = math.max(logS + term, -1000000000L)
      val row = (dur, atRisk, d, c, logS)
      atRisk -= d + c
      row
    }
    assert(rows.toSeq == expected,
      s"KM curve mismatch: got ${rows.take(3).toSeq}... " +
        s"want ${expected.take(3)}...")
    // survival never increases, and the data exercises BOTH branches
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5, "log-survival must be non-increasing")
    }
    assert(rows.exists(_._3 > 0) && rows.exists(_._4 > 0),
      "need both fired and censored observations for a meaningful gate")
  }

  test("q232 MASE: seasonal-naive errors and the train scale replay " +
    "off the filled day grid") {
    val sf = "/root/testdata/sf0.001"
    val row = Behavior.q232_forecast_eval(spark, sf).collect().head
    val (nTest, errSum, nTr, scaleSum, mase) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    val days = graft.Tables.events(spark, sf).select("ts_us").collect()
      .map(_.getLong(0) / 86400000000L)
    val byDay = days.groupBy(identity)
      .map { case (d, v) => d -> v.length.toLong }
    val (d0, d1) = (days.min, days.max)
    def c(d: Long): Long = byDay.getOrElse(d, 0L)
    val cut = d0 + 21
    val test = (math.max(cut, d0 + 7) to d1)
      .map(d => math.abs(c(d) - c(d - 7)))
    val train = (d0 + 1 until cut).map(d => math.abs(c(d) - c(d - 1)))
    assert(nTest == test.length.toLong && errSum == test.sum)
    assert(nTr == train.length.toLong && scaleSum == train.sum)
    assert(mase ==
      1000L * errSum * nTr / math.max(scaleSum * nTest, 1L))
  }

  test("q233 Markov holdout: model, predictions and accuracies replay; " +
    "argmax ties break lexicographically") {
    val sf = "/root/testdata/sf0.001"
    val rows = Behavior.q233_markov_holdout(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    def pairsOf(pred: Long => Boolean): Seq[(String, String)] =
      ev.filter(e => pred(e._2)).groupBy(_._1).toSeq.flatMap { case (_, v) =>
        val sorted = v.sortBy(e => (e._2, e._3))
        sorted.sliding(2).filter(_.length == 2)
          .map(w => (w(0)._4, w(1)._4)).toSeq
      }
    val trp = pairsOf(_ <= mid)
    val tep = pairsOf(_ > mid)
    val model = trp.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val pred = model.groupBy(_._1._1).map { case (src, m) =>
      src -> m.toSeq.map { case ((_, dst), n) => (dst, n) }
        .sortBy { case (dst, n) => (-n, dst) }.head._1
    }
    val maj = trp.map(_._2).groupBy(identity).toSeq
      .map { case (d, v) => (d, v.size) }
      .sortBy { case (d, n) => (-n, d) }.head._1
    for ((src, byPred) <- tep.groupBy(_._1) if pred.contains(src)) {
      val (gPred, gN, gCorrect, gAcc, gMaj) = rows(src)
      assert(gPred == pred(src), s"$src argmax prediction")
      assert(gN == byPred.length.toLong)
      val correct = byPred.count(_._2 == pred(src)).toLong
      assert(gCorrect == correct)
      assert(gAcc == 1000L * correct / byPred.length)
      assert(gMaj == 1000L * byPred.count(_._2 == maj) / byPred.length)
    }
    assert(rows.keySet == tep.map(_._1).toSet.intersect(pred.keySet))
  }

  test("q234 p-chart: the squared 3-sigma test replays and agrees with " +
    "the float form") {
    val sf = "/root/testdata/sf0.001"
    val rows = Behavior.q234_control_chart(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getString(6)))
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day",
        "event_type = 'purchase' AS hit").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val byDay = ev.groupBy(_._1).map { case (d, v) =>
      d -> (v.length.toLong, v.count(_._2).toLong)
    }
    val nn = ev.length.toLong
    val cc = ev.count(_._2).toLong
    assert(rows.map(_._1).toSet == byDay.keySet)
    for ((day, n, c, rate, center, ooc, side) <- rows) {
      val (bn, bc) = byDay(day)
      assert(n == bn && c == bc, s"day $day counts")
      assert(rate == 1000L * c / n && center == 1000L * cc / nn)
      val dev = c * nn - n * cc
      val expOoc = dev * dev > 9L * cc * (nn - cc) * n
      assert(ooc == expOoc, s"day $day control flag")
      assert(side == (if (expOoc && dev > 0) "high"
        else if (expOoc) "low" else "in"))
      // algebra cross-check: the integer form equals the float 3-sigma
      val pBar = cc.toDouble / nn
      val pHat = c.toDouble / n
      val floatOoc =
        math.abs(pHat - pBar) > 3.0 * math.sqrt(pBar * (1 - pBar) / n)
      assert(expOoc == floatOoc, s"day $day squared-form equivalence")
    }
  }

  test("q240 ACF: brute replay over the filled grid; band and float " +
    "agreement") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q240_acf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(rows.length == 14)
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (d0, d1) = (days.min, days.max)
    val xs = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
    val n = xs.length.toLong
    val sTot = xs.sum
    val ys = xs.map(x => n * x - sTot)
    val den = ys.map(y => BigInt(y) * BigInt(y)).sum
    for ((lag, nDays, nOv, rMilli, sig) <- rows) {
      assert(nDays == n)
      val k = lag.toInt
      val num = (k until xs.length)
        .map(t => BigInt(ys(t)) * BigInt(ys(t - k))).sum
      assert(nOv == n - k, s"overlap at lag $k")
      // both engines TRUNCATE integer division toward zero
      val expected = (BigInt(1000) * num / den.max(BigInt(1))).toLong
      assert(rMilli == expected, s"r_milli at lag $k")
      // the integer value tracks the float ACF within quantization
      val mean = sTot.toDouble / n
      val fNum = (k until xs.length)
        .map(t => (xs(t) - mean) * (xs(t - k) - mean)).sum
      val fDen = xs.map(x => (x - mean) * (x - mean)).sum
      assert(math.abs(rMilli / 1000.0 - fNum / fDen) < 0.002,
        s"float agreement at lag $k")
      assert(sig == (rMilli * rMilli * n > 4000000L), s"band at lag $k")
    }
  }

  test("q248 SPRT: the integer walk replays; decision is the first " +
    "boundary crossing; literals match Wald's bounds") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q248_sprt(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6), r.getString(7)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val hitM = math.round(1e6 * math.log(0.20 / 0.15))
    val missM = math.round(1e6 * math.log(0.80 / 0.85))
    val bound = math.round(1e6 * math.log(19.0))
    var cum = 0L
    var decided: Option[(Long, String)] = None
    for ((day, n, c, llrDay, cumGot, state, dday, dec) <- rows) {
      assert(llrDay == c * hitM + (n - c) * missM, s"day $day llr")
      cum += llrDay
      assert(cumGot == cum, s"day $day cum")
      val expState =
        if (cum >= bound) "accept_h1"
        else if (cum <= -bound) "accept_h0"
        else "continue"
      assert(state == expState, s"day $day state")
      if (decided.isEmpty && expState != "continue")
        decided = Some((day, expState))
      assert(dday == decided.map(_._1).getOrElse(-1L), s"day $day dday")
      assert(dec == decided.map(_._2).getOrElse("continue"))
    }
    // the measured 19.8% purchase rate sits above H1 = 20%'s indiff
    // zone midpoint, so this corpus must accept H1
    assert(decided.exists(_._2 == "accept_h1"), "corpus should accept H1")
  }

  test("q258 Theil-Sen: pairwise-slope median replays; robust vs LS " +
    "on the same grid") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q258_theil_sen(spark, sf).collect().head
    val (nPairs, sen, ls, mn, mx) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val xs = (days.min to days.max).map(d => byDay.getOrElse(d, 0L))
    val n = xs.length
    def tdiv(a: Long, b: Long): Long = a / b // truncation, both engines
    val slopes = (for {
      i <- 0 until n; j <- (i + 1) until n
    } yield tdiv(1000L * (xs(j) - xs(i)), (j - i).toLong)).sorted
    assert(nPairs == slopes.length.toLong)
    assert(sen == slopes(((slopes.length + 1) / 2) - 1), "lower median")
    assert(mn == slopes.head && mx == slopes.last)
    val si = (1L to n.toLong).sum
    val sy = xs.sum
    val siy = xs.zipWithIndex.map { case (y, i0) =>
      BigInt(i0 + 1) * y
    }.sum
    val si2 = (1L to n.toLong).map(i => BigInt(i) * i).sum
    val expLs = (BigInt(1000) * (BigInt(n) * siy - BigInt(si) * sy) /
      (BigInt(n) * si2 - BigInt(si) * si)).toLong
    assert(ls == expLs, "least-squares twin")
  }

  test("q288 ANOVA/ICC: sums-of-squares replay; float F and ICC " +
    "agreement; ICC bounds") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q288_anova_icc(spark, sf).collect().head
    val (n, ssb, ssw, fM, iccM, sig) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val grid = (days.min to days.max)
      .map(d => ((d + 4) % 7, byDay.getOrElse(d, 0L)))
    assert(n == grid.length.toLong)
    val k = 7L
    val ss = grid.map(_._2).sum
    val byG = grid.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var a = BigInt(0); var wSub = BigInt(0); var sn2 = 0L
    for ((_, xs) <- byG) {
      val nG = xs.length.toLong
      val sG = xs.sum
      val d = BigInt(sG) * n - BigInt(ss) * nG
      a += BigInt(1000000) * d * d / (BigInt(nG) * n * n)
      wSub += BigInt(1000000) * sG * sG / nG
      sn2 += nG * nG
    }
    val qq = grid.map(x => BigInt(x._2) * x._2).sum
    val w = BigInt(1000000) * qq - wSub
    assert(BigInt(ssb) == a && BigInt(ssw) == w, "SS replay")
    assert(fM == (BigInt(1000000) * (n - k) * a /
      (BigInt(k - 1) * w).max(BigInt(1))).toLong, "F replay")
    val iccNum = BigInt(1000) * n * (k - 1) *
      (a * (n - k) - w * (k - 1))
    val iccDen = (BigInt(n) * (k - 1) * a * (n - k) +
      (BigInt(n) * n - sn2 - n * (k - 1)) * w * (k - 1)).max(BigInt(1))
    assert(iccM == (iccNum / iccDen).toLong, "ICC replay")
    assert(sig == (BigInt(1000000) * (n - k) * a >
      BigInt(2527655) * (k - 1) * w))
    // float agreement (Searle's unbalanced n0)
    val msb = a.toDouble / 1e6 / (k - 1)
    val msw = w.toDouble / 1e6 / (n - k)
    assert(math.abs(fM / 1e6 - msb / msw) < 0.01, "float F")
    val n0 = (n - sn2.toDouble / n) / (k - 1)
    val iccF = (msb - msw) / (msb + (n0 - 1) * msw)
    assert(math.abs(iccM / 1000.0 - iccF) < 0.005, s"float ICC $iccF")
    assert(iccM <= 1000L, "ICC bounded above by 1")
  }

  test("q287 Mantel-Haenszel: per-stratum quantized sums replay; " +
    "degenerate stratum contributes zero; float-CMH equivalence") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q287_mantel_haenszel(spark, sf).collect().head
    val (nS, nE, sumA, orM, dM, sig) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day",
        "event_type = 'purchase' AS y").collect()
      .map(x => (x.getLong(0), x.getBoolean(1)))
    val d0 = ev.map(_._1).min
    val cells = ev.groupBy(x => (x._1 - d0) / 7).map { case (wk, g) =>
      val a = g.count(x => ((x._1 + 4) % 7 == 0 || (x._1 + 4) % 7 == 6) && x._2).toLong
      val b = g.count(x => ((x._1 + 4) % 7 == 0 || (x._1 + 4) % 7 == 6) && !x._2).toLong
      val c = g.count(x => !((x._1 + 4) % 7 == 0 || (x._1 + 4) % 7 == 6) && x._2).toLong
      val d = g.count(x => !((x._1 + 4) % 7 == 0 || (x._1 + 4) % 7 == 6) && !x._2).toLong
      (wk, a, b, c, d)
    }.toSeq
    assert(nS == cells.length.toLong)
    assert(nE == cells.map(x => x._2 + x._3 + x._4 + x._5).sum)
    assert(sumA == cells.map(_._2).sum)
    var num = 0L; var den = 0L; var eM = 0L; var vM = BigInt(0)
    for ((_, a, b, c, d) <- cells) {
      val n = a + b + c + d
      num += (BigInt(1000000) * a * d / n).toLong
      den += (BigInt(1000000) * b * c / n).toLong
      eM += (BigInt(1000000) * (a + b) * (a + c) / n).toLong
      vM += BigInt("1000000000000") * (a + b) * (c + d) * (a + c) *
        (b + d) / (BigInt(n) * n * math.max(n - 1, 1))
    }
    assert(orM == 1000L * num / math.max(den, 1L), "MH odds ratio")
    assert(dM == 1000000L * sumA - eM, "CMH numerator")
    val lhs = BigInt(10000) * dM * dM
    assert(sig == (lhs > BigInt(38416) * vM), "squared CMH verdict")
    // degenerate stratum: the partial trailing week has no weekend —
    // its a = b = 0 and it contributes zero to num/den
    val degen = cells.filter(x => x._2 + x._3 == 0)
    assert(degen.nonEmpty, "partial week present")
    // float CMH equivalence
    val chi2 = (dM / 1e6) * (dM / 1e6) / (vM.toDouble / 1e12)
    assert(sig == (chi2 > 3.8416), s"float CMH $chi2")
  }

  test("q286 Jonckheere: doubled dominance statistic replays; float-z " +
    "equivalence on the untied variance") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q286_jonckheere(spark, sf).collect().head
    val (n, nW, j2, d, trend, sig) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getString(4), r.getBoolean(5))
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val d0 = days.min
    val grid = (days.min to days.max)
      .map(dd => ((dd - d0) / 7, byDay.getOrElse(dd, 0L)))
    assert(n == grid.length.toLong)
    assert(nW == grid.map(_._1).distinct.length.toLong)
    var j2Exp = 0L
    for ((wa, ca) <- grid; (wb, cb) <- grid if wa < wb)
      j2Exp += (if (ca < cb) 2L else if (ca == cb) 1L else 0L)
    assert(j2 == j2Exp, "doubled JT statistic")
    val sn2 = grid.groupBy(_._1).values.map(g =>
      g.length.toLong * g.length).sum
    val sn23 = grid.groupBy(_._1).values.map { g =>
      val m = g.length.toLong; m * m * (2 * m + 3)
    }.sum
    assert(d == 2 * j2 - (n * n - sn2))
    val v = n * n * (2 * n + 3) - sn23
    assert(sig == (BigInt(11250) * d * d > BigInt(9604) * v))
    assert(trend == (if (d > 0) "increasing"
      else if (d < 0) "decreasing" else "none"))
    // float z agrees: J = J2/2, E = (N^2-Σn²)/4, Var = V/72
    val z = (j2 / 2.0 - (n.toDouble * n - sn2) / 4) / math.sqrt(v / 72.0)
    assert(sig == (z * z > 3.8416), "float z equivalence")
  }

  test("q285 Holm post-hoc: per-pair z2 replays via the q259 kernel; " +
    "step-down is monotone; consistent with the q267 omnibus") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q285_posthoc_pairwise(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(rows.length == 21)
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val grid = (days.min to days.max)
      .map(d => ((d + 4) % 7, byDay.getOrElse(d, 0L)))
    for ((pa, pb, nA, nB, z2, _, _, _) <- rows) {
      val sub = grid.filter(x => x._1 == pa || x._1 == pb)
      val n = sub.length.toLong
      assert(nA == sub.count(_._1 == pa).toLong)
      assert(nB == sub.count(_._1 == pb).toLong)
      val groups = sub.map(_._2).groupBy(identity).view
        .mapValues(_.length.toLong).toMap.toSeq.sortBy(_._1)
      var cum = 0L; var r1d = 0L; var tie3 = 0L
      val byVal = sub.groupBy(_._2)
      for ((v, t) <- groups) {
        val dr = 2 * cum + t + 1
        r1d += byVal(v).count(_._1 == pa).toLong * dr
        tie3 += t * t * t - t
        cum += t
      }
      val diff = r1d - nA * (nA + 1) - nA * nB
      val z2Exp = BigInt(3000000) * n * (n - 1) * diff * diff /
        (BigInt(nA) * nB * (BigInt(n) * (n - 1) * (n + 1) - tie3))
        .max(BigInt(1))
      assert(z2 == z2Exp.toLong, s"pair ($pa,$pb) z2")
    }
    // Holm structure: ranks are 1..21 by z2 desc; the significance set
    // is a prefix of the rank order; crit ladder is monotone
    val byRank = rows.sortBy(_._6)
    assert(byRank.map(_._6).toSeq == (1L to 21L).toSeq)
    assert(byRank.map(_._5).sliding(2).forall(p => p(0) >= p(1)),
      "z2 sorted desc by rank")
    val sigFlags = byRank.map(_._8)
    assert(!sigFlags.dropWhile(identity).contains(true),
      "Holm significance is a prefix")
    assert(byRank.map(_._7).sliding(2).forall(p => p(0) >= p(1)),
      "crit ladder decreasing in rank order")
    // no-dow-effect corpus (q267): nothing should survive Holm
    assert(sigFlags.forall(!_), "quiet corpus — no pair survives")
  }

  test("q282 PACF: quantized Durbin-Levinson replays off q240's r; " +
    "lag-1 identity; float-DL agreement") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q282_pacf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(rows.length == 14)
    val acf = Behavior.q240_acf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    val n = acf.head._2
    val rr = acf.map(_._3 * 1000L)
    // integer replay
    var phis = Array(rr(0))
    val got = rows.map(_._2)
    assert(got(0) == rr(0), "lag-1 identity phi11 = r1")
    for (m <- 2 to 14) {
      val k = m - 1
      var dn = 0L; var dd = 0L
      for (j <- 1 to k) { dn += phis(j - 1) * rr(m - 1 - j);
        dd += phis(j - 1) * rr(j - 1) }
      val num = rr(m - 1) - dn / 1000000L
      val den0 = 1000000L - dd / 1000000L
      val phikk = 1000000L * num / (if (den0 == 0L) 1L else den0)
      phis = Array.tabulate(k)(i =>
        phis(i) - phikk * phis(k - 1 - i) / 1000000L) :+ phikk
      assert(got(m - 1) == phikk, s"lag $m pacf")
    }
    for ((lag, phi, nD, sig) <- rows) {
      assert(nD == n)
      assert(sig == (phi * phi * n > 4000000000000L), s"lag $lag band")
    }
    // float Durbin-Levinson tracks the quantized one
    val rF = acf.map(_._3 / 1000.0)
    var pF = Array(rF(0))
    val gotF = scala.collection.mutable.ArrayBuffer(rF(0))
    for (m <- 2 to 14) {
      val k = m - 1
      val num = rF(m - 1) - (1 to k).map(j => pF(j - 1) * rF(m - 1 - j)).sum
      val den0 = 1.0 - (1 to k).map(j => pF(j - 1) * rF(j - 1)).sum
      val pkk = num / den0
      pF = Array.tabulate(k)(i => pF(i) - pkk * pF(k - 1 - i)) :+ pkk
      gotF += pkk
    }
    for (m <- 1 to 14)
      assert(math.abs(got(m - 1) / 1e6 - gotF(m - 1)) < 0.01,
        s"lag $m float agreement ${gotF(m - 1)}")
  }

  test("q281 turning points: strict extrema count replays; float-z " +
    "equivalence") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q281_turning_points(spark, sf).collect().head
    val (n, t, expM, sig) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3))
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val xs = (days.min to days.max).map(d => byDay.getOrElse(d, 0L))
    assert(n == xs.length.toLong)
    val tExp = (1 until xs.length - 1).count { i =>
      (xs(i) > xs(i - 1) && xs(i) > xs(i + 1)) ||
        (xs(i) < xs(i - 1) && xs(i) < xs(i + 1))
    }.toLong
    assert(t == tExp, "turning points")
    assert(expM == 2000L * (n - 2) / 3)
    val lhs = BigInt(900000) * (3 * t - 2 * (n - 2)) * (3 * t - 2 * (n - 2))
    assert(sig == (lhs > BigInt(345744) * (16 * n - 29)))
    val z = (t - 2.0 * (n - 2) / 3) / math.sqrt((16.0 * n - 29) / 90)
    assert(sig == (z * z > 3.8416), "float z equivalence")
  }

  test("q279 strengths: variances replay off the gated q220 components; " +
    "float-strength agreement; bounds") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q279_seasonal_strength(spark, sf).collect().head
    val (n, fS, fT) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val comp = Behavior.q220_seasonal_decompose(spark, sf).collect()
      .map(x => (x.getLong(5), x.getLong(4), x.getLong(3)))
    assert(n == comp.length.toLong)
    def varNum(xs: Seq[Long]): (BigInt, BigInt) = {
      val s = xs.sum
      val s2 = xs.map(x => BigInt(x) * x).sum
      (BigInt(n) * s2 - BigInt(s) * s, BigInt(s))
    }
    val rs = comp.map(_._1)
    val srs = comp.map(c => c._1 + c._2)
    val trs = comp.map(c => c._1 + c._3)
    val (vr, _) = varNum(rs)
    val (vsr, _) = varNum(srs)
    val (vtr, _) = varNum(trs)
    assert(fS == (BigInt(1000) - BigInt(1000) * vr / vsr.max(BigInt(1)))
      .max(BigInt(0)).toLong, "seasonal strength")
    assert(fT == (BigInt(1000) - BigInt(1000) * vr / vtr.max(BigInt(1)))
      .max(BigInt(0)).toLong, "trend strength")
    assert(fS >= 0 && fS <= 1000 && fT >= 0 && fT <= 1000)
    // float agreement
    def fvar(xs: Seq[Long]): Double = {
      val m = xs.map(_.toDouble).sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val fSf = math.max(0.0, 1.0 - fvar(rs) / fvar(srs))
    val fTf = math.max(0.0, 1.0 - fvar(rs) / fvar(trs))
    assert(math.abs(fS / 1000.0 - fSf) < 0.002, s"float F_S $fSf")
    assert(math.abs(fT / 1000.0 - fTf) < 0.002, s"float F_T $fTf")
  }

  test("q278 Brown-Forsythe: medians, deviations and the quantized F " +
    "replay; float-F agreement") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q278_brown_forsythe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).sortBy(_._1)
    assert(rows.length == 7)
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val grid = (days.min to days.max)
      .map(d => ((d + 4) % 7, byDay.getOrElse(d, 0L)))
    val byDow = grid.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val meds = byDow.map { case (dw, xs) =>
      dw -> xs.sorted.apply(((xs.length + 1) / 2) - 1)
    }
    for ((dow, med, _, _, _, _, _) <- rows)
      assert(med == meds(dow), s"dow $dow median")
    val z = grid.map { case (dw, c) => (dw, math.abs(c - meds(dw))) }
    val n = z.length.toLong
    val zz = z.map(_._2).sum
    val z2 = z.map(x => BigInt(x._2) * x._2).sum
    var ssb = BigInt(0); var wSub = BigInt(0)
    for ((dw, g) <- z.groupBy(_._1)) {
      val nG = g.length.toLong
      val zG = g.map(_._2).sum
      val d = BigInt(zG) * n - BigInt(zz) * nG
      ssb += BigInt(1000000) * d * d / (BigInt(nG) * n * n)
      wSub += BigInt(1000000) * zG * zG / nG
      val _ = dw
    }
    val ssw = BigInt(1000000) * z2 - wSub
    assert(BigInt(rows.head._4) == ssb, "SSB")
    assert(BigInt(rows.head._5) == ssw, "SSW")
    val fExp = (BigInt(1000000) * (n - 7) * ssb /
      (BigInt(6) * ssw).max(BigInt(1))).toLong
    assert(rows.head._6 == fExp, "F replay")
    assert(rows.head._7 == (fExp > 2527655L))
    // float F agrees
    val means = z.groupBy(_._1).view.mapValues(g =>
      g.map(_._2).sum.toDouble / g.length).toMap
    val zBar = zz.toDouble / n
    val ssbF = z.groupBy(_._1).map { case (dw, g) =>
      g.length * math.pow(means(dw) - zBar, 2)
    }.sum
    val sswF = z.map { case (dw, v) => math.pow(v - means(dw), 2) }.sum
    val fF = (n - 7).toDouble / 6 * ssbF / sswF
    assert(math.abs(fExp / 1e6 - fF) < 0.01, s"float F $fF")
  }

  test("q277 Friedman: within-week doubled ranks replay; W bounds; " +
    "float chi2_r agreement") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q277_friedman(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(rows.length == 7)
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val d0 = days.min
    val grid = (days.min to days.max)
      .map(d => ((d - d0) / 7, (d + 4) % 7, byDay.getOrElse(d, 0L)))
    val fullWeeks = grid.groupBy(_._1).filter(_._2.size == 7)
    val n = fullWeeks.size.toLong
    val k = 7L
    // within-block doubled tie-average ranks
    var tie3 = 0L
    val rdByDow = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((_, block) <- fullWeeks) {
      val groups = block.map(_._3).groupBy(identity).view
        .mapValues(_.length.toLong).toMap.toSeq.sortBy(_._1)
      var cum = 0L
      val dr = groups.map { case (v, t) =>
        val d = 2 * cum + t + 1
        cum += t
        tie3 += t * t * t - t
        v -> d
      }.toMap
      block.foreach { case (_, dow, c) => rdByDow(dow) += dr(c) }
    }
    for ((dow, rd, nB, _, _, _) <- rows) {
      assert(nB == n)
      assert(rd == rdByDow(dow), s"dow $dow rank sum")
    }
    val srd2 = rdByDow.values.map(r => BigInt(r) * r).sum
    val h0 = BigInt(3000000) * srd2 / (n * k * (k + 1)) -
      BigInt(3000000) * n * (k + 1)
    val dd = BigInt(n) * k * (k * k - 1)
    val h = (h0 * dd / (dd - tie3).max(BigInt(1))).toLong
    assert(rows.head._4 == h, "chi2_r replay")
    assert(rows.head._5 == h / (n * (k - 1)), "Kendall W")
    assert(rows.head._6 == (h > 12591587L))
    // W in [0, 1] up to quantization
    assert(rows.head._5 >= -1L && rows.head._5 <= 1000001L)
    // float chi2_r agrees (ranks = doubled/2)
    val rSums = rdByDow.values.map(_ / 2.0)
    val hF0 = 12.0 / (n * k * (k + 1)) * rSums.map(r => r * r).sum -
      3.0 * n * (k + 1)
    val hF = hF0 / (1.0 - tie3.toDouble / (n * k * (k * k - 1.0)))
    assert(math.abs(h / 1e6 - hF) < 0.01, s"float chi2_r $hF")
  }

  test("q273 EWMA: the integer recurrence replays; tracks the float " +
    "EWMA; limit test squares the 3-sigma asymptote") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q273_ewma_chart(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).sortBy(_._1)
    assert(rows.nonEmpty)
    val xs = rows.map(_._2)
    val n = xs.length.toLong
    val sSum = xs.sum
    val s2 = xs.map(x => BigInt(x) * x).sum
    val mu = 1000L * sSum / n
    val varNum = BigInt(n) * s2 - BigInt(sSum) * sSum
    var ew = mu
    for ((day, c, got, dev, aH, aL) <- rows) {
      ew = (1000L * c + 7L * ew) / 8L
      assert(got == ew, s"day $day ewma")
      assert(dev == ew - mu)
      val trip = BigInt(15) * n * (n - 1) * BigInt(dev) * dev >
        BigInt(9000000) * varNum
      assert(aH == (trip && dev > 0) && aL == (trip && dev < 0))
    }
    // float agreement: rerun the float recurrence cleanly
    var f = mu / 1000.0
    for ((day, c, got, _, _, _) <- rows) {
      f = (c + 7.0 * f) / 8.0
      assert(math.abs(got / 1000.0 - f) < 0.01, s"day $day float EWMA")
    }
    // sensitivity: a +3-sigma sustained tail must alarm
    val sigma = math.sqrt(varNum.toDouble / (n * (n - 1)))
    val shift = math.ceil(3 * sigma).toLong + 1
    val planted = xs.zipWithIndex.map { case (c, i) =>
      if (i >= xs.length / 2) c + shift else c
    }
    val mu2 = 1000L * planted.sum / planted.length
    val s22 = planted.map(x => BigInt(x) * x).sum
    val vn2 = BigInt(n) * s22 - BigInt(planted.sum) * planted.sum
    var e2 = mu2
    var fired = false
    for (c <- planted) {
      e2 = (1000L * c + 7L * e2) / 8L
      if (BigInt(15) * n * (n - 1) * BigInt(e2 - mu2) * (e2 - mu2) >
        BigInt(9000000) * vn2) fired = true
    }
    assert(fired, "sustained +3-sigma shift must alarm")
  }

  test("q269 Page-Hinkley: milli walk replays sequentially; a planted " +
    "level shift trips the increase alarm") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q269_page_hinkley(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val xs = rows.map(_._2)
    val lambdaM = 1000L * xs.sum / xs.length
    var sT = 0L
    var phUp = 0L; var phDn = 0L
    var mUp = Long.MaxValue; var mDn = Long.MaxValue
    for (((day, c, phU, gapU, gapD, lam, aU, aD), i) <- rows.zipWithIndex) {
      val t = i + 1L
      sT += c
      phUp += 1000 * c - (1000 * sT) / t - (50 * sT) / t
      phDn += (1000 * sT) / t - 1000 * c - (50 * sT) / t
      mUp = math.min(mUp, phUp); mDn = math.min(mDn, phDn)
      assert(phU == phUp, s"day $day PH")
      assert(gapU == phUp - mUp && gapD == phDn - mDn, s"day $day gaps")
      assert(lam == lambdaM)
      assert(aU == (gapU > lambdaM) && aD == (gapD > lambdaM))
    }
    // stationary corpus at the mean-relative calibration: no alarms
    assert(rows.forall(r => !r._7 && !r._8), "stationary series is quiet")
    // planted shift: a +200/day tail (~60% over the ~335/day mean —
    // +60 measured knife-edge at gap 360701 vs lambda 363333) must
    // fire the increase alarm (detector sensitivity contract)
    val planted = xs.zipWithIndex.map { case (c, i) =>
      if (i >= xs.length / 2) c + 200L else c
    }
    val lam2 = 1000L * planted.sum / planted.length
    var s2 = 0L; var p2 = 0L; var m2 = Long.MaxValue; var fired = false
    for ((c, i) <- planted.zipWithIndex) {
      val t = i + 1L
      s2 += c
      p2 += 1000 * c - (1000 * s2) / t - (50 * s2) / t
      m2 = math.min(m2, p2)
      if (p2 - m2 > lam2) fired = true
    }
    assert(fired, "a +60/day level shift must trip the alarm")
  }

  test("q268 Cochran-Armitage: dose-scored trend statistic replays; " +
    "float z2 equivalence") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q268_cochran_armitage(spark, sf).collect().head
    val (nU, nP, nD, aStat, z2M, sig) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    val users = graft.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(expr("count(1) AS w"), expr("min(ts_us) AS fe"),
        expr("min(CASE WHEN event_type = 'purchase' THEN ts_us END) AS fp"))
      .selectExpr("w", "CASE WHEN fp = fe THEN 1L ELSE 0L END AS p")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = users.length.toLong
    val c = users.map(_._2).sum
    assert(nU == n && nP == c)
    val doses = users.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    assert(nD == doses.size.toLong)
    val a = doses.map { case (w, (ni, ci)) =>
      BigInt(w) * (ci * n - ni * c)
    }.sum
    assert(BigInt(aStat) == a, "A statistic")
    val w2n = doses.map { case (w, (ni, _)) => BigInt(w) * w * ni }.sum
    val wn = doses.map { case (w, (ni, _)) => BigInt(w) * ni }.sum
    val b = BigInt(c) * (n - c) * (BigInt(n) * w2n - wn * wn)
    assert(BigInt(z2M) == BigInt(1000000) * a * a * n / b.max(BigInt(1)))
    assert(sig == (BigInt(10000) * a * a * n > BigInt(38416) * b))
    // float z² agrees (Armitage's T/Var form: A = N·T, B = N³·Var)
    val t = a.toDouble / n
    val v = b.toDouble / (n.toDouble * n * n)
    val z2 = t * t / v
    assert(math.abs(z2M / 1e6 - z2) < 1e-3, s"float z2 $z2")
    assert(sig == (z2 > 3.8416), "float verdict")
  }

  test("q267 Kruskal-Wallis: doubled-rank H replays; float agreement " +
    "with scipy's tie-corrected form") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q267_kruskal_wallis(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(rows.length == 7)
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val grid = (days.min to days.max)
      .map(d => ((d + 4) % 7, byDay.getOrElse(d, 0L)))
    val n = grid.length.toLong
    // doubled tie-average ranks per value
    val groups = grid.map(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap.toSeq.sortBy(_._1)
    var cum = 0L
    val drMap = groups.map { case (v, t) =>
      val dr = 2 * cum + t + 1
      cum += t
      v -> dr
    }.toMap
    val tie3 = groups.map { case (_, t) => t * t * t - t }.sum
    val byDow = grid.groupBy(_._1)
    var sc = BigInt(0)
    for ((dow, ng, rd, meanM, _, _) <- rows) {
      val mine = byDow(dow).map(_._2)
      assert(ng == mine.length.toLong, s"dow $dow size")
      val rdExp = mine.map(drMap).sum
      assert(rd == rdExp, s"dow $dow doubled rank sum")
      assert(meanM == 500L * rdExp / ng, s"dow $dow mean rank")
      sc += BigInt(3000000) * rdExp * rdExp / ng
    }
    val h0 = sc / (BigInt(n) * (n + 1)) - BigInt(3000000) * (n + 1)
    val n3n = BigInt(n) * n * n - n
    val hExp = (h0 * n3n / (n3n - tie3).max(BigInt(1))).toLong
    assert(rows.head._5 == hExp, "H replay")
    assert(rows.forall(_._5 == hExp))
    assert(rows.head._6 == (hExp > 12591587L))
    // float H (scipy.kruskal's tie-corrected formula) agrees
    val rSums = rows.map(r => (r._3 / 2.0, r._2.toDouble))
    val hF0 = 12.0 / (n * (n + 1.0)) *
      rSums.map { case (rs, ng) => rs * rs / ng }.sum - 3 * (n + 1.0)
    val hF = hF0 / (1.0 - tie3.toDouble / (n.toDouble * n * n - n))
    assert(math.abs(hExp / 1e6 - hF) < 0.01, s"float H: $hF vs $hExp")
  }

  test("q265 permutation test: identical deterministic shuffles replay; " +
    "p-value counts exceedances with the add-one convention") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q265_permutation_test(spark, sf).collect().head
    val (n1, n2, tObs, bReps, nGe, pPm, sig) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getBoolean(6))
    assert(bReps == 1000L)
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val grid = (days.min to days.max)
      .map(d => (d, byDay.getOrElse(d, 0L), (d + 4) % 7 == 0 || (d + 4) % 7 == 6))
    val n1E = grid.count(_._3).toLong
    val n2E = grid.size - n1E
    assert(n1 == n1E && n2 == n2E)
    val sTot = grid.map(_._2).sum
    val s1 = grid.filter(_._3).map(_._2).sum
    assert(tObs == math.abs(s1 * n2 - (sTot - s1) * n1))
    var ge = 0L
    for (b <- 0L until 1000L) {
      val ranked = grid.map { case (d, c, _) =>
        (SplitMix64Kernel.mix(b * 1000003L + d), d, c)
      }.sortBy(t => (t._1, t._2))
      val s1b = ranked.take(n1.toInt).map(_._3).sum
      val tB = math.abs(s1b * n2 - (sTot - s1b) * n1)
      if (tB >= tObs) ge += 1
    }
    assert(nGe == ge, "exceedance count over identical shuffles")
    assert(pPm == 1000L * (1 + ge) / 1001L)
    assert(sig == (pPm < 50L))
  }

  test("q264 runs test: runs count and squared z-test replay; float " +
    "z-test equivalence") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q264_runs_test(spark, sf).collect().head
    val (n1, n2, nTies, runs, expM, sig) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val xs = (days.min to days.max).map(d => byDay.getOrElse(d, 0L))
    val nd = xs.length
    val median = xs.zipWithIndex.sortBy(identity).map(_._1)
      .apply((nd + 1) / 2 - 1)
    val sgns = xs.filter(_ != median).map(x => if (x > median) 1 else -1)
    assert(n1 == sgns.count(_ == 1).toLong)
    assert(n2 == sgns.count(_ == -1).toLong)
    assert(nTies == xs.count(_ == median).toLong)
    val runsExp = 1 + sgns.sliding(2).count(p => p(0) != p(1))
    assert(runs == runsExp.toLong, "runs count")
    val nn = n1 + n2
    val aa = 2 * n1 * n2
    assert(expM == 1000 + 1000 * aa / nn)
    val lhs = BigInt(10000) * (nn - 1) *
      BigInt(runs * nn - nn - aa) * BigInt(runs * nn - nn - aa)
    val rhs = BigInt(38416) * aa * (aa - nn)
    assert(sig == (lhs > rhs), "squared test")
    // float equivalence
    val mu = 1.0 + aa.toDouble / nn
    val s2 = aa.toDouble * (aa - nn) / (nn.toDouble * nn * (nn - 1))
    val z = (runs - mu) / math.sqrt(s2)
    assert(sig == (z * z > 3.8416), "float z equivalence")
  }

  test("q263 Theil: micro-nat terms replay brutally; decomposition " +
    "identity holds in float-land") {
    val sf = "/root/testdata/sf0.01"
    val rows = Behavior.q263_theil_index(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.nonEmpty)
    val cust = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "CAST(o_totalprice AS DECIMAL(18,2)) AS p")
      .groupBy("o_custkey")
      .agg(expr("CAST(SUM(p) * 100 AS BIGINT)").as("x"))
      .join(spark.read.parquet(s"$sf/customer.parquet")
        .selectExpr("c_custkey AS o_custkey", "c_mktsegment AS seg"),
        Seq("o_custkey"))
      .select("seg", "x").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def lnMicro(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))
    val n = cust.length.toLong
    val sAll = cust.map(_._2).sum
    val bySeg = cust.groupBy(_._1)
    val tTotExp = (cust.map { case (_, x) =>
      if (x > 0) BigInt(x) * (lnMicro(x * n) - lnMicro(sAll)) else BigInt(0)
    }.sum / BigInt(sAll)).toLong
    var bNum = BigInt(0)
    for ((seg, nG, sG, tW, tTot, tB) <- rows) {
      val mine = bySeg(seg).map(_._2)
      assert(nG == mine.length.toLong && sG == mine.sum, s"$seg totals")
      val wNum = mine.map { x =>
        if (x > 0) BigInt(x) * (lnMicro(x * nG) - lnMicro(sG)) else BigInt(0)
      }.sum
      assert(tW == (wNum / BigInt(sG)).toLong, s"$seg within")
      assert(tTot == tTotExp, s"$seg total column")
      bNum += BigInt(sG) * (lnMicro(sG * n) - lnMicro(sAll * nG))
      assert(tW >= -1L, s"$seg within non-negative up to quantization")
      val _ = tB
    }
    val tBetweenExp = (bNum / BigInt(sAll)).toLong
    assert(rows.head._6 == tBetweenExp, "between replay")
    // decomposition: T ≈ T_b + Σ (s_g/s)·T_g (float identity)
    val lhs = rows.head._5 / 1e6
    val rhs = rows.head._6 / 1e6 + rows.map { case (_, _, sG, tW, _, _) =>
      (sG.toDouble / sAll) * (tW / 1e6)
    }.sum
    assert(math.abs(lhs - rhs) < 0.001, s"decomposition $lhs vs $rhs")
  }

  test("q262 Ljung-Box: Q profile replays from q240's gated ACF; " +
    "thresholds are the chi-square table; verdict consistent") {
    val sf = "/root/testdata/sf0.01"
    val acf = Behavior.q240_acf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    val lb = Behavior.q262_ljung_box(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(lb.length == 14)
    val n = acf.head._2
    var cum = 0L
    for (((lag, rM, q, crit, rej), (aLag, _, aR)) <- lb.zip(acf)) {
      assert(lag == aLag && rM == aR, s"lag $lag consumes q240's r")
      cum += (rM * rM) / (n - lag)
      assert(q == n * (n + 2) * cum, s"lag $lag Q")
      assert(rej == (q > crit), s"lag $lag verdict")
      // the float Ljung-Box tracks the quantized one
      val qf = lb.take(lag.toInt).map { case (l2, r2, _, _, _) =>
        (r2 / 1000.0) * (r2 / 1000.0) / (n - l2)
      }.sum * n * (n + 2)
      assert(math.abs(q / 1e6 - qf) < 0.05, s"lag $lag float agreement")
    }
    // chi-square criticals are monotone in df and match scipy's table
    // at the endpoints (3.841, 23.685)
    assert(lb.head._4 == 3841459L && lb.last._4 == 23684791L)
    assert(lb.map(_._4).sliding(2).forall(p => p(0) < p(1)))
    // the synthetic series is white noise: no rejection anywhere,
    // consistent with q251's no-trend
    assert(lb.forall(!_._5), "white-noise corpus must not reject")
  }

  test("q259 Mann-Whitney: doubled tie-average ranks replay; delta is " +
    "the rank-sum rational; squared z-test agrees with the float form") {
    val sf = "/root/testdata/sf0.01"
    val r = Behavior.q259_mann_whitney(spark, sf).collect().head
    val (n1Got, n2Got, u2xGot, tie3Got, deltaGot, sigGot) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))
    val days = graft.Tables.events(spark, sf)
      .selectExpr("ts_us div 86400000000L AS day").collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val grid = (days.min to days.max)
      .map(d => (byDay.getOrElse(d, 0L), ((d + 4) % 7 == 0) || ((d + 4) % 7 == 6)))
    val n = grid.length.toLong
    val n1 = grid.count(_._2).toLong
    val n2 = n - n1
    assert(n1Got == n1 && n2Got == n2)
    // doubled average rank per value group = 2*cumBelow + t + 1
    val groups = grid.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (v, rows) =>
        (v, rows.length.toLong, rows.count(_._2).toLong)
      }
    var cum = 0L
    var r1d = 0L
    var tie3 = 0L
    for ((_, t, t1) <- groups) {
      val dr = 2 * cum + t + 1
      r1d += t1 * dr
      tie3 += t * t * t - t
      cum += t
    }
    val u2x = r1d - n1 * (n1 + 1)
    assert(u2xGot == u2x, "doubled U1")
    assert(tie3Got == tie3, "tie correction term")
    val diff = u2x - n1 * n2
    assert(deltaGot == 1000L * diff / (n1 * n2).max(1L), "Cliff's delta")
    val lhs = BigInt(120000) * n * (n - 1) * BigInt(diff) * BigInt(diff)
    val rhs = BigInt(153664) * n1 * n2 *
      (BigInt(n) * (n - 1) * (n + 1) - tie3)
    assert(sigGot == (lhs > rhs), "squared significance test")
    // the squared integer test IS the float z-test
    val u1 = u2x / 2.0
    val sigma2 = n1.toDouble * n2 *
      ((n.toDouble * (n - 1) * (n + 1) - tie3) / (12.0 * n * (n - 1)))
    val z = (u1 - n1.toDouble * n2 / 2.0) / math.sqrt(sigma2)
    assert(sigGot == (z * z > 3.8416), "float z-test equivalence")
    // brute U from pairwise wins + half-ties matches the rank-sum form
    val a = grid.filter(_._2).map(_._1)
    val b = grid.filterNot(_._2).map(_._1)
    val u2xBrute = a.map(x =>
      2L * b.count(x > _) + b.count(x == _)).sum
    assert(u2xBrute == u2x, "pairwise-wins identity")
  }
}
