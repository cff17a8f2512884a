package graft.rel

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q224: the Apriori pipeline replays brutally, and the anti-monotone
  * support property (pair support ≤ either item support) holds. */
class ItemsetsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q224 frequent itemsets: brute replay, anti-monotonicity, " +
    "rule arithmetic") {
    val rows = Itemsets.q224_frequent_itemsets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val n = li.map(_._1).distinct.length.toLong
    val sup1 = li.groupBy(_._2).map { case (p, v) => p -> v.length.toLong }
    val freq = sup1.filter(_._2 >= 3L)
    val byOrder = li.groupBy(_._1)
      .map { case (_, v) => v.map(_._2).filter(freq.contains).sorted }
    val sup2 = byOrder.toSeq
      .flatMap(ps => for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 3L)
    val want = sup2.toSeq.map { case ((a, b), sab) =>
      (a, b, sab, freq(a), freq(b), 1000L * sab / freq(a),
        1000L * sab / freq(b), 1000L * sab * n / (freq(a) * freq(b)))
    }.sortBy { case (a, b, _, _, _, _, _, lift) => (-lift, a, b) }.take(20)
    assert(rows.toSeq == want,
      s"itemset rules mismatch:\n got=${rows.toSeq}\nwant=$want")
    rows.foreach { case (a, b, sab, sa, sb, cab, cba, lift) =>
      assert(a < b, "canonical pair order")
      assert(sab <= math.min(sa, sb), "support anti-monotonicity")
      assert(sab >= 3L && sa >= 3L && sb >= 3L, "support floors")
      assert(cab <= 1000L && cba <= 1000L, "confidence bounded")
      assert(lift > 0L)
    }
    assert(rows.nonEmpty, "a support-3 floor must leave rules at sf0.001")
  }

  test("q227 rank stability: Spearman replays against a sorted driver " +
    "twin; rho bounds hold") {
    val row = Itemsets.q227_rank_stability(spark, sf).collect().head
    val (nC, nE, nL, sumD2, maxD, pkAt, rho) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "unix_micros(CAST(l_shipdate AS TIMESTAMP))",
        "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (li.map(_._2).min + li.map(_._2).max) / 2
    def revs(pred: Long => Boolean): Map[Long, Long] =
      li.filter(r => pred(r._2)).groupBy(_._1)
        .map { case (pk, v) => pk -> v.map(_._3).sum }
    val eRev = revs(_ <= mid); val lRev = revs(_ > mid)
    def rank(m: Map[Long, Long]): Map[Long, Long] =
      m.toSeq.sortBy { case (pk, rev) => (-rev, pk) }
        .zipWithIndex.map { case ((pk, _), i) => pk -> (i + 1L) }.toMap
    val (re, rl) = (rank(eRev), rank(lRev))
    val common = (re.keySet & rl.keySet).toSeq
    assert(nC == common.length.toLong)
    assert(nE == (re.keySet -- rl.keySet).size.toLong)
    assert(nL == (rl.keySet -- re.keySet).size.toLong)
    // re-rank within the common set (the permutation Spearman needs)
    def rerank(r: Map[Long, Long]): Map[Long, Long] =
      common.sortBy(r).zipWithIndex.map { case (pk, i) => pk -> (i + 1L) }
        .toMap
    val (re2, rl2) = (rerank(re), rerank(rl))
    val ds = common.map(pk => pk -> (re2(pk) - rl2(pk)))
    assert(sumD2 == ds.map(d => d._2 * d._2).sum, "sum of squared diffs")
    val mad = ds.map(d => math.abs(d._2)).max
    assert(maxD == mad)
    assert(pkAt == ds.filter(d => math.abs(d._2) == mad).map(_._1).min)
    val n = common.length.toLong
    assert(rho == 1000000L - (6000000L * sumD2) / (n * (n * n - 1)))
    assert(rho >= -1000000L && rho <= 1000000L, "rho in [-1, 1]")
  }

  test("q244 Kendall tau: inversion-count driver replay on the " +
    "budgeted common set") {
    val r = Itemsets.q244_kendall_tau(spark, sf).collect().head
    val (b, nPairs, conc, disc, tau) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(b == 500L)
    // driver twin: same halves, same budget, same permutations
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey AS pk",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS us",
        "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS LONG)" +
          " AS cents")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val mid = (li.map(_._2).min + li.map(_._2).max) / 2
    def revs(early: Boolean): Map[Long, Long] =
      li.filter(t => (t._2 <= mid) == early)
        .groupBy(_._1).map { case (pk, v) => pk -> v.map(_._3).sum }
    val (re, rl) = (revs(true), revs(false))
    val common = re.keySet.intersect(rl.keySet)
    val top = common.toSeq.map(pk => (pk, re(pk), rl(pk)))
      .sortBy { case (pk, rev, _) => (-rev, pk) }.take(500)
    val reRank = top.sortBy { case (pk, rev, _) => (-rev, pk) }
      .zipWithIndex.map { case ((pk, _, _), i) => pk -> (i + 1) }.toMap
    val rlRank = top.sortBy { case (pk, _, rev) => (-rev, pk) }
      .zipWithIndex.map { case ((pk, _, _), i) => pk -> (i + 1) }.toMap
    val perm = top.map(_._1).sortBy(reRank).map(rlRank)
    val n = perm.length.toLong
    val expPairs = n * (n - 1) / 2
    val expDisc = (for {
      i <- perm.indices; j <- (i + 1) until perm.length
      if perm(i) > perm(j)
    } yield 1).size.toLong
    assert(nPairs == expPairs, "pair count")
    assert(disc == expDisc, "discordant count")
    assert(conc == expPairs - expDisc)
    assert(tau == ((nPairs - 2 * expDisc) * 1000000L) / math.max(nPairs, 1L))
    assert(tau >= -1000000L && tau <= 1000000L)
  }

  test("q247 GSP: first-occurrence chain driver replay; anti-monotone " +
    "prefix support") {
    val gap = 86400000000L
    val rows = Itemsets.q247_sequential_patterns(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id AS u", "event_type AS ty", "ts_us AS t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(x => (x._2, x._1)))
      .toMap
    val nu = byUser.size.toLong
    val types = ev.map(_._2).distinct.sorted
    // first-occurrence chain: t1 = min t(a); t_k = min t(step) in
    // (t_{k-1}, t_{k-1} + gap]
    def chain(seq: Seq[(String, Long)], pat: Seq[String]): Boolean = {
      var tPrev = -1L
      for ((step, i) <- pat.zipWithIndex) {
        val cand =
          if (i == 0) seq.filter(_._1 == step).map(_._2)
          else seq.filter(e => e._1 == step && e._2 > tPrev &&
            e._2 <= tPrev + gap).map(_._2)
        if (cand.isEmpty) return false
        tPrev = cand.min
      }
      true
    }
    def support(pat: Seq[String]): Long =
      byUser.values.count(s0 => chain(s0, pat)).toLong
    val exp2 = (for {a <- types; b <- types} yield Seq(a, b))
      .map(p => p -> support(p)).filter(_._2 * 100 >= 20L * nu)
    val got2 = rows.filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
    assert(got2 == exp2.map { case (p, s0) => p.mkString(">") -> s0 }
      .toMap, "level-2 patterns")
    val frequentPairs = exp2.map(_._1).toSet
    val exp3 = (for {
      a <- types; b <- types; c <- types
      if frequentPairs(Seq(a, b))
    } yield Seq(a, b, c))
      .map(p => p -> support(p)).filter(_._2 * 100 >= 20L * nu)
    val got3 = rows.filter(_._1 == 3L).map(r => r._2 -> r._3).toMap
    assert(got3 == exp3.map { case (p, s0) => p.mkString(">") -> s0 }
      .toMap, "level-3 patterns")
    // anti-monotonicity: a triple's support never exceeds its prefix's
    exp3.foreach { case (p, s0) =>
      assert(s0 <= exp2.toMap.apply(p.take(2)), s"prefix bound of $p")
    }
    rows.foreach { r =>
      assert(r._4 == 1000L * r._3 / nu, "support permille")
    }
  }

  test("q272 HHI: one-division concentration replays from per-supplier " +
    "cents; reciprocal identity holds") {
    val rows = Itemsets.q272_hhi_concentration(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_suppkey",
        "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS cents")
      .groupBy("l_suppkey")
      .agg(org.apache.spark.sql.functions.expr("sum(cents) AS r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val snk = spark.read.parquet(s"$sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val nn = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val byNation = li.toSeq.groupBy { case (sk, _) => nn(snk(sk)) }
    for ((name, nSup, rev, hhi, top, eff) <- rows) {
      val rs = byNation(name).map(_._2)
      assert(nSup == rs.length.toLong, s"$name suppliers")
      val r = rs.sum
      assert(rev == r, s"$name revenue")
      val r2 = rs.map(x => BigInt(x) * x).sum
      assert(BigInt(hhi) == BigInt(1000000) * r2 / (BigInt(r) * r))
      assert(top == 1000L * rs.max / r)
      assert(BigInt(eff) == BigInt(1000) * r * r / r2.max(BigInt(1)))
      // HHI in [10^6/n, 10^6]; eff in [1, n] (Cauchy-Schwarz, exact
      // direction holds for the plug-in estimator)
      assert(hhi >= 1000000L / nSup - 1 && hhi <= 1000000L)
      assert(eff >= 1000L - 1 && eff <= 1000L * nSup + 1)
    }
  }
}
