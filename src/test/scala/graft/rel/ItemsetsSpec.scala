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
}
