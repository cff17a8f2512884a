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
}
