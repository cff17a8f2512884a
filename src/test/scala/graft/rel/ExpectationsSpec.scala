package graft.rel

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q146 expectations suite: report shape + verdict consistency. */
class ExpectationsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("report covers the suite; verdicts consistent; clean fixture passes") {
    val out = Expectations.q146_expectations(spark, "/root/testdata/sf0.001")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 8)
    assert(out.map(_._1).distinct.length == 8, "one row per constraint")
    val pop = out.head._3
    assert(out.forall(_._3 == pop), "population is the fact row count")
    out.foreach { case (name, v, _, passed) =>
      assert(v >= 0L)
      assert(passed == (v == 0L), s"$name verdict")
    }
    // the synthetic fixture is referentially clean and fully populated —
    // but its (l_orderkey, l_linenumber) key genuinely COLLIDES (2562
    // rows at sf0.001): the suite must both pass the clean constraints
    // and catch the real dirt, or the verdict column is decorative
    val byName = out.map(r => r._1 -> r._2).toMap
    assert(byName("complete_l_quantity") == 0L)
    assert(byName("ref_l_orderkey_in_orders") == 0L)
    assert(byName("unique_orderkey_linenumber") > 0L,
      "the fixture's known key collisions must be detected")
  }

  test("q208 Benford: digit counts and divergence replay from raw prices") {
    val sf = "/root/testdata/sf0.001"
    val rows = Expectations.q208_benford_audit(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    // driver twin: same DECIMAL(18,2) cents derivation off the raw reads
    val prices = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(org.apache.spark.sql.functions.col("l_extendedprice")
        .cast("decimal(18,2)").multiply(100).cast("long")).collect()
      .map(_.getLong(0))
    val n = prices.length.toLong
    val counts = prices.groupBy(_.toString.head.asDigit)
      .map { case (d, v) => d -> v.length.toLong }
    var divergence = 0L
    rows.foreach { r =>
      val (d, nObs, nRows, o, e, term) = (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nRows == n)
      assert(nObs == counts.getOrElse(d, 0L), s"digit $d count")
      assert(o == 1000L * nObs / n)
      assert(e == math.round(1000.0 * math.log10(1.0 + 1.0 / d)))
      assert(term == (o - e) * (o - e) * 1000000L / e, s"digit $d term")
      divergence += term
    }
    rows.foreach(r => assert(r.getLong(6) == divergence))
    // Benford permilles are a near-partition of 1000
    assert(math.abs(rows.map(_.getLong(4)).sum - 1000L) <= 2)
  }

  test("q235 RI audit: anti-join orphan counts replay; a poisoned child " +
    "key shows up with its signature") {
    val sf = "/root/testdata/sf0.001"
    val rows = Expectations.q235_ri_audit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(rows.keySet == Set("lineitem->orders", "orders->customer",
      "customer->nation", "lineitem->part", "lineitem->supplier"))
    // the generated star schema is referentially intact — coverage 1000
    rows.foreach { case (e, (nChild, nKeys, orphans, cov, sig)) =>
      assert(orphans == 0L && cov == 1000L && sig == 0L, s"$e clean")
      assert(nKeys <= nChild && nKeys > 0, s"$e key counts")
    }
    // brute counts for one edge
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
    val ok = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(rows("lineitem->orders")._1 == li.length.toLong)
    assert(rows("lineitem->orders")._2 == li.distinct.length.toLong)
    assert(li.forall(ok.contains), "fixture integrity assumption")
    // poisoned fixture: drop parents, orphans must surface with a sig
    import spark.implicits._
    val child = Seq(1L, 2L, 3L, 99L, 98L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val orphans = child.join(parent, Seq("k"), "left_anti")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.expr("bit_xor(k)"))
      .collect().head
    assert(orphans.getLong(0) == 2L && orphans.getLong(1) == (99L ^ 98L))
  }
}
