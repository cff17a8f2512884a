package graft.rel

import graft.text.{JaroWinklerKernel, SparkTestSession}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** q137 fuzzy entity resolution + q141 k-anonymity ladder. The JW golden
  * values below are the published record-linkage examples (Winkler 1990 /
  * the Jaro test pairs every implementation cites), verified to match
  * DuckDB 1.0's `jaro_winkler_similarity` bit-for-bit during round 14. */
class LinkageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler golden values (published examples, DuckDB-verified)") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("crate", "trace") == 0.7333333333333334)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
  }

  test("jaro-winkler: prefix boost applies ONLY above the 0.7 threshold") {
    // 'ab'/'ax': jaro = 2/3 ≤ 0.7 → NO boost despite the shared prefix
    assert(jw("ab", "ax") == 0.6666666666666666)
    // 'prefix'/'prefly': jaro > 0.7 → boosted above plain jaro
    val boosted = jw("prefix", "prefly")
    assert(boosted == 0.8666666666666666)
  }

  test("jaro-winkler: symmetry and range on random token-blocked names") {
    val words = Seq("small", "ring", "red", "widget", "blue", "bolt",
      "hot", "gear", "gizmo", "cold", "old", "plate")
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.size)))
        .mkString(" ")
      val b = Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.size)))
        .mkString(" ")
      val ab = jw(a, b)
      assert(ab == jw(b, a), s"asymmetric on ($a, $b)")
      assert(ab >= 0.0 && ab <= 1.0)
      if (a == b) assert(ab == 1.0)
    }
  }

  test("jaro_winkler is registered as a SQL function") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s")
      .head().getDouble(0)
    assert(got == 0.9611111111111111)
  }

  test("q137: every match is mutual-threshold, best is argmax, dup groups sum to corpus") {
    val out = Linkage.q137_fuzzy_match(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (name, best, jwU) = (r.getString(1), r.getString(3), r.getLong(4))
      assert(jwU >= 900000L && jwU < 1000000L) // distinct names → never 1.0
      assert(name != best)
      // the reported score IS the kernel's score
      assert(math.round(jw(name, best) * 1e6) == jwU)
    }
    // per distinct name, exactly one best_match (assignment, not pair dump)
    val perName = out.groupBy(_.getString(1))
      .map { case (_, rs) => rs.map(r => (r.getString(3), r.getLong(4))).toSet }
    assert(perName.forall(_.size == 1))
  }

  test("q141: coarsening is monotone and `chosen` marks the first k-ok level") {
    val out = Linkage.q141_k_anonymity(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(out.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    // each level is a strict coarsening: fewer groups, min size can't drop
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, "group count must not grow when coarsening")
      assert(b._3 >= a._3, "min group size must not shrink when coarsening")
      assert(b._4 <= a._4, "suppressed rows must not grow when coarsening")
    }
    // chosen = the unique first level with k_ok
    val chosen = out.filter(_._6)
    val firstOk = out.find(_._5)
    assert(chosen.length == (if (firstOk.isDefined) 1 else 0))
    firstOk.foreach(f => assert(chosen.head._1 == f._1))
    // k_ok ⇔ zero suppression at that level
    out.foreach { l => assert(l._5 == (l._4 == 0L)) }
  }

  test("q216: diversity is monotone under coarsening; chosen is first l-ok") {
    val out = Linkage.q216_l_diversity(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    assert(out.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, "group count must not grow when coarsening")
      // a coarse group is a union of fine groups, so its distinct-count
      // is >= every part's — the minimum can only rise
      assert(b._3 >= a._3, "min diversity must not shrink when coarsening")
    }
    // level 4 (one group) has l = global distinct priorities
    val globalL = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority").distinct().count()
    assert(out.last._3 == globalL)
    assert(out.last._2 >= 1L)
    val chosen = out.filter(_._7)
    val firstOk = out.find(_._6)
    assert(chosen.length == (if (firstOk.isDefined) 1 else 0))
    firstOk.foreach(f => assert(chosen.head._1 == f._1))
    // l_ok ⇔ zero groups below ⇔ zero rows at risk
    out.foreach { l =>
      assert(l._6 == (l._4 == 0L) && (l._4 == 0L) == (l._5 == 0L))
    }
  }

  test("q241: EMD brute replay; max-EMD monotone under coarsening " +
    "(convexity); chosen is first t-ok") {
    val out = Linkage.q241_t_closeness(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    assert(out.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    // EMD is a norm of (p − q): convex in p, so a coarse group (a
    // weighted average of its fine parts) can never exceed the max of
    // the parts — the ladder's max is nonincreasing
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, "max EMD must not grow when coarsening")
    }
    val chosen = out.filter(_._7)
    val firstOk = out.find(_._6)
    assert(chosen.length == 1 && chosen.head._1 == firstOk.get._1)
    out.foreach { l =>
      assert(l._6 == (l._3 <= 100L), "t_ok definition")
      assert((l._4 == 0L) == (l._5 == 0L), "groups/rows at risk agree")
    }
    // brute replay of level 3 (seg × region): exact prefix-EMD permille
    val fact = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        org.apache.spark.sql.functions.expr("c_nationkey = n_nationkey"))
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("c_mktsegment AS seg",
        "CAST(n_regionkey AS BIGINT) AS reg",
        "CAST(substring(o_orderpriority, 1, 1) AS INT) AS rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val nn = fact.length.toLong
    def pref(rows: Seq[Int]): Seq[Long] =
      (1 to 4).map(i => rows.count(_ <= i).toLong)
    val q = pref(fact.map(_._3).toSeq)
    val emds = fact.groupBy(t => (t._1, t._2)).map { case (_, rows) =>
      val g = rows.length.toLong
      val p = pref(rows.map(_._3).toSeq)
      val d = (0 until 4).map(i =>
        (BigInt(p(i)) * nn - BigInt(q(i)) * g).abs).sum
      ((BigInt(1000) * d) / (BigInt(4) * g * nn)).toLong
    }
    val lvl3 = out(3)
    assert(lvl3._2 == emds.size.toLong, "level-3 group count")
    assert(lvl3._3 == emds.max, "level-3 max EMD replay")
  }
}
