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
}
