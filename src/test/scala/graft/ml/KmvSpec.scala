package graft.ml

import graft.GraftExtensions
import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KmvDistinct aggregate: accuracy bound, partitioning invariance (the
  * sketch must be a pure function of the value set — partial buffers merge
  * associatively), exact counts below k, and the SQL surface. */
class KmvSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("estimate within 10% at 10k distinct; invariant to partitioning") {
    import spark.implicits._
    val df = (1 to 30000).map(i => i % 10000).toDF("v")
    def est(parts: Int): Double =
      df.repartition(parts).agg(KmvFunctions.kmv_distinct(col("v")))
        .head().getDouble(0)
    val e3 = est(3)
    assert(math.abs(e3 - 10000) <= 1000, s"estimate $e3 off by >10%")
    assert(est(13) == e3, "sketch must not depend on partitioning")
  }

  test("fewer than k distinct values -> exact count") {
    import spark.implicits._
    val df = (1 to 5000).map(i => i % 100).toDF("v")
    assert(df.agg(KmvFunctions.kmv_distinct(col("v"))).head().getDouble(0) == 100.0)
  }

  test("grouped aggregation and SQL registration") {
    import spark.implicits._
    (1 to 4000).map(i => (i % 4, i % (100 * (i % 4 + 1)))).toDF("g", "v")
      .createOrReplaceTempView("kmv_in")
    val rows = spark.sql(
      """SELECT g, kmv_distinct(v) AS est,
        |       count(DISTINCT v) AS exact FROM kmv_in GROUP BY g""".stripMargin)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getLong(2))
      assert(math.abs(est - exact) <= 0.1 * exact + 1,
        s"group ${r.getInt(0)}: est $est vs exact $exact")
    }
  }

  test("null inputs are ignored") {
    import spark.implicits._
    val df = Seq[Option[Int]](Some(1), None, Some(2), None, Some(1)).toDF("v")
    assert(df.agg(KmvFunctions.kmv_distinct(col("v"))).head().getDouble(0) == 2.0)
  }
}
