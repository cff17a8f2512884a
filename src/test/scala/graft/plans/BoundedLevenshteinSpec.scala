package graft.plans

import graft.GraftExtensions
import graft.text.SparkTestSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BoundedLevenshtein optimizer rule: plan rewrite present, semantics
  * unchanged (including nulls and every comparison direction). */
class BoundedLevenshteinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  private def pairs: DataFrame = {
    import spark.implicits._
    Seq(
      ("kitten", "sitting"),   // dist 3
      ("flaw", "lawn"),        // dist 2
      ("abc", "abc"),          // dist 0
      ("a", "abcdefgh"),       // length diff 7 — guard prunes
      (null.asInstanceOf[String], "x") // null left
    ).toDF("a", "b")
  }

  test("rewrites lev(a,b) <= k to length guard + thresholded levenshtein") {
    // ConvertToLocalRelation would evaluate the filter over the in-memory
    // relation before we can inspect the rewrite; exclude it for this test.
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val df = pairs.filter(levenshtein(col("a"), col("b")) <= 2)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein(") && opt.contains("Some(2)) >= 0"),
        s"expected thresholded levenshtein in:\n$opt")
      assert(opt.contains("abs((length("),
        s"expected length-difference guard in:\n$opt")
      assert(df.collect().map(_.getString(0)).sorted
        sameElements Array("abc", "flaw"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("all comparison directions agree with the unoptimized result") {
    val preds = Seq(
      levenshtein(col("a"), col("b")) <= 2,
      lit(2) >= levenshtein(col("a"), col("b")),
      levenshtein(col("a"), col("b")) < 3,
      lit(3) > levenshtein(col("a"), col("b")))
    preds.foreach { p =>
      val withRule = pairs.filter(p).collect().map(r => (r.getString(0), r.getString(1)))
      assert(withRule.toSet == Set(("abc", "abc") -> (), ("flaw", "lawn") -> ())
        .map(_._1), s"predicate $p")
    }
  }

  test("fires inside q45's optimized plan (thresholded form present)") {
    val plan = graft.rel.Relational
      .q45_edit_distance(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Some(2)") && plan.contains("abs((length("),
      s"expected bounded rewrite in q45's plan:\n$plan")
  }

  test("k = 0 and negative-k literals stay safe") {
    assert(pairs.filter(levenshtein(col("a"), col("b")) <= 0)
      .collect().map(_.getString(0)) sameElements Array("abc"))
    // k < 0 is not rewritten (matches nothing either way)
    assert(pairs.filter(levenshtein(col("a"), col("b")) <= -1).count() == 0)
  }
}
