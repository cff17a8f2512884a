package graft.rel

import graft.text.SparkTestSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the union+window as-of join (Relational.q47_asof_join) on a
  * hand-built frame where every edge case is visible: equal timestamps
  * (inclusive match), no preceding right row (null), multiple right rows
  * (latest wins), per-user isolation. */
class AsofSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** The q47 kernel on explicit left/right frames. */
  private def asof(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("user_id"), col("ts"), lit(1).as("tag"),
      col("id"), lit(null).cast("long").as("v_ts"),
      lit(null).cast("double").as("v_val"))
    val r = right.select(col("user_id"), col("ts"), lit(0).as("tag"),
      lit(null).cast("long").as("id"), col("ts").as("v_ts"),
      col("v").as("v_val"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(col("user_id"), col("ts"), col("tag"), col("id"),
        last(col("v_ts"), ignoreNulls = true).over(w).as("asof_ts"),
        last(col("v_val"), ignoreNulls = true).over(w).as("asof_val"))
      .filter(col("tag") === 1)
      .select(col("id"), col("user_id"), col("ts"), col("asof_ts"), col("asof_val"))
  }

  test("as-of picks latest at-or-before right row per user; null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, 100L),  // user 1: after r@50 and r@100 (equal ts → inclusive)
      (2L, 1L, 60L),   // user 1: after r@50 only
      (3L, 1L, 10L),   // user 1: before any right row → null
      (4L, 2L, 500L)   // user 2: isolated from user 1's rights
    ).toDF("id", "user_id", "ts")
    val right = Seq(
      (1L, 50L, 5.0),
      (1L, 100L, 7.0), // equal to left id=1's ts — must match (inclusive)
      (2L, 400L, 9.0)
    ).toDF("user_id", "ts", "v")

    val got = asof(left, right).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got(1L) == (Some(100L), Some(7.0)), "equal ts must match inclusively")
    assert(got(2L) == (Some(50L), Some(5.0)), "latest preceding wins")
    assert(got(3L) == (None, None), "no preceding right row -> null")
    assert(got(4L) == (Some(400L), Some(9.0)), "users are isolated")
  }

  test("as-of join plans exactly one shuffle (user_id), no join operator") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("id", "user_id", "ts")
    val right = Seq((1L, 50L, 5.0)).toDF("user_id", "ts", "v")
    val plan = asof(left, right).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange:\n$plan")
  }

  test("deterministic hash sample is a pure function of the key") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("k")
    def sample(d: DataFrame) = d.filter(
      substring(md5(col("k").cast("string").cast("binary")), 1, 1).isin("0", "1"))
    val a = sample(df).as[Long].collect().sorted
    val b = sample(df.repartition(7)).as[Long].collect().sorted
    assert(a.sameElements(b), "sample must be partitioning-invariant")
    // 2/16 of the md5 space ≈ 12.5%; loose band for 1000 keys
    assert(a.length > 60 && a.length < 200, s"got ${a.length} of 1000")
  }
}
