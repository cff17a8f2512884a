package graft.plans

import graft.GraftExtensions
import graft.text.SparkTestSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native AsofJoin plan node: edge-case semantics, agreement with the
  * union+window encoding on randomized multi-partition data, self-join
  * lineage dedup, and physical plan shape. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  private def native(left: DataFrame, right: DataFrame): DataFrame =
    Asof.join(left, right, Seq("user_id"), Seq("r_user_id"), "ts", "r_ts")

  /** The q47 union+window kernel as the independent reference. */
  private def viaWindow(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("user_id"), col("ts"), lit(1).as("tag"),
      col("id"), lit(null).cast("long").as("v_ts"),
      lit(null).cast("double").as("v_val"))
    val r = right.select(col("r_user_id").as("user_id"), col("r_ts").as("ts"),
      lit(0).as("tag"), lit(null).cast("long").as("id"),
      col("r_ts").as("v_ts"), col("v").as("v_val"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(col("user_id"), col("ts"), col("tag"), col("id"),
        last(col("v_ts"), ignoreNulls = true).over(w).as("asof_ts"),
        last(col("v_val"), ignoreNulls = true).over(w).as("asof_val"))
      .filter(col("tag") === 1)
      .select(col("id"), col("user_id"), col("ts"), col("asof_ts"), col("asof_val"))
  }

  test("edge cases: inclusive equal ts, latest wins, null when none, user isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, 100L), (2L, 1L, 60L), (3L, 1L, 10L), (4L, 2L, 500L)
    ).toDF("id", "user_id", "ts")
    val right = Seq(
      (1L, 50L, 5.0), (1L, 100L, 7.0), (2L, 400L, 9.0)
    ).toDF("r_user_id", "r_ts", "v")
    val got = native(left, right).collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got(1L) == (Some(100L), Some(7.0)), "equal ts matches inclusively")
    assert(got(2L) == (Some(50L), Some(5.0)), "latest preceding wins")
    assert(got(3L) == (None, None), "no preceding right row -> nulls")
    assert(got(4L) == (Some(400L), Some(9.0)), "users isolated")
  }

  test("agrees with the union+window encoding on randomized multi-partition data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // many users, clustered timestamps so matches, misses and equal-ts
    // collisions all occur; 16 input partitions exercise the merge across
    // real exchanges
    val leftRows = (1 to 2000).map { i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(200).toLong)
    }
    val rightRows = (1 to 1000).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(200).toLong, rnd.nextInt(1000) / 10.0)
    }.distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (by, on)
    val left = leftRows.toDF("id", "user_id", "ts").repartition(16)
    val right = rightRows.toDF("r_user_id", "r_ts", "v").repartition(16)

    val a = native(left, right)
      .select(col("id"), col("user_id"), col("ts"),
        col("r_ts").as("asof_ts"), col("v").as("asof_val"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).sortBy(_._1)
    val b = viaWindow(left, right)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).sortBy(_._1)
    assert(a.length == 2000 && (a sameElements b))
  }

  test("self-join lineage: a frame as-of itself (attribute dedup)") {
    import spark.implicits._
    val df = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 50L))
      .toDF("id", "user_id", "ts")
    // each row matched with the latest row (incl. itself) for its user
    val out = Asof.join(df, df, Seq("user_id"), "ts", "ts").collect()
    assert(out.length == 3)
    // id=2 (ts 200) sees id=2 itself (latest at-or-before 200)
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getLong(3) == 2L && r2.getLong(5) == 200L)
  }

  test("empty right side yields all-null right columns") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("id", "user_id", "ts")
    val right = Seq.empty[(Long, Long, Double)].toDF("r_user_id", "r_ts", "v")
    val out = native(left, right).collect()
    assert(out.length == 1 && out(0).isNullAt(3) && out(0).isNullAt(5))
  }

  test("bucketed-by-key sources as-of join with ZERO shuffle") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-asof-buckets").toString
    (1 to 500).map(i => (i.toLong, (i % 20).toLong, (i * 7 % 300).toLong))
      .toDF("id", "user_id", "ts")
      .write.mode("overwrite").option("path", s"$wh/b_asof_l")
      .bucketBy(4, "user_id").sortBy("user_id", "ts")
      .saveAsTable("b_asof_l")
    (1 to 200).map(i => ((i % 25).toLong, (i * 11 % 300).toLong, i / 10.0))
      .toDF("r_user_id", "r_ts", "v")
      .write.mode("overwrite").option("path", s"$wh/b_asof_r")
      .bucketBy(4, "r_user_id").sortBy("r_user_id", "r_ts")
      .saveAsTable("b_asof_r")
    try {
      val joined = native(spark.table("b_asof_l"), spark.table("b_asof_r"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed as-of must not shuffle; plan:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_asof_l")
      spark.sql("DROP TABLE IF EXISTS b_asof_r")
    }
  }

  test("plans as AsofJoinExec: by-key exchanges + local sorts, no window, no join") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("id", "user_id", "ts")
    val right = Seq((1L, 50L, 5.0)).toDF("r_user_id", "r_ts", "v")
    val plan = native(left, right).queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec in:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("SortMergeJoin")
      && !plan.contains("BroadcastHashJoin"), s"unexpected operator in:\n$plan")
  }
}
