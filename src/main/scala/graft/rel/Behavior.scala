package graft.rel

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Behavioral analytics over the event stream — the funnel/cohort pair
  * every product-analytics engine ships (the reference's pandas surface
  * stops at flat value_counts; these are the event-sequence operators a
  * warehouse adds on top). Both are integer-exact end to end: timestamps
  * stay epoch-microsecond longs (`Tables.events` ts_us), weeks/days are
  * integer divisions of the epoch, so the gates hash-match with no
  * timezone or date-arithmetic knife-edges.
  *
  * Scale shape: every stage keys on `user_id` — the per-step aggregates
  * and their join-backs co-partition on the same key, so after the first
  * shuffle the funnel chain is exchange-reusable; the cohort matrix is
  * two user-keyed aggregates and one bounded rollup. Nothing is
  * corpus-global except the final tiny result frames.
  */
object Behavior {

  private val WeekUs = 7L * 86400L * 1000000L
  private val DayUs = 86400L * 1000000L
  /** Conversion must complete within 7 days of the first view. */
  private val WindowUs = 7L * 86400L * 1000000L

  // -------------------------------------------------- q133: ordered funnel
  /** Ordered 3-step funnel view → click → purchase: per user, the first
    * view, the first click AT OR AFTER that view, and the first purchase
    * at or after that click — all within a 7-day window of the view.
    * This is the sequence-constrained funnel (a click before the first
    * view does not count), the semantics `windowFunnel`-style operators
    * implement; here it is the min-conditional chain: three user-keyed
    * aggregates, each join-back co-partitioned on user_id. Reported per
    * first-view week so the gate has structure: users entering, users
    * clicking, users converting, and the exact summed view→purchase
    * latency of converters. */
  def q133_funnel(s: SparkSession, dir: String): DataFrame =
    funnelFrame(Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_type")))

  /** The funnel chain over any (user_id, ts_us, event_type) frame —
    * exposed for BehaviorSpec's adversarial orderings. */
  private[graft] def funnelFrame(e: DataFrame): DataFrame = {
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts_us") >= col("t1") &&
        col("ts_us") <= col("t1") + lit(WindowUs))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .join(s1, Seq("user_id"))
      .filter(col("ts_us") >= col("t2") &&
        col("ts_us") <= col("t1") + lit(WindowUs))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .groupBy(expr(s"t1 div ${WeekUs}L").as("week_idx"))
      .agg(count(lit(1)).as("n_entered"),
        count(col("t2")).as("n_clicked"),
        count(col("t3")).as("n_converted"),
        coalesce(sum(col("t3") - col("t1")), lit(0L)).cast("long")
          .as("sum_conv_us"))
      .orderBy(col("week_idx"))
  }

  private lazy val funnelOracle: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type
       |  FROM events),
       |s1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
       |  WHERE event_type = 'view' GROUP BY user_id),
       |s2 AS (SELECT e.user_id, MIN(ts_us) AS t2 FROM e
       |  JOIN s1 USING (user_id)
       |  WHERE event_type = 'click' AND ts_us >= t1
       |    AND ts_us <= t1 + ${WindowUs}
       |  GROUP BY e.user_id),
       |s3 AS (SELECT e.user_id, MIN(ts_us) AS t3 FROM e
       |  JOIN s2 USING (user_id) JOIN s1 USING (user_id)
       |  WHERE event_type = 'purchase' AND ts_us >= t2
       |    AND ts_us <= t1 + ${WindowUs}
       |  GROUP BY e.user_id)
       |SELECT t1 // ${WeekUs} AS week_idx,
       |  CAST(COUNT(*) AS BIGINT) AS n_entered,
       |  CAST(COUNT(t2) AS BIGINT) AS n_clicked,
       |  CAST(COUNT(t3) AS BIGINT) AS n_converted,
       |  CAST(COALESCE(SUM(t3 - t1), 0) AS BIGINT) AS sum_conv_us
       |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
       |GROUP BY week_idx ORDER BY week_idx""".stripMargin

  // --------------------------------------------- q134: cohort retention
  /** Cohort retention matrix: users cohorted by their first-activity day,
    * cells count distinct users active `day_offset` days later (offsets
    * 0-13). The standard warehouse recipe: one user-keyed min, one
    * distinct (user, day) frame, a co-partitioned join, and a bounded
    * rollup — the matrix is O(days × offsets) regardless of event
    * volume. */
  def q134_cohort_retention(s: SparkSession, dir: String): DataFrame =
    retentionFrame(Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts_us div ${DayUs}L").as("day")))

  /** The retention rollup over any (user_id, day) frame — exposed for
    * BehaviorSpec. */
  private[graft] def retentionFrame(e: DataFrame): DataFrame = {
    val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("c_day"))
    val active = e.distinct()
    active.join(cohort, Seq("user_id"))
      .withColumn("day_offset", col("day") - col("c_day"))
      .filter(col("day_offset") <= 13)
      .groupBy(col("c_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users")) // (user, day) is distinct already
      .orderBy(col("c_day"), col("day_offset"))
  }

  private lazy val cohortOracle: String =
    s"""WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // ${DayUs} AS day
       |  FROM events),
       |cohort AS (SELECT user_id, MIN(day) AS c_day FROM e
       |  GROUP BY user_id)
       |SELECT c_day, day - c_day AS day_offset,
       |  CAST(COUNT(*) AS BIGINT) AS n_users
       |FROM e JOIN cohort USING (user_id)
       |WHERE day - c_day <= 13
       |GROUP BY c_day, day_offset ORDER BY c_day, day_offset""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_funnel" -> (q133_funnel _),
    "q134_cohort_retention" -> (q134_cohort_retention _))

  val oracle: Map[String, String] = Map(
    "q133_funnel" -> funnelOracle,
    "q134_cohort_retention" -> cohortOracle)
}
