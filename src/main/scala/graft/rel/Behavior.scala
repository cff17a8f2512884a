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
  // ------------------------------------- q193: Markov transition matrix
  /** First-order Markov transition matrix over per-user event sequences —
    * the behavior-modeling rollup (and the n-gram-LM analog for event
    * streams): per user, consecutive event pairs under the total
    * (ts_us, event_id) order; per (src, dst), the transition count and
    * row-conditional probability in permille (floor division of exact
    * counts). Output is |event_type|² rows — catalog-sized. One lag
    * window partitioned BY USER (distributed; no global window), one
    * rollup, one broadcast of the |types|-row totals. */
  def q193_markov_transitions(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val tr = Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    val tot = tr.groupBy(col("src")).agg(sum(col("n")).as("n_src"))
    tr.join(broadcast(tot), "src")
      .selectExpr("src", "dst", "n", "(1000 * n) div n_src AS p_permille")
      .orderBy(col("src"), col("dst"))
  }

  private lazy val markovOracle: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
       |    event_type FROM events),
       |lagged AS (SELECT event_type AS dst,
       |    LAG(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts_us, event_id) AS src
       |  FROM e),
       |tr AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM lagged WHERE src IS NOT NULL GROUP BY src, dst),
       |tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_src
       |  FROM tr GROUP BY src)
       |SELECT src, dst, n, (1000 * n) // n_src AS p_permille
       |FROM tr JOIN tot USING (src) ORDER BY src, dst""".stripMargin

  // --------------------------------------------- q194: RFM segmentation
  /** RFM customer segmentation (Hughes 1994's recency/frequency/monetary
    * quintiles — the standard behavioral clustering a wrangler feeds to
    * campaign/labeling tools): per customer, days since last order
    * (against the corpus max day), order count, and exact monetary total
    * (summed as DECIMAL(18,2) — the money discipline — then cast), each
    * scored 1-5 against its own exact quintile cuts; output is the
    * segment-count cube (≤125 rows). Higher r_score = staler. Both
    * engines derive identical interpolated cuts (the q95
    * percentile/quantile_cont parity) and compare the identically-derived
    * values, so bucketing is knife-edge-free. Per-customer aggs are
    * customer-cardinality; the cuts are one 1-row broadcast; at 100 TB
    * the percentile swaps to approx_percentile (q41→q41b note). */
  def q194_rfm_segments(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .selectExpr("o_custkey",
        // NTZ micros == UTC micros (every graft entry point runs UTC)
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS day",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price")
      .groupBy(col("o_custkey"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("f"),
        sum(col("price")).cast("double").as("m"))
    val maxDay = perCust.agg(max(col("last_day")).as("max_day"))
    val rfm = perCust.crossJoin(broadcast(maxDay))
      .selectExpr("o_custkey", "max_day - last_day AS r", "f", "m")
    val cuts = rfm.agg(
      expr("percentile(r, array(0.2, 0.4, 0.6, 0.8))").as("rc"),
      expr("percentile(f, array(0.2, 0.4, 0.6, 0.8))").as("fc"),
      expr("percentile(m, array(0.2, 0.4, 0.6, 0.8))").as("mc"))
    rfm.crossJoin(broadcast(cuts))
      .selectExpr(
        "1 + size(filter(rc, c -> r > c)) AS r_score",
        "1 + size(filter(fc, c -> f > c)) AS f_score",
        "1 + size(filter(mc, c -> m > c)) AS m_score")
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  private lazy val rfmOracle: String =
    s"""WITH pc AS (SELECT o_custkey,
       |    MAX(epoch_us(o_orderdate) // 86400000000) AS last_day,
       |    CAST(COUNT(*) AS BIGINT) AS f,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m
       |  FROM orders GROUP BY o_custkey),
       |md AS (SELECT MAX(last_day) AS max_day FROM pc),
       |rfm AS (SELECT o_custkey, max_day - last_day AS r, f, m
       |  FROM pc CROSS JOIN md),
       |cuts AS (SELECT
       |    quantile_cont(r, [0.2, 0.4, 0.6, 0.8]) AS rc,
       |    quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS fc,
       |    quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS mc
       |  FROM rfm),
       |scored AS (SELECT
       |    1 + len(list_filter(rc, c -> r > c)) AS r_score,
       |    1 + len(list_filter(fc, c -> f > c)) AS f_score,
       |    1 + len(list_filter(mc, c -> m > c)) AS m_score
       |  FROM rfm CROSS JOIN cuts)
       |SELECT CAST(r_score AS INTEGER) AS r_score,
       |  CAST(f_score AS INTEGER) AS f_score,
       |  CAST(m_score AS INTEGER) AS m_score,
       |  CAST(COUNT(*) AS BIGINT) AS n_customers
       |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_funnel" -> (q133_funnel _),
    "q134_cohort_retention" -> (q134_cohort_retention _),
    "q193_markov_transitions" -> (q193_markov_transitions _),
    "q194_rfm_segments" -> (q194_rfm_segments _))

  val oracle: Map[String, String] = Map(
    "q133_funnel" -> funnelOracle,
    "q134_cohort_retention" -> cohortOracle,
    "q193_markov_transitions" -> markovOracle,
    "q194_rfm_segments" -> rfmOracle)
}
