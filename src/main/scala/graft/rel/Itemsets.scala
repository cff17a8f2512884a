package graft.rel

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequent-itemset / association-rule mining over order baskets — the
  * Apriori shape (Agrawal & Srikant 1994) every retail-ish event store
  * eventually runs: distinct (order, part) baskets → frequent items →
  * frequent pairs (support-pruned) → rule strength. All association
  * arithmetic is exact integers: confidences are floor-permilles of
  * support ratios, lift is the single cross-multiplied floor-permille
  * (1000·sup_ab·N) div (sup_a·sup_b) — no float, so the gate is exact.
  *
  * Scale shape: the candidate-pair stream explodes per-basket
  * combinations (bounded by basket size², here ≤ 13² — at retail scale
  * the L1 support prune runs FIRST so the fan-out is frequent-items²
  * per basket, the published Apriori trick, and the pair aggregate gets
  * map-side combine); item supports are catalog-sized and broadcast.
  * The top-20 is a bounded heap. Support thresholds prune candidates
  * corpus-linearly — the reason Apriori survives at scale while
  * all-pairs doesn't.
  */
object Itemsets {

  private val MinSup = 3L

  def q224_frequent_itemsets(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val n = baskets.select(col("ok")).distinct().count()
    val items = baskets.groupBy(col("pk")).agg(count(lit(1)).as("sup"))
    val l1 = items.filter(col("sup") >= MinSup)
      .select(col("pk"), col("sup"))
    // frequent-item prune BEFORE the pair explode (the Apriori step)
    val fb = baskets.join(broadcast(l1.select(col("pk"))), Seq("pk"))
    val pairs = fb.as("a")
      .join(fb.as("b"), expr("a.ok = b.ok AND a.pk < b.pk"))
      .select(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= MinSup)
    pairs
      .join(broadcast(l1.select(col("pk").as("pa"), col("sup").as("sup_a"))),
        Seq("pa"))
      .join(broadcast(l1.select(col("pk").as("pb"), col("sup").as("sup_b"))),
        Seq("pb"))
      .select(col("pa"), col("pb"), col("sup_ab"), col("sup_a"),
        col("sup_b"),
        expr("(1000 * sup_ab) div sup_a").as("conf_ab_permille"),
        expr("(1000 * sup_ab) div sup_b").as("conf_ba_permille"),
        expr(s"(1000 * sup_ab * ${n}L) div (sup_a * sup_b)")
          .as("lift_permille"))
      .orderBy(col("lift_permille").desc, col("pa"), col("pb"))
      .limit(20)
  }

  private lazy val itemsetsOracle: String =
    s"""WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem),
       |tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM b),
       |l1 AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS sup
       |  FROM b GROUP BY 1 HAVING COUNT(*) >= $MinSup),
       |fb AS (SELECT b.ok, b.pk FROM b JOIN l1 ON l1.pk = b.pk),
       |p AS (SELECT a.pk AS pa, c.pk AS pb,
       |    CAST(COUNT(*) AS BIGINT) AS sup_ab
       |  FROM fb a JOIN fb c ON a.ok = c.ok AND a.pk < c.pk
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinSup)
       |SELECT p.pa, p.pb, p.sup_ab, la.sup AS sup_a, lb.sup AS sup_b,
       |  (1000 * p.sup_ab) // la.sup AS conf_ab_permille,
       |  (1000 * p.sup_ab) // lb.sup AS conf_ba_permille,
       |  (1000 * p.sup_ab * (SELECT n FROM tot)) // (la.sup * lb.sup)
       |    AS lift_permille
       |FROM p JOIN l1 la ON la.pk = p.pa JOIN l1 lb ON lb.pk = p.pb
       |ORDER BY lift_permille DESC, p.pa, p.pb LIMIT 20""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q224_frequent_itemsets" -> (q224_frequent_itemsets _))

  val oracle: Map[String, String] = Map(
    "q224_frequent_itemsets" -> itemsetsOracle)
}
