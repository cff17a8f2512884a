package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Node coreness / k-core decomposition (q148) by the distributed
  * H-index iteration (Lü, Zhou, Zhang & Stanley, PNAS 2016, "The
  * H-index of a network node and its relation to degree and coreness"):
  * initialize c₀(v) = deg(v); each round, c(v) becomes the H-index of
  * its neighbors' current values (the largest h with ≥ h neighbors at
  * c ≥ h). The sequence is monotone NON-INCREASING per node and
  * converges to the classical peeling coreness — turning the inherently
  * sequential min-degree peel into a fixed number of embarrassingly
  * parallel rounds.
  *
  * Why this shape at 100 TB: peeling is a serial frontier algorithm
  * (remove the global min-degree node, repeat) — unusable distributed.
  * The H-index round is ONE join (neighbor values) + ONE window (rank
  * within node) + ONE aggregate (max of min(rank, value)), all keyed on
  * the node — the partitioning is reused round over round. The H-index
  * is tie-order-insensitive, so the window's tie behavior cannot perturb
  * results: everything is exact integers.
  *
  * Rounds are FIXED ([[Rounds]]) with a gated `converged` column
  * asserting the round-(R−1) → round-R fixpoint — if the constant were
  * ever too small for a corpus, both engines report false and the spec
  * fails loudly rather than shipping a wrong coreness (measured: this
  * graph family converges in ≤ 4 rounds at every bench SF).
  */
object Coreness {

  private val Rounds = 6
  private val TopK = 25

  private[rel] def hRoundForTest(adj: DataFrame, c: DataFrame): DataFrame =
    hRound(adj, c)

  /** One H-index round over the adjacency: c'(v) = H(c(u) : u ~ v). */
  private def hRound(adj: DataFrame, c: DataFrame): DataFrame = {
    val nb = adj.join(c.withColumnRenamed("n", "u"), Seq("u"))
      .select(col("v"), col("c").as("cn"))
    val w = Window.partitionBy(col("v")).orderBy(col("cn").desc)
    nb.withColumn("i", row_number().over(w))
      .groupBy(col("v"))
      .agg(max(least(col("i").cast("long"), col("cn"))).as("c"))
      .select(col("v").as("n"), col("c"))
  }

  def q148_coreness(s: SparkSession, dir: String): DataFrame = {
    val edges = Triangles.significantEdges(s, dir)
    val adj = edges.select(col("sa").as("u"), col("sb").as("v"))
      .unionByName(edges.select(col("sb").as("u"), col("sa").as("v")))
      .localCheckpoint() // reused every round
    val deg = Triangles.degreesOf(edges)
    var c = deg.select(col("n"), col("deg").as("c"))
    var prev: DataFrame = null
    (1 to Rounds).foreach { _ =>
      prev = c
      c = hRound(adj, c).localCheckpoint()
    }
    val conv = c.join(prev.withColumnRenamed("c", "c_prev"), Seq("n"))
      .agg(max(when(col("c") =!= col("c_prev"), 1L).otherwise(0L)).as("d"))
      .select((col("d") === 0L).as("converged"))
    val w = Window.orderBy(col("c").desc, col("n"))
    c.join(deg, Seq("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .crossJoin(broadcast(conv))
      .select(col("rk").cast("int").as("rank"), col("n").as("s_suppkey"),
        col("deg").as("degree"), col("c").as("coreness"), col("converged"))
      .orderBy(col("rank"))
  }

  private lazy val corenessOracle: String = {
    def round(k: Int): String = {
      val prev = if (k == 1) "c0" else s"c${k - 1}"
      s"""nb$k AS (SELECT a.v, p.c AS cn FROM adj a
         |  JOIN $prev p ON p.n = a.u),
         |rk$k AS (SELECT v, cn, ROW_NUMBER() OVER (PARTITION BY v
         |    ORDER BY cn DESC) AS i FROM nb$k),
         |c$k AS (SELECT v AS n, CAST(MAX(least(i, cn)) AS BIGINT) AS c
         |  FROM rk$k GROUP BY v)""".stripMargin
    }
    s"""WITH ${Triangles.coGraphCtes},
       |adj AS (SELECT sa AS u, sb AS v FROM edges
       |  UNION ALL SELECT sb, sa FROM edges),
       |c0 AS (SELECT n, deg AS c FROM deg),
       |${(1 to Rounds).map(round).mkString(",\n")},
       |conv AS (SELECT MAX(CASE WHEN a.c <> b.c THEN 1 ELSE 0 END) = 0
       |    AS converged
       |  FROM c$Rounds a JOIN c${Rounds - 1} b USING (n)),
       |ranked AS (SELECT c.n, c.c, d.deg,
       |    ROW_NUMBER() OVER (ORDER BY c.c DESC, c.n) AS rk
       |  FROM c$Rounds c JOIN deg d USING (n))
       |SELECT CAST(rk AS INTEGER) AS rank, n AS s_suppkey, deg AS degree,
       |  c AS coreness, converged
       |FROM ranked, conv WHERE rk <= $TopK ORDER BY rank""".stripMargin
  }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q148_coreness" -> (q148_coreness _))

  val oracle: Map[String, String] = Map(
    "q148_coreness" -> corenessOracle)
}
