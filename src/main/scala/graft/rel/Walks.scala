package graft.rel

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Random-walk corpus generation (q167) — the DeepWalk/node2vec
  * preprocessing step (Perozzi, Al-Rfou & Skiena 2014, "DeepWalk:
  * online learning of social representations"): emit W truncated
  * random walks of length L from every node; the walk corpus then
  * feeds a skip-gram trainer exactly like sentences feed word2vec
  * (which is why it belongs in a training-data engine — it converts a
  * graph into the engine's text-pipeline food).
  *
  * Determinism: the t-th hop of walk w from start s draws
  * h = splitmix64(s·131 + w·17 + t) and steps to
  * sortedNeighbors(cur)[pmod(h, deg(cur))] — no RNG object, every hop
  * recomputable from (s, w, t) alone, so the DuckDB twin replays the
  * ENTIRE corpus: one splitmix64 HUGEINT pass over the (s, w, t) grid
  * (with the signed two's-complement conversion before pmod — degree
  * moduli aren't powers of two), then L unrolled hops indexing the
  * same sorted adjacency lists. Hash-gated end to end.
  *
  * Scale shape: the adjacency-list frame is catalog-sized (sparsified
  * degrees) and BROADCASTS; each hop is then a map-side join — the
  * walk frontier never shuffles. At web-graph scale the adjacency side
  * exceeds broadcast and the hops become shuffle joins keyed by the
  * frontier's current node — still L bounded passes, no driver state;
  * walk count per node is the knob that sizes the corpus against the
  * downstream trainer's budget. */
object Walks {

  private val WalksPerNode = 2
  private val WalkLen = 4

  def q167_deepwalk_corpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = Triangles.significantEdges(s, dir)
    val both = edges.select(col("sa").as("u"), col("sb").as("v"))
      .unionByName(edges.select(col("sb").as("u"), col("sa").as("v")))
    val adj = both.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
    val starts = adj.select(col("u").as("s"))
      .crossJoin((0 until WalksPerNode).toDF("w"))
    var walk = starts
      .withColumn("cur", col("s"))
      .withColumn("path", col("s").cast("string"))
    (1 to WalkLen).foreach { t =>
      val h = JoinCard.splitmix64(
        col("s") * lit(131L) + col("w") * lit(17L) + lit(t.toLong))
      walk = walk
        .join(broadcast(adj), col("cur") === col("u"))
        .withColumn("nxt",
          element_at(col("nbrs"), (pmod(h, size(col("nbrs"))) + 1)
            .cast("int")))
        .select(col("s"), col("w"),
          col("nxt").as("cur"),
          concat(col("path"), lit("-"), col("nxt").cast("string"))
            .as("path"))
    }
    val out = walk
      .select(col("s"), col("w").cast("long").as("w"), col("path"),
        (size(array_distinct(split(col("path"), "-")))).cast("long")
          .as("n_distinct"))
      .orderBy(col("s"), col("w"))
    val pinned = out.localCheckpoint()
    graft.ml.Similarity.pinnedRdds(edges).foreach(_.unpersist(false))
    pinned
  }

  // ---------------------------------------------------------------- oracle

  private def mulmodSql(x: String, c: BigInt): String = {
    val base = BigInt(4294967296L)
    val lo = c % base
    val hi = c / base
    s"((($x % 4294967296) * $lo + " +
      s"((($x % 4294967296) * $hi + ($x // 4294967296) * $lo) % 4294967296)" +
      s" * 4294967296) % 18446744073709551616)"
  }

  private lazy val walksOracle: String = {
    val mco = Triangles.MinCoOrders
    val z1 = "(z + 11400714819323198485) % 18446744073709551616"
    val m2 = mulmodSql("x1", BigInt("13787848793156543929"))
    val m3 = mulmodSql("x2", BigInt("10723151780598845931"))
    // one hop: look up cur's adjacency, index with the precomputed
    // signed hash for step t
    def hop(prev: String, out: String, t: Int): String =
      s"""$out AS (SELECT p.s, p.w, p.path || '-' || CAST(
         |    a.nbrs[CAST(((h.x % len(a.nbrs)) + len(a.nbrs))
         |      % len(a.nbrs) AS BIGINT) + 1] AS VARCHAR) AS path,
         |    a.nbrs[CAST(((h.x % len(a.nbrs)) + len(a.nbrs))
         |      % len(a.nbrs) AS BIGINT) + 1] AS cur
         |  FROM $prev p
         |  JOIN adj a ON p.cur = a.u
         |  JOIN hs h ON h.s = p.s AND h.w = p.w AND h.t = $t)""".stripMargin
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
       |  FROM lineitem),
       |edges AS (SELECT a.sk AS sa, b.sk AS sb
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $mco),
       |bidir AS (SELECT sa AS u, sb AS v FROM edges
       |  UNION ALL SELECT sb, sa FROM edges),
       |adj AS (SELECT u, list(v ORDER BY v) AS nbrs
       |  FROM bidir GROUP BY u),
       |grid AS (SELECT u AS s, w, t
       |  FROM adj, (SELECT unnest(range(0, $WalksPerNode)) AS w),
       |    (SELECT unnest(range(1, ${WalkLen + 1})) AS t)),
       |zs AS (SELECT s, w, t,
       |    CAST(CAST(s AS HUGEINT) * 131 + w * 17 + t AS HUGEINT) AS z
       |  FROM grid),
       |s1 AS (SELECT s, w, t, $z1 AS z1 FROM zs),
       |s2 AS (SELECT s, w, t, xor(z1, z1 // 1073741824) AS x1 FROM s1),
       |s3 AS (SELECT s, w, t, $m2 AS z2 FROM s2),
       |s4 AS (SELECT s, w, t, xor(z2, z2 // 134217728) AS x2 FROM s3),
       |s5 AS (SELECT s, w, t, $m3 AS z3 FROM s4),
       |s6 AS (SELECT s, w, t, xor(z3, z3 // 2147483648) AS m FROM s5),
       |hs AS (SELECT s, w, t,
       |    CASE WHEN m >= 9223372036854775808 THEN m - 18446744073709551616
       |         ELSE m END AS x
       |  FROM s6),
       |w0 AS (SELECT u AS s, w, CAST(u AS VARCHAR) AS path, u AS cur
       |  FROM adj, (SELECT unnest(range(0, $WalksPerNode)) AS w)),
       |${hop("w0", "w1", 1)},
       |${hop("w1", "w2", 2)},
       |${hop("w2", "w3", 3)},
       |${hop("w3", "w4", 4)}
       |SELECT s, CAST(w AS BIGINT) AS w, path,
       |  CAST(len(list_distinct(string_split(path, '-'))) AS BIGINT)
       |    AS n_distinct
       |FROM w4 ORDER BY s, w""".stripMargin
  }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_deepwalk_corpus" -> (q167_deepwalk_corpus _))

  val oracle: Map[String, String] = Map(
    "q167_deepwalk_corpus" -> walksOracle)
}
