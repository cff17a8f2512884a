package graft.rel

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q148: the H-index iteration must land on TRUE peeling coreness
  * (Batagelj-Zaversnik semantics, brute-forced by repeated k-core
  * removal) and must report convergence. */
class CorenessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** True coreness by definition: max k such that v survives in the
    * k-core (repeatedly delete nodes with degree < k). */
  private def peelCoreness(adj0: Map[Long, Set[Long]]): Map[Long, Long] = {
    val core = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val maxDeg = adj0.values.map(_.size).max
    (1 to maxDeg).foreach { k =>
      var adj = adj0
      var changed = true
      while (changed) {
        val drop = adj.collect { case (v, ns) if ns.size < k => v }.toSet
        changed = drop.nonEmpty
        if (changed) adj = (adj -- drop).map { case (v, ns) =>
          v -> (ns -- drop)
        }
      }
      adj.keys.foreach(v => core(v) = k.toLong)
    }
    core.toMap
  }

  test("H-index fixpoint equals peeling coreness; convergence reported") {
    // the same thresholded edge set the query builds
    val edges = Triangles.significantEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val expected = peelCoreness(adj)

    val out = Coreness.q148_coreness(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(4)), "must report convergence")
    out.foreach { r =>
      val (n, degree, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c == expected(n), s"node $n coreness")
      assert(degree == adj(n).size)
      assert(c <= degree, "coreness never exceeds degree")
    }
  }

  test("hand-built graph: clique + pendant path peels correctly") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus path 4-5-6: coreness 3 for the clique, 1 for
    // the path
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val adj = edges.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val expected = peelCoreness(adj)
    assert(expected == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 1L), "peeling reference is itself correct")
    // the distributed rounds, driven directly on the tiny adjacency
    val adjDf = edges.flatMap(p => Seq(p, p.swap))
      .toDF("u", "v")
    var c = adjDf.groupBy(col("u").as("n"))
      .agg(count(lit(1)).as("c"))
    (1 to 6).foreach { _ => c = CorenessTestHook.round(adjDf, c) }
    val got = c.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("convergence probe: K4+path exits early, values equal peeling") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val adjDf = edges.flatMap(p => Seq(p, p.swap)).toDF("u", "v")
    val c0 = adjDf.groupBy(col("u").as("n")).agg(count(lit(1)).as("c"))
    // round 1 already lands on the coreness; the round-2 probe detects it
    val (c, rounds, converged) = Coreness.hIndexWithRounds(adjDf, c0, 6)
    assert(converged, "fixpoint must be detected")
    assert(rounds < 6, s"expected early exit, ran $rounds rounds")
    val got = c.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 1L))
  }

  test("convergence probe: starved round budget reports NOT converged") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val adjDf = edges.flatMap(p => Seq(p, p.swap)).toDF("u", "v")
    val c0 = adjDf.groupBy(col("u").as("n")).agg(count(lit(1)).as("c"))
    // c1 ≠ c0 (degrees are not the coreness here), so one round cannot
    // confirm a fixpoint — the late case must gate loudly, not lie
    val (_, rounds, converged) = Coreness.hIndexWithRounds(adjDf, c0, 1)
    assert(!converged, "one round cannot certify this graph")
    assert(rounds == 1)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
  private def count(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.count(c)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)
}

/** Exposes the per-round kernel for the hand-built-graph case. */
private[rel] object CorenessTestHook {
  def round(adj: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Coreness.hRoundForTest(adj, c)
}
