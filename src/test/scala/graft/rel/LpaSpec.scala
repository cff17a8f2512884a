package graft.rel

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q166: the synchronous min-tie LPA semantics on handcrafted graphs
  * (the oracle hash-gates the 4-round state on the real graph). */
class LpaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def labelsOf(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (df, rounds) = Lpa.propagateLabels(edges.toDF("sa", "sb"))
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("two cliques with a bridge resolve to two communities") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),       // clique A
      (10L, 11L), (10L, 12L), (11L, 12L), // clique B
      (3L, 10L))                          // bridge
    val (lbl, _) = labelsOf(edges)
    assert(Set(lbl(1L), lbl(2L), lbl(3L)).size == 1, "clique A one label")
    assert(Set(lbl(10L), lbl(11L), lbl(12L)).size == 1, "clique B one label")
    assert(lbl(1L) != lbl(10L), "bridge must not merge the cliques")
  }

  test("a triangle stabilizes and probe-exits before the round cap") {
    val (lbl, rounds) = labelsOf(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(lbl.values.toSet.size == 1)
    assert(rounds < 4, s"expected early probe-exit, ran $rounds rounds")
  }

  test("q166 report: modularity identity and community accounting hold") {
    import org.apache.spark.sql.functions.col
    val rows = Lpa.q166_lpa_communities(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val m = rows.head.getAs[Long]("m_edges")
    rows.foreach { r =>
      // every community's d_c counts each intra edge twice plus the cut
      assert(r.getAs[Long]("d_c") >= 2 * r.getAs[Long]("e_c"))
      assert(r.getAs[Long]("e_c") <= m)
    }
    // Q·4m² is bounded by its definition: Q ≤ 1
    assert(rows.head.getAs[Long]("q_4m2") <= 4L * m * m)
  }
}
