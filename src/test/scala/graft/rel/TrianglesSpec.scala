package graft.rel

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q145 oriented triangle counting vs an in-memory brute-force twin. */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("oriented count equals brute force; coefficients exact") {
    // brute-force twin: same thresholded edge set, O(n^3) enumeration
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val co = li.groupBy(_._1).values.flatMap { g =>
      val sks = g.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- i + 1 until sks.size)
        yield (sks(i), sks(j))
    }.groupBy(identity)
      // NB: Map.collect over (pair, os) => pair would REBUILD a Map keyed
      // by pair._1 and silently collapse edges — keep the key set instead
      .filter { case (_, os) => os.size >= Triangles.MinCoOrders }
      .keySet
    val adj = co.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    var expectedTotal = 0L
    val perNode = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size
      if adj(nodes(i))(nodes(j))
      k <- j + 1 until nodes.size
      if adj(nodes(i))(nodes(k)) && adj(nodes(j))(nodes(k))
    } {
      expectedTotal += 1
      Seq(i, j, k).foreach(x => perNode(nodes(x)) += 1)
    }
    assert(expectedTotal > 0, "fixture must contain triangles")

    val out = Triangles.q145_triangle_count(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(5) == expectedTotal, "total triangle count")
    out.foreach { r =>
      val (n, degree, tri, coeff) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tri == perNode(n), s"node $n triangle count")
      assert(degree == adj(n).size, s"node $n degree")
      assert(coeff == 2000L * tri / (degree * (degree - 1)))
      assert(coeff <= 1000L, "local clustering is a proper fraction")
    }
    // top-k ordering: descending by count, id tiebreak
    val ranked = out.map(r => (r.getInt(0), r.getLong(3), r.getLong(1)))
    ranked.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._3 < b._3))
    }
  }
}
