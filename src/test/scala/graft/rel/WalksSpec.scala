package graft.rel

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q167: the hop rule against an independent sequential reference (the
  * oracle hash-gates the full corpus on the real graph). */
class WalksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("walks follow the (s,w,t)-hashed hop rule exactly") {
    val rows = Walks.q167_deepwalk_corpus(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // rebuild the graph's adjacency the same way and replay each walk
    // with a plain Scala loop
    val edges = Triangles.significantEdges(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).sorted.toIndexedSeq }
    def refWalk(s: Long, w: Long): String = {
      var cur = s
      val path = new StringBuilder(s.toString)
      (1 to 4).foreach { t =>
        val nbrs = adj(cur)
        val h = SplitMix64Kernel.mix(s * 131L + w * 17L + t)
        val idx = ((h % nbrs.length) + nbrs.length) % nbrs.length
        cur = nbrs(idx.toInt)
        path.append("-").append(cur)
      }
      path.toString
    }
    rows.foreach { r =>
      val (s, w, path) = (r.getLong(0), r.getLong(1), r.getString(2))
      assert(path == refWalk(s, w), s"walk ($s, $w)")
      assert(r.getLong(3) ==
        path.split("-").distinct.length.toLong)
    }
    // every node contributes exactly WalksPerNode walks
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length == 2))
  }
}
