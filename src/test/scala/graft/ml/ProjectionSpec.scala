package graft.ml

import graft.rel.SplitMix64Kernel
import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q160: the JL sign matrix's structural sanity and the distortion
  * audit's contracts on the smallest fixture (the oracle gates the same
  * rows bit-for-bit at sf0.01). */
class ProjectionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("sign matrix: ±1 only, rows distinct, no degenerate row") {
    val signs = (0 until 32).map(r => (0 until 64).map(j =>
      if ((SplitMix64Kernel.mix(r * 64L + j) & 1L) == 0L) 1.0 else -1.0))
    assert(signs.flatten.forall(s => s == 1.0 || s == -1.0))
    assert(signs.distinct.size == 32, "duplicate projection rows")
    // a row summing to ±64 would be a constant direction, not a random one;
    // splitmix64 parity keeps every row's walk well inside ±3σ (σ = 8)
    assert(signs.forall(r => math.abs(r.sum) <= 24.0))
  }

  test("distortion audit: means near 1, spread strictly shrinks with k") {
    val rows = Projection.q160_jl_projection(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Long]("n_pairs") == 50L))
    assert(rows.forall(_.getAs[Boolean]("mean_ok")))
    assert(rows.forall(_.getAs[Boolean]("tighter_ok")))
    // stronger than the gated contract: the concentration is strictly
    // monotone on this panel, not merely no-worse-than-k=4
    val spreads = rows.sortBy(_.getAs[Int]("k")).map(_.getAs[Long]("spread_micro"))
    assert(spreads.zip(spreads.tail).forall { case (a, b) => b < a },
      s"spread not strictly decreasing: ${spreads.mkString(",")}")
  }
}
