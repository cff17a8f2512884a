package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q151: the S-curve math against a direct double-precision recompute,
  * plus the planner's structural properties. */
class LshPlannerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("areas equal the closed-form recompute; banding structure holds") {
    val out = LshPlanner.q151_lsh_planner(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.length == 6)
    def pMicro(b: Int, r: Int, sPermille: Long): Long =
      math.round(1e6 * (1.0 -
        math.pow(1.0 - math.pow(sPermille / 1000.0, r), b)))
    out.foreach { case (b, r, sStar, fp, fn, loss, _) =>
      val grid = 50L until 1000L by 50L
      assert(fp == grid.filter(_ < 700).map(pMicro(b, r, _)).sum)
      assert(fn == grid.filter(_ >= 700).map(s => 1000000L - pMicro(b, r, s)).sum)
      assert(loss == fp + fn)
      assert(sStar ==
        math.round(1e6 * math.pow(1.0 / b, 1.0 / r)))
      // the S-curve is monotone in s
      val ps = grid.map(pMicro(b, r, _))
      assert(ps.zip(ps.tail).forall { case (a, c) => a <= c })
    }
    // exactly the min-loss configs are flagged best
    val minLoss = out.map(_._6).min
    out.foreach { case (_, _, _, _, _, loss, best) =>
      assert(best == (loss == minLoss))
    }
    // more rows per band -> steeper curve -> higher threshold
    val byCfg = out.map(c => (c._1, c._2) -> c._3).toMap
    assert(byCfg((16, 16)) > byCfg((16, 8)),
      "threshold must rise with rows per band")
  }

  test("every integerized pow() value sits far from a .5 rounding boundary") {
    // round(1e6·x) gates a cross-library double (JVM Math.pow vs DuckDB
    // std::pow). pow is not required to be correctly rounded, but both
    // are faithful to ~1 ulp: a 1-ulp divergence at |x| ≤ 1 perturbs
    // 1e6·x by ~1e-10 — so the gate is platform-stable iff every grid
    // value's fractional part stays well clear of .5. Assert a 1e-4
    // margin (six orders above the worst credible divergence) for all
    // 6 configs × 19 grid points AND the 6 s_star values (round-14
    // advice item: this was shown for the ln-based micro-nat kernels
    // but never for these pow grids).
    val configs = Seq((8, 16), (16, 8), (32, 4), (64, 2), (16, 16), (32, 8))
    val grid = 50L until 1000L by 50L
    // distance of frac(1e6·x) from the round() decision boundary at .5
    def margin(x: Double): Double = math.abs((x * 1e6) % 1.0 - 0.5)
    for ((b, r) <- configs) {
      for (s <- grid) {
        val p = 1.0 - math.pow(1.0 - math.pow(s / 1000.0, r), b)
        assert(margin(p) > 1e-4,
          s"p(b=$b,r=$r,s=$s)=$p too close to a .5 boundary " +
            s"(margin ${margin(p)})")
      }
      val sStar = math.pow(1.0 / b, 1.0 / r)
      assert(margin(sStar) > 1e-4,
        s"s_star(b=$b,r=$r)=$sStar too close to a .5 boundary " +
          s"(margin ${margin(sStar)})")
    }
  }
}
