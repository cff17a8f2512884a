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
}
