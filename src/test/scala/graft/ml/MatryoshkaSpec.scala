package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q158: structural invariants of the truncation-robustness audit. */
class MatryoshkaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("full dimension is its own truth; overlaps bounded; panel complete") {
    val rows = Similarity
      .q158_matryoshka_recall(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(8, 16, 32, 64))
    rows.foreach { case (d, nq, ov) =>
      assert(nq == 50L, s"dim $d query panel")
      assert(ov >= 0L && ov <= 1000L, s"dim $d overlap range")
    }
    val byDim = rows.map(r => r._1 -> r._3).toMap
    assert(byDim(64) == 1000L, "full dim compared to itself is exact")
    // truncation must retain SOME signal well above chance: random top-3
    // of ~500 neighbors overlaps the truth ~6/1000 of the time
    assert(byDim(32) > 100L, s"32-dim overlap ${byDim(32)} at chance level")
  }
}
