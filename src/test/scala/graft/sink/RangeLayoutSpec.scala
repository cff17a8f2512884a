package graft.sink

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q163/q163b: the layout advisor's structural gates and the
  * advisor→writer loop (oracle hash-gates the full derivation at
  * sf0.01; these pin the loop and the balance regime). */
class RangeLayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("advisor: 7 sorted boundaries, buckets tile the corpus") {
    val bnds = RangeLayout.recommendedBoundaries(spark, "/root/testdata/sf0.01")
    assert(bnds.length == 7)
    assert(bnds.zip(bnds.tail).forall { case (a, b) => a <= b })
    val rows = RangeLayout.q163_range_boundaries(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.map(_.getAs[Int]("bucket")).toSeq == (0 until 8))
    assert(rows.forall(_.getAs[Boolean]("tiles_ok")))
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      rows.head.getAs[Long]("n_total"))
  }

  test("advisor: equi-depth balance holds where the sample is honest") {
    // at sf0.01 the 1/64 sample has ~150 points for 8 buckets — shares
    // measured 750–1251‰; the [600, 1400] bound leaves real margin while
    // still failing a broken boundary derivation outright
    val shares = RangeLayout.q163_range_boundaries(spark, "/root/testdata/sf0.01")
      .collect().map(_.getAs[Long]("share_permille"))
    assert(shares.forall(s => s >= 600 && s <= 1400),
      s"unbalanced shares: ${shares.mkString(",")}")
  }

  test("advised writer: physical layout matches the advisor's counts") {
    val rows = RangeLayout.q163b_advised_layout(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("matches_advice")))
    assert(rows.forall(_.getAs[Long]("n_files") == 1L),
      "each range bucket must land in exactly one file")
  }
}
