package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** HDR log-bucketed quantile sketch (q130): pure-kernel properties,
  * SQL/kernel bucketing parity, and the end-to-end rank contract. */
class HdrSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("bucket bounds contain v with relative width <= 2^-4") {
    val rnd = new Random(7)
    val vs = Seq.fill(5000)(1L + math.abs(rnd.nextLong()) % (1L << 50)) ++
      (1L to 64L) ++ Seq(Long.MaxValue, Long.MaxValue - 1)
    vs.foreach { v =>
      val (_, _, lo, hi) = Hdr.bucket(v)
      assert(lo <= v && v <= hi, s"v=$v not in [$lo,$hi]")
      assert((hi - lo) * 16 <= lo || hi == lo,
        s"v=$v bucket [$lo,$hi] too wide")
    }
  }

  test("bucketing is a partition: buckets never overlap, union covers") {
    // consecutive values either share a bucket or hit adjacent buckets
    (1L to 4096L).foreach { v =>
      val (_, _, lo1, hi1) = Hdr.bucket(v)
      val (_, _, lo2, _) = Hdr.bucket(v + 1)
      assert(lo2 == lo1 || lo2 == hi1 + 1,
        s"gap/overlap between buckets of $v and ${v + 1}")
    }
  }

  test("SQL bucketing (bin/shiftleft/div) equals the pure kernel") {
    import spark.implicits._
    val rnd = new Random(13)
    val vs = Seq.fill(2000)(1L + math.abs(rnd.nextLong()) % (1L << 40))
    val rows = vs.toDF("v")
      .withColumn("e", length(expr("bin(v)")))
      .withColumn("shift", greatest(col("e") - lit(5), lit(0)).cast("int"))
      .withColumn("sub", expr("v div shiftleft(1L, shift)"))
      .withColumn("lo", expr("sub * shiftleft(1L, shift)"))
      .withColumn("hi", expr("(sub + 1) * shiftleft(1L, shift) - 1L"))
      .select("v", "shift", "sub", "lo", "hi").collect()
    rows.foreach { r =>
      val (sh, sub, lo, hi) = Hdr.bucket(r.getLong(0))
      assert(r.getInt(1) == sh && r.getLong(2) == sub &&
        r.getLong(3) == lo && r.getLong(4) == hi, s"v=${r.getLong(0)}")
    }
  }

  test("q130 end-to-end: every phi row satisfies both contracts") {
    val rows = Hdr.q130_hdr_quantiles(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_bucket"), r.toString)
      assert(r.getAs[Boolean]("rel_err_ok"), r.toString)
      assert(r.getAs[Long]("est_lo") <= r.getAs[Long]("exact_v") &&
        r.getAs[Long]("exact_v") <= r.getAs[Long]("est_hi"))
    }
  }

  test("histogram merge = count addition (order independence)") {
    // two halves bucketed independently then merged must equal the
    // whole-corpus histogram — the property a multi-executor rollup needs
    val rnd = new Random(99)
    val vs = Seq.fill(10000)(1L + math.abs(rnd.nextLong()) % (1L << 30))
    def histo(xs: Seq[Long]): Map[(Int, Long), Long] =
      xs.groupBy { v => val b = Hdr.bucket(v); (b._1, b._2) }
        .map { case (k, g) => k -> g.size.toLong }
    val (a, b) = vs.splitAt(4321)
    val merged = (histo(a).toSeq ++ histo(b).toSeq)
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    assert(merged == histo(vs))
  }
}
