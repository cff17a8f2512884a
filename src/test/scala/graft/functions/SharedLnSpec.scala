package graft.functions

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine-neutral shared ln (the r18 knife-edge retirement).
  *
  * The cross-ENGINE half of the certification (DuckDB evaluating
  * [[SharedLn.oracleLn]]'s generated SQL bit-for-bit against
  * [[SharedLnUtil.ln]]) cannot run here — DuckDB is driver-side only —
  * and was certified offline over a 61,744-value sweep spanning
  * 1..2⁶³−1 including every 2ᵏ±1 (0 bit mismatches; SCALING.md r18),
  * and is re-certified against real data by every q250/q260/q263
  * oracle gate. This spec pins the JVM half: accuracy, the quantized
  * contract values, edge behavior, and codegen/interpreted agreement.
  */
class SharedLnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ulpDiff(a: Double, b: Double): Long =
    math.abs(java.lang.Double.doubleToLongBits(a) -
      java.lang.Double.doubleToLongBits(b))

  test("shared ln stays within 1 ulp of Math.log across magnitudes") {
    val rnd = new java.util.Random(7)
    val ns = (1L to 5000L) ++
      (1 to 62).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1)) ++
      Seq(Long.MaxValue) ++
      (1 to 18).flatMap { d =>
        val lo = math.pow(10, d - 1).toLong
        (1 to 200).map(_ => lo + math.abs(rnd.nextLong()) %
          math.max(lo * 9, 1L))
      }
    ns.foreach { n =>
      assert(ulpDiff(SharedLnUtil.ln(n), math.log(n.toDouble)) <= 1L,
        s"n=$n shared=${SharedLnUtil.ln(n)} libm=${math.log(n.toDouble)}")
    }
  }

  test("quantized micro-nat contract values") {
    def L(n: Long): Long = math.round(1e6 * SharedLnUtil.ln(n))
    assert(L(1L) == 0L)
    assert(L(2L) == 693147L)
    assert(L(1000000L) == 13815511L)
    // monotone non-decreasing over a dense prefix: the quantization
    // can repeat but never invert
    var prev = Long.MinValue
    (1L to 50000L).foreach { n =>
      val v = L(n); assert(v >= prev, s"L($n)=$v < L(${n - 1})=$prev")
      prev = v
    }
  }

  test("codegen path equals the static kernel; <1 yields NULL") {
    import spark.implicits._
    val rnd = new java.util.Random(13)
    val ns = (0L to 64L) ++ (1 to 500).map(_ => 1L + math.abs(rnd.nextLong()) % (Long.MaxValue - 1))
    val rows = ns.toDF("n")
      .select(col("n"), SharedLn.ln(col("n")).as("v")).collect()
    rows.foreach { r =>
      val n = r.getLong(0)
      if (n < 1L) assert(r.isNullAt(1), s"ln_shared($n) should be NULL")
      else assert(r.getDouble(1) == SharedLnUtil.ln(n),
        s"codegen diverged at $n")
    }
  }

  test("lnMicro column matches math.round of the kernel") {
    import spark.implicits._
    val rows = (1L to 2000L).toDF("n")
      .select(col("n"), SharedLn.lnMicro(col("n")).as("m")).collect()
    rows.foreach { r =>
      val n = r.getLong(0)
      assert(r.getLong(1) == math.round(1e6 * SharedLnUtil.ln(n)),
        s"lnMicro($n)")
    }
  }

  test("generated oracle SQL embeds the exact shared coefficients") {
    val sql = SharedLn.oracleLn("t", Seq("k"), Seq(("lnv", "n")))
    // every coefficient literal must round-trip to the JVM double, and
    // must be matched IN ITS HORNER CONTEXT — a bare contains() is
    // trivially satisfied for C(0)="1.0" by unrelated text like
    // "(__y - 1.0)" (ADVICE r18). C(13) seeds the innermost product;
    // C(0..12) each appear as the added constant of one Horner layer.
    SharedLnUtil.C.zipWithIndex.foreach { case (c, k) =>
      val ctx = if (k == 13) s"(${c.toString} * __s_" else s" + ${c.toString})"
      assert(sql.contains(ctx), s"missing coefficient $c in context '$ctx'")
      assert(c.toString.toDouble == c)
    }
    assert(sql.contains(SharedLnUtil.Ln2.toString))
    // the exponent ladder covers 2^1..2^62
    assert(sql.contains((1L << 62).toString))
    assert(!sql.contains("ln(")) // no libm anywhere
  }

  test("all four integral widths pass analysis; fractional still fails (ADVICE r19)") {
    import spark.implicits._
    val df = Seq((1.toByte, 2.toShort, 3, 4L, 5.0))
      .toDF("b", "s", "i", "l", "d")
    // byte/short/int widen losslessly to long: every integral column
    // must analyze AND evaluate through both paths
    Seq("b", "s", "i", "l").foreach { c =>
      val got = df.select(SharedLn.ln(col(c))).head().getDouble(0)
      val n = c match { case "b" => 1L; case "s" => 2L; case "i" => 3L; case _ => 4L }
      assert(got == SharedLnUtil.ln(n), s"column $c")
    }
    // a DOUBLE child must still fail at analysis with the typed message
    val err = intercept[Exception](df.select(SharedLn.ln(col("d"))).head())
    assert(err.getMessage.contains("ln_shared requires an integral argument"),
      err.getMessage)
  }
}
