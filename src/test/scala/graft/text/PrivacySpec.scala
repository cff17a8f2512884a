package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q200: the randomized-response release replays bit-exactly against a
  * driver-side splitmix64, the estimator identity holds, the epsilon
  * constant sits away from its rounding boundary, and the mechanism is
  * near-unbiased on a planted-prevalence fixture. */
class PrivacySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val Salt = 42405L

  private def mix(i: Long): Long = { // splitmix64 — public-domain mixer
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("q200: per-source counts replay the mechanism bit-exactly") {
    val out = Privacy.q200_randomized_response(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(_._2).map { case (src, rows) =>
      var n = 0L; var rep = 0L; var t = 0L
      rows.foreach { case (id, _, lang) =>
        val fl = if (lang == "zh") 1L else 0L
        val h = mix(id ^ Salt)
        val reported = if ((h & 1L) == 1L) fl else (h >>> 1) & 1L
        n += 1; rep += reported; t += fl
      }
      src -> (n, rep, t)
    }
    assert(out.keySet == expected.keySet)
    expected.foreach { case (src, (n, rep, t)) =>
      val (on, orep, ot, estNum, estDen) = out(src)
      assert((on, orep, ot) == (n, rep, t), s"source $src")
      assert(estNum == 4 * rep - n, "estimator numerator identity")
      assert(estDen == 2 * n, "estimator denominator identity")
    }
  }

  test("q200: epsilon micro-nat constant is correct and boundary-safe") {
    val x = 1e6 * math.log(3.0)
    assert(math.round(x) == 1098612L)
    // the gated literal must sit well away from the .5 rounding edge
    assert(math.abs(x % 1.0 - 0.5) > 0.2)
  }

  test("q200: estimator is near-unbiased on a planted 20% prevalence") {
    // deterministic fixture: 20,000 ids, every 5th flagged (t = 4000)
    val docs = spark.range(20000L)
      .select(col("id").as("doc_id"), lit("fix").as("source"),
        when(col("id") % 5 === 0, 1L).otherwise(0L).as("fl"))
    val r = Privacy.rrRelease(docs).collect()
    assert(r.length == 1)
    val (n, t, estNum) = (r(0).getLong(1), r(0).getLong(3), r(0).getLong(4))
    assert(n == 20000L && t == 4000L)
    // est = 2R − n/2, so Var(est) = 4·Var(R) = 4·n·(3/16) = 3n/4 →
    // σ ≈ 122.5 at n = 20k. |est − t| within 3σ certifies the noise is
    // centered (measured 2.3σ) — the draw is deterministic, never flaky.
    val est = estNum / 2.0
    assert(math.abs(est - t) <= 3 * math.sqrt(3.0 * n / 4.0),
      s"est $est vs true $t")
  }
}
