package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** q139 char-entropy kernel: golden closed forms, the explode-shape twin
  * (the oracle's formulation, run in Spark), and code-point counting. */
class EntropySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def h(s: String): Long =
    EntropyKernel.charEntropyUnat(UTF8String.fromString(s))

  private def iln(x: Long): Long = math.round(1e6 * math.log(x.toDouble))

  test("golden closed forms") {
    assert(h("") == 0L)
    assert(h("aaaa") == 0L, "single-symbol text has zero entropy")
    // two equiprobable symbols: exactly ln 2 micro-nats (693147)
    assert(h("ab") == 693147L)
    assert(h("aabb") == iln(4) - (2 * iln(2) + 2 * iln(2)) / 4)
    // uniform over 4 symbols: ln 4
    assert(h("abcd") == iln(4))
    // order invariance: entropy sees the histogram, not the sequence
    assert(h("aabbccdd") == h("abcdabcd"))
  }

  test("char_entropy_unat is registered as a SQL function") {
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT char_entropy_unat('ab') AS h")
      .head().getLong(0) == 693147L)
  }

  test("non-ASCII fallback counts CODE POINTS (astral chars included)") {
    // U+1F600 is two UTF-16 units but ONE code point: 2 distinct symbols
    val s = "a😀" // "a😀"
    assert(h(s) == 693147L, "two equiprobable code points = ln 2")
    assert(h("ééaa") == 693147L)
  }

  test("kernel equals the explode-shape twin (the oracle's formulation)") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val viaKernel = docs
      .select(col("doc_id"), Entropy.char_entropy_unat(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // explode → per-char counts → Σ cnt·iln(cnt), the oracle's exact shape
    val viaExplode = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= "") // guard against split's empty-tail artifacts
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("cnt") * expr("cast(round(1000000.0 * ln(cnt)) as long)"))
          .as("sm"))
      .select(col("doc_id"),
        (expr("cast(round(1000000.0 * ln(n)) as long)") - expr("sm div n"))
          .as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel.keySet == viaExplode.keySet)
    viaKernel.foreach { case (id, v) =>
      assert(v == viaExplode(id), s"doc $id kernel=$v explode=${viaExplode(id)}")
    }
  }

  test("q139 output: flags are threshold-consistent, one row per doc") {
    val out = Entropy.q139_char_entropy(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(out.length == nDocs)
    out.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) < 2800000L))
      assert(r.getLong(2) >= 0L)
    }
  }
}
