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

  private def iln(x: Long): Long = math.round(1e6 * graft.functions.SharedLnUtil.ln(x))

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

  test("q271 Simpson: unbiased repeat-probability replays brutally; " +
    "inverse-Simpson bounds against the type count") {
    val sf = "/root/testdata/sf0.001"
    val rows = Entropy.q271_simpson_diversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.nonEmpty)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(r => r.getString(1).trim.split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val byLang = toks.groupBy(_._1)
    assert(rows.map(_._1).toSet == byLang.keySet)
    for ((lang, nTok, nTypes, simp, gini, eff) <- rows) {
      val counts = byLang(lang).map(_._2).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      val n = byLang(lang).length.toLong
      assert(nTok == n && nTypes == counts.size.toLong, s"$lang totals")
      val rep2 = counts.values.map(c => c * (c - 1)).sum
      assert(simp == 1000000L * rep2 / (n * (n - 1)).max(1L))
      assert(gini == 1000000L - simp)
      assert(eff == 1000L * n * (n - 1) / rep2.max(1L))
      // repeat-probability in [0,1]; effective size at least 1 (the
      // unbiased estimator is NOT Jensen-bounded by the type count)
      assert(simp >= 0L && simp <= 1000000L, s"$lang simpson bounds")
      assert(eff >= 1000L, s"$lang eff")
    }
  }
}
