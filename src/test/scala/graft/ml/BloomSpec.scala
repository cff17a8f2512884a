package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom build/probe correctness: the sketch path must never lose a hit
  * (no false negatives vs the exact broadcast join) and must keep its
  * overcount inside the configured false-positive budget. */
class BloomSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("no false negatives: every member probes true") {
    import spark.implicits._
    val members = (1 to 5000).map(i => s"member_$i")
    val df = members.toDF("v")
    val bytes = Bloom.buildFilter(df, col("v"), expectedItems = 5000)
    val misses = df.filter(!Bloom.bloom_contains(col("v"), bytes)).count()
    assert(misses == 0L, "a Bloom filter can never miss a real member")
  }

  test("false-positive rate on non-members stays near fpp") {
    import spark.implicits._
    val bytes = Bloom.buildFilter(
      (1 to 5000).map(i => s"member_$i").toDF("v"), col("v"),
      expectedItems = 5000, fpp = 0.01)
    val probes = (1 to 20000).map(i => s"other_$i").toDF("v")
    val fp = probes.filter(Bloom.bloom_contains(col("v"), bytes)).count()
    // 1% nominal; 3% leaves ~5-sigma headroom on 20k deterministic probes
    assert(fp < 600, s"fp rate ${fp / 20000.0} far above configured 0.01")
  }

  test("bloom decontamination bounds the exact hit counts from above") {
    val exact = graft.text.CorpusFilters.q52_contamination(spark, dir)
      .select(col("doc_id"), col("n_grams"), col("n_hit"))
    val bloom = Bloom.m_bloom_decontaminate(spark, dir)
    val joined = exact.join(bloom, Seq("doc_id"), "full")
      .select(col("doc_id"), col("n_hit"), col("n_hit_bloom"),
        bloom("n_grams").as("ng"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2),
        s"doc sets differ between exact and bloom paths: $r")
      assert(r.getLong(2) >= r.getLong(1),
        s"false negative at doc ${r.getLong(0)}: bloom ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    val over = joined.map(r => r.getLong(2) - r.getLong(1)).sum.toDouble
    val grams = joined.map(_.getLong(3)).sum.toDouble
    assert(over / grams < 0.05,
      s"overcount frac ${over / grams} breaks the fpp≈0.01 contract")
  }

  test("deterministic across runs") {
    val a = Bloom.m_bloom_decontaminate(spark, dir).collect().toSeq
    val b = Bloom.m_bloom_decontaminate(spark, dir).collect().toSeq
    assert(a == b)
  }
}
