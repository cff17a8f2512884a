package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** int8 quantization accuracy contract: element error ≤ scale/2 implies a
  * bounded dot/cosine error, and the quantized ANN ranking must agree with
  * the exact one at recall@5 on the fixture embeddings. */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("quantized dot approximates the exact dot within the scale bound") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.3, -1.2, 0.8, 2.5)),
      (2L, Array(-0.7, 0.1, 1.9, -0.4)),
      (3L, Array(0.0, 0.0, 0.0, 0.0)),
      (4L, Array(4.0, -3.0, 2.0, -1.0))).toDF("vec_id", "emb")
    val q = Quantize.quantized(vecs)
      .select(col("vec_id"), col("emb"), col("sc"), col("q"))
    val pairs = q.as("a").crossJoin(q.as("b"))
      .select(
        VecFunctions.dot_d(col("a.emb"), col("b.emb")).as("exact"),
        (Quantize.i8_dot(col("a.q"), col("b.q")).cast("double")
          * col("a.sc") * col("b.sc")).as("approx"),
        col("a.sc").as("sa"), col("b.sc").as("sb"),
        size(col("a.emb")).as("n"))
      .collect()
    pairs.foreach { r =>
      val (exact, approx) = (r.getDouble(0), r.getDouble(1))
      val (sa, sb, n) = (r.getDouble(2), r.getDouble(3), r.getInt(4))
      // |Δdot| ≤ n·(sa/2·max_b + sb/2·max_a + sa·sb/4); max ≤ 127·s
      val bound = n * (sa / 2 * 127 * sb + sb / 2 * 127 * sa + sa * sb / 4)
      assert(math.abs(exact - approx) <= bound + 1e-12,
        s"dot error ${math.abs(exact - approx)} above bound $bound")
    }
  }

  test("zero vector quantizes cleanly (scale 1, all-zero bytes)") {
    import spark.implicits._
    val r = Quantize.quantized(
      Seq((1L, Array(0.0, 0.0))).toDF("vec_id", "emb"))
      .select(col("sc"), col("q"), col("qnorm")).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getAs[Array[Byte]](1).forall(_ == 0))
    assert(r.getDouble(2) == 0.0)
  }

  test("recall@5 vs the exact brute-force ranking") {
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().toSeq
        .groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val exact = topSets(Similarity.q19_similarity_topk(spark, dir))
    val quant = topSets(Quantize.m_ann_quantized(spark, dir))
    assert(quant.keySet == exact.keySet)
    val recalls = exact.map { case (q, ex) =>
      quant(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@5 $mean below 0.8: $recalls")
  }

  test("deterministic across runs") {
    val a = Quantize.m_ann_quantized(spark, dir).collect().toSeq
    val b = Quantize.m_ann_quantized(spark, dir).collect().toSeq
    assert(a == b)
  }
}
