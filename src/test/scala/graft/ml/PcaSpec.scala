package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q188 integer power iteration: exact brute-force replay of the whole
  * fit in driver-side Long arithmetic, plus normalization invariants. */
class PcaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def micro(): Array[Array[Long]] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * lit(1000000.0), 0).cast("long")).as("xu"))
      .orderBy(col("vec_id"))
      .collect().map(_.getSeq[Long](1).toArray)

  test("the fitted direction replays exactly in driver-side integers") {
    val xs = micro()
    val d = 64
    // second moment, shifted by 2^20 with floor semantics
    val c = Array.ofDim[Long](d, d)
    for (x <- xs; i <- 0 until d; j <- 0 until d) c(i)(j) += x(i) * x(j)
    val cs = c.map(_.map(v => Math.floorDiv(v, 1048576L)))
    def stepV(v: Array[Long]): (Array[Long], Array[Long]) = {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cs(i)(j) * v(j)).sum)
      val m = math.max(w.map(math.abs).max, 1L)
      (w, w.map(x => Math.floorDiv(1000L * x, m)))
    }
    var v = Array.fill(d)(1000L)
    for (_ <- 1 to 3) v = stepV(v)._2
    val (wf, vn) = stepV(v)
    val rows = Pca.q188_power_iteration(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == d)
    rows.foreach { r =>
      val dim = r.getLong(0).toInt
      assert(r.getLong(1) == v(dim), s"v[$dim]")
      assert(r.getLong(2) == wf(dim), s"w[$dim]")
    }
    // emitted alignment matches the driver-side cosine of (v, v_next)
    val svn = (0 until d).map(i => v(i) * vn(i)).sum.toDouble
    val svv = v.map(x => x * x).sum.toDouble
    val snn = vn.map(x => x * x).sum.toDouble
    val expect = math.rint(1e6 * svn / (math.sqrt(svv) * math.sqrt(snn))) / 1e6
    assert(rows.head.getDouble(3) == expect)
  }

  test("projection histogram tiles the collection within bin bounds (q189)") {
    val bins = Pca.q189_projection_histogram(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(bins.map(_.getLong(1)).sum == total)
    bins.foreach { r =>
      val (bin, lo, hi) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(lo >= bin * 1024 && hi < (bin + 1) * 1024,
        s"bin $bin bounds [$lo,$hi]")
      assert(r.getLong(2) >= r.getLong(1) * lo &&
        r.getLong(2) <= r.getLong(1) * hi, "mass within envelope")
    }
  }

  test("renormalization pins the max-abs component to exactly 1000") {
    val vs = Pca.q188_power_iteration(spark, sf).collect()
      .map(_.getLong(1))
    assert(vs.map(math.abs).max == 1000L)
    // convergence contract present and bounded
    val a = Pca.q188_power_iteration(spark, sf).head().getDouble(3)
    assert(a >= -1.0 && a <= 1.0)
  }

  test("q230 separability: centroids, scatters and Fisher permilles " +
    "replay brutally off the micro embeddings") {
    val rows = Pca.q230_source_separability(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(CAST(embedding AS array<double>), x -> CAST(round(x * 1000000.0, 0) AS LONG)) AS xu")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val src = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val bySrc = embs.groupBy { case (id, _) => src(id) }
    def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val cent = bySrc.map { case (sName, vs) =>
      sName -> (0 until 64).map(d =>
        floorDiv(vs.map(_._2(d)).sum, vs.length.toLong)).toArray
    }
    val within = bySrc.map { case (sName, vs) =>
      val c = cent(sName)
      val ssw = vs.map { case (_, x) =>
        (0 until 64).map(d => (x(d) - c(d)) * (x(d) - c(d))).sum
      }.sum
      sName -> ssw / vs.length
    }
    val srcs = bySrc.keys.toSeq.sorted
    for (i <- srcs.indices; j <- i + 1 until srcs.length) {
      val (sa, sb) = (srcs(i), srcs(j))
      val (bD2, wA, wB, sep) = rows((sa, sb))
      val expB = (0 until 64).map(d =>
        (cent(sa)(d) - cent(sb)(d)) * (cent(sa)(d) - cent(sb)(d))).sum
      assert(bD2 == expB, s"($sa,$sb) between scatter")
      assert(wA == within(sa) && wB == within(sb), s"($sa,$sb) within")
      assert(sep == 1000L * bD2 / math.max(wA + wB, 1L))
      assert(bD2 >= 0 && wA > 0 && wB > 0)
    }
    assert(rows.size == srcs.length * (srcs.length - 1) / 2)
  }
}
