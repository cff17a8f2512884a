package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** q178-q180 integer k-means: kernel goldens, HOF-twin parity, cluster
  * partition/quota invariants, and Lloyd improvement over the seeds. */
class ClusterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("sqdistL golden values and truncation semantics") {
    def arr(xs: Long*) = ArrayData.toArrayData(xs.toArray)
    assert(ClusterUtil.sqdistL(arr(), arr()) == 0L)
    assert(ClusterUtil.sqdistL(arr(3L), arr(7L)) == 16L)
    assert(ClusterUtil.sqdistL(arr(1L, -2L, 3L), arr(-1L, 2L, 3L)) == 20L)
    // shorter side truncates (never happens in-plan: fixed 64 dims)
    assert(ClusterUtil.sqdistL(arr(5L, 100L), arr(5L)) == 0L)
  }

  test("native kernel matches the interpreted zip_with/aggregate twin") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * lit(1000000.0), 0).cast("long")).as("xu"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("xu").as("c")).crossJoin(e.limit(50))
    val mism = q.select(
        Cluster.l2_sqdist_l(col("xu"), col("c")).as("native"),
        aggregate(zip_with(col("xu"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mism == 0L)
  }

  test("clusters partition the collection and quotas bind (q179/q180)") {
    val rep = Cluster.q179_cluster_report(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rep.map(_.getLong(1)).sum == total)
    assert(rep.forall(_.getLong(2) >= 0L), "inertia non-negative")
    val quota = Cluster.q180_cluster_balanced_sample(spark, sf)
      .groupBy("cid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rep.foreach { r: Row =>
      val (cid, n) = (r.getLong(0), r.getLong(1))
      assert(quota.getOrElse(cid, 0L) == math.min(32L, n),
        s"cluster $cid quota")
    }
  }

  test("centroids stay inside the micro-unit envelope (q178)") {
    val cent = Cluster.q178_kmeans_centroids(spark, sf)
    val Row(lo: Long, hi: Long) = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .select(explode(col("embedding").cast("array<double>")).as("x"))
      .select(round(col("x") * lit(1000000.0), 0).cast("long").as("u"))
      .agg(min(col("u")), max(col("u"))).head()
    val bad = cent.filter(col("c_u") < lo || col("c_u") > hi).count()
    assert(bad == 0L, "every centroid coordinate is a convex-ish combo")
    assert(cent.count() == 4L * 64L)
  }

  test("three Lloyd rounds improve on the seed assignment") {
    import org.apache.spark.sql.DataFrame
    def inertia(cent: DataFrame): Long = {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            x => round(x * lit(1000000.0), 0).cast("long")).as("xu"))
      e.crossJoin(broadcast(cent.select(col("cid"), col("c"))))
        .select(col("vec_id"),
          (Cluster.l2_sqdist_l(col("xu"), col("c")) * lit(4L) + col("cid"))
            .as("pk"))
        .groupBy(col("vec_id")).agg(min(col("pk")).as("packed"))
        .selectExpr("sum(packed div 4) AS i").head().getLong(0)
    }
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * lit(1000000.0), 0).cast("long")).as("xu"))
    val seeds = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("xu").as("c"))
    val fit = Cluster.kmeans(spark, sf)
    assert(inertia(fit) <= inertia(seeds),
      "fitted centroids can't be worse than the raw seeds")
  }

  test("q254 Davies-Bouldin: R ratios replay from the fitted model; " +
    "index is the mean of per-cluster maxima") {
    val rows = Cluster.q254_davies_bouldin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.nonEmpty)
    // rebuild (a, n, centroid) per cluster from the gated q178/q179
    // surfaces + raw embeddings
    val cent = Cluster.q178_kmeans_centroids(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toIndexedSeq)
      .toMap
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * 1000000.0) AS LONG)) AS xu")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
    def l1(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * (x - y) }.sum
    val assignments = embs.map { case (id, xu) =>
      val cid = cent.keys.toSeq.sorted
        .minBy(c => (sq(xu, cent(c)), c))
      (id, cid, xu)
    }
    val byC = assignments.groupBy(_._2)
    val scat = byC.map { case (c, ms) =>
      c -> (ms.map(m => l1(m._3, cent(c))).sum, ms.length.toLong)
    }
    val cids = scat.keys.toSeq.sorted
    val rExp = cids.map { i =>
      val (ai, ni) = scat(i)
      val cand = cids.filter(_ != i).map { j =>
        val (aj, nj) = scat(j)
        val mij = math.max(l1(cent(i), cent(j)), 1L)
        val r = (BigInt(1000000) * (BigInt(ai) * nj + BigInt(aj) * ni) /
          (BigInt(ni) * nj * mij)).toLong
        (r, j)
      }
      val best = cand.maxBy { case (r, j) => (r, -j) }
      i -> best
    }.toMap
    val dbExp = rExp.values.map(_._1).sum / cids.length
    for ((cid, nm, a, nearest, rMax, db) <- rows) {
      assert(nm == scat(cid)._2, s"members $cid")
      assert(a == scat(cid)._1, s"scatter $cid")
      assert(rMax == rExp(cid)._1, s"R max $cid")
      assert(nearest == rExp(cid)._2, s"nearest $cid")
      assert(db == dbExp)
    }
  }

  test("q256 Calinski-Harabasz: SSW/SSB replay; ratio arithmetic; " +
    "variance decomposition sanity") {
    val r = Cluster.q256_calinski_harabasz(spark, sf).collect().head
    val (nv, k, ssw, ssb, ch) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val cent = Cluster.q178_kmeans_centroids(spark, sf).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toIndexedSeq)
      .toMap
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * 1000000.0) AS LONG)) AS xu")
      .collect().map(x => x.getSeq[Long](1).toIndexedSeq)
    assert(nv == embs.length.toLong)
    def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * (x - y) }.sum
    val asg = embs.map { xu =>
      val cid = cent.keys.toSeq.sorted.minBy(c => (sq(xu, cent(c)), c))
      (cid, xu)
    }
    val sswExp = asg.map { case (c, xu) => sq(xu, cent(c)) }.sum
    assert(BigInt(ssw) == sswExp, "SSW")
    val n = embs.length.toLong
    val dims = embs.head.length
    val gm = (0 until dims).map { i =>
      val su = embs.map(_(i)).sum
      val a = 2 * su + n
      val b = 2 * n
      (a - (((a % b) + b) % b)) / b
    }
    val nj = asg.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ssbExp = nj.keys.map { c =>
      BigInt(nj(c)) * sq(cent(c), gm)
    }.sum
    assert(BigInt(ssb) == ssbExp, "SSB")
    assert(k == nj.size.toLong)
    assert(BigInt(ch) ==
      BigInt(1000000) * ssbExp * (n - k) / (sswExp.max(BigInt(1)) * (k - 1)))
    assert(ch > 0L)
  }

  test("q261 silhouette: per-point L1 a/b replay off the gated fit; " +
    "milli means and negative counts agree") {
    val rows = Cluster.q261_silhouette(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.nonEmpty)
    val cent = Cluster.q178_kmeans_centroids(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toIndexedSeq)
      .toMap
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * 1000000.0) AS LONG)) AS xu")
      .collect().map(r => r.getSeq[Long](1).toIndexedSeq)
    def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * (x - y) }.sum
    def l1(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    val cids = cent.keys.toSeq.sorted
    // assignment stays the fit's L2 argmin; scoring is L1
    val sByC = embs.map { xu =>
      val own = cids.minBy(c => (sq(xu, cent(c)), c))
      val a = l1(xu, cent(own))
      val b = cids.filter(_ != own).map(c => l1(xu, cent(c))).min
      val sM = 1000L * (b - a) / math.max(math.max(a, b), 1L)
      (own, sM)
    }.groupBy(_._1)
    var sumAll = 0L
    var nAll = 0L
    for ((cid, nm, nNeg, silM, _) <- rows) {
      val mine = sByC(cid).map(_._2)
      assert(nm == mine.length.toLong, s"members $cid")
      assert(nNeg == mine.count(_ < 0).toLong, s"negatives $cid")
      assert(silM == mine.sum / nm, s"cluster mean $cid")
      assert(silM >= -1000L && silM <= 1000L, s"bounds $cid")
      sumAll += mine.sum
      nAll += nm
    }
    val overall = rows.head._5
    assert(rows.forall(_._5 == overall))
    assert(overall == sumAll / nAll, "overall mean over points")
  }
}
