package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q219: the relational HLL replays register-for-register against a
  * driver-side reference sketch, including the estimate arithmetic and
  * the small-range correction branch. */
class HllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.text.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sm64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def reference(keys: Array[Long])
      : (Array[Long], Long, Long, Long, Long) = {
    val m = 256
    val regs = Array.fill(m)(0L)
    for (k <- keys) {
      val h = sm64(k)
      val bucket = (((h % m) + m) % m).toInt
      val w = h >>> 8
      val rho = if (w == 0L) 57L else 57L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val vZero = regs.count(_ == 0L).toLong
    val s = regs.map(mj => BigInt(1) << (57 - mj).toInt).sum
    val alphaMicro = math.round(1e6 * 0.7213 / (1.0 + 1.079 / m))
    val numer = BigInt(alphaMicro) * m * m * (BigInt(1) << 57)
    val rawEst = (numer / (BigInt(1000000) * s)).toLong
    val lnM = math.round(1e6 * graft.functions.SharedLnUtil.ln(m.toLong))
    val est = if (vZero > 0 && rawEst * 2 <= 5L * m)
      (m * (lnM - math.round(1e6 * graft.functions.SharedLnUtil.ln(vZero)))) /
        1000000L
    else rawEst
    val sig = regs.zipWithIndex.map { case (mj, b) => b * 64L + mj }
      .reduce(_ ^ _)
    (regs, vZero, rawEst, est, sig)
  }

  test("q219 HLL: registers, signature, estimate and correction branch " +
    "replay exactly; error stays inside the published RSE envelope") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey").collect()
    val cols = Map(
      "orderkey" -> li.map(_.getLong(0)),
      "partkey" -> li.map(_.getLong(1)),
      "suppkey" -> li.map(_.getLong(2)))
    val out = Hll.q219_hll_distinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.keySet == cols.keySet)
    for ((name, keys) <- cols) {
      val (_, vZero, rawEst, est, sig) = reference(keys)
      val (gV, gSig, gRaw, gEst, gExact, gErr) = out(name)
      val exact = keys.distinct.length.toLong
      assert(gV == vZero, s"$name zero-register count")
      assert(gSig == sig, s"$name register signature")
      assert(gRaw == rawEst, s"$name raw estimate")
      assert(gEst == est, s"$name corrected estimate")
      assert(gExact == exact, s"$name exact distinct")
      assert(gErr == 1000L * math.abs(est - exact) / exact)
      // m=256 → RSE ≈ 1.04/√256 = 6.5%; 4σ envelope (both corrections
      // applied) — a failure here means broken arithmetic, not variance
      assert(gErr <= 260, s"$name error $gErr permille out of envelope")
    }
    // the small-cardinality target must actually exercise the
    // linear-counting branch at this SF (suppliers ≪ m)
    val (sV, _, sRaw, _, _, _) = out("suppkey")
    assert(sV > 0 && sRaw * 2 <= 5L * 256,
      "suppkey should take the linear-counting branch")
  }

  test("q226 merge contract: sharded max-merge equals the direct pass; " +
    "both flags gate true") {
    val rows = Hll.q226_hll_merge(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    assert(rows.map(_._1).sorted.toSeq == Seq("direct", "merged"))
    val Seq(d, m) = rows.sortBy(_._1).toSeq
    assert(d._2 == m._2 && d._3 == m._3 && d._4 == m._4 && d._5 == m._5,
      "merged sketch must equal the direct sketch field-for-field")
    assert(rows.forall(r => r._6 && r._7), "contract flags must be true")
    // driver reference off the sharded fold proves it is the same sketch
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    for ((_, id) <- docs) {
      val h = sm64(id)
      val b = ((h % 256) + 256) % 256
      val w = h >>> 8
      val rho = if (w == 0L) 57L
        else 57L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      ref(b) = math.max(ref.getOrElse(b, 0L), rho)
    }
    val sig = (0L until 256L)
      .map(b => b * 64L + ref.getOrElse(b, 0L)).reduce(_ ^ _)
    assert(d._3 == sig, "register signature replay")
    val (vZero, raw, est) = Hll.estimate(ref.toMap)
    assert(d._2 == vZero && d._4 == raw && d._5 == est, "estimate replay")
  }

  test("q228 KMV set ops: bottom-k signatures, union-from-signatures and " +
    "inclusion-exclusion replay brutally") {
    val rows = Hll.q228_kmv_setops(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    def h60(x: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val k = 128
    val hMax = BigInt(1) << 60
    def estOf(hs: Seq[Long]): Long = {
      val sig = hs.distinct.sorted.take(k)
      if (sig.length < k) sig.length.toLong
      else ((BigInt(k - 1) * hMax) / BigInt(sig.max)).toLong
    }
    val byFlag = li.groupBy(_._1)
      .map { case (f, v) => f -> v.map(x => h60(x._2)).toSeq }
    val setsByFlag = li.groupBy(_._1)
      .map { case (f, v) => f -> v.map(_._2).toSet }
    for (((fa, fb), (estA, estB, estU, estI, exU, exI)) <- rows) {
      assert(estA == estOf(byFlag(fa)), s"($fa,$fb) est_a")
      assert(estB == estOf(byFlag(fb)), s"($fa,$fb) est_b")
      // union estimate must come from the SIGNATURES, not the base sets
      val sigA = byFlag(fa).distinct.sorted.take(k)
      val sigB = byFlag(fb).distinct.sorted.take(k)
      assert(estU == estOf(sigA ++ sigB), s"($fa,$fb) est_union")
      assert(estI == estA + estB - estU, s"($fa,$fb) inclusion-exclusion")
      assert(exU == (setsByFlag(fa) ++ setsByFlag(fb)).size.toLong)
      assert(exI == (setsByFlag(fa) & setsByFlag(fb)).size.toLong)
      // k=128 -> RSE ~ 8.9%; 4-sigma envelope on the union
      assert(math.abs(estU - exU) * 1000 <= 360L * exU,
        s"($fa,$fb) union error outside the envelope")
    }
    assert(rows.keySet == Set(("A", "N"), ("A", "R"), ("N", "R")))
  }
}
