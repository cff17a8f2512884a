package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q140 waterfill: the allocation must be the UNIQUE maximal uniform
  * level — checked against the definition directly, not a reimplementation. */
class BudgetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("waterfill: feasible, maximal, cap-consistent, epoch-bounded") {
    val out = Budget.q140_token_waterfill(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getLong(7))
    }
    assert(out.nonEmpty)
    val budget = out.head._4
    val level = out.head._5
    assert(out.forall(_._4 == budget) && out.forall(_._5 == level),
      "budget and level are corpus-global scalars")
    val caps = out.map(_._3)
    // feasibility: Σ alloc ≤ B, and alloc = min(cap, L) exactly
    assert(out.map(_._6).sum <= budget)
    out.foreach { case (_, _, cap, _, lv, alloc, sat, _) =>
      assert(alloc == math.min(cap, lv))
      assert(sat == (alloc == cap), "saturated ⇔ allocation hit the cap")
    }
    // maximality: raising the level by 1 must bust the budget
    // (unless every source is already saturated)
    if (!out.forall(_._7)) {
      val atPlus1 = caps.map(c => math.min(c, level + 1)).sum
      assert(atPlus1 > budget, "L is not maximal")
    }
    // epoch bound: allocation never exceeds MaxEpochs (cap = 3·tokens)
    out.foreach { case (_, tokens, cap, _, _, alloc, _, epochsMilli) =>
      assert(cap == tokens * 3)
      assert(epochsMilli <= 3000L)
      assert(epochsMilli == alloc * 1000 / tokens)
    }
  }

  test("q143 materialization: never overdraws the grant, prefix is tight") {
    val alloc = Budget.q140_token_waterfill(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    val out = Budget.q143_mixture_materialize(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9))
    }
    assert(out.map(_._1).toSet == alloc.keySet, "one row per source")
    out.foreach { case (src, nDocs, tokens, grant, fullEpochs, prefixDocs,
        prefixTokens, keptDocs, keptTokens, utilPermille) =>
      assert(grant == alloc(src), "materialization must use q140's grants")
      assert(keptTokens <= grant, s"$src overdraws: $keptTokens > $grant")
      assert(fullEpochs == grant / tokens)
      assert(prefixTokens <= grant % tokens, "prefix exceeds the remainder")
      assert(keptDocs == fullEpochs * nDocs + prefixDocs)
      assert(keptTokens == fullEpochs * tokens + prefixTokens)
      assert(utilPermille == keptTokens * 1000 / grant)
      // saturated sources (grant = 3·tokens) consume exactly 3 epochs
      if (grant == tokens * 3) {
        assert(fullEpochs == 3 && prefixDocs == 0 && keptTokens == grant)
      }
    }
  }

  test("q152 curriculum: budget respected, staircase holds, totals anchor") {
    val out = Budget.q152_curriculum_steps(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))
    }
    assert(out.length > 1, "fixture must span multiple steps")
    assert(out.forall(_._6), "staircase must hold everywhere")
    // steps are dense 0..K
    assert(out.map(_._1).toSeq == (0L until out.length))
    // every step except possibly the last lands within one doc of budget
    out.dropRight(1).foreach { case (step, _, tokens, _, maxLen, _) =>
      assert(tokens <= 2000L + maxLen, s"step $step grossly over budget")
      assert(tokens > 2000L - maxLen, s"step $step grossly under budget")
    }
    // totals anchor at the corpus
    val corpusTokens = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          Cleanse.tokens(org.apache.spark.sql.functions.col("text"))))
        .cast("long")).head().getLong(0)
    assert(out.map(_._3).sum == corpusTokens)
  }

  test("q156 packing: blocks tile the token stream exactly") {
    import org.apache.spark.sql.functions.{col, size}
    val out = Budget.q156_sequence_packing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // contiguous block ids from 0
    assert(out.map(_._1).toSeq == (0L until out.length.toLong))
    // every block but the last holds exactly BlockLen tokens; the last
    // holds the remainder
    val fills = out.map(_._3)
    assert(fills.init.forall(_ == 256L), "interior blocks must be full")
    assert(fills.last >= 1L && fills.last <= 256L)
    // the fills sum to the corpus token count (nothing lost or doubled)
    val docToks = graft.Tables.documents(spark, sf)
      .select(size(Cleanse.tokens(col("text"))).cast("long").as("tk"))
      .collect().map(_.getLong(0)).filter(_ > 0)
    assert(fills.sum == docToks.sum)
    // doc spans are monotone across blocks; boundary counts total docs
    assert(out.map(_._6).sum == docToks.length,
      "every doc starts in exactly one block")
    // consecutive blocks either share the boundary-spanning doc or butt
    // up exactly (a doc ending on the cut)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= a._5 && b._4 <= b._5, "doc span ordered within block")
      assert(b._4 == a._5 || b._4 == a._5 + 1,
        s"block ${b._1} first_doc ${b._4} vs prev last_doc ${a._5}")
    }
  }

  test("prefix sums distribute: corpus window is bucket-partitioned") {
    // the two-phase bucketed prefix sum must shuffle the CORPUS side by
    // bucket (parallel windows), leaving only the O(buckets) subtotal
    // frame to an unpartitioned window — never the corpus in one task
    Seq(Budget.q156_sequence_packing(spark, sf),
        Budget.q157_systematic_pps(spark, sf),
        Budget.q152_curriculum_steps(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(bkt"),
        s"corpus-side window must partition by bucket:\n${plan.take(1200)}")
    }
  }

  test("q157 systematic PPS: brute-force point placement agrees") {
    import org.apache.spark.sql.functions.{col, size}
    val k = 64L
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(Cleanse.tokens(col("text"))).cast("long").as("tk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0).sortBy(_._1)
    val w = docs.map(_._2).sum
    val points = (0L until k).map(j => ((2 * j + 1) * w) / (2 * k))
    // brute force: walk the cumulative line, drop each point into its doc
    var cum = 0L
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    docs.foreach { case (id, tk) =>
      val st = cum; cum += tk
      val h = points.count(p => p >= st && p < cum)
      if (h > 0) expected(id) = h.toLong
    }
    val got = Budget.q157_systematic_pps(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected.toMap, "closed-form f must equal point walk")
    assert(got.values.sum == k, "all points land exactly once")
  }

  test("q164 Neyman: seats sum to budget, optimality survives rounding") {
    import org.apache.spark.sql.functions.col
    val rows = Budget.q164_neyman_allocation(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("alloc_neyman")).sum == 1000L)
    assert(rows.map(_.getAs[Long]("alloc_prop")).sum == 1000L)
    assert(rows.forall(_.getAs[Boolean]("sum_ok")))
    assert(rows.forall(_.getAs[Boolean]("neyman_no_worse")))
    // Hamilton apportionment: every stratum within 1 seat of its real quota
    val wTot = rows.map(_.getAs[Long]("w_micro")).sum
    rows.foreach { r =>
      val exact = 1000.0 * r.getAs[Long]("w_micro") / wTot
      val seats = r.getAs[Long]("alloc_neyman")
      assert(math.abs(seats - exact) < 1.0,
        s"${r.getAs[String]("source")}: $seats vs quota $exact")
    }
  }

  test("q182 reservoir: size, weight positivity, priority ordering") {
    val rows = Budget.q182_weighted_reservoir(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, "weights positive")
      assert(r.getLong(2) <= 0L, "ln(u) <= 0 for u in (0,1]")
      assert(r.getDouble(3) <= 0.0)
    }
    // the kept set is exactly the top-50 of the full priority ranking
    val all = Budget.q182_weighted_reservoir(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all.size == 50)
  }

  test("q182 ln micro-nats sit far from .5 rounding boundaries") {
    // measured min margin: 1.06e-3 at sf0.001/sf0.01, 1.2e-4 at sf0.1 —
    // vs ~4e-9 worst-case cross-libm 1-ulp perturbation of 1e6*ln(u).
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val mn = graft.Tables.documents(spark, d)
        .select(col("doc_id"))
        .withColumn("h", graft.rel.JoinCard.splitmix64(col("doc_id")))
        .selectExpr("1000000.0 * ln(CAST(shiftrightunsigned(h, 11) + 1 " +
          "AS DOUBLE) / 9007199254740992.0) AS v")
        .selectExpr("abs(v - floor(v) - 0.5) AS m")
        .agg(min(col("m"))).head().getDouble(0)
      assert(mn > 1e-6, s"boundary margin $mn at $d")
    }
  }

  test("q199 stride schedule: priority-queue simulation parity, " +
    "fairness lag < 1 slot, frontier gate holds") {
    val rows = Budget.q199_stride_schedule(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(rows.length == 600)
    assert(rows.forall(_._5), "per-row lag_ok must gate true")
    assert(rows.forall(_._6), "frontier_ok must gate true")
    // exact driver-side simulation: merge all (source, k) candidates by
    // the rational priority (k+1)/w via BigInt cross-multiplication
    val ws = Budget.allocations(spark, sf)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("alloc")).collect()
      .map(r => (r.getString(0), r.getLong(1))).filter(_._2 > 0)
    val totalW = ws.map(_._2).sum
    val cands = for {
      (src, w) <- ws.toSeq
      k <- 0L until (600L * w / totalW + 4L)
    } yield (src, w, k)
    val sorted = cands.sortWith { case ((s1, w1, k1), (s2, w2, k2)) =>
      val l = BigInt(k1 + 1) * w2; val r = BigInt(k2 + 1) * w1
      l < r || (l == r && (s1 < s2 || (s1 == s2 && k1 < k2)))
    }.take(600)
    sorted.zipWithIndex.foreach { case ((src, w, k), i) =>
      val (step, oSrc, occ, oW, _, _) = rows(i)
      assert(step == i + 1L && oSrc == src && occ == k + 1L && oW == w,
        s"step ${i + 1}: got ($oSrc, $occ), sim ($src, ${k + 1})")
    }
    // full fairness matrix: EVERY source at EVERY prefix is within one
    // slot of its exact quota (the stride-scheduler bound)
    val cum = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    sorted.zipWithIndex.foreach { case ((src, _, _), i) =>
      val t = i + 1L
      cum(src) += 1
      ws.foreach { case (s2, w2) =>
        val lag = (BigInt(cum(s2)) * totalW - BigInt(t) * w2).abs
        assert(lag < BigInt(totalW),
          s"lag bound broken for $s2 at step $t")
      }
    }
  }

  /** Scala replica of the splitmix64 finalizer (Steele et al. 2014). */
  private def sm64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("q217 split manifest: assignment is a pure doc_id function; " +
    "splits partition every source; signatures replay") {
    import org.apache.spark.sql.functions.col
    val rows = Budget.q217_split_manifest(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def splitOf(id: Long): String = {
      val b = ((sm64(id) % 100) + 100) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val exp = docs.groupBy(d => (d._2, splitOf(d._1))).map { case (k, v) =>
      k -> (v.length.toLong,
        v.map(_._3.trim.split(" ").count(_.nonEmpty).toLong).sum,
        v.map(d => sm64(d._1)).reduce(_ ^ _))
    }
    assert(rows.map(r => (r._1, r._2)).toSet == exp.keySet)
    for ((src, sp, n, tk, share, sig) <- rows) {
      val (en, etk, esig) = exp((src, sp))
      assert(n == en && tk == etk && sig == esig, s"($src,$sp) manifest")
      val nSrc = docs.count(_._2 == src).toLong
      assert(share == 1000L * n / nSrc)
    }
    // the splits PARTITION each source exactly
    for (src <- docs.map(_._2).distinct) {
      val tot = rows.filter(_._1 == src).map(_._3).sum
      assert(tot == docs.count(_._2 == src).toLong, s"$src partition")
    }
  }

  test("q218 epoch shuffle: assignment replays; shards partition each " +
    "epoch; stay-rate is the decorrelation audit") {
    val rows = Budget.q218_epoch_shuffle(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def keyOf(id: Long, e: Int): Long = sm64(id * 1000003L + e)
    def shardOf(id: Long, e: Int): Long = {
      val k = keyOf(id, e); ((k % 8) + 8) % 8
    }
    for (e <- 0 until 3) {
      val byShard = ids.groupBy(shardOf(_, e))
      val epochRows = rows.filter(_._1 == e)
      assert(epochRows.map(_._3).sum == ids.length.toLong,
        s"epoch $e shards must partition the corpus")
      for ((ep, sh, n, minK, maxK, sig, stay) <- epochRows) {
        val mine = byShard(sh)
        assert(n == mine.length.toLong)
        val keys = mine.map(keyOf(_, ep))
        assert(minK == keys.min && maxK == keys.max)
        assert(sig == keys.reduce(_ ^ _), s"epoch $ep shard $sh sig")
        val expStay = if (ep == 0) 0L
          else mine.count(id => shardOf(id, ep - 1) == sh).toLong
        assert(stay == expStay, s"epoch $ep shard $sh stay count")
      }
    }
    // epochs genuinely reshuffle: strictly fewer stay than move
    val later = rows.filter(_._1 > 0)
    assert(later.map(_._7).sum * 2 < later.map(_._3).sum,
      "a real reshuffle keeps well under half the docs in place")
  }

  test("q252 rendezvous: driver replay of the HRW argmax; minimal-" +
    "disruption guarantee; balance") {
    val sf = "/root/testdata/sf0.001"
    val rows = Budget.q252_rendezvous_shards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getBoolean(8))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 8L))
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def assignment(id: Long, nShards: Int): Long =
      (0 until nShards).maxBy(sh => (sm64(id * 16 + sh), sh)).toLong
    val moves = ids.map { id =>
      (id, assignment(id, 8), assignment(id, 9))
    }
    val nMoved = moves.count(m => m._2 != m._3).toLong
    // the HRW guarantee, re-derived independently: every mover's new
    // winner IS the new shard (its hash won; nothing else changed)
    moves.filter(m => m._2 != m._3)
      .foreach(m => assert(m._3 == 8L, s"doc ${m._1} moved to ${m._3}"))
    for ((shard, nOld, nNew, nArr, nDocs, gMoved, permille, exp, ok)
        <- rows) {
      assert(nDocs == ids.length.toLong)
      assert(gMoved == nMoved)
      assert(nOld == moves.count(_._2 == shard).toLong, s"old $shard")
      assert(nNew == moves.count(_._3 == shard).toLong, s"new $shard")
      assert(nArr == moves.count(m => m._2 != m._3 && m._3 == shard)
        .toLong, s"arrived $shard")
      assert(permille == 1000L * nMoved / nDocs)
      assert(exp == 111L)
      assert(ok)
    }
    // moved fraction within 3x of 1/(S+1) even on the small corpus
    assert(nMoved * 3 >= ids.length / 9 &&
      nMoved <= ids.length, "moved mass sane")
  }
}
