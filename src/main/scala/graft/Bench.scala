package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs the declared query set on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Methodology: one untimed warmup pass at sf0.001 first (JIT + whole-stage
  * codegen compilation dominate cold-JVM timings on small data), then each
  * query is timed at the target SF — best-of-2 by default, median-of-5 for
  * the multi-job fixpoint set. Two escalation triggers (r18/r19 verdicts):
  * a sample whose /proc/stat steal-seconds exceed half its wall is TAINTED
  * (a hypervisor steal phase, not the plan — r18 shipped q283 at 15.5 s
  * off two samples carrying ~70 steal-s each against a 3.8 s intrinsic),
  * and the run resamples until ≥2 untainted samples exist (cap 8); then
  * a >2× spread ACROSS UNTAINTED samples adds up to 3 more. The official
  * number comes from the untainted set alone (least-stolen pair as a
  * last-resort fallback if a phase outlives the cap), so a uniform steal
  * phase can no longer ship an inflated median that spread checks can't
  * see. Every sample's taskTime/gc/shuffle/spill/input bytes plus
  * loadAvg, other-JVM count, /proc/stat steal-seconds and the per-query
  * tainted-sample count land in BENCH_FULL.json, so a contended run is
  * attributable from the artifact alone.
  */
object Bench {
  /** Iterative MLlib model fits (LDA sweeps, LSH/KMeans fits) are excluded
    * from the timed loop: they measure iteration counts, not engine
    * throughput, and would dominate the bench wall-clock 100:1. They
    * remain in `SparkEntry.queries` and are correctness-gated by Verify
    * every round. q55 (connected components) IS timed since round 5: its
    * large-star/small-star fixpoint is O(log²) rounds, so its cost is an
    * engine property worth tracking, not an iteration count (the round-4
    * verdict flagged its bench invisibility). Override with
    * SPARK_GRAFT_BENCH_ALL=1 to time everything. */
  val heavyModelFits: Set[String] =
    Set("m_lda_topics", "m_lda_sweep", "m_lda_coherence", "m_lda_doc_topics",
      "m_lda_relevance", "m_dedup_minhash_lsh", "m_ann_ivf",
      // run model fits inside (m_ann_ivf KMeans / MinHashLSH+CountVectorizer /
      // q87b LogisticRegression / q94's 10-round BPE merge loop)
      "q82_ann_ivf_recall", "q84_minhash_lsh_recall", "q87b_quality_trained",
      "q94_bpe_learn", "q94b_bpe_tokenize",
      "q112_bytebpe_learn", "q112b_bytebpe_tokenize", // same 10-round loop

      "m_ann_pq_fitted", "q99_pq_fitted_recall",
      "q106_ivfpq_recall", // coarse KMeans + 8 PQ KMeans fits inside
      "q110_ivfpq_residual_recall", // same fits on residuals
      "q105_unigram_learn", "q105b_unigram_tokenize", // Viterbi-EM fits
      "q111_tokenizer_report", // replays the BPE + unigram trainings
      "q155_lda_recovery", // seeded LDA fit on the planted corpus
      // bounded streaming replays: they time the micro-batch protocol
      // (fixed 5000-/2000-row slices at ANY SF), not engine throughput
      "m_hll_stream", "m_session_stream", "m_psi_stream")

  /** Queries that launch MANY driver jobs (convergence fixpoints, the
    * multi-pass funnel): their per-job scheduling noise compounds, so
    * best-of-2 swings 2-3× across JVMs (round-7 verdict item 1 measured
    * official 21.9s vs isolated 8.3s on q73). Timed three times, median
    * reported — the median of three is robust to one bad draw in either
    * direction, which best-of-N is not (best-of underreports systematically
    * and still inherits one lucky draw's variance). */
  // q73b/q100/q101 left this set in r12: they now derive from the
  // materialized dedup stage (a scan + rollup, one job), so best-of-2
  // suffices; the fixpoint cost stays visible as q73's own line.
  val multiJobQueries: Set[String] =
    Set("q55_dedup_components", "q70_curation_funnel", "q73_dedup_union",
      "q92_semdedup",
      // 16 fixture appends + the rewrite: ~20 sequential driver jobs
      "q126_compact_small_files",
      // 8 fixture appends + index builds + per-probe pruned scans
      "q131_data_skipping",
      // fixed-round iterations with a checkpoint per round (r14)
      "q138_pagerank", "q148_coreness",
      // 4 synchronous label rounds, checkpoint + fingerprint job each (r15)
      "q166_lpa_communities",
      // register fixpoint: up to 8 max-merge rounds + a stats probe per
      // round (r16); the exact-twin memo its contract columns consume is
      // pre-warmed untimed before the timed loop (r17)
      "q239_distance_approx",
      // PageRank fixpoint on the word graph: ≤10 rounds + probes (r16)
      "q246_textrank",
      // budget-bounded BFS: a fixpoint with per-round count probes —
      // exactly this set's shape, yet it was min-of-2 through r17 and
      // the official number carried a 3.5× sample spread (r17 verdict
      // item 1a)
      "q201_distance_histogram")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ui.enabled=false does NOT stop the app-status listeners: they
      // retain up to 1000 executions / 1000 jobs of state, and a
      // 90-query bench emits thousands (the component fixpoints alone
      // are ~50 jobs each). The growing store throttles the listener
      // bus, which many-small-job queries feel hardest — q70 measured
      // 7.4s isolated vs 24.6s at the end of a full sequence. Keep the
      // retained state tiny; the bench needs none of it.
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.worker.ui.retainedExecutors", "10")
      .config("spark.appStateStore.asyncTracking.enable", "false")
    // Shuffle spill on the container's overlay rootfs intermittently stalls
    // tasks for 10-100s; tmpfs sidesteps it (local-mode only — a real
    // cluster would use fast local SSDs for spark.local.dir).
    // SPARK_GRAFT_LOCAL_DIR overrides: at the 100× scale probe (r17) the
    // RAM-backed tmpfs spill competed with the enlarged heap for the same
    // physical memory and the OS OOM-killed the JVM — big-corpus probes
    // point this at real disk.
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-local"
      else "")
    if (localDir.nonEmpty) builder.config("spark.local.dir", localDir)
    val spark = builder.getOrCreate()
    GraftExtensions.register(spark) // SQL functions + optimizer rules
    // ERROR: keep the single JSON result line easy for the driver to find
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_TIER=trainer (r17 verdict item 5): time the
    // model-fit/streaming-replay entries the main loop excludes — one
    // sample each after the standard warmup, written to
    // BENCH_TRAINER.json and embedded into the next official
    // BENCH_FULL.json as a "trainer" section. These measure iteration
    // counts, not engine throughput, so they stay OUT of the official
    // total — but a trainer-path regression (a fit suddenly 10×) now
    // has a recorded number to regress FROM.
    val trainerTier = sys.env.get("SPARK_GRAFT_TIER").contains("trainer")
    val benchSet = {
      val base =
        if (trainerTier)
          SparkEntry.queries.view.filterKeys(heavyModelFits).toMap
        else if (sys.env.contains("SPARK_GRAFT_BENCH_ALL")) SparkEntry.queries
        else SparkEntry.queries -- heavyModelFits
      // dev-only subset (comma-separated names), like Verify's; driver
      // leaves it unset
      sys.env.get("SPARK_GRAFT_ONLY") match {
        case Some(names) => base.view.filterKeys(names.split(",").toSet).toMap
        case None => base
      }
    }

    // Materialize EVERY projected column (count() would let Catalyst prune
    // the expensive projections and final sorts — round-1 advice): the noop
    // sink consumes all rows/columns without write-side I/O in the timing.
    def run(fn: (SparkSession, String) => DataFrame, dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    val warmDir = "/root/testdata/sf0.001"
    benchSet.foreach { case (_, fn) =>
      try run(fn, warmDir) catch { case _: Throwable => () }
    }

    // Pre-warm the CROSS-QUERY trainer memo at the TARGET dir, untimed
    // (r16 verdict item 1): q239's contract columns consume the exact
    // q201 kernel through LinkPred.exactDistance; letting the first
    // timed sample train that memo polluted the r16 official number
    // (13.3 s with a 4× sample spread — the training, not the HyperANF
    // plan). q201's own cost stays bench-visible as its own line.
    if (benchSet.contains("q239_distance_approx"))
      try graft.rel.LinkPred.exactDistance(spark, sfDir)
      catch { case _: Throwable => () }

    // SPARK_GRAFT_DIAG=1: per-run [diag] lines attributing wall to stage
    // wall / executor task time / GC — the tool for chasing long-sequence
    // degradation (tail queries inflating 2-3x over their isolated times).
    // The listener itself ALWAYS runs (its cost is one atomic add per
    // stage) so BENCH_FULL can carry {taskTime, gcTime} beside every wall
    // sample — environment phases (uniform all-boats inflation, executor
    // CPU blowups with gc≈0) become separable from plan cost in the
    // artifact without a rerun (round-15 verdict item 7).
    val diag = sys.env.contains("SPARK_GRAFT_DIAG")
    val stageWall = new java.util.concurrent.atomic.AtomicLong(0)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val stageCount = new java.util.concurrent.atomic.AtomicLong(0)
    // Shuffle/spill/input bytes (r17): local[32] timings cannot prove
    // cluster behavior — what transfers is the DATA MOVEMENT the plan
    // asks for. Shuffle write bytes per query is exactly the network
    // cost a 1000-executor run would pay, so the scaling ladder records
    // it alongside wall time: a kernel whose shuffle bytes scale
    // linearly with the corpus stays network-feasible at 100 TB even if
    // local wall time is memory-bandwidth-bound.
    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val shufRead = new java.util.concurrent.atomic.AtomicLong(0)
    val spillBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val inputBytes = new java.util.concurrent.atomic.AtomicLong(0)
    locally {
      import org.apache.spark.scheduler._
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stageWall.addAndGet(
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
          val tm = si.taskMetrics
          taskTime.addAndGet(tm.executorRunTime)
          shufWrite.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(tm.shuffleReadMetrics.localBytesRead +
            tm.shuffleReadMetrics.remoteBytesRead)
          spillBytes.addAndGet(tm.diskBytesSpilled)
          inputBytes.addAndGet(tm.inputMetrics.bytesRead)
          stageCount.incrementAndGet()
        }
      })
    }
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // Machine-load attribution (r17 verdict item 1b): the r17 artifact
    // inflated 1.33× over r16 with 3-7× taskTime swings on IDENTICAL
    // plans — environment contention, but nothing in the artifact could
    // prove it. Record the 1-minute loadavg and the count of OTHER java
    // processes alongside every sample, so a contended run is
    // attributable from the artifact alone.
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    // Hypervisor steal (r18): loadavg and otherJvms see only INSIDE the
    // VM; /proc/stat's steal column counts cycles the HOST withheld.
    // The r18 probe that motivated this read 7% steal at idle and ~13%
    // of active CPU stolen cumulatively — enough to inflate identical
    // plans' executor taskTime 1.5-2× and breach the bench contract
    // with zero in-VM signal. Per-sample steal-seconds make that
    // attribution readable straight from BENCH_FULL.
    def stealJiffies: Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try {
          val f = src.getLines().next().trim.split("\\s+")
          if (f.length > 8) f(8).toLong else -1L
        } finally src.close()
      } catch { case _: Throwable => -1L }
    val selfPid = ProcessHandle.current().pid()
    def otherJvms: Int =
      try {
        val procs = new java.io.File("/proc").listFiles()
        if (procs == null) -1
        else procs.count { f =>
          f.getName.forall(_.isDigit) && f.getName.toLong != selfPid && {
            val comm = new java.io.File(f, "comm")
            comm.isFile && {
              try {
                val s = scala.io.Source.fromFile(comm)
                try s.mkString.trim == "java" finally s.close()
              } catch { case _: Throwable => false }
            }
          }
        }
      } catch { case _: Throwable => -1 }
    // SparkListener events arrive on an async bus: without a drain,
    // trailing onStageCompleted events get attributed to the NEXT
    // sample (ADVICE r17). The bus exposes waitUntilEmpty() as
    // private[spark] — public in bytecode, so reflection reaches it
    // without an org.apache.spark shim; the fallback sleep bounds the
    // skew at one scheduling quantum.
    def drainListenerBus(): Unit =
      try {
        val bus = spark.sparkContext.getClass
          .getMethod("listenerBus").invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(30) }

    // one sample; wall = -1 marks a failure
    case class Sample(wall: Double, tt: Double, gc: Double, swB: Double,
      srB: Double, spB: Double, inB: Double, load: Double, jvms: Int,
      steal: Double)
    // validate the probe-mode sample override BEFORE the run starts, not
    // mid-bench inside times.min (ADVICE r17)
    val envSamples = sys.env.get("SPARK_GRAFT_SAMPLES").map { v =>
      val n = try v.toInt catch { case _: NumberFormatException =>
        sys.error(s"SPARK_GRAFT_SAMPLES must be a positive int, got '$v'") }
      require(n >= 1, s"SPARK_GRAFT_SAMPLES must be >= 1, got $n")
      n
    }
    val results = benchSet.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Sample = {
        drainListenerBus() // don't inherit the predecessor's stragglers
        val (load0, jvms0, st0) = (loadAvg, otherJvms, stealJiffies)
        val (g0, sw0, tt0, sc0) =
          (gcMs, stageWall.get, taskTime.get, stageCount.get)
        val (sw1, sr1, sp1, in1) =
          (shufWrite.get, shufRead.get, spillBytes.get, inputBytes.get)
        def stealSec: Double = {
          val s1 = stealJiffies
          if (st0 < 0 || s1 < 0) -1.0 else (s1 - st0) / 100.0
        }
        val t0 = System.nanoTime()
        try run(fn, sfDir)
        catch { case _: Throwable =>
          return Sample(-1.0, 0, 0, 0, 0, 0, 0, load0, jvms0, stealSec) }
        val w = (System.nanoTime() - t0) / 1e9
        drainListenerBus() // attribute every stage to THIS sample
        val (tt, gc) = ((taskTime.get - tt0) / 1e3, (gcMs - g0) / 1e3)
        val mb = 1024.0 * 1024.0
        val (swB, srB, spB, inB) = ((shufWrite.get - sw1) / mb,
          (shufRead.get - sr1) / mb, (spillBytes.get - sp1) / mb,
          (inputBytes.get - in1) / mb)
        val stealNow = stealSec
        if (diag)
          println(f"[diag] $name wall=$w%.2f stageWall=${(stageWall.get - sw0) / 1e3}%.2f " +
            f"taskTime=$tt%.2f gc=$gc%.2f " +
            f"stages=${stageCount.get - sc0} " +
            f"shufWriteMB=$swB%.1f shufReadMB=$srB%.1f spillMB=$spB%.1f " +
            f"inputMB=$inB%.1f load=$load0%.1f jvms=$jvms0 " +
            f"steal=$stealNow%.1f")
        Sample(w, tt, gc, swB, srB, spB, inB, load0, jvms0, stealNow)
      }
      // measurement hygiene: drop every block a predecessor left pinned
      // (eager localCheckpoints, lingering .cache()s) and then drain heap
      // garbage, so each timing measures this plan, not accumulated
      // block-manager debt — the round-5 verdict measured q55 at 2.7× its
      // isolated cost 70 queries into the sequence from exactly this.
      // INVARIANT: this global unpersist is safe ONLY because Bench runs
      // queries strictly sequentially on a private SparkSession — with any
      // concurrent query it would truncate a live checkpoint's lineage
      // (see componentsWithRounds' per-loop tracking for the safe form).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      // median-of-5 for the multi-job set since round 14: the round-13
      // official run medianed q73 at 33s against a 2.7-5s isolated time —
      // diag showed executor CPU itself inflated ~6x (gc≈0, same stages),
      // i.e. an external-contention PHASE spanning consecutive runs.
      // Three samples lose the median to any 2-run phase; five need a
      // ~4-run phase to corrupt, at ~+40s total bench cost.
      // SPARK_GRAFT_SAMPLES caps the per-query sample count — probe-only
      // (big-corpus scaling rungs where one sample runs minutes and the
      // BYTE metrics are sample-invariant anyway); the official run
      // leaves it unset and keeps median-of-5 / best-of-2.
      val nSamples = envSamples
        .getOrElse(if (trainerTier) 1
        else if (multiJobQueries(name)) 5 else 2)
      var samples = Seq.fill(nSamples)(once())
      // A sample is TAINTED when the host stole more than half its wall
      // (r18 verdict item 1): steal < 0 means /proc/stat is unreadable —
      // no evidence either way, treat as clean rather than resample
      // forever on a host that hides the counter.
      def untaintedOf(ss: Seq[Sample]): Seq[Sample] = ss.filter(s =>
        s.wall >= 0 && (s.steal < 0 || s.steal <= 0.5 * s.wall))
      if (envSamples.isEmpty && !trainerTier) {
        // Steal-taint resample FIRST (r18 verdict item 1): a steal phase
        // inflates every sample it covers UNIFORMLY, so the spread check
        // below is blind to it — r18's q283 read 16.4/15.5 s (spread
        // 1.06, no escalation) with ~70 steal-s per sample against a
        // 3.8 s certified intrinsic. Resample until ≥2 untainted samples
        // exist, cap 8 — if the phase outlives the cap, the fallback
        // below reports the least-stolen pair and the artifact's
        // taintedSamples count says why.
        while (untaintedOf(samples).size < 2 && samples.size < 8)
          samples :+= once()
        // Escalate on spread (r17 verdict item 1c): a >2× spread across
        // UNTAINTED samples means residual contention (load, other JVMs)
        // crossed the run — q201's official 15.4 s was min-of-2 over
        // {15.4, 54.5}. Take up to 3 more samples so the reported number
        // comes from the quiet side of the phase. Only when the caller
        // didn't pin the count (probe mode) and the query is big enough
        // for spread to mean contention rather than timer noise.
        def spreadHigh = {
          val ok = untaintedOf(samples).map(_.wall)
          ok.nonEmpty && ok.min >= 0.5 && ok.max / ok.min > 2.0
        }
        var extra = 0
        while (spreadHigh && extra < 3) { samples :+= once(); extra += 1 }
      }
      // official basis: untainted samples only; if a steal phase tainted
      // everything, fall back to the two least-stolen samples (the number
      // is still an overstatement, but the artifact records the taint)
      val untainted = untaintedOf(samples)
      val basis =
        if (untainted.nonEmpty) untainted
        else samples.filter(_.wall >= 0)
          .sortBy(s => if (s.steal < 0) Double.MaxValue else s.steal)
          .take(2)
      val times = basis.map(_.wall)
      val official = if (samples.exists(_.wall < 0) || times.isEmpty) -1.0
        // lower-middle median: the upper-middle of an even-sized escalated
        // set biased the official number high (ADVICE r18)
        else if (multiJobQueries(name)) times.sorted.apply((times.size - 1) / 2)
        else times.min
      (name, official, samples)
    }.map { case (name, official, samples) => name -> (official, samples) }
    // 3-decimal rounding (1 ms resolution — below run-to-run noise): the
    // full-precision doubles doubled the line length and the driver's tail
    // capture truncated the cheap half of the suite out of BENCH_r{5,6}
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Queries by ASCENDING cost with failures (-1) LAST: the driver's
    // capture keeps the END of the output, so the tail must hold what
    // matters most — failing query names first of all, then the expensive
    // half whose regressions matter (round-11 verdict: round 8's
    // descending order preserved the 72 cheapest queries and dropped the
    // ~48 expensive ones; round-12 advice: failures sorted FIRST were the
    // first content truncated, inverting the intent). The short trailing
    // summary line still carries n_failed even if every name is cut.
    val qs = results.sortBy { case (k, (v, _)) => (v < 0, v, k) }
      .map { case (k, (v, _)) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._2._1 < 0)
    val total = results.collect { case (_, (v, _)) if v >= 0 => v }.sum
    val metric = if (trainerTier) "trainer_total" else "total"
    println(s"""{"metric":"$metric","value":${r3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":$nFailed,"queries":$qs}""")
    // Second, SHORT line with the headline numbers alone: short enough to
    // survive truncation from EITHER direction, so the official artifact
    // always records the total even if the per-query line is cut
    // (round-8 verdict item 2).
    println(s"""{"metric":"$metric","value":${r3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":$nFailed}""")
    // COMPLETE per-query artifact on disk (round-14 verdict item 8): the
    // stdout capture preserves only the tail of the long line, which
    // limited r13↔r14 comparison to ~70 queries. This file carries every
    // query's official time AND the raw sample vector (so the multi-job
    // set's spread — not just the median — is recorded). Written to the
    // repo root, where the bench runs from; overwritten per run.
    def r1(v: Double): String =
      BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
    val full = results.toSeq.sortBy(_._1).map { case (k, (v, ts)) =>
      "\"" + k + "\":{\"time\":" + r3(v) +
        ",\"samples\":[" + ts.map(s => r3(s.wall)).mkString(",") + "]" +
        ",\"taskTime\":[" + ts.map(s => r3(s.tt)).mkString(",") + "]" +
        ",\"gcTime\":[" + ts.map(s => r3(s.gc)).mkString(",") + "]" +
        // data-movement profile (MB, r17): shuffle write is the
        // cluster-network cost the plan would pay at scale; spill > 0
        // flags partitions outgrowing executor memory at this SF
        ",\"shufWriteMB\":[" + ts.map(s => r1(s.swB)).mkString(",") + "]" +
        ",\"shufReadMB\":[" + ts.map(s => r1(s.srB)).mkString(",") + "]" +
        ",\"spillMB\":[" + ts.map(s => r1(s.spB)).mkString(",") + "]" +
        ",\"inputMB\":[" + ts.map(s => r1(s.inB)).mkString(",") + "]" +
        // machine-load attribution (r18): 1-min loadavg + count of
        // OTHER jvm processes at each sample's start — a 3× wall
        // inflation with load ≫ cpus and jvms > 0 is the environment,
        // not the plan
        ",\"loadAvg\":[" + ts.map(s => r1(s.load)).mkString(",") + "]" +
        ",\"otherJvms\":[" + ts.map(_.jvms).mkString(",") + "]" +
        // hypervisor steal-seconds during the sample (r18): taskTime
        // inflating on an identical plan while stealSec tracks wall is
        // the HOST, not the plan — the one contention source loadavg
        // and otherJvms cannot see
        ",\"stealSec\":[" + ts.map(s => r1(s.steal)).mkString(",") + "]" +
        // count of samples the steal-taint rule excluded from the
        // official basis (r19): >0 with a sane official time means the
        // protocol caught a steal phase; == samples.size means the
        // phase outlived the resample cap and the time is least-stolen
        ",\"taintedSamples\":" + ts.count(s =>
          s.wall >= 0 && s.steal >= 0 && s.steal > 0.5 * s.wall) + "}"
    }.mkString("{", ",", "}")
    // a SPARK_GRAFT_ONLY dev subset must not clobber the full artifact
    // (round-15 lesson: a 2-query probe overwrote the certified run);
    // same for SPARK_GRAFT_SAMPLES — it is documented probe-only
    // (1-sample big-corpus rungs at a different SF dir), so its runs
    // must never replace the certified median-of-5 artifact (ADVICE r17)
    if (!sys.env.contains("SPARK_GRAFT_ONLY") &&
        !sys.env.contains("SPARK_GRAFT_SAMPLES")) try {
      if (trainerTier) {
        // trainer tier writes its OWN artifact; the next official run
        // embeds it, so BENCH_FULL always carries the latest recorded
        // trainer-path costs without the official total absorbing them
        val w = new java.io.PrintWriter("BENCH_TRAINER.json")
        try w.println(
          s"""{"sf":"$sfDir","n_queries":${results.size},"n_failed":$nFailed,"total":${r3(total)},"queries":$full}""")
        finally w.close()
      } else {
        val trainer = try {
          val f = new java.io.File("BENCH_TRAINER.json")
          if (f.isFile)
            scala.io.Source.fromFile(f).mkString.trim match {
              // a truncated trainer artifact (writer crash mid-line) must
              // not render the whole embedding unparseable (ADVICE r18):
              // require the blob to CLOSE as well as open
              case s if s.startsWith("{") && s.endsWith("}") => s
              case _ => "null"
            }
          else "null"
        } catch { case _: Throwable => "null" }
        val w = new java.io.PrintWriter("BENCH_FULL.json")
        try w.println(
          s"""{"sf":"$sfDir","n_queries":${results.size},"n_failed":$nFailed,"total":${r3(total)},"queries":$full,"trainer":$trainer}""")
        finally w.close()
      }
    } catch { case _: Throwable => () } // artifact is best-effort
    spark.stop()
  }
}
