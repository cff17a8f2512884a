package graft

// Dev tool (Explain's timing sibling, round-13): clean per-query wall
// timings with Bench's session/hygiene, plus PROF_STAGES=<name> for a
// stage-level attribution dump — this is what exposed the single-task
// 6.1 s map stage behind q70 (the 1-row-group scan parallelism trap).
// Not part of the driver contract.
import org.apache.spark.sql.SparkSession

object ProfQ70 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q70_curation_funnel")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.appStateStore.asyncTracking.enable", "false")
    if (new java.io.File("/dev/shm").isDirectory)
      builder.config("spark.local.dir", "/dev/shm/spark-local")
    val spark = builder.getOrCreate()
    GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      noop(fn(spark, "/root/testdata/sf0.001")) // warmup
      def gcMs: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      val times = (1 to 5).map { _ =>
        clear()
        val g0 = gcMs
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        ((System.nanoTime() - t0) / 1e9, (gcMs - g0) / 1000.0)
      }
      println(s"[prof] $name " +
        times.map { case (t, g) => f"$t%.2f(gc $g%.1f)" }.mkString(" "))
    }

    // PROF_Q70_PASSES=1: time each of the funnel's specialized corpus
    // passes individually over the SAME pinned token frame the funnel
    // uses (the pass builders are the very functions q70FunnelOver
    // composes — no copy drift). Median of 3 per pass.
    if (sys.env.contains("PROF_Q70_PASSES")) {
      import graft.text.CorpusFilters._
      val toks = q70TokenFrame(spark, sfDir).localCheckpoint()
      val passes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        ("tagged_counts(u/b/5)", () => q70TaggedCounts(toks)),
        ("unigram_freqs", () => q70Freqs(toks)),
        ("total_tokens", () => q70Total(toks)),
        ("bench_5grams", () => q70Bench(toks)),
        ("neardup_labels", () => q70NearLabels(toks)),
        ("span_kept", () => q70SpanKept(toks)))
      passes.foreach { case (n, f) => noop(f()) } // warm the plan shapes
      passes.foreach { case (n, f) =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); noop(f()); (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[pass] $n%-22s median=${ts(1)}%.2f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
      }
      graft.ml.Similarity.pinnedRdds(toks).foreach(_.unpersist(blocking = false))
    }

    if (sys.env.contains("PROF_STAGES")) {
      import org.apache.spark.scheduler._
      val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
      val listener = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          stages += ((si.stageId, wall, si.numTasks.toLong,
            si.name.take(90).replace("\n", " ")))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val target = sys.env("PROF_STAGES")
      clear()
      noop(SparkEntry.queries(target)(spark, sfDir))
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(500)
      println(s"=== stages of $target (ms, tasks, site) ===")
      stages.sortBy(-_._2).take(25).foreach { case (id, w, nt, n) =>
        println(f"[stage] $id%5d ${w}%6d ms  $nt%4d tasks  $n")
      }
      println(f"[stage] total-wall=${stages.map(_._2).sum}%d ms over ${stages.size} stages")
    }
    spark.stop()
  }
}
