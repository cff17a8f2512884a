package graft.sink

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** q142 dynamic partition pruning: the claim is PHYSICAL — the fact scan
  * must carry a runtime dynamicpruning predicate AND actually open fewer
  * partitions than exist. Runs on the inner (pre-checkpoint) frame per
  * the q88 rule: the returned query's plan is Scan ExistingRDD. */
class DppSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("fact scan is dynamically pruned: predicate present, partitions skipped") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_dppspec_" +
      spark.sparkContext.applicationId
    try {
      val inner = Dpp.dppAgg(spark, sf, out)
      val rows = inner.collect()
      assert(rows.nonEmpty)
      val langsKept = rows.map(_.getString(0)).toSet
      val allLangs = graft.Tables.documents(spark, sf)
        .select("lang").distinct().collect().map(_.getString(0)).toSet
      assert(langsKept.nonEmpty && langsKept != allLangs,
        s"fixture must prune SOME langs (kept $langsKept of $allLangs) " +
          "or the DPP claim is vacuous")
      // 1. the optimized fact scan carries a dynamicpruning predicate
      val planStr = inner.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("dynamicpruning"),
        s"no dynamicpruning predicate in the executed plan:\n$planStr")
      // 2. physically: the lake scan opened only the qualifying partitions
      // AQE nests subtrees outside `children`: AdaptiveSparkPlanExec
      // holds its current plan, and every QueryStageExec (Result/
      // Shuffle/Broadcast) wraps its stage in `plan` — descend into both
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p.collect {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case f: FileSourceScanExec => Seq(f)
      }.flatten
      val lakeScan = scans(inner.queryExecution.executedPlan)
        .find(_.relation.location.rootPaths.exists(_.toString.contains("_dppspec_")))
      assert(lakeScan.isDefined, "lake FileSourceScanExec not found")
      val partMetric = lakeScan.get.metrics.collectFirst {
        case (name, m) if name.toLowerCase.contains("partition") &&
          !name.toLowerCase.contains("time") => m.value
      }
      assert(partMetric.isDefined, "no partitions-read metric on the scan; " +
        s"available: ${lakeScan.get.metrics.keys.mkString(",")}")
      assert(partMetric.get == langsKept.size,
        s"scan read ${partMetric.get} partitions, expected exactly " +
          s"${langsKept.size} (of ${allLangs.size})")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(out))
  }
}
