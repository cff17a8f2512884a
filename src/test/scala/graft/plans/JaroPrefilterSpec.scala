package graft.plans

import graft.text.{SparkTestSession, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JaroPrefilter: the length-guard rewrite must fire on high thresholds,
  * stay away from vacuous ones, and never change results. */
class JaroPrefilterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    graft.GraftExtensions.register(s)
    s
  }

  private def pairsDf = {
    import spark.implicits._
    val words = Seq("small", "ring", "red", "widget", "blue", "bolt",
      "hot", "gear", "gizmo", "cold", "old", "plate", "x", "longishword")
    val rnd = new scala.util.Random(11)
    (1 to 400).map { _ =>
      (Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.size)))
        .mkString(" "),
        Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.size)))
          .mkString(" "))
    }.toDF("a", "b")
  }

  // plan-shape assertions need a non-local source: ConvertToLocalRelation
  // would otherwise EXECUTE the filter at optimize time and leave only a
  // LocalRelation behind
  private def partPairs = {
    val p = graft.Tables.part(spark, "/root/testdata/sf0.001")
    p.select(col("p_name").as("a"), col("p_brand").as("b"))
  }

  test("rewrite fires at t=0.9: guard present, comparator kept") {
    val df = partPairs.filter(
      TextFunctions.jaro_winkler(col("a"), col("b")) >= lit(0.9))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("least(utf16_length"), s"no length guard in:\n$opt")
    assert(opt.toLowerCase.contains("jaro_winkler"),
      "the comparator itself must survive (guard is necessary, not sufficient)")
  }

  test("no rewrite at vacuous thresholds (t <= 0.8)") {
    val df = partPairs.filter(
      TextFunctions.jaro_winkler(col("a"), col("b")) >= lit(0.5))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("least(utf16_length"), s"guard should not fire:\n$opt")
  }

  test("supplementary-plane pair survives the guard (code-unit lengths)") {
    // the kernel scores UTF-16 CODE UNITS; a guard in code points would
    // silently drop this true match (round-14 advice item): a is 4
    // supplementary chars (cp 4, cu 8), b appends 4 ASCII (cp 8, cu 12).
    // cu ratio 8/12 = 0.667 ≥ 5·0.93−4 = 0.65 — but cp ratio 4/8 = 0.5
    // fails the bound, so the old guard rejected a pair whose true
    // jw ≈ 0.933 ≥ 0.93.
    val a = "𝕒𝕓𝕔𝕕" // 𝕒𝕓𝕔𝕕
    val b = a + "wxyz"
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    assert(graft.text.JaroWinklerKernel.cuLength(u(a)) == 8)
    assert(graft.text.JaroWinklerKernel.cuLength(u(b)) == 12)
    val jw = graft.text.JaroWinklerKernel.jw(u(a), u(b))
    assert(jw >= 0.93, s"fixture must be a true match, got $jw")
    // parquet-backed so the optimizer can't pre-execute the filter on a
    // LocalRelation (which would mask a broken guard)
    val tmp = java.nio.file.Files
      .createTempDirectory("jaroguard").toString + "/pairs"
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").write.parquet(tmp)
    val df = spark.read.parquet(tmp).filter(
      TextFunctions.jaro_winkler(col("a"), col("b")) >= lit(0.93))
    assert(df.queryExecution.optimizedPlan.toString
      .contains("least(utf16_length"), "guard must be in play")
    assert(df.count() == 1, "guard must keep the supplementary-plane match")
  }

  test("all comparison directions agree with the unoptimized result") {
    val rows = pairsDf.collect().map(r => (r.getString(0), r.getString(1)))
    def kernel(a: String, b: String): Double =
      graft.text.JaroWinklerKernel.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val jwCol = TextFunctions.jaro_winkler(col("a"), col("b"))
    val cases: Seq[(org.apache.spark.sql.Column, (String, String) => Boolean)] =
      Seq(
        (jwCol >= lit(0.9), (a, b) => kernel(a, b) >= 0.9),
        (jwCol > lit(0.9), (a, b) => kernel(a, b) > 0.9),
        (lit(0.92) <= jwCol, (a, b) => 0.92 <= kernel(a, b)),
        (lit(0.92) < jwCol, (a, b) => 0.92 < kernel(a, b)))
    cases.foreach { case (pred, ref) =>
      val got = pairsDf.filter(pred).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val want = rows.filter { case (a, b) => ref(a, b) }.toSet
      assert(got == want, s"mismatch for $pred")
    }
  }

  test("fires inside q137's optimized plan") {
    val plan = graft.rel.Linkage
      .q137_fuzzy_match(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("least(utf16_length"),
      s"q137 should carry the length guard:\n${plan.take(2000)}")
  }
}
