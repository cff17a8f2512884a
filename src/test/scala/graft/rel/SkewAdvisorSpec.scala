package graft.rel

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q153 → q46 advisor→executor loop: the salting factor a consumer
  * applies must BE the advisor's ⌈top1/mean⌉ (round-14 verdict item 4),
  * and the sizing rule itself must be exact on constructed skew. */
class SkewAdvisorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("⌈top1/mean⌉ on a skewed fixture: hot key split average-sized") {
    import spark.implicits._
    // hot key 90 rows + 9 singletons: n_rows=99, n_keys=10, top1=90
    // mean = 9.9 → factor = ⌈90/9.9⌉ = ⌈9.09⌉ = 10
    val keys = (Seq.fill(90)("hot") ++ ('a' to 'i').map(_.toString)).toDF("k")
    assert(SkewAdvisor.saltFactorOf(keys) == 10L)
  }

  test("uniform fixture advises factor 1 (no salting needed)") {
    import spark.implicits._
    val keys = (for (k <- 'a' to 'j'; _ <- 1 to 10) yield k.toString).toDF("k")
    assert(SkewAdvisor.saltFactorOf(keys) == 1L)
  }

  test("q153's reported factor equals the rule recomputed on the raw key") {
    val fromQuery = SkewAdvisor.q153_skew_advisor(spark, sf)
      .filter(col("audit_key") === "events.event_type")
      .select(col("salt_factor")).head().getLong(0)
    val direct = SkewAdvisor.saltFactorOf(
      graft.Tables.events(spark, sf).select(col("event_type").as("k")))
    assert(fromQuery == direct, "q153 row must equal the fixture rule")
  }

  test("q46 CONSUMES the advisor's factor (floored at shuffle width)") {
    val advised =
      SkewAdvisor.recommendedSaltFactor(spark, sf, "events.event_type")
    val expected = math.max(advised,
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    assert(Relational.q46SaltCount(spark, sf) == expected)
    // the literal modulus is inlined into q46's salt expression
    val plan = Relational.q46_skew_salted_agg(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains(s"$expected)"),
      s"plan must carry the advised modulus $expected:\n${plan.take(1500)}")
    assert(plan.contains("pmod(xxhash64("), "salting expression present")
  }

  test("memo: repeated consumption does not re-run the advisor pass") {
    val a = SkewAdvisor.recommendedSaltFactor(spark, sf, "events.event_type")
    val b = SkewAdvisor.recommendedSaltFactor(spark, sf, "events.event_type")
    assert(a == b)
  }
}
