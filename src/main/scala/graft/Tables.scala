package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the shared parquet tables (`TESTDATA.md`). Every relational
  * operator reads through here so scan conventions (ns-timestamp handling,
  * schema expectations) live in one place. All loaders are plain
  * `spark.read.parquet` scans — Catalyst pushes filters/projections down to
  * the parquet reader, so callers should NOT cache or materialize these.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def p(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = p(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")

  /** `events.parquet`'s `ts` encoding has varied across driver-generated
    * datasets: TIMESTAMP(NANOS) (which Spark's parquet reader only accepts
    * as a raw long via the legacy conf) and plain microsecond
    * TIMESTAMP_NTZ. Normalize both to the same three columns so every
    * downstream operator and every DuckDB oracle (`epoch_us(ts)`) agrees:
    *   - `ts_ns` — epoch nanoseconds
    *   - `ts_us` — epoch microseconds (floor division for the nanos case,
    *               matching DuckDB's ns→us truncation)
    *   - `ts`    — TimestampType at microsecond precision
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = p(s, d, "events")
    val tsType = raw.schema("ts").dataType
    val withUs = tsType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
      case _ => // TIMESTAMP / TIMESTAMP_NTZ; session tz is UTC so the
        // NTZ→LTZ cast is the identity on the stored micros
        raw.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
          .drop("ts")
    }
    withUs.withColumn("ts", expr("timestamp_micros(ts_us)"))
  }
}
