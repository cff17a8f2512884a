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

  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright. We read the nanos as a raw long (legacy conf) and
    * expose:
    *   - `ts_ns` — the raw epoch nanoseconds
    *   - `ts_us` — epoch microseconds (floor division, matching DuckDB's
    *               ns→us truncation so oracle queries agree)
    *   - `ts`    — TimestampType at microsecond precision
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
  }
}
