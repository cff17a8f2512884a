package graft.sink

import java.sql.Timestamp

import graft.Tables
import graft.text.SparkTestSession
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-avro-$tag").toString

  test("avro round-trip: every supported type survives, nulls included") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("part", StringType, false),
      StructField("i", IntegerType, true),
      StructField("d", DoubleType, true),
      StructField("f", FloatType, true),
      StructField("b", BooleanType, true),
      StructField("s", StringType, true),
      StructField("bin", BinaryType, true),
      StructField("ts", TimestampType, true),
      StructField("af", ArrayType(FloatType, false), true),
      StructField("al", ArrayType(LongType, false), true)))
    val rows = Seq(
      Row(1L, "a", 7, 2.5d, 1.5f, true, "plain", Array[Byte](1, 2, -3),
        Timestamp.valueOf("2026-01-02 03:04:05.123456"),
        Seq(0.25f, -1.0f), Seq(10L, 20L)),
      Row(2L, "a", null, null, null, null, "quotes\"and\nnewline\tµ€",
        null, null, null, null),
      Row(3L, "b", -1, -0.0d, Float.NaN, false, "", Array.empty[Byte],
        Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        Seq.empty[Float], Seq(-5L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = tmp("types")
    Avro.writePartitioned(df, out, "part")
    val back = spark.read.format("graft.sink.AvroSource").load(out)
    // same column set (partition col re-appended), same rows
    assert(back.columns.sorted.toSeq == df.columns.sorted.toSeq)
    val key = (r: Row) => r.getLong(r.fieldIndex("id"))
    val a = df.collect().map(r => key(r) -> r).toMap
    val b = back.collect().map(r => key(r) -> r).toMap
    assert(a.keySet == b.keySet)
    for (id <- a.keySet; c <- schema.fieldNames) {
      val (x, y) = (a(id).get(a(id).fieldIndex(c)), b(id).get(b(id).fieldIndex(c)))
      (x, y) match {
        case (xb: Array[Byte], yb: Array[Byte]) => assert(xb.sameElements(yb), s"$id.$c")
        case (xf: Float, yf: Float) if xf.isNaN => assert(yf.isNaN, s"$id.$c")
        case _ => assert(x == y, s"$id.$c: wrote $x read $y")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("avro partition pruning: a lang filter opens ONLY matching files") {
    val out = tmp("prune")
    Avro.writePartitioned(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      out, "lang")
    val enFiles = new java.io.File(s"$out/lang=en").listFiles()
      .count(_.getName.endsWith(".avro"))
    val allFiles = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).count(_.getName.endsWith(".avro"))
    assert(enFiles > 0 && allFiles > enFiles, "need >1 partition to prove pruning")
    val scan = spark.read.format("graft.sink.AvroSource").load(out)
      .filter(col("lang") === "en")
    // the filter is consumed at plan time: scan description records it
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAvroScan") && plan.contains("lang"),
      s"expected pushed lang filter in scan description:\n$plan")
    AvroCounters.filesOpened.set(0)
    val n = scan.count()
    assert(AvroCounters.filesOpened.get() == enFiles,
      s"pruned scan opened ${AvroCounters.filesOpened.get()} files, " +
        s"expected only the $enFiles en files")
    assert(n == Tables.documents(spark, dir).filter(col("lang") === "en").count())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("avro zone-map skipping: a NON-partition filter opens fewer files") {
    val out = tmp("zonemap")
    // range-partition by doc_id so each task's files carry tight
    // [min,max] sidecars — the layout a range-clustered lake table has
    Avro.writePartitioned(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .repartitionByRange(8, col("doc_id")),
      out, "lang")
    assert(new java.io.File(s"$out/_stats").listFiles()
      .count(_.getName.endsWith(".txt")) > 0, "writer must emit sidecars")
    val allFiles = new java.io.File(out).listFiles().filter(_.isDirectory)
      .filterNot(_.getName == "_stats")
      .flatMap(_.listFiles()).count(_.getName.endsWith(".avro"))
    val truth = Tables.documents(spark, dir).filter(col("doc_id") < 100L)
    val scan = spark.read.format("graft.sink.AvroSource").load(out)
      .filter(col("doc_id") < 100L) // NO partition filter
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAvroScan") && plan.contains("doc_id"),
      s"expected the stats filter in the scan description:\n$plan")
    AvroCounters.filesOpened.set(0)
    AvroCounters.filesSkippedByStats.set(0)
    val n = scan.count()
    assert(AvroCounters.filesOpened.get() < allFiles,
      s"zone maps must skip files: opened ${AvroCounters.filesOpened.get()} " +
        s"of $allFiles present")
    assert(AvroCounters.filesSkippedByStats.get() > 0,
      "the skip must come from the stats sidecars")
    assert(n == truth.count(), "skipping must lose no matching row")
    // the stats filter stays RESIDUAL: rows inside surviving files that
    // fail the predicate are still dropped row-level
    val sum = spark.read.format("graft.sink.AvroSource").load(out)
      .filter(col("doc_id") >= 200L && col("doc_id") < 300L)
      .agg(sum_distinct(col("doc_id"))).head().getLong(0)
    assert(sum == (200L until 300L).sum,
      "mid-range predicate must return exactly its rows")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("avro zone-map skipping answers IN filters on data columns") {
    val out = tmp("zonemap_in")
    Avro.writePartitioned(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .repartitionByRange(8, col("doc_id")),
      out, "lang")
    val allFiles = new java.io.File(out).listFiles().filter(_.isDirectory)
      .filterNot(_.getName == "_stats")
      .flatMap(_.listFiles()).count(_.getName.endsWith(".avro"))
    // an IN probe on the range-clustered column: every value lands in
    // the low range, so zone maps must prove most files irrelevant
    val probe = Seq(5L, 10L, 50L)
    val scan = spark.read.format("graft.sink.AvroSource").load(out)
      .filter(col("doc_id").isin(probe: _*)) // NO partition filter
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAvroScan") && plan.contains("doc_id"),
      s"expected the IN stats filter in the scan description:\n$plan")
    AvroCounters.filesOpened.set(0)
    AvroCounters.filesSkippedByStats.set(0)
    val got = scan.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(AvroCounters.filesOpened.get() < allFiles,
      s"IN zone maps must skip files: opened " +
        s"${AvroCounters.filesOpened.get()} of $allFiles present")
    assert(AvroCounters.filesSkippedByStats.get() > 0,
      "the IN skip must come from the stats sidecars")
    val truth = Tables.documents(spark, dir)
      .filter(col("doc_id").isin(probe: _*))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(truth), "IN skipping must lose no matching row")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("avro splittable read: byte-range splits partition records exactly") {
    val out = tmp("split")
    // one task -> one file holding every row, so splitting must come from
    // the sync-marker byte ranges, not the file count
    Avro.writePartitioned(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"))
        .withColumn("p", lit("all")).repartition(1),
      out, "p")
    val files = new java.io.File(s"$out/p=all").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 1)
    val whole = spark.read.format("graft.sink.AvroSource").load(out)
    val split = spark.read.format("graft.sink.AvroSource")
      .option("splitBytes", 4096).load(out)
    assert(split.rdd.getNumPartitions > 4,
      s"expected many byte-range splits, got ${split.rdd.getNumPartitions}")
    // no loss, no double-read at the range boundaries
    assert(split.count() == whole.count())
    assert(split.agg(sum(col("doc_id"))).head().getLong(0) ==
      whole.agg(sum(col("doc_id"))).head().getLong(0))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("avro SUB-FILE skipping: segment zone maps drop splits inside one big file") {
    val out = tmp("segskip")
    // ONE sorted file with many segments: sub-file skipping is the only
    // skipping possible — file-level stats cover the whole id range
    Avro.writePartitioned(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars"), col("lang"))
        .withColumn("p", lit("all"))
        .repartition(1).sortWithinPartitions(col("doc_id")),
      out, "p", segRows = 50)
    val files = new java.io.File(s"$out/p=all").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 1, "the fixture must be a single file")
    // sidecar must now carry 6-field segment lines beside the file line
    val statLines = new java.io.File(s"$out/_stats").listFiles()
      .filter(_.getName.endsWith(".txt"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(statLines.exists(_.split("\\|").length == 6),
      s"expected segment lines in the sidecar:\n${statLines.mkString("\n")}")
    val scan = spark.read.format("graft.sink.AvroSource")
      .option("splitBytes", 1024).load(out)
      .filter(col("doc_id") < 40L) // selective on the clustered column
    AvroCounters.splitsPlanned.set(0)
    AvroCounters.splitsSkippedByStats.set(0)
    val n = scan.count()
    val planned = AvroCounters.splitsPlanned.get()
    val skipped = AvroCounters.splitsSkippedByStats.get()
    assert(planned > 4, s"fixture must be multi-split, planned=$planned")
    assert(skipped > 0 && skipped < planned,
      s"segment zone maps must skip splits: skipped $skipped of $planned")
    assert(n == Tables.documents(spark, dir)
      .filter(col("doc_id") < 40L).count(),
      "split skipping must lose no matching row")
    // residual discipline: a mid-range predicate still returns exactly
    // its rows through surviving splits
    val sum = spark.read.format("graft.sink.AvroSource")
      .option("splitBytes", 1024).load(out)
      .filter(col("doc_id") >= 200L && col("doc_id") < 300L)
      .agg(sum_distinct(col("doc_id"))).head().getLong(0)
    assert(sum == (200L until 300L).sum,
      "mid-range predicate must return exactly its rows")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("planInputPartitions memoized: counters bump once per Scan (ADVICE r19)") {
    // Spark may call planInputPartitions more than once per query (plan
    // reuse, AQE re-planning, batch re-creation); the machine-check
    // counters must count the SCAN, not the invocations
    val scan = new AvroScan(
      files = Seq(("all", "/nonexistent-memo-fixture.avro", 4096L)),
      partitionCol = Some("p"),
      dataSchema = new StructType().add("doc_id", LongType),
      required = new StructType().add("doc_id", LongType),
      splitBytes = 1024L, pushedDesc = Array.empty)
    AvroCounters.splitsPlanned.set(0)
    AvroCounters.splitsSkippedByStats.set(0)
    val first = scan.planInputPartitions()
    val second = scan.planInputPartitions()
    assert(first eq second, "the planned array must be memoized")
    assert(first.length == 4) // 4096 / 1024
    assert(AvroCounters.splitsPlanned.get() == 4,
      s"splitsPlanned must bump exactly once, got ${AvroCounters.splitsPlanned.get()}")
    assert(AvroCounters.splitsSkippedByStats.get() == 0)
  }

  test("schema evolution: default fill, alias rename, dropped field") {
    val out = tmp("evo")
    val evolved = Avro.avroEvolutionAgg(spark, dir, out)
    // the evolved scan schema: renamed + added fields, no `text`
    val raw = spark.read.format("graft.sink.AvroSource")
      .option("readerSchema", Avro.EvolvedReaderSchema).load(out)
    assert(raw.schema.fieldNames.toSet ==
      Set("doc_id", "source", "chars", "quality", "lang"))
    val got = evolved.collect()
    val want = Tables.documents(spark, dir)
      .filter(col("lang").isin("en", "de"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        (lit(7) * count(lit(1))).cast("long").as("sum_quality"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"), col("source")).collect()
    assert(got.toSeq == want.toSeq)
    // per-row default fill, not just in aggregate
    assert(raw.filter(col("quality") =!= 7).count() == 0)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("q113 avro round-trip agg equals the parquet truth") {
    val got = Avro.avroRoundTripAgg(spark, dir, tmp("q113")).collect()
    val want = Tables.documents(spark, dir)
      .filter(col("lang").isin("en", "de"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sum(conv(substring(md5(col("text").cast("binary")), 1, 12), 16, 10)
          .cast("long")).cast("long").as("text_sig"))
      .orderBy(col("source")).collect()
    assert(got.toSeq == want.toSeq)
  }
}
