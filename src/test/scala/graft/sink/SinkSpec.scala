package graft.sink

import graft.Tables
import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("partitioned parquet sink: hive layout + partition pruning on read") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Parquet.writePartitioned(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars")),
      out, Seq("lang"))
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.nonEmpty && langDirs.forall(_.matches("lang=[a-z]+")))
    // a lang predicate must prune partitions at plan time, not post-scan
    val scan = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filter in scan:\n$plan")
    assert(scan.count() ==
      Tables.documents(spark, dir).filter(col("lang") === "en").count())
  }

  test("ORC round-trip: lossless, partition-pruned on read") {
    // the pre-checkpoint plan: q88 itself returns a pinned frame (scratch
    // dir deleted), which would hide the scan behind a Scan ExistingRDD
    // own scratch path (like the JSONL test): q88 below overwrites AND
    // deletes the shared scratch dir, so inner's plan must never depend on
    // files q88 already removed (the old ordering worked only because the
    // InMemoryFileIndex listing was cached — fragile)
    val inner = Orc.orcRoundTripAgg(spark, dir, Orc.scratchDir(spark) + "_orc_spec")
    // pruning: the read inside q88 filters on the partition column — the
    // scan must carry a PartitionFilters entry, not a post-scan filter;
    // assert BEFORE invoking q88 so the two never share filesystem state
    val plan = inner.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [lang") ||
      plan.contains("PartitionFilters: [isnotnull(lang") ||
      plan.contains("lang#") && plan.contains("PartitionFilters"),
      s"expected partition filters on the ORC scan:\n$plan")
    val q88 = Orc.q88_orc_roundtrip(spark, dir)
    // losslessness: aggregate equals the same aggregate off parquet
    val got = q88.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val want = Tables.documents(spark, dir)
      .filter(col("lang").isin("en", "de"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("s"),
        min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"ORC round-trip drifted: $got vs $want")
  }

  test("JSONL round-trip: text content survives escaping, partition-pruned") {
    val specOut = Orc.scratchDir(spark) + "_jsonl_spec"
    val inner = Orc.jsonlRoundTripAgg(spark, dir, specOut)
    val plan = inner.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition filters on the JSONL scan:\n$plan")
    // the text signature must equal the same md5-prefix sum off parquet —
    // any escape/unescape corruption in the JSON cycle breaks it
    val got = Orc.q91_jsonl_roundtrip(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    val want = Tables.documents(spark, dir)
      .filter(col("lang").isin("en", "de"))
      .groupBy(col("source"))
      .agg(sum(conv(substring(md5(col("text").cast("binary")), 1, 12), 16, 10)
        .cast("long")).cast("long").as("sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "JSONL text signature drifted")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(specOut))
  }

  test("SQL registration: native expressions callable from spark.sql") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT normalize_nfkc('ﬁle１２３') AS n, html_unescape('&amp;x') AS h, " +
        "dot_product_d(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0)
    assert(r.getString(0) == "file123")
    assert(r.getString(1) == "&x")
    assert(r.getDouble(2) == 11.0)
    // aggregate registrations: one serialized Bloom filter cell whose
    // members then probe true through the Column API. The bare 0.01
    // parses as a DECIMAL literal — the argument decoder must accept it
    // (it used to silently substitute the default fpp)
    val bf = spark.sql(
      "SELECT bloom_build(v, 100, 0.01) AS f FROM VALUES ('a'), ('b') AS t(v)")
      .head().getAs[Array[Byte]](0)
    import spark.implicits._
    val probed = Seq("a", "b", "zzz").toDF("v")
      .select(col("v"), graft.ml.Bloom.bloom_contains(col("v"), bf).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(probed("a") && probed("b"))
    // non-foldable sizing args must fail loudly, never default silently
    val err = intercept[Exception] {
      spark.sql("SELECT bloom_build(v, length(v), 0.01) FROM VALUES ('a') AS t(v)")
        .collect()
    }
    assert(err.getMessage.contains("foldable"),
      s"expected a loud bloom_build arg error, got: ${err.getMessage}")
  }

  test("media resize: images re-encoded at target dims, other kinds untouched") {
    val media = graft.multimodal.Media.mediaTable(spark, dir).limit(60)
    val resized = graft.multimodal.Media.resizeImages(media, 128, 128)
    assert(resized.count() == media.count())
    val img = resized.filter(col("kind") === "image")
      .select(col("meta.width"), col("meta.height")).distinct().collect()
    assert(img.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((128, 128)))
    val audioUnchanged = resized.filter(col("kind") === "audio")
      .join(media.filter(col("kind") === "audio")
        .select(col("media_id"), col("content").as("orig")), "media_id")
      .filter(col("content") =!= col("orig")).count()
    assert(audioUnchanged == 0)
  }
}
