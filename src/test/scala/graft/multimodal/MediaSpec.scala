package graft.multimodal

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("media table: binary content + typed metadata, kinds partition the corpus") {
    val m = Media.mediaTable(spark, dir)
    assert(m.schema("content").dataType.typeName == "binary")
    val kinds = m.groupBy(col("kind")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
  }

  test("feature extraction: unit-norm, deterministic, partitioning-invariant") {
    val m = Media.mediaTable(spark, dir).limit(50)
    val f1 = Media.extractFeatures(m.repartition(1))
      .select(col("media_id"), col("features")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f7 = Media.extractFeatures(m.repartition(7))
      .select(col("media_id"), col("features")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f7) // batch/partition boundaries must not change results
    f1.values.foreach { v =>
      assert(v.length == Media.FeatureDim)
      val n = v.map(x => x.toDouble * x).sum
      assert(math.abs(n - 1.0) < 1e-4, s"not unit norm: $n")
    }
  }

  test("frame sampling: n frames per video, bytes cover the blob") {
    val m = Media.mediaTable(spark, dir)
    val nVideos = m.filter(col("kind") === "video").count()
    val frames = Media.sampleFrames(m, n = 4)
    assert(frames.count() == nVideos * 4)
    assert(frames.filter(length(col("frame")) < 1).count() == 0)
  }

  test("perceptual-hash dedup: re-ingested twins found exactly, no false pairs") {
    val n = Media.mediaTable(spark, dir).count()
    val pairs = Media.m_media_dedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length == n,
      s"every original pairs with exactly its re-ingested twin: ${pairs.length} vs $n")
    pairs.foreach { case (a, b, h) =>
      assert(b == a + n, s"pair ($a,$b) is not an ingest twin")
      assert(h == 0, s"identical content must hash identically (hamming $h)")
    }
  }

  test("image-text pairs: one pair per image doc, only dedup survivors pair") {
    val n = Media.mediaTable(spark, dir).count()
    val pairs = Media.q83_image_text_pairs(spark, dir).collect()
    // survivors of the re-crawl dedup are exactly the originals — any
    // re-ingested twin leaking through would carry media_id >= n
    pairs.foreach { r =>
      assert(r.getAs[Long]("media_id") < n,
        s"re-ingested twin ${r.getAs[Long]("media_id")} escaped the pHash dedup")
      assert(r.getAs[Long]("media_id") == r.getAs[Long]("doc_id"),
        "pairing key must bind each image to its own caption document")
      assert(r.getAs[String]("format") == "jpeg")
    }
    // exactly one pair per image medium, none duplicated or dropped
    val nImages = Media.mediaTable(spark, dir)
      .filter(col("kind") === "image").count()
    assert(pairs.length == nImages,
      s"${pairs.length} pairs vs $nImages image media")
    assert(pairs.map(_.getAs[Long]("doc_id")).distinct.length == pairs.length)
  }

  test("metadata filters never deserialize content (column pruning)") {
    val plan = Media.mediaTable(spark, dir)
      .filter(col("meta.width") >= 64)
      .select(col("media_id"), col("meta.width"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("content"), "blob column should be pruned")
  }

  test("interleaved docs: per-doc image counts match the id arithmetic, anchors ordered") {
    val n = graft.Tables.documents(spark, dir).count()
    val m = math.max(n / 8, 1L)
    // expected per-doc image counts straight from the generator arithmetic
    val expected = Media.mediaTable(spark, dir)
      .filter(col("kind") === "image")
      .groupBy((col("media_id") % m).as("doc_id"))
      .agg(count(lit(1)).cast("int").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Media.q90_interleaved_docs(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expected.keySet)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_images") == expected(id),
        s"doc $id image count")
      assert(r.getAs[Long]("first_pos") <= r.getAs[Long]("last_pos"),
        s"doc $id anchor order")
    }
    // the multi-image shape is actually exercised
    assert(expected.values.max >= 2, "fixture must produce multi-image docs")
    assert(rows.map(_.getAs[String]("items_md5")).distinct.length > 1)
  }

  test("q205 alignment gate: pair set matches q83, hamming replays, " +
    "keep is exactly the threshold test") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val rows = Media.q205_alignment_gate(spark, dir).collect()
    val pairKeys = Media.q83_image_text_pairs(spark, dir)
      .select(col("doc_id"), col("media_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == pairKeys,
      "gate scores exactly the q83 pair table")
    val sims = graft.ml.Similarity.simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var kept = 0
    rows.foreach { r =>
      val (doc, media, ham, keep) =
        (r.getLong(0), r.getLong(1), r.getInt(3), r.getBoolean(4))
      assert(ham >= 0 && ham <= 64)
      val imgSig = mix(media ^ 77003L)
      assert(ham == java.lang.Long.bitCount(imgSig ^ sims(doc)),
        s"hamming replay for pair ($doc, $media)")
      assert(keep == (ham <= 26), "keep is the pure threshold test")
      if (keep) kept += 1
    }
    assert(kept >= 1 && kept < rows.length,
      "threshold must separate: some pairs keep, some drop")
  }
}
