package graft.rel

import java.sql.Timestamp

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q86's compaction kernel on synthetic edge cases the fixture changelog
  * may not contain: same-timestamp ties (event_id must decide),
  * tombstone-last keys (absent), and tombstone-then-reinsert keys
  * (present with the reinserted state). */
class ChangelogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-05-01 10:$m%02d:00")

  test("latest-per-key: ties break on event_id; tombstones delete; reinserts revive") {
    import spark.implicits._
    val log = Seq(
      // user 1: two updates at the SAME ts — higher event_id wins
      (10L, ts(0), 1L, "view", 1.0),
      (11L, ts(0), 1L, "click", 2.0),
      // user 2: update then tombstone → absent from snapshot
      (20L, ts(1), 2L, "view", 3.0),
      (21L, ts(2), 2L, "error", 0.0),
      // user 3: tombstone then reinsert → present with reinserted state
      (30L, ts(1), 3L, "error", 0.0),
      (31L, ts(3), 3L, "purchase", 9.5),
      // user 4: single record
      (40L, ts(4), 4L, "view", 7.25))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val snap = Relational.applyChangelog(log)
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("last_event_id"),
        r.getAs[String]("last_type"), r.getAs[Double]("last_value"),
        r.getAs[Long]("n_changes")))
    assert(snap.toSeq == Seq(
      (1L, 11L, "click", 2.0, 2L),   // tie at ts(0): event_id 11 > 10
      (3L, 31L, "purchase", 9.5, 2L), // revived after tombstone
      (4L, 40L, "view", 7.25, 1L)))  // user 2 deleted
  }

  test("snapshot diff: op partition matches the bucket arithmetic") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val bucketOf = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
          .as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = bucketOf.size
    val ops = Relational.q93_snapshot_diff(spark, dir).collect()
      .groupBy(_.getAs[String]("op"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    // deletes = bucket 'a'; updates = bucket 'b' (the ' v2' suffix always
    // changes the digest); inserts = bucket 'c' docs under shifted ids
    assert(ops.getOrElse("D", Set.empty) ==
      bucketOf.collect { case (id, "a") => id }.toSet)
    assert(ops.getOrElse("U", Set.empty) ==
      bucketOf.collect { case (id, "b") => id }.toSet)
    assert(ops.getOrElse("I", Set.empty) ==
      bucketOf.collect { case (id, "c") => id + n }.toSet)
    // every op row carries exactly the digests its kind implies
    Relational.q93_snapshot_diff(spark, dir).collect().foreach { r =>
      (r.getAs[String]("op"): @unchecked) match {
        case "D" => assert(r.getAs[String]("new_md5") == null
          && r.getAs[String]("old_md5") != null)
        case "I" => assert(r.getAs[String]("old_md5") == null
          && r.getAs[String]("new_md5") != null)
        case "U" => assert(r.getAs[String]("old_md5") != null
          && r.getAs[String]("new_md5") != null
          && r.getAs[String]("old_md5") != r.getAs[String]("new_md5"))
      }
    }
  }

  test("SCD2: intervals chain gaplessly, exactly one current row per key") {
    import spark.implicits._
    val log = Seq(
      (10L, ts(0), 1L, "view", 1.0),    // user 1: v1, closed by the tie row
      (11L, ts(0), 1L, "click", 2.0),   // same ts — event_id orders versions
      (12L, ts(2), 1L, "purchase", 3.0),
      (20L, ts(1), 2L, "view", 4.0),    // user 2: closed by a tombstone,
      (21L, ts(2), 2L, "error", 0.0),   //   which stays current (no revive)
      (30L, ts(3), 3L, "view", 5.0))    // user 3: single open version
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val hist = Relational.scd2History(log)
      .orderBy("user_id", "version").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
        r.getAs[Timestamp]("valid_from"), r.getAs[Timestamp]("valid_to"),
        r.getAs[Long]("event_id"), r.getAs[Boolean]("is_current")))
    assert(hist.length == 6, "every change event becomes a version row")
    hist.groupBy(_._1).foreach { case (uid, rows) =>
      assert(rows.map(_._2).toSeq == (1 to rows.length), s"user $uid versions")
      assert(rows.count(_._6) == 1, s"user $uid: exactly one current row")
      assert(rows.last._4 == null && rows.last._6, s"user $uid: open tail")
      // interval chaining: each valid_to equals the next valid_from
      rows.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._4 == b._3, s"user $uid: gap between v${a._2} and v${b._2}")
      }
    }
    // the same-ts tie: versions 1,2 share valid_from; event_id ordered
    val u1 = hist.filter(_._1 == 1L)
    assert(u1.map(_._5).toSeq == Seq(10L, 11L, 12L))
    assert(u1(0)._3 == u1(1)._3, "tie rows share valid_from")
    // compaction consistency: q86's survivor is SCD2's current non-error row
    val snapIds = Relational.applyChangelog(log).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_event_id")).toMap
    hist.filter(_._6).foreach { case (uid, _, _, _, eid, _) =>
      snapIds.get(uid) match {
        case Some(sid) => assert(sid == eid, s"user $uid current mismatch")
        case None => // tombstone-current: absent from the compacted snapshot
      }
    }
  }
}
