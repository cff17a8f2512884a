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
}
