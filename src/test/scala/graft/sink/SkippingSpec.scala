package graft.sink

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Data-skipping index (q131): the pruning must be real, not just
  * consistent — zone maps collapse present probes to one file per lang
  * and out-of-domain probes to zero files. */
class SkippingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private lazy val rows =
    Skipping.q131_data_skipping(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7),
        r.getBoolean(8)))

  test("every probe: no false negatives and the pruned scan is exact") {
    assert(rows.length == 10)
    rows.foreach { case (i, _, _, _, mm, cand, _, nfn, ok) =>
      assert(nfn, s"probe $i lost its true file")
      assert(ok, s"probe $i pruned scan wrong")
      assert(cand <= mm, s"probe $i bloom widened the candidate set")
    }
  }

  test("zone maps prune: in-domain probes hit at most one file per lang") {
    // range clustering means each lang contributes exactly one bucket
    // whose [mn,mx] can contain the probe
    val langs = 5
    rows.filter(_._5 > 0).foreach { case (i, _, _, nf, mm, _, _, _, _) =>
      assert(mm <= langs, s"probe $i: $mm files passed min/max of $nf")
    }
  }

  test("out-of-domain probes prune to zero files from stats alone") {
    val outOfDomain = rows.filter(r => !r._3 && r._5 == 0)
    assert(outOfDomain.nonEmpty,
      "fixture should draw some probes beyond the id domain")
    outOfDomain.foreach { case (i, _, _, _, _, cand, _, _, _) =>
      assert(cand == 0, s"probe $i: candidates without min/max survivors")
    }
  }

  test("present probes are found; their candidate set is nonempty") {
    val present = rows.filter(_._3)
    assert(present.nonEmpty)
    present.foreach { case (i, _, _, _, mm, cand, nTrue, _, _) =>
      assert(nTrue == 1 && cand >= 1 && mm >= 1, s"probe $i")
    }
  }
}
