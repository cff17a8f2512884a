package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q155: the planted-topic recovery contract must hold with margin —
  * all four planted topics recovered, doc-majority clean — and the
  * generated corpus must be the documented fixed shape (the DuckDB twin
  * regenerates it; this spec pins the Spark side independently). */
class LdaRecoverySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("planted-topic recovery gates hold (dir-independent generator)") {
    val r = Lda.q155_lda_recovery(spark, "/root/testdata/sf0.001").head()
    assert(r.getLong(0) == 240L, "n_docs")
    assert(r.getString(1).length == 32, "md5 digest shape")
    assert(r.getLong(2) == 4L, "n_planted")
    assert(r.getLong(3) == 4L, "all four planted topics recovered")
    assert(r.getBoolean(4), "topics_ok")
    assert(r.getBoolean(5), "docs_ok")
  }
}
