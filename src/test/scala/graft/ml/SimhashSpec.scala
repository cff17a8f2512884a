package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SimhashAgg (one long[64] vote buffer) must equal the 64-conditional-sums
  * relational encoding bit for bit, across partitionings (merge path). */
class SimhashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("native aggregate ≡ 64-column encoding on the corpus") {
    val a = Similarity.simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Similarity.simhashSql(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == b.size && a == b)
  }

  test("partitioning-invariant (partial buffers merge associatively)") {
    import spark.implicits._
    val rows = (1 to 2000).map(i =>
      ((i % 37).toLong, scala.util.hashing.MurmurHash3.stringHash(s"t$i").toLong
        * 2654435761L, (i % 5 + 1).toLong))
    def sig(parts: Int): Map[Long, Long] =
      rows.toDF("doc_id", "h", "freq").repartition(parts)
        .groupBy(col("doc_id"))
        .agg(SimhashFunctions.simhash_agg(col("h"), col("freq")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(2) == sig(17))
  }
}
