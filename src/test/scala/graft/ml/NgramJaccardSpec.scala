package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Guards the round-13 kernel rewrite of `ngramJaccardPairs` (hashed
  * shingles via the compiled UDF + ride-along sizes, no join-backs): on
  * seeded random corpora with near-dup clusters, the kernel's pair set
  * must equal an in-memory reference computed over STRING 3-gram
  * shingles with the same df ∈ [2, 20] stop-shingle cap. A hash that
  * collides in-doc, a mis-ridden size, or a broken pair orientation
  * diverges HERE even if the fixture corpus never exercises it. */
class NgramJaccardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** The kernel's exact contract, string-shingled: distinct 3-gram
    * shingles per doc; only shingles with document frequency in [2, 20]
    * generate candidate pairs AND intersection counts; sizes are FULL
    * distinct-shingle counts; jaccard rounded half-up to 6. */
  private def brute(docs: Seq[(Long, Seq[String])]): Set[(Long, Long, Double)] = {
    val shingles = docs.map { case (id, t) =>
      id -> t.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val df = shingles.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val pairable: Set[String] = df.collect { case (s, n) if n >= 2 && n <= 20 => s }.toSet
    (for {
      (a, sa) <- shingles.toSeq; (b, sb) <- shingles.toSeq if a < b
      inter = (sa & sb & pairable).size if inter > 0
      j = inter.toDouble / (sa.size + sb.size - inter)
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.5
    } yield (a, b, jr)).toSet
  }

  private def corpus(seed: Int, nDocs: Int, vocab: Int): Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(seed)
    (0L until nDocs).map { id =>
      val base = rnd.nextInt(5)
      val protoRnd = new scala.util.Random(100 + base)
      val proto = Seq.fill(10 + protoRnd.nextInt(10))("w" + protoRnd.nextInt(vocab))
      // near-dup mutation: drop/append a few tokens so pairs straddle 0.5;
      // a shared hot prefix pushes some shingles over the df cap
      val mutated = Seq("hot", "hot", "hot") ++
        proto.drop(rnd.nextInt(3)) ++
        Seq.fill(rnd.nextInt(3))("w" + rnd.nextInt(vocab))
      (id, mutated)
    }
  }

  test("hashed-shingle kernel equals the string-shingle reference with the df cap") {
    import spark.implicits._
    for (seed <- Seq(7, 23, 91)) {
      val docs = corpus(seed, nDocs = 60, vocab = 40)
      val got = Similarity.ngramJaccardPairs(
        docs.toDF("doc_id", "t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = brute(docs)
      assert(got == want, s"seed $seed: kernel=${got.size} brute=${want.size} " +
        s"onlyKernel=${(got -- want).take(3)} onlyBrute=${(want -- got).take(3)}")
    }
  }
}
