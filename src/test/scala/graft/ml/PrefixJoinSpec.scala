package graft.ml

import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Losslessness of the generalized prefix-filter kernel
  * (SSJoin/PPJoin), beyond the fixed-corpus oracle gate: on seeded random
  * item-set corpora — tuned so many pairs straddle the threshold and
  * every df regime (unique → corpus-wide hot) occurs — the kernel's pair
  * set must equal an in-memory brute-force O(n²) scan exactly, at
  * multiple thresholds. A prefix too short, a positional bound too
  * tight, or an order inconsistency loses pairs HERE even if the
  * fixture corpus never exercises that geometry. */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def brute(docs: Seq[(Long, Set[String])], t: Double): Set[(Long, Long, Double)] =
    (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa & sb).size if inter > 0
      j = inter.toDouble / (sa.size + sb.size - inter)
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= t
    } yield (a, b, jr)).toSet

  private def corpus(seed: Int, nDocs: Int, vocab: Int): Seq[(Long, Set[String])] = {
    val rnd = new scala.util.Random(seed)
    // clusters of near-identical sets + singletons: near-dups straddle
    // the threshold; shared low-id items are corpus-wide hot (df ≈ n)
    (0L until nDocs).map { id =>
      val base = rnd.nextInt(6) // 6 cluster prototypes
      val protoRnd = new scala.util.Random(base)
      val proto = Set.fill(8 + protoRnd.nextInt(8))("w" + protoRnd.nextInt(vocab))
      val mutated = proto.filter(_ => rnd.nextDouble() > 0.15) ++
        Set.fill(rnd.nextInt(4))("w" + rnd.nextInt(vocab))
      (id, mutated + "hot0" + ("hot" + rnd.nextInt(2))) // hot items, df ~ n/2..n
    }
  }

  test("prefix kernel ≡ brute force on random set corpora, multiple thresholds") {
    import spark.implicits._
    for (seed <- Seq(1, 2); t <- Seq(0.5, 0.7)) {
      val docs = corpus(seed, nDocs = 40, vocab = 60)
      val frame = docs.flatMap { case (id, items) => items.map(id -> _) }
        .toDF("doc_id", "shingle")
      val got = Similarity.prefixJaccardPairs(frame, t)
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Double]("jaccard"))).toSet
      val want = brute(docs, t)
      assert(got == want,
        s"seed=$seed t=$t: kernel ${got.size} pairs vs brute ${want.size};" +
          s" missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }
}
