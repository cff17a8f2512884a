package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class SubwordSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def c(s: String): Int = SubwordUtil.count(UTF8String.fromString(s))

  private val rnd = new scala.util.Random(42)
  private def randWords(n: Int): Seq[String] =
    Seq.fill(n)((0 until (1 + rnd.nextInt(14)))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)

  test("greedy longest-match segmentation on known words") {
    assert(c("the") == 1)        // whole-word vocab piece
    assert(c("ation") == 1)      // longest (5-char) piece
    assert(c("testing") == 3)    // te|st|ing — greedy at each position
    assert(c("12345") == 5)      // no digit pieces: one token per digit
    assert(c("a") == 1)          // single-char fallback
    assert(c("xqzw") == 4)       // nothing matches: all fallback
    assert(c("") == 0)
  }

  test("piece count is bounded: ceil(len/maxLen) <= count <= len") {
    randWords(500).foreach { w =>
      val n = c(w)
      assert(n <= w.length, s"'$w' -> $n")
      assert(n >= (w.length + SubwordUtil.MaxLen - 1) / SubwordUtil.MaxLen,
        s"'$w' -> $n")
    }
  }

  test("segmentation matches an independent reference walk") {
    val vocab = SubwordUtil.Vocab.toSet
    def ref(w: String): Int = {
      var pos = 0; var n = 0
      while (pos < w.length) {
        val l = (math.min(SubwordUtil.MaxLen, w.length - pos) to 2 by -1)
          .find(k => vocab.contains(w.substring(pos, pos + k))).getOrElse(1)
        pos += l; n += 1
      }
      n
    }
    (randWords(500) ++ SubwordUtil.Vocab).foreach { w =>
      assert(c(w) == ref(w), s"'$w'")
    }
  }

  test("pieces: concat reassembles the word, length equals subword_count") {
    import spark.implicits._
    val words = (Seq("the", "testing", "overestimation", "12345", "x1y2",
      "...", "q", "") ++ randWords(300)).distinct
    val got = words.toDF("w")
      .select(col("w"), Subword.subword_pieces(col("w")).as("ps"),
        Subword.subword_count(col("w")).as("n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getSeq[String](1), r.getInt(2))))
      .toMap
    words.foreach { w =>
      val (ps, n) = got(w)
      assert(ps.mkString("") == w, s"pieces of '$w' don't reassemble: $ps")
      assert(ps.length == n, s"'$w': ${ps.length} pieces vs count $n")
      assert(ps.forall(_.nonEmpty), s"'$w' emitted an empty piece")
    }
  }

  test("BPE learning: merges unique, pair counts non-increasing, symbols real") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusFilters.q94_bpe_learn(spark, dir).collect()
    assert(rows.length == CorpusFilters.BpeRounds)
    assert(rows.map(_.getAs[Int]("round")).toSeq == (1 to CorpusFilters.BpeRounds))
    val merges = rows.map(r => (r.getAs[String]("merge_left"),
      r.getAs[String]("merge_right"), r.getAs[Long]("pair_count")))
    assert(merges.map(m => (m._1, m._2)).distinct.length == merges.length,
      "the same pair must never be the argmax twice (its occurrences are gone)")
    // every occurrence of a post-merge pair (x, ab) needs an occurrence of
    // ab, so the winning count can never rise across rounds
    merges.map(_._3).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"pair count rose $a -> $b")
    }
    // merged symbols decompose into characters of the corpus alphabet
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("merge_left") + r.getAs[String]("merge_right"))
      assert(r.getAs[String]("merged").matches("[a-z0-9]+"))
    }
  }

  test("codegen column path matches the direct eval") {
    import spark.implicits._
    val words = Seq("the", "testing", "overestimation", "x1y2", "...", "q") ++
      randWords(100)
    val got = words.distinct.toDF("w")
      .select(col("w"), Subword.subword_count(col("w")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    words.foreach(w => assert(got(w) == c(w), s"codegen mismatch for '$w'"))
  }

  test("unigram Viterbi DP matches brute-force segmentation enumeration") {
    // hand-built model with real ambiguity: 'abc' can split many ways
    val vocab = Map("a" -> 10L, "b" -> 5L, "c" -> 5L, "d" -> 1L,
      "ab" -> 20L, "bc" -> 30L, "abc" -> 8L, "cd" -> 2L, "abcd" -> 1L)
    // brute force: every composition of the word into vocab pieces,
    // scored exactly like the DP key (fewest pieces, highest sum, lex path)
    def enumerate(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(w.length, CorpusFilters.UniMaxPiece)).flatMap { k =>
        val (h, t) = (w.take(k), w.drop(k))
        if (vocab.contains(h)) enumerate(t).map(h :: _) else Nil
      }
    def keyOf(pieces: List[String]): String =
      f"${pieces.length}%02d" +
        f"${1000000000000L - pieces.map(vocab).sum}%013d" +
        pieces.map("|" + _).mkString
    for (w <- Seq("abc", "abcd", "abcabc", "dcba", "aabbcc", "abcdabcd",
        "dddd", "cab")) {
      val all = enumerate(w)
      val got = CorpusFilters.uniSegmentKey(w, vocab)
      if (all.isEmpty) assert(got == null, s"'$w' has no segmentation")
      else assert(got == all.map(keyOf).min,
        s"DP diverged from brute force on '$w': $got vs ${all.map(keyOf).min}")
    }
    // objective sanity on the ambiguous case: 'abc' → ['abc'] (1 piece
    // beats any 2-piece split regardless of scores)
    assert(CorpusFilters.uniSegmentKey("abc", vocab).endsWith("|abc"))
    // among 2-piece splits of 'abcd': ab|cd (sum 22) beats abc|d (sum 9)
    assert(CorpusFilters.uniSegmentKey("abcd", vocab).endsWith("|abcd"),
      "whole-word piece wins at 1 piece")
    val noWhole = vocab - "abcd"
    assert(CorpusFilters.uniSegmentKey("abcd", noWhole).endsWith("|ab|cd"))
  }

  test("unigram DP vs brute force on randomized vocabularies") {
    val rnd = new scala.util.Random(1234)
    val alphabet = "abc" // dense alphabet → heavy segmentation ambiguity
    for (trial <- 1 to 25) {
      val word = Seq.fill(3 + rnd.nextInt(6))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      // chars always present; random multi-char substrings with random scores
      val subs = (for {
        i <- 0 until word.length
        j <- (i + 2) to math.min(word.length, i + CorpusFilters.UniMaxPiece)
      } yield word.substring(i, j)).distinct.filter(_ => rnd.nextBoolean())
      val vocab: Map[String, Long] =
        (alphabet.map(c => c.toString -> (1L + rnd.nextInt(50))) ++
          subs.map(p => p -> (1L + rnd.nextInt(50)).toLong)).toMap
      def enumerate(w: String): Seq[List[String]] =
        if (w.isEmpty) Seq(Nil)
        else (1 to math.min(w.length, CorpusFilters.UniMaxPiece)).flatMap { k =>
          if (vocab.contains(w.take(k))) enumerate(w.drop(k)).map(w.take(k) :: _)
          else Nil
        }
      def keyOf(pieces: List[String]): String =
        f"${pieces.length}%02d" +
          f"${1000000000000L - pieces.map(vocab).sum}%013d" +
          pieces.map("|" + _).mkString
      val want = enumerate(word).map(keyOf).min // chars present → non-empty
      val got = CorpusFilters.uniSegmentKey(word, vocab)
      assert(got == want, s"trial $trial '$word': DP $got vs brute $want")
    }
  }

  test("q105b tokenize: per-doc counts match a driver-side re-segmentation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val vocab = CorpusFilters.uniTrain(spark, dir)._2
    val rows = CorpusFilters.q105b_unigram_tokenize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // independent recomputation: tokenize each doc's words through the
    // shared DP with the same trained model, summing key-decoded counts
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    rows.foreach { case (id, nWords, nPieces) =>
      val words = docs(id).trim.split(" ").filter(_.nonEmpty)
      assert(nWords == words.length, s"doc $id word count")
      val want = words.map(w =>
        CorpusFilters.uniSegmentKey(w, vocab).substring(0, 2).toLong).sum
      assert(nPieces == want, s"doc $id: $nPieces unigram tokens, expected $want")
      assert(nPieces >= nWords, "every word is at least one piece")
    }
  }

  test("q105 trajectory invariants: chars never drop, vocab shrinks to size") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusFilters.q105_unigram_learn(spark, dir).collect()
    val drops = rows.filter(_.getString(1) == "drop")
    val keeps = rows.filter(_.getString(1) == "keep")
    assert(drops.length == CorpusFilters.UniRounds * CorpusFilters.UniPrunePerRound)
    assert(drops.forall(!_.getBoolean(4)), "single chars must never drop")
    val keptMulti = keeps.count(!_.getBoolean(4))
    assert(keptMulti ==
      CorpusFilters.UniSeedMulti - CorpusFilters.UniRounds * CorpusFilters.UniPrunePerRound,
      s"final multi-char vocab size wrong: $keptMulti")
    // every kept multi-char piece is actually used (survived 4 usage prunes)
    assert(keeps.filter(!_.getBoolean(4)).forall(_.getLong(3) > 0),
      "surviving multi-char pieces must have nonzero usage")
  }

  test("byte-level BPE: any UTF-8 round-trips with zero unk under any merge table") {
    // totality is byte-level BPE's defining property (GPT-2's byte
    // fallback): every byte is in the closed 256-symbol alphabet, merges
    // only CONCATENATE symbols, so decode(segments(s)) == s for every
    // string and EVERY merge table — including merges that never fire
    // and chained merges over merged symbols
    val samples = Seq(
      "hello", "hello world", "héllo wörld", "naïve café résumé",
      "日本語のテキスト", "🎉 emoji ✨ test 🚀", "ñ", "mixed03num x1",
      "tabs\tand\nnewlines", "quote'and\"pipe|chars", "é́",
      "ασδφ ελληνικά", "русский текст", "한국어")
    val mergeTables = Seq(
      Seq.empty[(String, String)],
      // plausible learned merges: 'he', then 'hel', then 'lo'
      Seq("68" -> "65", "6865" -> "6C", "6C" -> "6F"),
      // merges over multi-byte UTF-8 prefixes (C3 is é/ö's lead byte)
      Seq("C3" -> "A9", "C3" -> "B6", "E6" -> "97"),
      // adversarial: self-merge (aa), then merge of the merged symbol
      Seq("61" -> "61", "6161" -> "6161", "20" -> "20"))
    for (s <- samples; m <- mergeTables) {
      val pieces = CorpusFilters.byteBpeSegments(s, m)
      assert(pieces.nonEmpty && pieces.forall(_.matches("([0-9A-F][0-9A-F])+")),
        s"pieces must be whole hex bytes: $pieces")
      assert(CorpusFilters.byteBpeDecode(pieces) == s,
        s"round-trip failed for '$s' under $m: $pieces")
    }
    // with no merges, segmentation IS the byte sequence (the closed
    // alphabet): piece count == UTF-8 byte length
    for (s <- samples)
      assert(CorpusFilters.byteBpeSegments(s, Nil).size == s.getBytes("UTF-8").length)
    // left-to-right non-overlap: 'aaa' under (a,a) -> [aa, a], engine rule
    assert(CorpusFilters.byteBpeSegments("aaa", Seq("61" -> "61")) ==
      Seq("6161", "61"))
  }

  test("byte-BPE Spark apply chain matches the driver-side surgery on learned merges") {
    // learn the real sf0.001 merges, then re-segment every distinct word
    // driver-side with the Scala twin and compare piece counts with the
    // engine's replace-chain column (same surgery, two implementations)
    val dir = "/root/testdata/sf0.001"
    val merges = CorpusFilters.q112_bytebpe_learn(spark, dir)
      .orderBy(org.apache.spark.sql.functions.col("round")).collect()
      .map(r => (r.getAs[String]("merge_left"), r.getAs[String]("merge_right"))).toSeq
    assert(merges.size == CorpusFilters.BpeRounds)
    assert(merges.distinct.size == merges.size, "merges must be unique")
    val perDoc = CorpusFilters.q112b_bytebpe_tokenize(spark, dir).collect()
    val docs = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    perDoc.take(50).foreach { r =>
      val words = docs(r.getAs[Long]("doc_id")).trim.split(" ").filter(_.nonEmpty)
      val expected = words.map(w =>
        CorpusFilters.byteBpeSegments(w, merges).size.toLong).sum
      assert(r.getAs[Long]("n_byte_tokens") == expected,
        s"doc ${r.getAs[Long]("doc_id")}: engine ${r.getAs[Long]("n_byte_tokens")} vs driver $expected")
      assert(r.getAs[Long]("n_words") == words.length.toLong)
    }
    // byte segmentation never needs unk: decode restores every word
    docs.values.take(20).foreach { t =>
      t.trim.split(" ").filter(_.nonEmpty).foreach { w =>
        assert(CorpusFilters.byteBpeDecode(
          CorpusFilters.byteBpeSegments(w, merges)) == w)
      }
    }
  }

  test("WordPiece training matches a brute-force likelihood-merge reference") {
    // independent pure-Scala replay of the Schuster-Nakajima rule over the
    // same corpus word frequencies: seed ##-marked chars, then K rounds of
    // exact-BigInt floor(c*1e18/(f_l*f_r)) argmax with (score desc, l, r)
    // tiebreak and prefix-stripping merge
    val dir = "/root/testdata/sf0.001"
    val freq = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(_.getString(0).trim.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    var syms: Map[Vector[String], Long] = freq.toSeq
      .map { case (w, c) =>
        w.toVector.zipWithIndex
          .map { case (ch, i) => if (i == 0) ch.toString else "##" + ch } -> c
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val scale = BigInt(10).pow(18)
    val expected = (1 to CorpusFilters.WpRounds).map { _ =>
      val f = scala.collection.mutable.Map.empty[String, Long]
      val p = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (ss, c) =>
        ss.foreach(x => f(x) = f.getOrElse(x, 0L) + c)
        ss.sliding(2).filter(_.size == 2)
          .foreach(q => p((q(0), q(1))) = p.getOrElse((q(0), q(1)), 0L) + c)
      }
      val ((l, r), c) = p.toSeq.minBy { case ((l, r), c) =>
        (-(BigInt(c) * scale) / (BigInt(f(l)) * BigInt(f(r))), l, r)
      }
      val sk = ((BigInt(c) * scale) / (BigInt(f(l)) * BigInt(f(r)))).toLong
      val merged = l + r.substring(2)
      syms = syms.map { case (ss, cc) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
            out += merged; i += 2
          } else { out += ss(i); i += 1 }
        }
        out.result() -> cc
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      (l, r, merged, c, sk)
    }
    val got = CorpusFilters.q116_wordpiece_learn(spark, dir).collect()
      .map(r => (r.getAs[String]("merge_left"), r.getAs[String]("merge_right"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count"),
        r.getAs[Long]("score_key"))).toSeq
    assert(got == expected, s"engine merges diverge from reference:\n$got\nvs\n$expected")
    // structural invariants: right side always a continuation; score <= 1e18
    got.foreach { case (l, r, m, _, sk) =>
      assert(r.startsWith("##"))
      assert(m == l + r.substring(2))
      assert(sk >= 0 && sk <= 1000000000000000000L)
    }
  }

  test("trained-WordPiece MaxMatch apply matches a driver reference walk") {
    val dir = "/root/testdata/sf0.001"
    val merged = CorpusFilters.q116_wordpiece_learn(spark, dir).collect()
      .map(_.getAs[String]("merged")).toSet
    val docs = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // vocab = positional alphabet of the corpus + merged symbols
    val alpha = docs.values
      .flatMap(_.trim.split(" ").filter(_.nonEmpty))
      .flatMap(w => w.toVector.zipWithIndex
        .map { case (ch, i) => if (i == 0) ch.toString else "##" + ch })
      .toSet
    val vocab = alpha ++ merged
    def walk(w: String): Long = {
      var pos = 0; var n = 0L
      while (pos < w.length) {
        val len = (math.min(w.length - pos,
          vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max) to 1 by -1)
          .find { k =>
            val cand = if (pos == 0) w.substring(pos, pos + k)
              else "##" + w.substring(pos, pos + k)
            vocab(cand)
          }.getOrElse(fail(s"stuck on '$w' at $pos"))
        pos += len; n += 1
      }
      n
    }
    val perDoc = CorpusFilters.q116b_wordpiece_tokenize(spark, dir).collect()
    perDoc.take(60).foreach { r =>
      val words = docs(r.getAs[Long]("doc_id")).trim.split(" ").filter(_.nonEmpty)
      assert(r.getAs[Long]("n_wp_tokens") == words.map(walk).sum,
        s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("n_words") == words.length.toLong)
    }
  }

  test("q204 fertility: per-lang rows roll up q94b's per-doc counts " +
    "exactly; metric identities hold") {
    val sf = "/root/testdata/sf0.001"
    val fert = CorpusFilters.q204_tokenizer_fertility(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // independent roll-up: q94b per-doc piece counts joined to doc langs
    val perDoc = CorpusFilters.q94b_bpe_tokenize(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_words")).as("w"), sum(col("n_bpe_tokens")).as("p"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(fert.keySet == perDoc.keySet)
    perDoc.foreach { case (lang, (nd, w, p)) =>
      val (fnd, fw, fp, _, per100, charsMilli) = fert(lang)
      assert(fnd == nd && fw == w && fp == p, s"roll-up for $lang")
      assert(per100 == 100 * p / w, "fertility floor-division identity")
      assert(per100 >= 100, "a word is at least one piece")
      assert(charsMilli >= 1000,
        "pieces never exceed characters (merges only shrink)")
    }
  }
}
