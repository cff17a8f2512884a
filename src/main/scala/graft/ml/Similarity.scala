package graft.ml

import graft.Tables
import graft.text.Cleanse
import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Similarity search + near-duplicate detection (SURVEY.md §2.5 G18/G19 and
  * the LLM-pipeline operators: ANN over embeddings, MinHash/SimHash/n-gram
  * Jaccard dedup).
  *
  * Scale design: the oracle-checked brute-force paths bound one side (query
  * set / doc-id window) so the cross product stays linear in the corpus; the
  * engine paths (LSH bucketing, MLlib MinHashLSH, SimHash banding) are the
  * 100 TB algorithms — candidate generation via equi-join on bucket keys
  * (hash shuffle, no cross product), exact re-scoring only within buckets.
  */
object Similarity {

  /** Sequential dot product over two double arrays — the native codegen'd
    * expression (see ml.DotProductD); same index-order evaluation as
    * DuckDB's list_dot_product, so rounded oracle results agree. */
  private def dot(a: Column, b: Column): Column = VecFunctions.dot_d(a, b)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddingsFanned(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  // ------------------------------------------------------------------- G19
  /** Brute-force cosine top-5 for a small query set (vec_id < 5) against
    * the full collection: the correctness baseline for ANN. The query side
    * is broadcast; the big side streams — one scan, no shuffle until the
    * tiny per-query top-k. */
  def q19_similarity_topk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_r").desc, col("neighbor_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qemb"), col("emb")), 6).as("sim_r"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------- n-gram Jaccard dedup
  /** Exact token-3-gram Jaccard near-dup pairs (J ≥ 0.5) via shingle
    * inverted-index self-join — no cross product: pairs only materialize
    * for docs sharing a shingle. The standard exact-dedup shape at scale
    * (explode → equi-join on shingle → agg). */
  def q33_ngram_jaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documentsFanned(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t")))
      .orderBy(col("doc_a"), col("doc_b"))

  /** The q33 kernel over any (doc_id, t) token frame — also the near-dup
    * stage of the q70 curation funnel, which feeds it the corpus-bucket
    * docs only. */
  private[graft] def ngramJaccardPairs(toks: DataFrame): DataFrame = {
    // HASHED shingle representation (round-13; the q79 long-ids lesson
    // applied to the lossy kernel too): the shingle key is a 64-bit hash
    // of the token triple (see [[hashedShingles]]) — an 8-byte long —
    // instead of the concat_ws string (~20+ chars). Distinctness, sizes and pair
    // intersections are identical to the string form modulo 64-bit
    // collisions; nothing downstream reads the shingle value. Honesty at
    // scale: at ~10^12 distinct shingles birthday collisions DO occur,
    // each perturbing one pair's jaccard by ±1/|union| — noise far below
    // the 0.5-threshold decision for a lossy near-dup kernel whose cap
    // already drops hot shingles; the exact-string path remains q79's
    // lossless prefix kernel.
    //
    // Doc sizes RIDE THE EXPLODED ROWS (round-13): n = |distinct shingles|
    // is computed map-side on the pre-explode array and carried as an
    // 8-byte column on every (shingle, doc) incidence, so the pair
    // expansion emits (doc_a, na, doc_b, nb) complete and the jaccard is
    // a pure per-group expression — the previous shape re-derived sizes
    // by re-exploding the bucket lists and joined them back onto the pair
    // aggregate twice. One groupBy(shingle) shuffle + one (tiny,
    // cap-bounded) pair shuffle is now the whole kernel: no sizes pass,
    // no joins, one consumer per exchange. Measured at sf0.1 the kernel
    // dropped ~40 % wall-clock (strings→longs + this).
    val sh = toks
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), hashedShingles(col("t")).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n"),
        explode(col("shs")).as("shingle"))
    // Candidate pairs come from ONE groupBy(shingle) pass that buckets the
    // (≤ 20) (doc_id, n) structs per pairable shingle and expands C(df,2)
    // ordered pairs in-task (sort_array orders by doc_id first, so
    // doc_a < doc_b orientation is preserved).
    // Hot-shingle ceiling (df ≤ 20): a shingle shared by many documents
    // generates O(df²) candidate pairs while carrying no near-dup signal —
    // the classic "stop-shingle" guard that keeps pair volume linear at
    // 100 TB. df=1 shingles can't form a pair, so they're dropped too
    // (pure pruning; the DuckDB twin keeps them and agrees — a lone
    // shingle never reaches `inter`). collect_list buffers O(df) structs
    // per shingle before the filter — fine for real shingle-frequency
    // tails; a pathological ultra-hot head would get a count-min/sample
    // prefilter in production, the documented guard.
    val buckets = sh.groupBy(col("shingle"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
    val pairs = buckets
      .filter(size(col("ds")).between(2, 20))
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y ->
          |    struct(x.doc_id AS doc_a, x.n AS na,
          |           y.doc_id AS doc_b, y.n AS nb))))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.na"), col("p.doc_b"), col("p.nb"))
    pairs
      .groupBy(col("doc_a"), col("na"), col("doc_b"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** Distinct hashed 3-shingles of a token array, as one compiled UDF:
    * the `transform(sequence(...), i -> xxhash64(...))` lambda form is
    * INTERPRETED per shingle instance (the round-4 HOF lesson — no
    * codegen inside higher-order functions), which dominated the kernel's
    * map side. Here each token hashes ONCE (FNV-1a 64 over its UTF-16
    * chars), triples combine with splitmix64 finalizers, and dedup is a
    * primitive sort + unique sweep — O(n log n) with zero boxing. The
    * hash need not match any engine function: shingle values never
    * surface (see the kernel scaladoc), only their equality does. */
  private val hashedShingles = udf { (t: Seq[String]) =>
    def mix(z0: Long): Long = { // splitmix64 finalizer — public domain
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val n = t.length
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { // FNV-1a 64 per token, computed once
      val s = t(i)
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < s.length) { h = (h ^ s.charAt(j)) * 0x100000001b3L; j += 1 }
      th(i) = h
      i += 1
    }
    val sh = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      sh(i) = mix(mix(mix(th(i)) ^ th(i + 1)) ^ th(i + 2))
      i += 1
    }
    java.util.Arrays.sort(sh)
    var k = 0
    i = 0
    while (i < sh.length) { // unique sweep in place
      if (i == 0 || sh(i) != sh(i - 1)) { sh(k) = sh(i); k += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(sh, k)
  }

  /** LOSSLESS exact Jaccard ≥ 0.5 pairs via PREFIX FILTERING (Chaudhuri
    * et al. SSJoin / Bayardo et al. "Scaling up all pairs" — public
    * algorithms): q33's hot-shingle cap (df ≤ 20) keeps pair volume
    * linear but is LOSSY — a pair sharing only hot shingles is missed.
    * Prefix filtering removes the cap without the blowup: order every
    * doc's shingles by ascending global frequency and index only the
    * first n − ceil(t·n) + 1 of them; any two sets with J ≥ t MUST share
    * a prefix element under a common total order, so candidate
    * generation over the prefix index alone is complete. Buckets stay
    * small because prefixes hold each doc's RAREST shingles. Candidates
    * verify exactly in-task via array_intersect on the two docs' full
    * shingle arrays — no second inverted-index pass.
    *
    * Scale: one shingle shuffle for df, one for the per-doc sort, one
    * prefix-bucket shuffle, then a candidate join against doc-sized
    * arrays. Oracle: the UNCAPPED brute inverted-index join — the truth
    * q33's cap approximates.
    *
    * The verify join intersects arrays of dense LONG shingle ids, not the
    * shingle strings: ids are assigned off the df table (vocabulary-sized)
    * and docs carry `ordered: array<long>` — 8 bytes per element vs ~20+
    * char strings, and array_intersect compares longs instead of strings.
    * The global prefix order is still (df asc, shingle asc): ids ride along
    * in the per-doc struct sort, they never decide it, so candidate
    * generation stays deterministic and exactly lossless. Measured at
    * sf0.1: 15.7 s with string-array verify → 3.7 s with long ids. */
  def q79_jaccard_prefix(s: SparkSession, dir: String): DataFrame =
    prefixJaccardPairs(
      Tables.documentsFanned(s, dir)
        .select(col("doc_id"), Cleanse.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(1, size(t)-2), i -> concat_ws(' ', element_at(t,i), element_at(t,i+1), element_at(t,i+2)))")))
          .as("shingle")),
      t = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  /** The q79 kernel over ANY (doc_id, shingle) distinct-item frame and
    * threshold — exact Jaccard ≥ t pairs, lossless, prefix+positional
    * filtered. Also the exact-truth side of the q84 MLlib-LSH recall gate
    * (item = distinct token, t = 0.7). Returns unsorted pinned pairs;
    * corpus-sized intermediates are released before returning. */
  private[graft] def prefixJaccardPairs(sh: DataFrame, t: Double): DataFrame = {
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // Unique (not order-carrying) long id per shingle, shuffle-free:
    // monotonically_increasing_id packs (partition, row) bits. ids has
    // exactly ONE consumer — the docsets build below, materialized once by
    // its localCheckpoint — so the nondeterminism across re-evaluations
    // that normally makes this id dangerous cannot be observed.
    val ids = df.select(col("shingle"), col("df"),
      monotonically_increasing_id().as("sid"))
    // docsets has THREE consumers (prefix explode + both verification
    // joins); without pinning, the whole shingle+df+sort chain re-executes
    // per consumer. localCheckpoint materializes it once — same pattern as
    // the components fixpoint; on a cluster this is a reliable checkpoint
    // of a corpus-sized table. (Pinned blocks are dropped below once the
    // pair result — bounded by the true near-dup count, ≪ corpus — is
    // itself pinned, so a long-lived session does not accumulate a corpus
    // of shingle arrays per q79 call.)
    val docsets = sh.join(ids, "shingle")
      .groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(df, shingle, sid))), x -> x.sid)")
        .as("ordered"))
      .select(col("doc_id"), col("ordered"), size(col("ordered")).as("n"),
        expr(s"slice(ordered, 1, size(ordered) - CAST(ceil($t * size(ordered)) AS INT) + 1)")
          .as("prefix"))
      .localCheckpoint()
    // PPJoin's POSITIONAL filter prunes inside the bucket expansion, before
    // candidates materialize: a pair sharing the element at (0-based)
    // prefix positions (px, py) can overlap at most ub = min(nx−px, ny−py),
    // so it can reach J ≥ t only if ub/(nx+ny−ub) ≥ t. Lossless: the pair's
    // FIRST common element in the global order satisfies the bound whenever
    // J ≥ t (PPJoin Lemma 1), and that occurrence always survives — later
    // buckets may over-prune the same pair harmlessly. Subsumes the length
    // filter (the px=py=0 case). Measured at sf0.1: candidates 310k with
    // prefix+length filters alone → 125k with the positional filter.
    val cands = docsets
      .select(col("doc_id"), col("n"), posexplode(col("prefix")).as(Seq("pos", "sid")))
      .groupBy(col("sid"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n"), col("pos")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        s"""flatten(transform(ds, (x, i) ->
           |  filter(transform(slice(ds, i + 2, size(ds)), y ->
           |    struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
           |      least(x.n - x.pos, y.n - y.pos) /
           |        (x.n + y.n - least(x.n - x.pos, y.n - y.pos)) >= $t AS ok)),
           |    p -> p.ok)))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
      // AQE coalesces this shuffle to one partition (the pair list is
      // tiny in BYTES) — but the verify join below costs a full long-array
      // intersection PER ROW, so fan it out explicitly (measured: the
      // verify stage ran 2.0 s in 1 task at sf0.1)
      .repartition(sh.sparkSession.sparkContext.defaultParallelism)
    val scored = cands
      .join(docsets.select(col("doc_id").as("doc_a"), col("ordered").as("ta"),
        col("n").as("na")), "doc_a")
      .join(docsets.select(col("doc_id").as("doc_b"), col("ordered").as("tb"),
        col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ta"), col("tb"))).as("inter"),
        col("na"), col("nb"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= t)
    // Eagerly pin the (pair-count-sized) result, then drop docsets' corpus
    // of pinned shingle arrays — the caller sees a plan over the small
    // pinned pairs only (same release discipline as componentsWithRounds).
    val out = scored.localCheckpoint()
    pinnedRdds(docsets).foreach(_.unpersist(blocking = false))
    out
  }

  // ---------------------------------------------------- engine-only: ANN
  /** Banded random-hyperplane (SimHash-for-cosine) signatures: `bands`
    * independent hash tables of `planes` sign bits each. Two vectors
    * collide in a band with P = (1 - θ/π)^planes, in ≥1 band with
    * 1-(1-P)^bands — the classic LSH amplification (Indyk-Motwani / Charikar
    * STOC'02). Emits (vec_id, band, key) — candidate generation is then a
    * plain equi-join on (band, key): a hash shuffle, never a cross product.
    * One projection pass computes all bands×planes dots per row. */
  private def bandKeys(s: SparkSession, e: DataFrame,
      bands: Int, planes: Int, dim: Int = 64): DataFrame = {
    val rnd = new scala.util.Random(42)
    val hyper: IndexedSeq[Seq[Double]] =
      IndexedSeq.fill(bands * planes)(IndexedSeq.fill(dim)(rnd.nextGaussian()))
    // bands×planes sign bits via the native codegen'd dot expression.
    // History of this hot path: builtin aggregate/zip_with HOFs run
    // interpreted (129 s at sf0.01) → compiled Scala UDF (<2 s) → this
    // fully-codegen expression form (no encoder boundary, reads
    // UnsafeArrayData in place) — the preference ladder from the design
    // notes, with measurements.
    def key(b: Int): Column =
      (0 until planes).map { i =>
        when(dot(col("emb"), typedlit(hyper(b * planes + i))) >= 0,
          lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    e.select(col("vec_id"), col("emb"), posexplode(
      array((0 until bands).map(b => key(b)): _*)).as(Seq("band", "key")))
  }

  /** ANN top-3 for 50 query vectors: candidates share any of 8×6-bit band
    * keys (≈52 % recall per cos-0.5 pair, ≫99 % for true near-dups);
    * exact cosine re-scores candidates only. At 100 TB: the band join
    * shuffles (band,key)-partitioned — no broadcast of the corpus, no
    * cross product, and bucket skew is bounded by 2^planes per band. */
  def m_ann_lsh(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val keys = bandKeys(s, e, bands = 8, planes = 6)
    val q = keys.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("band"), col("key"))
    val cands = q.join(keys, Seq("band", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qemb"), col("vec_id").as("neighbor_id"),
        col("emb"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cands
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qemb"), col("emb")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Band-bucket size distribution for the seeded-hyperplane LSH keys —
    * the measurement behind [[BandBucketCap]] (spec/probe surface). */
  private[graft] def bandBucketStats(s: SparkSession, dir: String)
      : (Long, Long, Double) = {
    val e = emb(s, dir)
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
      .select(col("vec_id"),
        transform(col("emb"), x => x / col("nrm")).as("emb"))
    val r = bandKeys(s, e, bands = 8, planes = 6)
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")), count(lit(1)), avg(col("n"))).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  /** Global top-20 most-similar embedding pairs via banded LSH candidates
    * (threshold-free: labels are uncorrelated with cosine in this corpus,
    * max pair cosine ≈0.51, so a 0.9-style cutoff would be vacuous).
    * Scale shape: candidates = Σ_buckets C(|bucket|,2) ≪ C(n,2); pair ids
    * dedup BEFORE scoring; norms precomputed once per vector, not per pair.
    * Brute-force all-pairs (the old shape) was 27 s at sf0.1 and O(n²) —
    * this is the 100 TB-viable form. */
  def m_dedup_embedding(s: SparkSession, dir: String): DataFrame = {
    // norm as a scalar column FIRST: dividing inside transform would
    // re-evaluate the interpreted dot() per array element (64× per row)
    val e = emb(s, dir)
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
      .select(col("vec_id"),
        transform(col("emb"), x => x / col("nrm")).as("emb"))
    val keys = bandKeys(s, e, bands = 8, planes = 6)
      .select(col("vec_id"), col("band"), col("key"))
    val pairs = cappedBandPairs(keys, BandBucketCap).distinct()
    pairs
      .join(e.select(col("vec_id").as("id_a"), col("emb").as("emb_a")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("emb").as("emb_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(dot(col("emb_a"), col("emb_b")), 6).as("sim"))
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(20)
  }

  // ---------------------------------------------------- engine-only: IVF
  /** IVF (inverted-file) ANN — the coarse-quantizer scale path
    * complementing LSH: k-means centroids partition the collection; each
    * vector lands in one list; queries probe the `nProbe` nearest lists
    * and re-score exactly inside them. At 100 TB: the centroid table is a
    * broadcast dim (k×dim floats), the collection is hash-partitioned by
    * centroid id, and recall/cost tunes with nProbe — candidate volume is
    * nProbe/k of the corpus instead of all of it. */
  def m_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val k = 16
    // 6 of 16 lists (was 4, was 2): these synthetic embeddings cluster
    // weakly — nProbe=2 sat at ~0.45-0.50 recall@3, nProbe=4 at 0.68-0.71,
    // only ~0.13 above q82's 0.55 floor (round-7 verdict item 6: a floor
    // within ~0.1 of measurement is one fixture regeneration from
    // flaking). 6 lists probe 3/8 of the corpus for measured 0.787 @
    // sf0.01 / 0.807 @ sf0.1 — ≥ 0.23 headroom over the floor, against a
    // 6/16 = 0.375 random-probe baseline that the floor still clears.
    // The seeded twin keeps nProbe=4: its gate is exact (hash), not a
    // recall bound, so margin pressure doesn't apply.
    val nProbe = 6
    val e = emb(s, dir).withColumn("v", array_to_vector(col("emb")))
    val km = new KMeans().setK(k).setSeed(42).setMaxIter(10)
      .setFeaturesCol("v").fit(e)
    val assigned = km.transform(e)
      .select(col("vec_id"), col("emb"), col("prediction").as("list_id"))
    // tiny (k × dim) centroid dim table, broadcast for probe selection
    val cents = s.createDataFrame(
      km.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("list_id", "cent")
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist"), col("list_id"))
    val probes = assigned.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qemb"), col("list_id"),
        (dot(col("qemb"), col("qemb")) - lit(2) * dot(col("qemb"), col("cent"))
          + dot(col("cent"), col("cent"))).as("cdist"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qemb"), col("list_id"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    probes.join(assigned, "list_id") // equi-join on centroid id — no cross product
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qemb"), col("emb")), 6).as("sim"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** RECALL ACCURACY-CONTRACT gate for the KMeans IVF path (round-6
    * verdict item 5): m_ann_ivf's top-3 joins against the exact
    * brute-force top-3 over the same 50-query set (DuckDB-recomputable)
    * and the gate emits ONE row — the query count and a boolean asserting
    * mean recall@3 ≥ the bound. Aggregate, not per-query, deliberately:
    * the centroids are optimizer output, so individual queries' recall
    * jitters with the fit, while the 50-query mean sits well above the
    * bound (measured 0.787 at sf0.01, 0.807 at sf0.1 with nProbe=6 of
    * k=16 — raised from nProbe=4's 0.68-0.71 for ≥ 0.23 floor headroom,
    * round-7 verdict item 6; random probing would score
    * nProbe/k = 0.375, still below the 0.55 floor). The oracle
    * recomputes the truth side and asserts the flag as literal TRUE — a
    * probe/assignment bug that degrades recall corpus-wide fails the hash
    * gate, retiring the last un-gated accuracy claim of the IVF family. */
  def q82_ann_ivf_recall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val truth = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qemb"), col("emb")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    val eng = m_ann_ivf(s, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(eng, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("nt"),
        sum(coalesce(col("hit"), lit(0L))).as("nh"))
      .agg(count(lit(1)).as("n_queries"),
        (avg(col("nh").cast("double") / col("nt")) >= 0.55).as("recall_ok"))
  }

  /** Matryoshka truncation-robustness audit (q158) — the MRL question
    * (Kusupati et al. 2022, "Matryoshka Representation Learning"): how
    * much top-k retrieval quality survives when the embedding is
    * truncated to its leading d dimensions? For d ∈ {8, 16, 32, 64} the
    * exact truncated-cosine top-3 over the 50-query set compares
    * against the full-dimension truth, reporting per-dim overlap in
    * exact permille integers — the dimension-budget curve a platform
    * consults before shipping short embeddings to an ANN tier.
    *
    * Fully hash-gated: slicing, dot products (same summation order both
    * engines — the q82 contract), round-6 sims, integer overlap
    * arithmetic. One pair pass computes ALL dims (the sims ride as an
    * exploded per-pair array — no per-dim corpus re-scan).
    *
    * Scale shape: the exact pass is the q19/q82 brute oracle shape over
    * the gated 50-query panel (queries × corpus equi-free join with a
    * broadcast query side, bounded-heap rank-≤3 WindowGroupLimit); at
    * production query volumes the truncated ranking runs through the
    * IVF/PQ tiers (q82/q99/q106) with d chosen FROM this report. */
  def q158_matryoshka_recall(s: SparkSession, dir: String): DataFrame = {
    val dims = Seq(8, 16, 32, 64)
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val pairSims = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        explode(array(dims.map(d => struct(lit(d).as("dim"),
          round(cosine(slice(col("qemb"), 1, d), slice(col("emb"), 1, d)), 6)
            .as("sim"))): _*)).as("ds"))
      .select(col("query_id"), col("neighbor_id"),
        col("ds.dim").as("dim"), col("ds.sim").as("sim"))
    val w = Window.partitionBy(col("dim"), col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    // tiny (dims × queries × 3 rows) and consumed TWICE (as the per-dim
    // candidate set and as the dim-64 truth side) — checkpoint so the
    // corpus-side pair scan executes once, not once per consumer
    val topk = pairSims.withColumn("r", row_number().over(w))
      .filter(col("r") <= 3)
      .select(col("dim"), col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    val truth = topk.filter(col("dim") === 64)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    topk.join(truth, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("dim"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        expr("(1000 * sum(coalesce(hit, 0L))) div (3 * count(distinct query_id))")
          .as("overlap_permille"))
      .orderBy(col("dim"))
  }

  /** Centroids for the hash-gated IVF twin: seeded Gaussians, same
    * embed-the-constants contract as the LSH hyperplanes. */
  private def seededCentroids(k: Int, dim: Int): IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new scala.util.Random(7)
    IndexedSeq.fill(k)(IndexedSeq.fill(dim)(rnd.nextGaussian()))
  }

  /** IVF with SEEDED random centroids — the oracle-gated twin of
    * m_ann_ivf: same plan shape (one-list assignment, broadcast centroid
    * dim, nProbe probe lists, exact re-rank inside lists), but the coarse
    * quantizer is a fixed seeded draw instead of a KMeans fit, so the
    * whole path is DuckDB-reproducible (the k-means variant is
    * legitimately un-oracleable — optimizer-dependent centroids). Random
    * centroids are the honest baseline coarse quantizer (FAISS's IVF on
    * random samples degrades gracefully to this); recall tunes with
    * nProbe exactly as in the fitted variant. Assignment ranks
    * −2⟨x,c⟩+|c|² (|x|² is common to the argmin) via the codegen dot
    * kernel — k dots per row, same hot-path form as the LSH sign bits. */
  def m_ann_ivf_seeded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 16
    val nProbe = 4
    val cents = seededCentroids(k, 64)
    val ss = cents.map(_.map(x => x * x).sum)
    val e = emb(s, dir)
    val scoreArr = array((0 until k).map(i =>
      lit(-2.0) * dot(col("emb"), typedlit(cents(i))) + lit(ss(i))): _*)
    val assigned = e.withColumn("sc", scoreArr)
      .withColumn("list_id",
        (expr("array_position(sc, array_min(sc))") - 1).cast("int"))
      .select(col("vec_id"), col("emb"), col("list_id"))
    val centsDf = cents.zipWithIndex.map { case (c, i) => (i, c, ss(i)) }
      .toDF("list_id", "cent", "css")
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist"), col("list_id"))
    val probes = assigned.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
      .crossJoin(broadcast(centsDf))
      .select(col("query_id"), col("qemb"), col("list_id"),
        (lit(-2.0) * dot(col("qemb"), col("cent")) + col("css")).as("cdist"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qemb"), col("list_id"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    probes.join(assigned, "list_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qemb"), col("emb")), 6).as("sim"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------------------ SemDeDup
  /** SemDeDup-style EMBEDDING keep-list (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"
    * — public algorithm): semantic near-dup pairs cluster into components
    * and one canonical doc per component survives. This is q73's endgame
    * shape applied to the embedding side — the round-7 verdict's item 4:
    * both signal families existed (banded-LSH pairs, IVF lists) but
    * nothing composed them into components → keep-list.
    *
    * Candidates are the union of two bucketed generators over NORMALIZED
    * embeddings (never all-pairs): (a) 8×6-bit seeded-hyperplane band
    * collisions — m_dedup_embedding's pair kernel; (b) same-seeded-IVF-
    * list pairs — SemDeDup proper runs pairwise cosine WITHIN clusters,
    * and list size is bounded by raising k with the corpus (125 vecs/list
    * here). Candidates score exactly (one dot per pair, embeddings carried
    * through the candidate join — no second fetch), pairs at cos ≥ 0.35
    * feed the q55 large-star/small-star fixpoint, and is_canonical is the
    * keep flag. τ = 0.35 sits above the 99.9th-percentile pair cosine
    * (0.377 @ sf0.01) with the max at 0.51-0.60, so the graph is sparse
    * but non-trivial; the compare runs on UNROUNDED doubles mirrored
    * op-for-op in the twin, so there is no tolerance to tune.
    *
    * Oracle: identical candidate derivation from the same hyperplane /
    * centroid literals, then the recursive-CTE transitive closure. */
  def q92_semdedup(s: SparkSession, dir: String): DataFrame = {
    val tau = 0.35
    val k = 16
    val cents = seededCentroids(k, 64)
    val ss = cents.map(_.map(x => x * x).sum)
    val e = emb(s, dir)
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
      .select(col("vec_id"), transform(col("emb"), x => x / col("nrm")).as("emb"))
    val keys = bandKeys(s, e, bands = 8, planes = 6)
      .select(col("vec_id"), col("band"), col("key"))
    val lshPairs = cappedBandPairs(keys, BandBucketCap)
    val scoreArr = array((0 until k).map(i =>
      lit(-2.0) * dot(col("emb"), typedlit(cents(i))) + lit(ss(i))): _*)
    val assigned = e.withColumn("sc", scoreArr)
      .withColumn("list_id",
        (expr("array_position(sc, array_min(sc))") - 1).cast("int"))
      .select(col("vec_id"), col("list_id"))
    val ivfPairs = cappedListPairs(assigned, IvfListCap)
    val pairs = lshPairs.unionByName(ivfPairs).distinct()
      .join(e.select(col("vec_id").as("id_a"), col("emb").as("emb_a")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("emb").as("emb_b")), "id_b")
      .filter(dot(col("emb_a"), col("emb_b")) >= tau)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    // adaptive: the exact-dot refine leaves a metadata-scale pair set →
    // local union-find; a corpus-scale set falls back to the fixpoint
    componentsAdaptive(pairs)
      .select(col("doc_id").as("vec_id"), col("component"), col("is_canonical"))
      .orderBy(col("vec_id"))
  }

  /** q92's IVF-list pair ceiling. Pair expansion is C(|list|, 2): with k
    * scaled so lists average ~125 vecs (sf0.1) the expansion is bounded,
    * but a degenerate embedding cluster (all-near-identical vectors — the
    * skew q46 salts for on the relational side) could blow up ONE list at
    * 100 TB. 512 is ~4× the expected list size, so no healthy list ever
    * hits it; the guard exists for the pathological cluster, where the
    * hash-sampled 512 still seed the component (LSH bands supply the rest
    * of the edges, and τ-closure reconnects through sampled members) —
    * the q33 df ≤ 20 stop-shingle posture, enforced in code not comment
    * (round-8 verdict item 4). Identical guard in the oracle twin. */
  private[graft] val IvfListCap = 512

  /** q92/m_dedup_embedding's LSH band-bucket ceiling — the IvfListCap
    * posture applied to the seeded-hyperplane band path (found by the
    * r17 100× scale probe: UNcapped buckets made candidate volume
    * quadratic — 8 bands × 64 keys over 200k vectors is ~3.1k vectors
    * per bucket, ~2.5e9 pairs, OOM-killing a 64 GB JVM where the gate
    * SFs never noticed). Healthy maxima MEASURED: 22 at sf0.01, 81 at
    * sf0.1 — 512 has ≥6× margin and never binds at any gated SF, while
    * bounding pair volume at buckets × C(512,2) at ANY corpus scale (a
    * production deployment also scales planes with corpus size so
    * buckets stay small; the cap is the safety net, exactly like the
    * q33 df ≤ 20 stop-shingle). Identical guard in both oracles. */
  private[graft] val BandBucketCap = 512

  /** Same-bucket candidate pairs for (band, key) LSH keys with the
    * bucket-size guard: pack the bucket id and reuse the hash-ordered
    * WindowGroupLimit sample of [[cappedListPairs]]. Pairs can repeat
    * across bands — consumers dedup. */
  private[graft] def cappedBandPairs(keys: DataFrame, cap: Int): DataFrame =
    cappedListPairs(
      keys.select(col("vec_id"),
        (col("band") * lit(64) + col("key")).cast("int").as("list_id")),
      cap)

  /** Same-list candidate pairs with the list-size guard applied: lists
    * over `cap` contribute pairs only among a deterministic hash-ordered
    * sample of `cap` members (md5 of the id — engine-portable, unbiased
    * w.r.t. insertion order; id tiebreak). row_number ≤ cap is the
    * WindowGroupLimit bounded-heap shape (q67), so the guard itself never
    * sorts a giant list's partition. Exposed for the skew-fixture spec. */
  private[graft] def cappedListPairs(assigned: DataFrame, cap: Int): DataFrame = {
    val wList = Window.partitionBy(col("list_id"))
      .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
    val capped = assigned
      .withColumn("lr", row_number().over(wList))
      .filter(col("lr") <= cap)
      .select(col("vec_id"), col("list_id"))
    capped.as("a").join(capped.as("b"),
        col("a.list_id") === col("b.list_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
  }

  // --------------------------------------------------- PQ (product quant)
  /** Seeded centroids for one PQ subspace — same embed-the-constants
    * contract as the LSH hyperplanes / IVF centroids. */
  private def pqCentroids(m: Int, k: Int, sub: Int): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val rnd = new scala.util.Random(11)
    IndexedSeq.fill(m)(IndexedSeq.fill(k)(IndexedSeq.fill(sub)(rnd.nextGaussian())))
  }

  /** PRODUCT QUANTIZATION ANN with ADC scoring (Jégou, Douze, Schmid,
    * "Product quantization for nearest neighbor search", TPAMI 2011 —
    * public algorithm; FAISS's IVF+PQ storage side): the 64-dim vector
    * splits into M = 8 subspaces of 8 dims; each subspace quantizes to
    * one of K = 16 seeded centroids, so a vector stores as 8 nibbles —
    * 16× smaller than int8 SQ, 64× smaller than float64. Queries never
    * touch codes with dot products: each query precomputes an 8×16
    * DISTANCE TABLE (‖q_m‖² − 2⟨q_m,c_mj⟩ + ‖c_mj‖², the asymmetric
    * distance), and every corpus row's approximate distance is 8 table
    * lookups + 7 adds — the ADC inner loop that makes PQ the 100 TB
    * scoring path (the table broadcasts with the 50-query dim; the
    * corpus side is one map-side pass over the code columns).
    *
    * Seeded (not fitted) codebooks keep the whole path DuckDB-exact —
    * the oracle re-derives codes, tables and ranks from the same
    * embedded constants, so this is hash-gated like the seeded IVF; a
    * KMeans-fitted codebook would drop the gate for ~identical plan
    * shape. Sum order over subspaces is fixed (m = 0..7, left fold) so
    * both engines produce bit-identical doubles. Bench note: most of
    * this query's local cost is DRIVER-side — analyzing/codegen'ing the
    * 256 embedded codebook dot expressions — a constant that amortizes
    * to nothing at real data scale (the 2000-vector sf0.1 table
    * executes in milliseconds once compiled). */
  def m_ann_pq_seeded(s: SparkSession, dir: String): DataFrame =
    pqAdcTopK(emb(s, dir), pqCentroids(8, 16, 8), 8, 16, 8)

  /** The PQ encode + ADC scoring plan over ANY codebook — byte-identical
    * for the seeded (hash-gated) and KMeans-fitted (recall-gated q99)
    * variants, so the fitted path exercises exactly the plan the oracle
    * already pins on seeded constants. */
  /** PQ ENCODE: per-subspace argmin over −2⟨x_m,c⟩+‖c‖² (‖x_m‖² common)
    * → (vec_id, c0..c{mSub-1}) nibble codes. One compact codegen'd
    * [[graft.ml.PqArgminCode]] per subspace since r20 — the inline
    * 16-dot expression array cost ~2 s of Janino compile per bench run
    * and fell back to interpreted eval (see PqUtil's scaladoc); output
    * is bit-identical (PqSpec pins kernel ≡ inline expressions). */
  private def pqEncode(e: DataFrame,
      cents: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      mSub: Int, k: Int, sub: Int, keep: Seq[Column] = Nil): DataFrame = {
    val ss = cents.map(_.map(_.map(x => x * x).sum))
    val codes = (0 until mSub).map { m =>
      VecFunctions.pq_argmin_code(
        expr(s"slice(emb, ${m * sub + 1}, $sub)"), cents(m), ss(m))
        .as(s"c$m")
    }
    e.select((col("vec_id") +: keep) ++ codes: _*)
  }

  /** ADC distance tables t_m[j] = ‖q_m‖² − 2⟨q_m,c_mj⟩ + ‖c_mj‖² appended
    * to ANY frame carrying a `qemb` vector column (key columns pass
    * through; qemb drops) — the per-query form and q110's per-(query,
    * probed-list) residual form both build on this. */
  private def pqQueryTablesOf(qFrame: DataFrame,
      cents: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      mSub: Int, k: Int, sub: Int): DataFrame = {
    val ss = cents.map(_.map(_.map(x => x * x).sum))
    // One compact codegen'd PqAdcTable per subspace (r20) — same
    // rationale and exactness argument as pqEncode above.
    var q = qFrame
    for (m <- 0 until mSub) {
      q = q.withColumn(s"t$m", VecFunctions.pq_adc_table(
        expr(s"slice(qemb, ${m * sub + 1}, $sub)"), cents(m), ss(m)))
    }
    q.drop("qemb")
  }

  /** Per-query ADC distance tables for the vec_id < 50 query set →
    * (query_id, t0..t{mSub-1}). */
  private def pqQueryTables(e: DataFrame,
      cents: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      mSub: Int, k: Int, sub: Int): DataFrame =
    pqQueryTablesOf(
      e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("emb").as("qemb")),
      cents, mSub, k, sub)

  /** Approximate distance: mSub table lookups + (mSub−1) adds, left fold
    * in fixed subspace order so both engines produce identical doubles. */
  private def pqAdcDist(mSub: Int) =
    (0 until mSub).map(m => expr(s"t$m[c$m]")).reduce(_ + _)

  private def pqAdcTopK(e: DataFrame,
      cents: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      mSub: Int, k: Int, sub: Int, topN: Int = 3): DataFrame = {
    val coded = pqEncode(e, cents, mSub, k, sub)
    val q = pqQueryTables(e, cents, mSub, k, sub)
    val adist = pqAdcDist(mSub)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    coded.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adist.as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("adist"), 6).as("adist_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** FITTED-codebook PQ — the variant production FAISS actually ships
    * (per-subspace KMeans codebooks; Jégou-Douze-Schmid §III trains each
    * subquantizer on the corpus' subvectors): 8 independent KMeans fits
    * of k = 16 over the 8-dim slices, then the SAME encode + ADC scoring
    * plan as m_ann_pq_seeded ([[pqAdcTopK]]). The fits are model training
    * — excluded from the timed bench with the other fits; at 100 TB the
    * codebook trains on a sample and broadcasts as 8×16×8 doubles, and
    * scoring stays 8 table lookups + 7 adds per row. */
  def m_ann_pq_fitted(s: SparkSession, dir: String): DataFrame =
    pqAdcTopK(emb(s, dir), fittedPqCentroids(s, dir, 8, 16, 8), 8, 16, 8)

  private def fittedPqCentroids(s: SparkSession, dir: String,
      mSub: Int, k: Int, sub: Int): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    fittedPqCentroidsOf(emb(s, dir), mSub, k, sub)

  /** Per-subspace KMeans codebooks over ANY (…, emb) frame — raw vectors
    * for q99/q106, coarse-residual vectors for q110. */
  private def fittedPqCentroidsOf(e: DataFrame,
      mSub: Int, k: Int, sub: Int): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    (0 until mSub).map { m =>
      val sliced = e.select(
        array_to_vector(expr(s"slice(emb, ${m * sub + 1}, $sub)")).as("v"))
      new KMeans().setK(k).setSeed(42 + m).setMaxIter(10)
        .setFeaturesCol("v").fit(sliced)
        .clusterCenters.map(_.toArray.toIndexedSeq).toIndexedSeq
    }
  }

  /** RECALL ACCURACY-CONTRACT gate for the fitted-PQ path (round-8
    * verdict item 5 — q82's pattern on the PQ family), gating the shape
    * production FAISS actually runs: ADC SHORTLIST + EXACT REFINE. Raw
    * 128-bit ADC top-3 cannot carry a recall contract on these
    * near-equidistant synthetic embeddings — measured mean recall@3 is
    * 0.187 @ sf0.01 / 0.127 @ sf0.1 for the fitted codebooks (0.02 for
    * seeded; one-off scratch main, measured 2026-08-13, since deleted): quantization distortion swamps
    * the tiny neighbor gaps, which is exactly why FAISS pairs IndexPQ
    * with a refine stage (the k-factor re-rank). So the gated pipeline
    * is: fitted-ADC shortlist of corpus/10 (min 50), exact squared-L2
    * re-rank of the shortlist, top-3. A true top-3 member inside the
    * shortlist always survives an exact re-rank, so recall equals
    * shortlist containment — measured 0.807 @ sf0.01 (k=50/500) and
    * 0.853 @ sf0.1 (k=200/2000), vs 0.58/0.50 at half the shortlist.
    * Floor 0.60: ≥ 0.21 headroom at both SFs, yet unreachable by a
    * broken encode/table/rank path (raw-ADC-grade 0.13-0.19) or by the
    * unfitted codebook at the same shortlist. The truth side is exact
    * squared L2 (what ADC approximates — the embeddings are unnormalized,
    * so cosine truth would gate the wrong metric). Oracle recomputes the
    * truth and asserts the flag as literal TRUE (q82's shape).
    *
    * Scale: the shortlist fraction is the tunable — at 100 TB the ADC
    * pass stays 8 lookups + 7 adds per row and the refine touches only
    * shortlist × queries rows; the corpus/10 fraction here is sized for
    * a 64-dim 16-cell codebook's distortion, not a law. */
  def q99_pq_fitted_recall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val nCorpus = e.count() // metadata-scale job (q93's count discipline)
    val kShort = math.max(50L, nCorpus / 10).toInt
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val l2 = dot(col("qemb"), col("qemb")) -
      lit(2.0) * dot(col("qemb"), col("emb")) + dot(col("emb"), col("emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2"), col("neighbor_id"))
    val truth = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), l2.as("l2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    // ADC shortlist with the FITTED codebook, then the exact refine:
    // shortlist rows re-fetch their embedding (equi-join on id), score
    // exact L2 against the broadcast query set, keep top-3
    val shortlist = pqAdcTopK(e, fittedPqCentroids(s, dir, 8, 16, 8),
        8, 16, 8, kShort)
      .select(col("query_id"), col("neighbor_id"))
    val refined = shortlist
      .join(e.select(col("vec_id").as("neighbor_id"), col("emb")), "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"), l2.as("l2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(refined, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("nt"),
        sum(coalesce(col("hit"), lit(0L))).as("nh"))
      .agg(count(lit(1)).as("n_queries"),
        (avg(col("nh").cast("double") / col("nt")) >= 0.60).as("recall_ok"))
  }

  /** COMPOSED IVF+PQ — the full FAISS IndexIVFPQ shape (Jégou-Douze-
    * Schmid §V: coarse quantizer routes, product codes score, a refine
    * stage re-ranks; codes taken on raw vectors, FAISS's
    * `by_residual=false` mode): q82 gates IVF probe recall and q99 gates
    * the PQ shortlist+refine — this composes them end to end:
    *   1. coarse KMeans (k=16, seed 42) assigns every vector to a list;
    *   2. queries probe their nProbe=6 exact-nearest lists (centroid L2);
    *   3. fitted-codebook ADC scores ONLY the probed lists' codes —
    *      8 lookups + 7 adds per candidate row, candidates are
    *      ~nProbe/k of the corpus instead of all of it;
    *   4. exact squared-L2 refine on the per-query shortlist
    *      (corpus/10, min 50) → top-3.
    * Gate: mean recall@3 vs the exact-L2 truth (q99's truth side)
    * ≥ 0.55. Measured mean recall 0.700 @ sf0.01 and 0.753 @ sf0.1
    * (scratch runMain, 2026-08-13, since deleted) — margin 0.15/0.20,
    * the round-11 verdict's asked-for ≥ 0.15 — while a broken stage
    * cannot reach the floor: raw fitted ADC without refine measures
    * 0.13-0.19 (q99 scaladoc), random 6/16 routing bounds containment
    * near 0.375, and q99 measured ~0.50-0.58 at half the shortlist
    * (the floor separates from all three; 0.50 would not separate the
    * degraded-shortlist case, so 0.55 is the right edge). Recall here
    * ≈ routing containment × shortlist containment — the composed
    * pipeline gives up ~0.1 vs q99's unrouted 0.807/0.853 while ADC
    * touches only ~3/8 of the corpus, which is the IndexIVFPQ trade.
    *
    * Scale: the centroid table and ADC tables broadcast (k×dim and
    * 50×8×16 doubles); the corpus side is one map-side encode + an
    * equi-join on list_id (hash-partitionable); the refine touches
    * shortlist × queries rows only. At 100 TB nProbe and the shortlist
    * fraction are the recall/cost dials, exactly as in FAISS. */
  private[graft] def ivfpqRecallMean(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val (kLists, nProbe) = (16, 6)
    val e = emb(s, dir)
    val nCorpus = e.count() // metadata-scale job (q93's count discipline)
    val kShort = math.max(50L, nCorpus / 10).toInt
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val l2 = dot(col("qemb"), col("qemb")) -
      lit(2.0) * dot(col("qemb"), col("emb")) + dot(col("emb"), col("emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2"), col("neighbor_id"))
    val truth = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), l2.as("l2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    // 1. coarse quantizer: every vector lands in one inverted list
    val ev = e.withColumn("v", array_to_vector(col("emb")))
    val km = new KMeans().setK(kLists).setSeed(42).setMaxIter(10)
      .setFeaturesCol("v").fit(ev)
    val assigned = km.transform(ev)
      .select(col("vec_id"), col("prediction").as("list_id"))
    val cents = s.createDataFrame(
      km.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("list_id", "cent")
    // 2. fine quantizer: fitted PQ codes, joined to their list
    val codebooks = fittedPqCentroids(s, dir, 8, 16, 8)
    val coded = pqEncode(e, codebooks, 8, 16, 8).join(assigned, "vec_id")
    val qt = pqQueryTables(e, codebooks, 8, 16, 8)
    // 3. probe selection: exact centroid L2, nProbe nearest lists
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist"), col("list_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("list_id"),
        (dot(col("qemb"), col("qemb")) - lit(2.0) * dot(col("qemb"), col("cent"))
          + dot(col("cent"), col("cent"))).as("cdist"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("list_id"))
    // 4. ADC over the probed lists only → per-query shortlist
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    val shortlist = probes.join(coded, "list_id") // equi-join, no cross product
      .join(broadcast(qt), "query_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        pqAdcDist(8).as("adist"))
      .withColumn("rank", row_number().over(wShort))
      .filter(col("rank") <= kShort)
      .select(col("query_id"), col("neighbor_id"))
    // 5. exact refine on the shortlist, then the recall contract
    val refined = shortlist
      .join(e.select(col("vec_id").as("neighbor_id"), col("emb")), "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"), l2.as("l2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(refined, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("nt"),
        sum(coalesce(col("hit"), lit(0L))).as("nh"))
      .agg(count(lit(1)).as("n_queries"),
        avg(col("nh").cast("double") / col("nt")).as("mean_recall"))
  }

  def q106_ivfpq_recall(s: SparkSession, dir: String): DataFrame =
    ivfpqRecallMean(s, dir)
      .select(col("n_queries"), (col("mean_recall") >= 0.55).as("recall_ok"))

  /** RESIDUAL-encoded IVF+PQ — FAISS's actual IndexIVFPQ default
    * (`by_residual=true`, Jégou-Douze-Schmid §V.A): the PQ codes the
    * RESIDUAL x − c(list(x)) instead of the raw vector. Residuals
    * concentrate near zero, so the same 8×16 codebook budget spends its
    * cells on a tighter distribution — lower quantization distortion
    * than q106's raw-vector coding for identical code size. The cost is
    * per-(query, probed-list) ADC tables (the query's residual differs
    * per probed centroid): nProbe=6 tables of 8×16 per query instead of
    * one — still a broadcast-scale dim (queries × nProbe × 128 doubles),
    * while the corpus-side ADC stays 8 lookups + 7 adds per row.
    *
    * Same pipeline and floors as q106 (routing → ADC over probed lists →
    * exact refine of the corpus/10 shortlist → top-3; floor 0.55 vs the
    * exact-L2 truth). Measured mean recall@3 0.707 @ sf0.01 and 0.767 @
    * sf0.1 (scratch runMain, 2026-08-13, since deleted) vs q106's
    * raw-vector 0.700/0.753 — the honest result: residual coding buys
    * only +0.007/+0.013 here, far below the textbook by_residual win,
    * because these synthetic embeddings cluster WEAKLY (the q82/q106
    * scaladocs' recurring observation) — when coarse cells are barely
    * tighter than the corpus, residuals are barely more concentrated
    * than raw vectors and the extra per-(query,list) table cost buys
    * little. On real clustered embeddings the gap is the point of
    * by_residual; the operator carries the shape either way, with the
    * same 0.55 floor (margin 0.15/0.22). */
  private[graft] def ivfpqResidualRecallMean(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val (kLists, nProbe) = (16, 6)
    val e = emb(s, dir)
    val nCorpus = e.count()
    val kShort = math.max(50L, nCorpus / 10).toInt
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val l2 = dot(col("qemb"), col("qemb")) -
      lit(2.0) * dot(col("qemb"), col("emb")) + dot(col("emb"), col("emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2"), col("neighbor_id"))
    val truth = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), l2.as("l2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    val ev = e.withColumn("v", array_to_vector(col("emb")))
    val km = new KMeans().setK(kLists).setSeed(42).setMaxIter(10)
      .setFeaturesCol("v").fit(ev)
    val assigned = km.transform(ev)
      .select(col("vec_id"), col("prediction").as("list_id"))
    val cents = s.createDataFrame(
      km.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("list_id", "cent")
    // residuals: x − c(list(x)); codebooks fit ON the residuals.
    // PINNED once (r21, VERDICT r20 item 3): the 8 per-subspace KMeans
    // fits each take an action on this frame, and before the pin every
    // fit re-ran the whole coarse pipeline — km.transform + two joins +
    // zip_with over the corpus, 8× (plus once more for the encode); the
    // measured cost of q110's 35.6 s trainer line was that recompute
    // fan-out, not the ADC tables. The checkpoint materializes the same
    // plan once; the fits and the encode then read pinned blocks, so
    // every fit sees the identical rows in the identical partition
    // order — the fitted codebooks are bit-identical to the unpinned
    // form. The pin stays referenced by the returned plan (coded reads
    // it); the bench's between-query sweep releases it, per the house
    // convention for checkpoint-returning queries.
    val resid = e.join(assigned, "vec_id").join(broadcast(cents), "list_id")
      .select(col("vec_id"), col("list_id"),
        zip_with(col("emb"), col("cent"), (x, c) => x - c).as("emb"))
      .localCheckpoint()
    val codebooks = fittedPqCentroidsOf(resid.select(col("vec_id"), col("emb")), 8, 16, 8)
    // list_id rides through the encode (keep column) — the old re-join
    // with `assigned` re-ran km.transform over the corpus a 10th time
    val coded = pqEncode(resid, codebooks, 8, 16, 8, Seq(col("list_id")))
    // probe selection (exact centroid L2), then PER-(query, list) residual
    // ADC tables: the query's residual w.r.t. each probed centroid
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist"), col("list_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("list_id"),
        (dot(col("qemb"), col("qemb")) - lit(2.0) * dot(col("qemb"), col("cent"))
          + dot(col("cent"), col("cent"))).as("cdist"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("list_id"))
    val qres = probes.join(broadcast(q), "query_id")
      .join(broadcast(cents), "list_id")
      .select(col("query_id"), col("list_id"),
        zip_with(col("qemb"), col("cent"), (x, c) => x - c).as("qemb"))
    val qt = pqQueryTablesOf(qres, codebooks, 8, 16, 8)
    // ADC over probed lists: the (band) join key is list_id, and each
    // candidate row scores against ITS list's residual table
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    val shortlist = coded.join(broadcast(qt), "list_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        pqAdcDist(8).as("adist"))
      .withColumn("rank", row_number().over(wShort))
      .filter(col("rank") <= kShort)
      .select(col("query_id"), col("neighbor_id"))
    val refined = shortlist
      .join(e.select(col("vec_id").as("neighbor_id"), col("emb")), "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"), l2.as("l2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(refined, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("nt"),
        sum(coalesce(col("hit"), lit(0L))).as("nh"))
      .agg(count(lit(1)).as("n_queries"),
        avg(col("nh").cast("double") / col("nt")).as("mean_recall"))
  }

  def q110_ivfpq_residual_recall(s: SparkSession, dir: String): DataFrame =
    ivfpqResidualRecallMean(s, dir)
      .select(col("n_queries"), (col("mean_recall") >= 0.55).as("recall_ok"))

  /** MMR DIVERSITY RE-RANK — the retrieval-side diversifier every RAG
    * pipeline runs after its ANN shortlist (Carbonell & Goldstein 1998,
    * "maximal marginal relevance", public algorithm): greedily select R
    * results where each pick maximizes λ·rel(q,d) − (1−λ)·max_{s∈S}
    * sim(d,s) — relevance traded against redundancy with what's already
    * selected. λ = 0.7, R = 5 picks from the exact cosine top-K = 20
    * candidate set per query.
    *
    * Cross-engine exactness without rounding anywhere inside the greedy
    * loop: cosine is dot/(√(aa)·√(bb)) with a fixed left-to-right dot
    * fold — bit-identical in both engines (the q92 unrounded-compare
    * discipline) — the score is the literal expression 0.7·rel − 0.3·
    * maxsim mirrored op-for-op, argmax ties break on candidate id, and
    * the running `maxsim` updates via greatest(). Scores round to 6 dp
    * only at emission.
    *
    * Scale: candidate generation is the ANN shortlist (here the exact
    * top-20 so the oracle can re-derive it); the greedy loop is R
    * query-cardinality rounds over a (queries × K) frame — per-query
    * work, never corpus-scale; each round is one bounded window argmax +
    * one equi-join on query_id. The oracle unrolls all R rounds as
    * MATERIALIZED CTE stages. */
  def q108_mmr_rerank(s: SparkSession, dir: String): DataFrame = {
    val (kCand, rPicks) = (20, 5)
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cid"))
    var st = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cid"),
        cosine(col("qemb"), col("emb")).as("rel"), col("emb"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= kCand).drop("rk")
      .withColumn("maxsim", lit(0.0))
      .localCheckpoint() // queries × K rows
    val mmr = lit(0.7) * col("rel") - lit(0.3) * col("maxsim")
    val wPick = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cid"))
    val picks = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val selPins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- 1 to rPicks) {
      val sel = st.withColumn("score", mmr)
        .withColumn("rk", row_number().over(wPick))
        .filter(col("rk") === 1)
        .select(col("query_id"), col("cid").as("sel_cid"),
          col("emb").as("sel_emb"), col("score"))
        .localCheckpoint() // query-cardinality
      selPins += sel
      picks += sel.select(col("query_id"), lit(r).as("rank"),
        col("sel_cid").as("neighbor_id"), round(col("score"), 6).as("score_r"))
      val next = st.join(sel.select(col("query_id"), col("sel_cid"), col("sel_emb")),
          "query_id")
        .filter(col("cid") =!= col("sel_cid"))
        .withColumn("maxsim",
          greatest(col("maxsim"), cosine(col("sel_emb"), col("emb"))))
        .drop("sel_cid", "sel_emb")
        .localCheckpoint()
      pinnedRdds(st).foreach(_.unpersist(blocking = false))
      st = next
    }
    val out = picks.reduce(_.unionByName(_))
      .orderBy(col("query_id"), col("rank"))
      .localCheckpoint() // tiny (queries × R); pin before releasing inputs
    (selPins :+ st).foreach(f =>
      pinnedRdds(f).foreach(_.unpersist(blocking = false)))
    out
  }

  // ------------------------------------------------ engine-only: MinHashLSH
  /** The MLlib-LSH gate corpus: a deterministic 3/16 (≈19 %) md5-prefix
    * sample of documents (the q49 hash-split primitive — stable across
    * runs, engines and partitionings). MLlib's `approxSimilarityJoin`
    * has no hot-bucket cap, so replaying it on the FULL corpus is the
    * one registry cost that grows super-linear-shaped in practice
    * (r18 trainer tier: 777 s + 4.8 GB spill at sf0.1, days at 100×).
    * The replay exists to keep the MLlib plumbing exercised and q84's
    * recall contract is statistical, so a fixed-fraction sub-corpus
    * carries the same evidence at bounded cost (r18 verdict item 3);
    * the production near-dup path (q30/q31 capped native bands) still
    * runs on the full corpus. */
  private def lshGateDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
        .isin("0", "1", "2"))

  /** The matching DuckDB predicate for [[lshGateDocs]]. */
  private val LshGateSql: String =
    "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')"

  /** G18: MLlib MinHashLSH near-dup join over binary token vectors
    * (Jaccard distance ≤ 0.3), on the [[lshGateDocs]] gate corpus. */
  def m_dedup_minhash_lsh(s: SparkSession, dir: String): DataFrame = {
    val docs = lshGateDocs(s, dir)
      .select(col("doc_id"), array_distinct(Cleanse.tokens(col("text"))).as("tokens"))
      .filter(size(col("tokens")) > 0)
    // vocabSize must cover EVERY distinct token: CountVectorizer's default
    // 2^18 cap would silently truncate the vocabulary on a larger corpus,
    // making the engine's Jaccard (and q84's dists_ok / n_false_pairs
    // contract) diverge from the exact-token truth for a non-bug reason.
    val nVocab = docs.select(explode(col("tokens")).as("t"))
      .agg(approx_count_distinct(col("t"), 0.01)).head().getLong(0)
    val cv = new CountVectorizer()
      .setInputCol("tokens").setOutputCol("features").setBinary(true)
      .setVocabSize(math.max(nVocab * 2, 1 << 18).toInt)
      .fit(docs)
    val vecs = cv.transform(docs)
    val mh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42)
      .fit(vecs)
    mh.approxSimilarityJoin(vecs, vecs, 0.3, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("doc_a") < col("doc_b"))
      .orderBy(col("jaccard_dist"), col("doc_a"), col("doc_b"))
  }

  /** ACCURACY-CONTRACT gate for the MLlib MinHashLSH path — the last
    * probabilistic rows-only entry (round-6 "what's missing" item 4):
    * m_dedup_minhash_lsh's approximate pair set is judged against the
    * EXACT Jaccard ≥ 0.7 truth computed losslessly by the q79 prefix
    * kernel over the same distinct-token sets. One aggregate row, every
    * column DuckDB-recomputable or asserted as a literal:
    *  - n_true_pairs: |exact pairs| (oracle recomputes by brute join);
    *  - recall_ok: the LSH join recovers ≥ 80 % of them (4 OR'd hash
    *    tables collide a J = 0.7 pair w.p. 1 − (1 − J)⁴ ≈ 0.99 — the
    *    bound is far below expectation but far above broken);
    *  - dists_ok: every recovered pair's reported distance equals the
    *    exact 1 − J (MLlib keyDistance is exact on candidates — any
    *    deviation is a bug);
    *  - n_false_pairs: engine pairs at dist ≤ 0.3 missing from the truth
    *    (must be 0 — approxSimilarityJoin post-filters by exact distance,
    *    so a false positive means the distance computation broke). */
  def q84_minhash_lsh_recall(s: SparkSession, dir: String): DataFrame = {
    // truth over the SAME gate sub-corpus the MLlib replay runs on —
    // the recall/false-positive contract is within-corpus
    val truth = prefixJaccardPairs(
      lshGateDocs(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(Cleanse.tokens(col("text")))).as("shingle")),
      t = 0.7)
    val eng = m_dedup_minhash_lsh(s, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard_dist"))
    val found = truth.join(eng, Seq("doc_a", "doc_b"), "left")
      .select(col("jaccard"), col("jaccard_dist"),
        col("jaccard_dist").isNotNull.cast("long").as("hit"))
    val falsePos = eng.join(truth, Seq("doc_a", "doc_b"), "left_anti")
      .agg(count(lit(1)).as("n_false_pairs"))
    found.agg(
      count(lit(1)).as("n_true_pairs"),
      coalesce(avg(col("hit")) >= 0.8, lit(true)).as("recall_ok"),
      // both sides round to 6 decimals independently → ≤ 1e-6 apart; the
      // tolerance only needs to exclude a genuinely different distance
      coalesce(
        min(when(col("hit") === 1,
          abs(col("jaccard_dist") - (lit(1.0) - col("jaccard"))) <= 2e-6)),
        lit(true)).as("dists_ok"))
      .crossJoin(falsePos)
  }

  // -------------------------------------------------------------- SimHash
  /** Per-(doc, term) frequencies with a 64-bit token hash assembled from
    * two md5 halves — md5 (not xxhash64) precisely so the ENTIRE
    * signature→band→Hamming pipeline has a DuckDB twin and m_dedup_simhash
    * is hash-gated rather than rows-only (round-4 advice item 2: every
    * rows-only entry is a place a wrong answer could hide). Hash quality is
    * equivalent for simhash voting; the two 32-bit hex parses stay inside
    * signed-long range on both engines. */
  private def simhashToks(s: SparkSession, dir: String): DataFrame =
    simhashToksOf(Tables.documentsFanned(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t")))

  /** The (doc_id, term, freq, h) kernel over any (doc_id, t) token frame —
    * q73 feeds it the shared checkpointed frame so the corpus is tokenized
    * once for all three of its near-dup signals. */
  private def simhashToksOf(toks: DataFrame): DataFrame =
    toks.select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("freq"))
      .withColumn("m", md5(col("term").cast("binary")))
      .withColumn("h",
        shiftleft(conv(substring(col("m"), 1, 8), 16, 10).cast(LongType), 32)
          .bitwiseOR(conv(substring(col("m"), 9, 8), 16, 10).cast(LongType)))
      .drop("m")

  /** 64-bit SimHash from xxhash64 token hashes via the native SimhashAgg
    * aggregate (one long[64] vote buffer per doc — single shuffle on
    * doc_id), then 16-bit band bucketing for near-dup candidates. */
  def simhash(s: SparkSession, dir: String): DataFrame =
    simhashOf(Tables.documentsFanned(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t")))

  /** Signature kernel over any (doc_id, t) token frame. */
  private def simhashOf(toks: DataFrame): DataFrame =
    simhashToksOf(toks)
      .groupBy(col("doc_id"))
      .agg(SimhashFunctions.simhash_agg(col("h"), col("freq")).as("simhash"))

  /** The 64-conditional-sums relational encoding of simhash — the
    * reference semantics SimhashSpec checks the aggregate against. */
  def simhashSql(s: SparkSession, dir: String): DataFrame = {
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("freq"))
        .otherwise(-col("freq"))).as(s"v$b")
    }
    val sig = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    simhashToks(s, dir).groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup candidates: 16-bit band bucketing over the 64-bit
    * signatures, Hamming ≤ 12 within buckets. Oracle-gated end to end (the
    * md5-derived token hash above makes the whole pipeline
    * DuckDB-expressible; the generated 64-conditional-sum oracle is
    * `simhashOracle` below). */
  def m_dedup_simhash(s: SparkSession, dir: String): DataFrame =
    simhashPairs(s, dir).orderBy(col("hamming"), col("doc_a"), col("doc_b"))

  /** Unsorted simhash pair kernel — q73 consumes this directly (its
    * fixpoint does not care about pair order; the dump query's global
    * sort would be pure waste there). */
  private def simhashPairs(s: SparkSession, dir: String): DataFrame =
    simhashPairsOf(simhash(s, dir))

  /** Band-bucketed SimHash pair kernel over a precomputed (doc_id, simhash)
    * signature frame. */
  /** Stop-bucket cap for the 16-bit simhash bands (r18 verdict item 5,
    * measured on the q73 ladder): the band KEYSPACE is a fixed 65,536
    * values, so bucket occupancy grows linearly with the corpus and the
    * band self-join QUADRATICALLY once the space saturates (~0 noise
    * collisions at 5 k docs; ~7.6 docs/bucket at 500 k; ~76 at 5 M —
    * the 12.2×/decade shuffle excess on the 100× rung). A bucket past
    * the cap is hash-noise saturation, not near-dup signal — the q33
    * hot-shingle / minhash stop-bucket posture applied to simhash, with
    * the IDENTICAL rule in the generated oracle so the gate stays
    * exact. 128 is far above any true duplicate cluster in testdata
    * (max identical-text group: 2) and bounds per-bucket fanout at
    * C(128,2) at ANY corpus size. */
  private[graft] val SimBandBucketCap = 128

  private def simhashPairsOf(sig: DataFrame): DataFrame = {
    val bands = sig.select(col("doc_id"), col("simhash"), explode(array(
      (0 until 4).map(i => struct(lit(i).as("band"),
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    // stop-bucket filter: the ok table is ≤ 4·65,536 rows at ANY corpus
    // size — broadcast-class by construction
    val ok = broadcast(bands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("nb"))
      .filter(col("nb").between(2L, SimBandBucketCap.toLong))
      .select(col("band"), col("key")))
    val cold = bands.join(ok, Seq("band", "key"), "left_semi")
    val a = cold.as("a"); val b = cold.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 12)
  }

  /** Generated DuckDB twin of m_dedup_simhash: token hash = two md5 hex
    * halves, signature = 64 conditional frequency sums (one per bit,
    * mirroring SimhashAgg's vote buffer), bands = (sig >> 16b) & 0xFFFF,
    * Hamming = bit_count(xor). Signature bits combine with bitwise OR of
    * per-bit signed literals (never `+`/`<<` at bit 63 — BIGINT sums
    * overflow-error in DuckDB where Spark wraps). */
  private[graft] def simhashCtes(p: String): String = {
    // signed assembly: DuckDB errors on `hi << 32` once bit 31 is set
    // (BIGINT shift overflow), so bias hi into signed-32 range first —
    // (hi - 2^32·[hi ≥ 2^31]) · 2^32 + lo is two's-complement-identical to
    // Spark's shiftleft(hi, 32) | lo and never leaves signed-64 range
    val h64 = "((hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)" +
      " * 4294967296 + lo)"
    val votes = (0 until 64).map { b =>
      s"SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN freq ELSE -freq END) AS v$b"
    }.mkString(",\n  ")
    val sig = (0 until 64).map { b =>
      s"(CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" | ")
    s"""${p}toks AS (SELECT doc_id, unnest($DToks) AS term FROM documents),
       |${p}tf AS (SELECT doc_id, term, COUNT(*) AS freq FROM ${p}toks
       |  GROUP BY doc_id, term),
       |${p}hs AS (SELECT doc_id, freq, $h64 AS h
       |  FROM (SELECT doc_id, freq,
       |          CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) AS hi,
       |          CAST('0x' || substr(md5(term), 9, 8) AS BIGINT) AS lo
       |        FROM ${p}tf)),
       |${p}votes AS (SELECT doc_id,
       |  $votes
       |  FROM ${p}hs GROUP BY doc_id),
       |${p}sig AS (SELECT doc_id, $sig AS simhash FROM ${p}votes),
       |${p}bands AS (SELECT doc_id, simhash, band,
       |    ((simhash >> (band * 16)) & 65535) AS key
       |  FROM ${p}sig, (VALUES (0),(1),(2),(3)) b(band)),
       |${p}bok AS (SELECT band, key FROM ${p}bands GROUP BY band, key
       |  HAVING COUNT(*) BETWEEN 2 AND $SimBandBucketCap),
       |${p}cold AS (SELECT bs.doc_id, bs.simhash, bs.band, bs.key
       |  FROM ${p}bands bs JOIN ${p}bok
       |  ON bs.band = ${p}bok.band AND bs.key = ${p}bok.key),
       |${p}pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |  FROM ${p}cold a JOIN ${p}cold b ON a.band = b.band AND a.key = b.key
       |    AND a.doc_id < b.doc_id)""".stripMargin
  }

  private lazy val simhashOracle: String =
    s"""WITH ${simhashCtes("")}
       |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 12
       |ORDER BY hamming, doc_a, doc_b""".stripMargin

  // --------------------------------------- dedup clusters (connected comps)
  /** Connected components over the near-dup pair graph (q33's Jaccard ≥
    * 0.5 pairs): every document gets a cluster label (the component's
    * minimum doc_id) and a canonical flag — the dedup endgame that turns
    * pairwise similarity into keep/drop decisions.
    *
    * Algorithm: alternating large-star/small-star (see `components`) —
    * O(log² n) rounds regardless of component diameter, convergence
    * asserted rather than capped, driver holds only a convergence
    * scalar. Oracle: DuckDB recursive-CTE transitive closure over the
    * same pairs. */
  def q55_dedup_components(s: SparkSession, dir: String): DataFrame =
    // the unsorted kernel: q33's dump-facing global sort is wasted work
    // under a fixpoint that re-shuffles the pairs immediately
    components(ngramJaccardPairs(Tables.documentsFanned(s, dir)
        .select(col("doc_id"), Cleanse.tokens(col("text")).as("t")))
      .select(col("doc_a"), col("doc_b")))
      .orderBy(col("doc_id"))

  /** MinHash band-collision candidate pairs: docs sharing any of the four
    * (band = one md5-minhash) values pair up. Same bucketed shape as q33's
    * shingle expansion — groupBy(band, value) buckets the colliding doc
    * ids, a map-side transform expands C(n,2) ordered pairs, and buckets
    * larger than 20 docs are dropped (an over-full bucket is a stop-bucket:
    * O(n²) pairs, no near-dup signal — the q33 hot-shingle guard applied
    * to minhash bands). Never an all-pairs join. */
  private[graft] def minhashBandPairs(s: SparkSession, dir: String): DataFrame =
    minhashBandPairsOf(graft.text.TextOps.minhashSignatures(s, dir))

  /** The band-collision pair kernel over a precomputed 4-permutation
    * signature frame (columns doc_id, h1..h4). */
  private def minhashBandPairsOf(sig: DataFrame): DataFrame =
    bandRowPairsOf(sig.select(col("doc_id"), explode(array(
      (1 to 4).map(i => struct(lit(i).as("band"), col(s"h$i").as("h"))): _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h")))

  /** Same kernel over an already-exploded (doc_id, band, h) band table —
    * the shape the streaming `Sessions.BandIndex` maintains incrementally
    * (`streamBandRows` derives h with the same seeds + md5 min as
    * `TextOps.minhashSignaturesOf`, so index-sourced pairs are exactly
    * the batch minhash signal). Stop-bucket cap (≤ 20) and distinct match
    * the signature-frame path above. */
  private[graft] def bandRowPairsOf(bands: DataFrame): DataFrame = {
    bands.groupBy(col("band"), col("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")).between(2, 20))
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y ->
          |    struct(x AS doc_a, y AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  /** The dedup ENDGAME over the union of near-dup signals: a production
    * dedup run does not cluster one detector's pairs — it unions every
    * candidate source (exact n-gram Jaccard ≥ 0.5, SimHash Hamming ≤ 12,
    * MinHash band collisions) into one graph and emits a single canonical
    * keep-list. Each signal is itself bucketed candidate generation (no
    * all-pairs anywhere), the union is a distinct on (doc_a, doc_b), and
    * the clustering is the same O(log²)-round large-star/small-star
    * fixpoint as q55. Output: every doc touched by any signal, its
    * component label (= minimum reachable doc_id) and keep/drop flag.
    * Oracle: recursive-CTE transitive closure over the identically-derived
    * union of the three pair sets. */
  def q73_dedup_union(s: SparkSession, dir: String): DataFrame = {
    // ONE tokenized frame for all three signals: each kernel accepts a
    // (doc_id, t) frame, so the corpus is scanned + tokenized exactly once
    // (round-6 verdict: the previous version tokenized three times — one
    // scan per signal). localCheckpoint materializes it; released below
    // once the fixpoint's labels are pinned.
    val toks = Tables.documentsFanned(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t"))
      .localCheckpoint()
    // unsorted kernels: the dump queries' global sorts are wasted work
    // under a union that re-shuffles into the fixpoint immediately
    val jaccard = ngramJaccardPairs(toks).select(col("doc_a"), col("doc_b"))
    val simhash = simhashPairsOf(simhashOf(toks))
      .select(col("doc_a"), col("doc_b"))
    val minhash = minhashBandPairsOf(graft.text.TextOps.minhashSignaturesOf(toks))
    // no pre-distinct: components() canonically orients and dedups its
    // input in one pass — a distinct here would just add a shuffle
    // adaptive since round 13: the union's pair graph is thresholded-
    // candidate output (metadata-scale on a well-dedup'd corpus; the
    // local path saves ~6 fixpoint jobs of scheduling), with the
    // distributed fixpoint automatic above 2^20 edges. q55 keeps the
    // PURE fixpoint so its cost stays a bench-visible line.
    val labels = componentsAdaptive(
      jaccard.unionByName(simhash).unionByName(minhash))
    // components() returns eagerly-pinned labels with no reference to toks
    pinnedRdds(toks).foreach(_.unpersist(blocking = false))
    labels.orderBy(col("doc_id"))
  }

  // ------------------------------------ q274 capture-recapture audit
  /** q274: capture-recapture estimation of the TOTAL near-duplicate
    * pair population from two independent-ish detectors (Chapman's
    * bias-corrected Lincoln-Petersen estimator, Chapman 1951; variance
    * per Seber 1970) — eval loop #15 over the dedup family: MinHash
    * band collisions are capture A, SimHash Hamming ≤ 12 is capture B,
    * their overlap m estimates how many near-dup pairs BOTH miss —
    * the "how much dedup is left on the table" number a recall-gated
    * pipeline (q84) wants corpus-wide, where exhaustive truth is
    * unaffordable. The exact n-gram Jaccard signal and the union ride
    * the row as references. The independence assumption is declared:
    * both detectors read token overlap, so the estimate is a LOWER
    * bound on the miss mass (positively correlated captures shrink
    * N̂ toward the union).
    *
    * Exactness: N̂ = ((n_A+1)(n_B+1)) div (m+1) − 1 and
    * Var = ((n_A+1)(n_B+1)(n_A−m)(n_B−m)) div ((m+1)²(m+2)) are single
    * integer divisions (DECIMAL(38,0) for the 4-factor product);
    * coverage permilles are exact ratios against N̂.
    *
    * Scale shape: the three kernels are q73's bucketed candidate
    * generators off ONE tokenized pass (no all-pairs anywhere); the
    * audit adds pair-keyed joins and scalar aggregates. */
  def q274_capture_recapture(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documentsFanned(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t"))
      .localCheckpoint()
    val a = minhashBandPairsOf(graft.text.TextOps.minhashSignaturesOf(toks))
      .select(col("doc_a"), col("doc_b")).distinct()
    val b = simhashPairsOf(simhashOf(toks))
      .select(col("doc_a"), col("doc_b")).distinct()
    val j = ngramJaccardPairs(toks)
      .select(col("doc_a"), col("doc_b")).distinct()
    val na = a.agg(count(lit(1)).as("n_minhash"))
    val nb = b.agg(count(lit(1)).as("n_simhash"))
    val m = a.join(b, Seq("doc_a", "doc_b"))
      .agg(count(lit(1)).as("n_both"))
    val nj = j.agg(count(lit(1)).as("n_jaccard"))
    val nu = a.unionByName(b).unionByName(j).distinct()
      .agg(count(lit(1)).as("n_union"))
    val out = na.crossJoin(broadcast(nb)).crossJoin(broadcast(m))
      .crossJoin(broadcast(nj)).crossJoin(broadcast(nu))
      // chapman_est's product is corpus-shaped (ADVICE r16): past ~3e9
      // pairs per detector the raw BIGINT product wraps, so the product
      // lives in DECIMAL(38,0) like chapman_var; the BIGINT quotient is
      // guarded by a PRODUCT comparison (never a decimal quotient —
      // Spark decimal `div` wraps silently, the r16 seam)
      .filter(coalesce(assert_true(
        expr("CAST(n_minhash + 1 AS DECIMAL(38,0)) * (n_simhash + 1) " +
          "<= CAST(9223372036854775807 AS DECIMAL(38,0)) * " +
          "(n_both + 1)"),
        lit("Chapman estimate would overflow its BIGINT column: the " +
          "detector pair sets are too uncorrelated at this scale")),
        lit(true)))
      .select(col("n_minhash"), col("n_simhash"), col("n_both"),
        col("n_jaccard"), col("n_union"),
        expr("(CAST(n_minhash + 1 AS DECIMAL(38,0)) * " +
          "(n_simhash + 1)) div (n_both + 1) - 1")
          .as("chapman_est"),
        expr("CAST((CAST(n_minhash + 1 AS DECIMAL(38,0)) * " +
          "(n_simhash + 1) * (n_minhash - n_both) * " +
          "(n_simhash - n_both)) div (CAST(n_both + 1 AS DECIMAL(38,0))" +
          " * (n_both + 1) * (n_both + 2)) AS BIGINT)")
          .as("chapman_var"),
        expr("(1000 * n_union) div greatest(" +
          "(CAST(n_minhash + 1 AS DECIMAL(38,0)) * (n_simhash + 1)) " +
          "div (n_both + 1) - 1, 1L)")
          .as("union_coverage_permille"))
      .localCheckpoint()
    pinnedRdds(toks).foreach(_.unpersist(blocking = false))
    out
  }

  private lazy val captureOracle: String =
    s"""WITH $unionPairsCtes,
       |sp AS (SELECT doc_a, doc_b FROM spairs WHERE hamming <= 12),
       |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_minhash FROM mpairs),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_simhash FROM sp),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both
       |  FROM mpairs JOIN sp USING (doc_a, doc_b)),
       |nj AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_jaccard FROM jpairs),
       |nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union FROM upairs)
       |SELECT n_minhash, n_simhash, n_both, n_jaccard, n_union,
       |  CAST((CAST(n_minhash + 1 AS HUGEINT) * (n_simhash + 1)) //
       |    (n_both + 1) - 1 AS BIGINT) AS chapman_est,
       |  CAST((CAST(n_minhash + 1 AS HUGEINT) * (n_simhash + 1) *
       |    (n_minhash - n_both) * (n_simhash - n_both)) //
       |    (CAST(n_both + 1 AS HUGEINT) * (n_both + 1) * (n_both + 2))
       |    AS BIGINT) AS chapman_var,
       |  (1000 * n_union) // GREATEST(CAST((CAST(n_minhash + 1 AS
       |    HUGEINT) * (n_simhash + 1)) // (n_both + 1) - 1 AS BIGINT),
       |    1) AS union_coverage_permille
       |FROM na CROSS JOIN nb CROSS JOIN mm CROSS JOIN nj CROSS JOIN nu"""
      .stripMargin

  /** Metadata-only SNAPSHOT FINGERPRINT of the documents table under
    * `dir`: md5 over the sorted (file path, length, mtime) listing — the
    * same information a table format's snapshot id summarizes. Listing a
    * directory is a metadata operation (no data read), so the probe costs
    * what a lake manifest read costs at any scale. Any in-place mutation
    * (a CDC merge into the corpus, a partition rewrite, a driver
    * regenerating the dir) changes file names/sizes/mtimes and therefore
    * the fingerprint. In production on Iceberg/Delta this is the
    * table's current snapshot/version id. */
  private[graft] def corpusFingerprint(s: SparkSession, dir: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      entries += s"${f.getPath.toUri.getPath}|${f.getLen}|${f.getModificationTime}"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  /** Scratch path for the materialized dedup stage, keyed by
    * (applicationId, input dir, CONTENT fingerprint): the app id scopes
    * the stage to the session, the dir md5 keeps a sf0.001 warmup stage
    * from serving a sf0.1 read (two dirs with identical content still get
    * distinct stages), and the snapshot fingerprint invalidates the stage
    * when the corpus mutates IN PLACE mid-session — exactly what
    * `sink.Lake.applyChangesInto` does to a lake; the round-12 path-only
    * key silently served stale labels after such a merge. Lives for the
    * session like a curation DAG's intermediate table lives for the
    * pipeline run. */
  private[graft] def dedupStageDir(s: SparkSession, dir: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${System.getProperty("java.io.tmpdir")}/graft_dedup_stage_" +
      s"${s.sparkContext.applicationId}_${key}_${corpusFingerprint(s, dir)}"
  }

  /** MATERIALIZED dedup stage — the production curation-DAG shape
    * (round-11 verdict item 4): the q73 union-fixpoint runs ONCE per
    * (session, input dir) and its per-document output persists as a
    * split-partitioned parquet stage table; every downstream audit /
    * split / report derives by SCANNING the stage, never by re-running
    * the fixpoint. At 100 TB the component fixpoint is hours of cluster
    * time — nobody runs it three times to publish an audit, a split
    * assignment and a curation report. q73 itself stays self-contained so
    * the fixpoint's cost remains bench-visible as its own line.
    *
    * Stage schema, one row per document:
    *   doc_id, source,
    *   component   — q73 label; NULL for docs no near-dup signal touched
    *   grp         — component coalesced to the doc's own id (singletons)
    *   flagged     — touched by any signal
    *   is_canonical— survivor flag (untouched singletons survive)
    *   split       — 'train'/'val'/'test', 80/10/10 hash of grp (the
    *                 leakage-proof q100 assignment), partition column */
  private[graft] def dedupStage(s: SparkSession, dir: String): DataFrame = {
    val out = dedupStageDir(s, dir)
    // INVARIANT: the _SUCCESS probe-then-write is NOT concurrency-safe
    // (two sessions racing here would both compute and one overwrite the
    // other — benign but wasteful); safe under Bench/Verify's strictly
    // sequential single-session contract (the same assumption Bench's
    // global unpersist hygiene documents). A multi-writer deployment
    // replaces this with the table format's atomic snapshot commit.
    if (!new java.io.File(out, "_SUCCESS").exists())
      writeStage(s, dir, q73_dedup_union(s, dir), out)
    s.read.parquet(out)
  }

  /** Derive the stage table from per-doc closure labels and persist it
    * split-partitioned at `out` — shared by the cold-start path above and
    * the streaming reconcile ([[republishDedupStage]]). `labels0` must be
    * eagerly pinned (components() output is); its blocks are released
    * once the stage is on disk. */
  private def writeStage(s: SparkSession, dir: String, labels0: DataFrame,
      out: String): Unit = {
    val labels = labels0
      .select(col("doc_id"), col("component"), col("is_canonical"))
    val stage = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("component"),
        coalesce(col("component"), col("doc_id")).as("grp"),
        col("is_canonical").isNotNull.as("flagged"),
        coalesce(col("is_canonical"), lit(true)).as("is_canonical"))
      .withColumn("bk", pmod(
        conv(substring(md5(col("grp").cast("string").cast("binary")), 1, 4),
          16, 10).cast("long"), lit(100L)))
      .withColumn("split",
        when(col("bk") < 80, "train").when(col("bk") < 90, "val")
          .otherwise("test"))
      .drop("bk")
    graft.sink.Parquet.writePartitioned(stage, out, Seq("split"))
    // the stage now lives on disk; release the fixpoint's pinned label
    // blocks (docs-cardinality — a real leak at 100 TB if left to the
    // session sweep)
    pinnedRdds(labels).foreach(_.unpersist(blocking = false))
  }

  /** STREAMING→BATCH DEDUP RECONCILIATION (round-12 verdict item 1): the
    * periodic compaction step that makes streaming near-dup verdicts
    * converge to batch truth. The streaming DAG's first-occurrence rule
    * is DIRECT-collision only — it cannot retro-drop an already-emitted
    * doc when a later arrival links two existing clusters, and it sees
    * only the minhash signal. This operator recomputes the full q73
    * THREE-SIGNAL transitive closure over the accumulated corpus at
    * `dir`, sourcing the minhash band pairs from the stream's
    * incrementally maintained index (no signature recompute — the index
    * IS that work, already done per-batch) while re-deriving the jaccard
    * and simhash signals from the corpus, then REPUBLISHES the
    * materialized stage for the corpus' current snapshot — the table
    * q73b/q100/q101 and the stream's verdict checks read.
    *
    * PRECONDITION: `bandIndex` covers every document in the corpus
    * (the streaming DAG folds every batch's band rows in, dropped docs
    * included, so a continuously-maintained index satisfies this by
    * construction).
    *
    * 100 TB shape: jaccard/simhash are the bucketed kernels q73 uses, the
    * index read replaces the minhash signature pass (at scale the index
    * is a (band, h)-partitioned lake table, so its pair kernel is a
    * partition-local group), and the republish is one partitioned write —
    * the same nightly-compaction cost profile as the cold stage build,
    * minus one corpus pass. */
  private[graft] def republishDedupStage(s: SparkSession, dir: String,
      bandIndex: DataFrame): DataFrame = {
    val toks = Tables.documentsFanned(s, dir)
      .select(col("doc_id"), Cleanse.tokens(col("text")).as("t"))
      .localCheckpoint()
    val jaccard = ngramJaccardPairs(toks).select(col("doc_a"), col("doc_b"))
    val simhash = simhashPairsOf(simhashOf(toks))
      .select(col("doc_a"), col("doc_b"))
    val minhash = bandRowPairsOf(bandIndex)
    val labels = componentsAdaptive( // matches q73's path — parity with the cold stage
      jaccard.unionByName(simhash).unionByName(minhash))
    pinnedRdds(toks).foreach(_.unpersist(blocking = false))
    val out = dedupStageDir(s, dir)
    // republish = overwrite: a stage for this snapshot may already exist
    // (e.g. a consumer cold-built it mid-stream); the reconcile's closure
    // is the fresher truth for the same fingerprint
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    writeStage(s, dir, labels, out)
    s.read.parquet(out)
  }

  /** Per-source SURVIVORSHIP of the dedup stage — the audit table every
    * curation run publishes next to its keep-list (q89's per-source-
    * accounting shape applied to dedup): how many of each source's
    * documents were flagged by any near-dup signal, how many drop
    * (flagged non-canonical), and the survival rate.
    *
    * Since r12 this DERIVES FROM the materialized stage: the plan is a
    * stage-table scan + source-cardinality rollup (the fixpoint ran once,
    * in `dedupStage`). Oracle reuses the q73 recursive-CTE closure
    * verbatim — the stage is pure bookkeeping over the same labels, so
    * the rollup hash-matches the self-contained derivation. */
  def q73b_dedup_survivorship(s: SparkSession, dir: String): DataFrame =
    dedupStage(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("flagged") && !col("is_canonical"), 1L).otherwise(0L))
          .as("n_dropped"))
      .select(col("source"), col("n_docs"), col("n_flagged"), col("n_dropped"),
        (col("n_docs") - col("n_dropped")).as("n_kept"),
        round((col("n_docs") - col("n_dropped")).cast("double") / col("n_docs"), 6)
          .as("survival_rate"))
      .orderBy(col("source"))

  /** DEDUP-AWARE train/val/test split — leakage-proof split assignment.
    * Splitting per DOCUMENT lets near-duplicates straddle train and test
    * (a test doc's near-dup twin trains the model — the classic eval-
    * leakage bug; the Lee et al. 2022 dedup paper's motivating failure).
    * The assignment unit must be the near-dup COMPONENT: every doc
    * inherits its q73 component label (docs no signal touched are their
    * own singleton group) and the split is a pure hash of the GROUP id —
    * 80/10/10 train/val/test. Output: per-split doc/group counts plus a
    * corpus-level leak_free flag (no component straddles splits — true by
    * construction since split = f(group), but ASSERTED through the gate:
    * a bug that split by doc_id would flip it false).
    *
    * Since r12 the assignment lives IN the materialized stage (`split` is
    * its partition column); this query is a stage scan + two group-
    * cardinality aggs. The leak probe is re-derived from the stored
    * table rather than assumed — a stage written with a per-doc split
    * would flip `leak_free` false through the gate. */
  def q100_component_split(s: SparkSession, dir: String): DataFrame = {
    val stage = dedupStage(s, dir)
    val leak = stage.groupBy(col("grp"))
      .agg(countDistinct(col("split")).as("ns"))
      .agg(max(col("ns")).as("max_ns"))
    stage.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("grp")).as("n_groups"))
      .crossJoin(broadcast(leak))
      .select(col("split"), col("n_docs"), col("n_groups"),
        (col("max_ns") === 1L).as("leak_free"))
      .orderBy(col("split"))
  }

  /** Curation REPORT off the materialized stage: the (split × source)
    * matrix a training run reads before mixing data — per cell, document
    * count, survivor count (post-dedup kept docs) and the number of
    * near-dup groups represented (a group spanning sources counts in
    * each source it touches; split never splits a group — that is q100's
    * gated `leak_free` invariant). Third consumer of the stage table:
    * with q73b and q100 it demonstrates the materialize-once /
    * derive-many DAG — three published tables, ONE fixpoint.
    *
    * Scale: a partition-pruned stage scan + one rollup; cell cardinality
    * is |splits| × |sources|. Oracle re-derives the closure and the
    * identical rollup in DuckDB. */
  def q101_curation_report(s: SparkSession, dir: String): DataFrame =
    dedupStage(s, dir)
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_kept"),
        countDistinct(col("grp")).as("n_groups"))
      .orderBy(col("split"), col("source"))

  /** Naive-split leakage audit (q229) — WHY the stage assigns splits by
    * GROUP: a per-document hash split (q217's rule — correct for exact
    * dedup, where duplicates share the id-defining content) lets
    * NEAR-duplicates with different doc_ids straddle the train/eval
    * boundary; for a pair the chance of landing together is only
    * 0.8²+0.1²+0.1² = 0.66, so roughly a third of 2-doc groups leak.
    * This operator QUANTIFIES that: the q73 closure groups crossed with
    * the q217 doc-hash assignment — leaky groups, documents they hold,
    * the leaked permille, and the (expected-false) `leak_free_naive`
    * flag that contrasts with q100's gated-true group-aware split.
    *
    * Scale: one stage scan + a group-cardinality rollup; the split is a
    * map-side hash. Consumer #8 of the materialized stage. */
  def q229_naive_split_leakage(s: SparkSession, dir: String): DataFrame = {
    val naive = dedupStage(s, dir).select(col("doc_id"), col("grp"))
      .withColumn("bucket",
        pmod(graft.rel.JoinCard.splitmix64(col("doc_id")), lit(100L)))
      .withColumn("nsplit",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
    naive.groupBy(col("grp"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("nsplit")).as("ns"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("sz")).as("n_docs"),
        sum(when(col("ns") >= 2, 1L).otherwise(0L)).as("n_leaky_groups"),
        sum(when(col("ns") >= 2, col("sz")).otherwise(0L))
          .as("docs_in_leaky"),
        max(col("ns")).as("max_span"))
      .select(col("n_groups"), col("n_docs"), col("n_leaky_groups"),
        col("docs_in_leaky"), col("max_span"),
        expr("(1000 * docs_in_leaky) div n_docs").as("leaked_permille"),
        (col("n_leaky_groups") === 0L).as("leak_free_naive"))
  }

  /** Component-SIZE histogram off the materialized stage — the cluster-
    * size audit a dedup run publishes (how much of the corpus sits in
    * big near-dup clusters vs singletons; a sudden mass shift toward
    * large components is the canary for a broken signal or a crawler
    * loop). Fourth consumer of the stage table: group sizes from one
    * grp rollup, histogram from a second — both group-cardinality.
    * Singletons (docs no signal touched) are size-1 groups. */
  def q109_component_sizes(s: SparkSession, dir: String): DataFrame =
    dedupStage(s, dir)
      .groupBy(col("grp")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("sz")).cast("long").as("n_docs"))
      .orderBy(col("group_size"))

  /** HARD-NEGATIVE MINING for contrastive training (round-13; fifth
    * consumer of the materialized dedup stage). The public recipe
    * (DPR/ANCE-family dense retrieval): for each anchor, the most useful
    * negatives are its nearest non-positive neighbors — semantically
    * close enough to be hard, but NOT near-duplicates of the anchor,
    * which would be FALSE negatives that corrupt the contrastive loss.
    * The near-dup exclusion is exactly what the dedup stage already
    * knows: a candidate sharing the anchor's `grp` (q73 three-signal
    * component) is excluded; everything else ranks by exact cosine and
    * the top-5 per anchor are the mined negatives.
    *
    * Scale shape: the anchor panel broadcasts (a training run mines for
    * a bounded query batch, not the whole corpus); candidates stream
    * through one scan joined hash-wise to the stage's (doc_id, grp)
    * projection; per-anchor top-k is a bounded-heap WindowGroupLimit. At
    * 100 TB the brute cosine pass swaps for the gated IVF/PQ shortlist
    * (q106) with the same exclusion join — the documented parameter
    * swap. Oracle: the q73 recursive-CTE closure composed with the q19
    * brute cosine ranking, exclusions replayed verbatim. */
  def q114_hard_negatives(s: SparkSession, dir: String): DataFrame = {
    val eg = Tables.embeddingsFanned(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
        col("label"))
      .join(dedupStage(s, dir).select(col("doc_id").as("vec_id"), col("grp")),
        Seq("vec_id"))
    val anchors = eg.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("grp").as("qgrp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_r").desc, col("neighbor_id"))
    eg.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("query_id") && col("grp") =!= col("qgrp"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qemb"), col("emb")), 6).as("sim_r"),
        col("label").as("neighbor_label"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim_r"),
        col("neighbor_label"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** CONTRASTIVE TRAINING TRIPLES (round-13; seventh consumer of the
    * materialized dedup stage) — the finished training table a dense-
    * retrieval / SimCSE-style run consumes: per anchor, ONE positive and
    * the mined hard negatives in a single row. The positive is the
    * anchor's best same-component partner (max rounded cosine, id
    * tiebreak) — near-duplicate pairs as positives is the public
    * unsupervised recipe; the negatives are exactly q114's top-5
    * non-component neighbors, serialized in rank order (engine-neutral
    * comma-joined string — raw arrays don't survive the harness dump).
    * Anchors whose component is a singleton drop out: a contrastive
    * example without a positive isn't one.
    *
    * Scale: anchors broadcast twice (positive pick joins on the hash-
    * partitioned grp, negatives on the q114 shape); both per-anchor
    * picks are bounded-heap window limits. Oracle: the q73 closure +
    * q114's ranking + an ordered string_agg. */
  def q118_contrastive_triples(s: SparkSession, dir: String): DataFrame = {
    val eg = Tables.embeddingsFanned(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .join(dedupStage(s, dir).select(col("doc_id").as("vec_id"), col("grp")),
        Seq("vec_id"))
    val anchors = eg.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("grp").as("qgrp"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("pos_sim_r").desc, col("positive_id"))
    val pos = eg.join(broadcast(anchors),
        col("grp") === col("qgrp") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("positive_id"),
        round(cosine(col("qemb"), col("emb")), 6).as("pos_sim_r"))
      .withColumn("prn", row_number().over(pw)).filter(col("prn") === 1)
      .drop("prn")
    val negs = q114_hard_negatives(s, dir)
      .groupBy(col("query_id"))
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(rank, neighbor_id))), x -> CAST(x.neighbor_id AS STRING))" +
        ", ',')").as("negatives"),
        count(lit(1)).as("n_negatives"))
    pos.join(negs, Seq("query_id"))
      .select(col("query_id"), col("positive_id"), col("pos_sim_r"),
        col("negatives"), col("n_negatives"))
      .orderBy(col("query_id"))
  }

  /** TRAINING MANIFEST (round-13; sixth consumer of the materialized
    * dedup stage) — the table a training run reads before launching:
    * per (split, source), how many canonical documents survive curation,
    * how many TOKENIZER tokens they carry (real subword counts via the
    * q72b lexer + greedy WordPiece walk, not whitespace words), how many
    * fixed-length training sequences they pack into (q72's 32-independent-
    * bucket concat-and-slice layout, seqLen 64 — per-bucket ceil-div, no
    * global serial cumsum), and each cell's share of the total token
    * budget. Composes four subsystems in one gated frame: the dedup
    * stage (keep + leakage-proof split), the subword tokenizer, the
    * packing accounting, and the source mix. All-integer except the
    * rounded share, so the gate is exact; the oracle replays the q73
    * closure, the recursive tokenizer walk, and the packing arithmetic
    * in one WITH block. */
  def q115_training_manifest(s: SparkSession, dir: String): DataFrame = {
    import graft.text.Subword
    val kept = Tables.documentsFanned(s, dir)
      .select(col("doc_id"),
        aggregate(
          regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)),
          lit(0L),
          (a, p) => a + Subword.subword_count(p).cast("long"))
          .as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .join(dedupStage(s, dir).filter(col("is_canonical"))
        .select(col("doc_id"), col("source"), col("split")), "doc_id")
      .withColumn("bucket", pmod(col("doc_id"), lit(32)))
    val cells = kept.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
    val seqs = kept.groupBy(col("split"), col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("bt"))
      .groupBy(col("split"), col("source"))
      .agg(sum(expr("(bt + 63) div 64")).cast("long").as("n_sequences"))
    val total = kept.agg(sum(col("n_tokens")).cast("long").as("tt"))
    cells.join(seqs, Seq("split", "source"))
      .crossJoin(broadcast(total))
      .select(col("split"), col("source"), col("n_docs"), col("n_tokens"),
        col("n_sequences"),
        round(col("n_tokens").cast("double") / col("tt"), 6).as("token_share"))
      .orderBy(col("split"), col("source"))
  }

  /** Connected components over an undirected pair list (doc_a, doc_b) →
    * (doc_id, component, is_canonical) by ALTERNATING LARGE-STAR /
    * SMALL-STAR (Kiveris et al. 2014, "Connected components in MapReduce
    * and beyond" — public algorithm): each round rewires every node's
    * larger neighbors (large-star) then its smaller ones (small-star) to
    * the local minimum, squashing component diameter geometrically. The
    * edge set converges to one star per component centered on the
    * component's minimum id in O(log²) rounds — unlike plain min-label
    * propagation, whose O(diameter) rounds made a 50-round cap reachable
    * on adversarial chains, and whose cap exit silently mislabeled them
    * (round-4 "what's wrong" item 1). Per round: two groupBy-min aggs +
    * two equi-joins, all hash-partitioned on node id; the driver holds
    * only the convergence counter. Convergence is now ASSERTED, never
    * truncated: MaxRounds = 64 covers graphs past 2^64 nodes with margin,
    * so hitting it means a bug, not big data. */
  def components(pairs: DataFrame): DataFrame = componentsWithRounds(pairs)._1

  /** ADAPTIVE connected components (round-13, the q70 shave): the
    * distributed large-star/small-star fixpoint pays ~6 driver jobs of
    * fixed scheduling cost per call — the right price for a corpus-scale
    * edge set, pure overhead for the metadata-scale pair graphs a
    * THRESHOLDED candidate generator emits (q70's funnel measured 220
    * pairs at sf0.1 spending ~2.4 s in fixpoint scheduling). This is the
    * GraphFrames-style local fallback: ONE job counts the canonical edge
    * set; at or under `maxLocalEdges` (default 2^20 edges = 16 MB of
    * longs — driver metadata scale, the same budget as a broadcast join
    * side) the edges collect to a driver union-find whose roots are
    * component minima; above it, the distributed fixpoint runs unchanged.
    * Labels are bit-identical between the two paths (min-id components),
    * so the threshold is a pure latency knob — ComponentsSpec asserts
    * equality on both sides of it. Used by the multi-stage consumers
    * (q70's funnel pass, q92's refine) where the component pass is one
    * stage of many; q55/q73 keep the pure fixpoint so its cost stays a
    * bench-visible line. */
  private[graft] def componentsAdaptive(pairs: DataFrame,
      maxLocalEdges: Long = 1L << 20): DataFrame = {
    val init = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    val n = init.count() // free: counts the just-materialized checkpoint
    val out = if (n > maxLocalEdges) {
      componentsWithRounds(
        init.select(col("u").as("doc_a"), col("v").as("doc_b")))._1
    } else {
      val spark = pairs.sparkSession
      // union-find, smaller id always the root: each tree's root IS its
      // component minimum, with path compression keeping finds amortized
      // near-constant
      val parent = scala.collection.mutable.LongMap.empty[Long]
      val nodes = scala.collection.mutable.LongMap.empty[Boolean]
      def find(x: Long): Long = {
        var r = parent.getOrElse(x, x)
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      init.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        nodes.update(a, true); nodes.update(b, true)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val rows = nodes.keysIterator.toArray.sorted.map { id =>
        val root = find(id)
        org.apache.spark.sql.Row(id, root, id == root)
      }
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, component LONG, is_canonical BOOLEAN")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        .localCheckpoint() // pinned, matching components()' contract
    }
    pinnedRdds(init).foreach(_.unpersist(blocking = false))
    out
  }

  /** The RDDs a localCheckpoint'd Dataset pinned — each checkpointed
    * Dataset's plan is a LogicalRDD wrapping the persisted RDD. Used to
    * release corpus-sized intermediates once a query's (small) result is
    * itself pinned, so long-lived sessions don't accumulate block-manager
    * debt per call. (A global persistent-RDD sweep would also unpersist
    * RDDs a concurrent query persisted — fatal for its truncated lineage.) */
  private[graft] def pinnedRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => buf += l.rdd
      case _ => ()
    }
    buf.toSeq
  }

  val MaxRounds = 64

  /** (labels, rounds-to-converge) — rounds exposed for ComponentsSpec's
    * O(log) convergence assertion on a long chain. */
  private[graft] def componentsWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    // canonical orientation: (u, v) with u > v, deduped
    // localCheckpoint (not cache) each round: star ops reference their
    // input ~6 times, so the composed logical plan grows 6^rounds —
    // Catalyst ANALYSIS of the tree becomes the bottleneck long before
    // execution does. Checkpointing truncates lineage to a constant-size
    // LogicalRDD per round (on a cluster: reliable checkpoint to the DFS).
    // Every localCheckpoint below caches an RDD; without cleanup a bench
    // loop leaks one per round per run, and the accumulated block-manager
    // debt quintupled q55's time 70 queries into a bench sequence. Track
    // exactly the RDDs THIS loop checkpointed — each checkpointed Dataset's
    // plan is a LogicalRDD wrapping the persisted RDD — and drop them once
    // the result is pinned. (A global persistent-RDD set-diff would also
    // unpersist RDDs a concurrent query on the shared session persisted
    // in the meantime, which is fatal for its truncated lineage.)
    val loopRdds = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
    def tracked(df: DataFrame): DataFrame = { loopRdds ++= pinnedRdds(df); df }
    val init = tracked(pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint())
    // Commutative set fingerprint (cardinality, XOR of row hashes): equal
    // fingerprints on consecutive rounds almost certainly mean equal edge
    // sets (both are distinct; a false match needs a 64-bit XOR collision
    // at equal cardinality). The per-round convergence probe is then a
    // map-side-partial aggregate over NEXT alone — no union, no groupBy
    // re-shuffle of both edge sets (the round-7 verdict's bench-variance
    // item: each fixpoint round's driver-job weight compounds scheduling
    // noise). Convergence is still EXACTLY asserted: a fingerprint match
    // triggers the one-shot set-equality check below, so a collision can
    // only cost one extra round, never a wrong exit.
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var edges = init
    var prevFp = fingerprint(init)
    var rounds = 0
    var converged = false
    while (!converged && rounds < MaxRounds) {
      // LAZY checkpoint: the fingerprint probe below is the round's only
      // job — it materializes next's cache as a side effect, instead of
      // paying one checkpoint job + one comparison job per round.
      // (Measured dead end, recorded so it isn't retried: TWO star
      // contractions per materialization — halving checkpoint/check
      // overhead — benched consistently SLOWER at sf0.1 (fixpoint trio
      // 19.8s → 22.8/23.7s): the doubled per-job plan depth costs more
      // than the fixed costs it saves.)
      val next = tracked(smallStar(largeStar(edges)).localCheckpoint(eager = false))
      val fp = fingerprint(next)
      if (fp == prevFp) {
        // exact set equality in ONE job (both sides are distinct): tag
        // +1/-1, any group summing nonzero is a difference either way
        converged = edges.select(col("u"), col("v"), lit(1).as("tag"))
          .union(next.select(col("u"), col("v"), lit(-1).as("tag")))
          .groupBy(col("u"), col("v")).agg(sum(col("tag")).as("d"))
          .filter(col("d") =!= 0).isEmpty
      }
      prevFp = fp
      edges = next
      rounds += 1
    }
    require(converged,
      s"large-star/small-star did not converge in $MaxRounds rounds — " +
        "impossible for any finite graph; investigate input")
    // at the fixpoint every edge is (member, component-min)
    val nodes = init
      .select(explode(array(col("u"), col("v"))).as("doc_id")).distinct()
    val labels = nodes
      .join(edges.select(col("u").as("doc_id"), col("v").as("label")),
        Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(coalesce(min(col("label")), first(col("doc_id"))).as("component"))
      .select(col("doc_id"), col("component"),
        (col("doc_id") === col("component")).as("is_canonical"))
      // eagerly pin the (tiny, one-row-per-node) label table so every
      // loop checkpoint can be dropped before this returns — callers see
      // a plan with no reference to the fixpoint's intermediate state
      .localCheckpoint()
    loopRdds.foreach(_.unpersist(blocking = false))
    (labels, rounds)
  }

  /** Large-star: every node u connects its strictly-larger neighbors to
    * m(u) = min(N(u) ∪ {u}). Input/output edges are canonically oriented
    * (first col > second). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("u").as("x"), col("v").as("y"))
      .unionByName(edges.select(col("v").as("x"), col("u").as("y")))
    val m = nbrs.groupBy(col("x")).agg(min(col("y")).as("mn"))
      .select(col("x"), least(col("mn"), col("x")).as("m"))
    nbrs.join(m, "x")
      .filter(col("y") > col("x"))
      .select(col("y").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node u connects its smaller-or-equal neighbors
    * (canonical edges already point large→small) plus itself to
    * m(u) = min of those neighbors. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val m = edges.groupBy(col("u")).agg(min(col("v")).as("m"))
    val viaNbr = edges.join(m, "u")
      .select(col("v").as("u2"), col("m").as("v2"))
    val self = m.select(col("u").as("u2"), col("m").as("v2"))
    viaNbr.unionByName(self)
      .filter(col("u2") =!= col("v2"))
      .select(col("u2").as("u"), col("v2").as("v"))
      .distinct()
  }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_similarity_topk" -> (q19_similarity_topk _),
    "q33_ngram_jaccard"   -> (q33_ngram_jaccard _),
    "m_ann_lsh"           -> (m_ann_lsh _),
    "m_ann_ivf"           -> (m_ann_ivf _),
    "m_dedup_embedding"   -> (m_dedup_embedding _),
    "m_dedup_minhash_lsh" -> (m_dedup_minhash_lsh _),
    "m_dedup_simhash"     -> (m_dedup_simhash _),
    "m_ann_ivf_seeded"    -> (m_ann_ivf_seeded _),
    "q55_dedup_components"-> (q55_dedup_components _),
    "q73_dedup_union"     -> (q73_dedup_union _),
    "q274_capture_recapture" -> (q274_capture_recapture _),
    "q73b_dedup_survivorship" -> (q73b_dedup_survivorship _),
    "q100_component_split" -> (q100_component_split _),
    "q101_curation_report" -> (q101_curation_report _),
    "q229_naive_split_leakage" -> (q229_naive_split_leakage _),
    "q109_component_sizes" -> (q109_component_sizes _),
    "q114_hard_negatives" -> (q114_hard_negatives _),
    "q118_contrastive_triples" -> (q118_contrastive_triples _),
    "q115_training_manifest" -> (q115_training_manifest _),
    "q79_jaccard_prefix"  -> (q79_jaccard_prefix _),
    "q82_ann_ivf_recall"  -> (q82_ann_ivf_recall _),
    "m_ann_pq_fitted"     -> (m_ann_pq_fitted _),
    "q99_pq_fitted_recall" -> (q99_pq_fitted_recall _),
    "q106_ivfpq_recall"   -> (q106_ivfpq_recall _),
    "q108_mmr_rerank"     -> (q108_mmr_rerank _),
    "q110_ivfpq_residual_recall" -> (q110_ivfpq_residual_recall _),
    "q84_minhash_lsh_recall" -> (q84_minhash_lsh_recall _),
    "m_ann_pq_seeded"     -> (m_ann_pq_seeded _),
    "q92_semdedup"        -> (q92_semdedup _),
    "q158_matryoshka_recall" -> (q158_matryoshka_recall _))

  private val DToks =
    "list_filter(string_split(trim(text), ' '), t -> t <> '')"

  /** DuckDB twins of the banded-LSH queries. The hyperplanes come from a
    * seeded RNG (Random(42), same draw order as `bandKeys`), so the oracle
    * can reproduce the exact signatures by embedding the plane constants as
    * SQL literals — Double.toString round-trips, and a sign flip would need
    * |dot| below double noise (P ~ 1e-10 for Gaussian planes). This turns
    * the two LSH paths from rows-only checks into exact hash-gated ones. */
  private def hyperPlanesSql(bands: Int, planes: Int, dim: Int): IndexedSeq[String] = {
    val rnd = new scala.util.Random(42)
    IndexedSeq.fill(bands * planes)(
      IndexedSeq.fill(dim)(rnd.nextGaussian()).mkString("[", ", ", "]"))
  }

  /** `key` expression for one band: planes sign bits packed little-endian,
    * mirroring bandKeys' when(dot >= 0, 1 << i) sum. */
  private def bandKeySql(embCol: String, b: Int, planes: Int,
      hyper: IndexedSeq[String]): String =
    (0 until planes).map { i =>
      s"(CASE WHEN list_dot_product($embCol, ${hyper(b * planes + i)}) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  /** keys CTE body: one UNION ALL arm per band over relation `src`
    * (columns vec_id, emb) — the unrolled twin of posexplode(array(keys)). */
  private def keysSql(src: String, bands: Int, planes: Int,
      hyper: IndexedSeq[String]): String =
    (0 until bands).map { b =>
      s"SELECT vec_id, emb, $b AS band, ${bandKeySql("emb", b, planes, hyper)} AS key FROM $src"
    }.mkString("\nUNION ALL\n")

  private lazy val annLshOracle: String = {
    val hyper = hyperPlanesSql(8, 6, 64)
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |keys AS (
       |${keysSql("e", 8, 6, hyper)}
       |),
       |q AS (SELECT vec_id AS query_id, band, key FROM keys WHERE vec_id < 50),
       |cand AS (SELECT DISTINCT q.query_id, k.vec_id AS neighbor_id
       |  FROM q JOIN keys k ON q.band = k.band AND q.key = k.key
       |  WHERE k.vec_id <> q.query_id),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |  round(list_dot_product(a.emb, b.emb) /
       |        (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6) AS sim
       |  FROM cand c JOIN e a ON a.vec_id = c.query_id
       |              JOIN e b ON b.vec_id = c.neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, sim,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, sim, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  private lazy val dedupEmbeddingOracle: String = {
    val hyper = hyperPlanesSql(8, 6, 64)
    s"""WITH r AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
       |e AS (SELECT vec_id,
       |  list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw))) AS emb FROM r),
       |keys AS (
       |${keysSql("e", 8, 6, hyper)}
       |),
       |bk AS (SELECT vec_id, band * 64 + key AS bl FROM keys),
       |bkc AS (SELECT vec_id, bl FROM (
       |  SELECT vec_id, bl, ROW_NUMBER() OVER (PARTITION BY bl
       |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS br FROM bk)
       |  WHERE br <= $BandBucketCap),
       |pairs AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM bkc x JOIN bkc y
       |  ON x.bl = y.bl AND x.vec_id < y.vec_id)
       |SELECT id_a, id_b, round(list_dot_product(x.emb, y.emb), 6) AS sim
       |FROM pairs JOIN e x ON x.vec_id = id_a JOIN e y ON y.vec_id = id_b
       |ORDER BY sim DESC, id_a, id_b LIMIT 20""".stripMargin
  }

  /** Generated twin of m_ann_ivf_seeded: the same seeded centroids (and
    * their squared norms) embedded as SQL literals; assignment, probe
    * ranking and re-scoring mirror the Spark expressions op-for-op so the
    * doubles — and hence the argmin/rank decisions — agree exactly. */
  private lazy val annIvfSeededOracle: String = {
    val k = 16
    val nProbe = 4
    val cents = seededCentroids(k, 64)
    val ss = cents.map(_.map(x => x * x).sum)
    val centLits = cents.map(_.mkString("[", ", ", "]"))
    val scoreExprs = (0 until k).map(i =>
      s"(-2.0 * list_dot_product(emb, ${centLits(i)}) + ${ss(i)})")
      .mkString("[", ",\n  ", "]")
    val centRows = (0 until k).map(i =>
      s"($i, ${centLits(i)}, ${ss(i)})").mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |sc AS (SELECT vec_id, emb,
       |  $scoreExprs AS sc FROM e),
       |a AS (SELECT vec_id, emb,
       |    CAST(list_position(sc, list_min(sc)) - 1 AS INT) AS list_id
       |  FROM sc),
       |cents(list_id, cent, css) AS (VALUES
       |  $centRows),
       |probes AS (SELECT query_id, qemb, list_id FROM (
       |  SELECT q.vec_id AS query_id, q.emb AS qemb, c.list_id,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |      (-2.0 * list_dot_product(q.emb, c.cent) + c.css), c.list_id) AS pr
       |  FROM (SELECT vec_id, emb FROM a WHERE vec_id < 50) q, cents c)
       |  WHERE pr <= $nProbe),
       |cand AS (SELECT p.query_id, p.qemb, x.vec_id AS neighbor_id, x.emb
       |  FROM probes p JOIN a x ON p.list_id = x.list_id
       |  WHERE x.vec_id <> p.query_id),
       |scored AS (SELECT query_id, neighbor_id,
       |  round(list_dot_product(qemb, emb) /
       |    (sqrt(list_dot_product(qemb, qemb)) * sqrt(list_dot_product(emb, emb))), 6) AS sim
       |  FROM cand),
       |ranked AS (SELECT query_id, neighbor_id, sim,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, sim
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Generated twin of m_ann_pq_seeded: codes, ADC tables and ranks all
    * re-derived from the same embedded centroid constants; expression
    * composition order mirrors the Spark side term-for-term so the
    * doubles — and hence the argmin / rank decisions — agree exactly. */
  private lazy val annPqSeededOracle: String = {
    val (mSub, k, sub) = (8, 16, 8)
    val cents = pqCentroids(mSub, k, sub)
    val ss = cents.map(_.map(_.map(x => x * x).sum))
    def centLit(m: Int, j: Int) = cents(m)(j).mkString("[", ", ", "]")
    def slice(e: String, m: Int) = s"$e[${m * sub + 1}:${m * sub + sub}]"
    val scCols = (0 until mSub).map { m =>
      (0 until k).map(j =>
        s"(-2.0 * list_dot_product(${slice("emb", m)}, ${centLit(m, j)}) + ${ss(m)(j)})")
        .mkString("[", ",\n    ", s"] AS sc$m")
    }.mkString(",\n  ")
    val codeCols = (0 until mSub).map(m =>
      s"CAST(list_position(sc$m, list_min(sc$m)) - 1 AS INT) AS c$m").mkString(",\n  ")
    val tabCols = (0 until mSub).map { m =>
      val qs = slice("qemb", m)
      (0 until k).map(j =>
        s"(list_dot_product($qs, $qs) + -2.0 * list_dot_product($qs, ${centLit(m, j)}) + ${ss(m)(j)})")
        .mkString("[", ",\n    ", s"] AS t$m")
    }.mkString(",\n  ")
    val adist = (0 until mSub).map(m => s"t$m[c$m + 1]").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |scs AS (SELECT vec_id, emb,
       |  $scCols
       |  FROM e),
       |codes AS (SELECT vec_id,
       |  $codeCols
       |  FROM scs),
       |q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 50),
       |qt AS (SELECT query_id,
       |  $tabCols
       |  FROM q),
       |scored AS (SELECT qt.query_id, c.vec_id AS neighbor_id,
       |    $adist AS adist
       |  FROM codes c, qt WHERE c.vec_id <> qt.query_id),
       |ranked AS (SELECT query_id, neighbor_id, adist,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       |  round(adist, 6) AS adist_r
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Generated twin of q92: candidates from the same hyperplane / centroid
    * literals (band collisions ∪ same-list pairs over normalized
    * embeddings), exact-dot threshold, recursive-CTE transitive closure. */
  private lazy val semdedupOracle: String = {
    val hyper = hyperPlanesSql(8, 6, 64)
    val k = 16
    val cents = seededCentroids(k, 64)
    val ss = cents.map(_.map(x => x * x).sum)
    val centLits = cents.map(_.mkString("[", ", ", "]"))
    val scoreExprs = (0 until k).map(i =>
      s"(-2.0 * list_dot_product(emb, ${centLits(i)}) + ${ss(i)})")
      .mkString("[", ",\n  ", "]")
    s"""WITH RECURSIVE raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS rw FROM embeddings),
       |e AS (SELECT vec_id,
       |  list_transform(rw, x -> x / sqrt(list_dot_product(rw, rw))) AS emb FROM raw),
       |keys AS (
       |${keysSql("e", 8, 6, hyper)}
       |),
       |bk AS (SELECT vec_id, band * 64 + key AS bl FROM keys),
       |bkc AS (SELECT vec_id, bl FROM (
       |  SELECT vec_id, bl, ROW_NUMBER() OVER (PARTITION BY bl
       |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS br FROM bk)
       |  WHERE br <= $BandBucketCap),
       |lpairs AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM bkc x JOIN bkc y
       |  ON x.bl = y.bl AND x.vec_id < y.vec_id),
       |sc AS (SELECT vec_id, emb,
       |  $scoreExprs AS sc FROM e),
       |asg AS (SELECT vec_id,
       |    CAST(list_position(sc, list_min(sc)) - 1 AS INT) AS list_id
       |  FROM sc),
       |asgc AS (SELECT vec_id, list_id FROM (
       |  SELECT vec_id, list_id, ROW_NUMBER() OVER (PARTITION BY list_id
       |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS lr FROM asg)
       |  WHERE lr <= $IvfListCap),
       |ipairs AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM asgc x JOIN asgc y
       |  ON x.list_id = y.list_id AND x.vec_id < y.vec_id),
       |cand AS (SELECT id_a, id_b FROM lpairs
       |  UNION SELECT id_a, id_b FROM ipairs),
       |pairs AS (SELECT id_a, id_b FROM cand
       |  JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
       |  WHERE list_dot_product(ea.emb, eb.emb) >= 0.35),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach AS (SELECT src, dst FROM edges
       |  UNION SELECT r2.src, e2.dst FROM reach r2 JOIN edges e2 ON r2.dst = e2.src),
       |lab AS (SELECT src AS id, LEAST(src, MIN(dst)) AS component
       |  FROM reach GROUP BY src)
       |SELECT id AS vec_id, component, (id = component) AS is_canonical
       |FROM lab ORDER BY vec_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q92_semdedup" -> semdedupOracle,
    "m_ann_pq_seeded" -> annPqSeededOracle,
    // brute inverted-index truth over distinct token sets; the engine's
    // probabilistic columns are contract booleans / literal zero
    "q84_minhash_lsh_recall" ->
      s"""WITH toks AS (SELECT doc_id, list_distinct($DToks) AS t
         |  FROM documents WHERE $LshGateSql),
         |sh AS (SELECT doc_id, unnest(t) AS item FROM toks),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.item = b.item AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (SELECT doc_a, doc_b FROM inter
         |  JOIN sizes x ON inter.doc_a = x.doc_id
         |  JOIN sizes y ON inter.doc_b = y.doc_id
         |  WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) >= 0.7)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs, TRUE AS recall_ok,
         |  TRUE AS dists_ok, CAST(0 AS BIGINT) AS n_false_pairs FROM truth""".stripMargin,
    "q82_ann_ivf_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 50),
        |pairs AS (SELECT query_id, vec_id AS neighbor_id,
        |  round(list_dot_product(qemb, emb) /
        |        (sqrt(list_dot_product(qemb, qemb)) * sqrt(list_dot_product(emb, emb))), 6) AS sim
        |  FROM q, e WHERE vec_id <> query_id),
        |ranked AS (SELECT query_id, neighbor_id,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM pairs)
        |SELECT COUNT(DISTINCT query_id) AS n_queries, TRUE AS recall_ok
        |FROM ranked WHERE rank <= 3""".stripMargin,
    // the MRL truncation curve — the full per-dim top-3 overlap replay
    "q158_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 50),
        |dims(dim) AS (VALUES (8), (16), (32), (64)),
        |pairs AS (SELECT d.dim, query_id, vec_id AS neighbor_id,
        |  round(list_dot_product(qemb[1:d.dim], emb[1:d.dim]) /
        |        (sqrt(list_dot_product(qemb[1:d.dim], qemb[1:d.dim])) *
        |         sqrt(list_dot_product(emb[1:d.dim], emb[1:d.dim]))), 6) AS sim
        |  FROM q, e, dims d WHERE vec_id <> query_id),
        |rk AS (SELECT dim, query_id, neighbor_id,
        |  ROW_NUMBER() OVER (PARTITION BY dim, query_id
        |    ORDER BY sim DESC, neighbor_id) AS r FROM pairs),
        |tk AS (SELECT dim, query_id, neighbor_id FROM rk WHERE r <= 3),
        |truth AS (SELECT query_id, neighbor_id FROM tk WHERE dim = 64)
        |SELECT CAST(t.dim AS INTEGER) AS dim,
        |  CAST(COUNT(DISTINCT t.query_id) AS BIGINT) AS n_queries,
        |  CAST((1000 * SUM(CASE WHEN x.neighbor_id IS NOT NULL
        |    THEN 1 ELSE 0 END)) // (3 * COUNT(DISTINCT t.query_id))
        |    AS BIGINT) AS overlap_permille
        |FROM tk t LEFT JOIN truth x
        |  ON x.query_id = t.query_id AND x.neighbor_id = t.neighbor_id
        |GROUP BY t.dim ORDER BY dim""".stripMargin,
    // truth = exact squared L2 (what ADC approximates — embeddings are
    // unnormalized); recall_ok asserted as literal TRUE, q82's shape
    "q99_pq_fitted_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 50),
        |pairs AS (SELECT query_id, vec_id AS neighbor_id,
        |  list_dot_product(qemb, qemb) - 2.0 * list_dot_product(qemb, emb)
        |    + list_dot_product(emb, emb) AS l2
        |  FROM q, e WHERE vec_id <> query_id),
        |ranked AS (SELECT query_id, neighbor_id,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY l2, neighbor_id) AS rank FROM pairs)
        |SELECT COUNT(DISTINCT query_id) AS n_queries, TRUE AS recall_ok
        |FROM ranked WHERE rank <= 3""".stripMargin,
    // same truth-recompute + asserted-flag shape as q99: the oracle pins
    // the query count and the contract boolean as literal TRUE
    "q106_ivfpq_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 50),
        |pairs AS (SELECT query_id, vec_id AS neighbor_id,
        |  list_dot_product(qemb, qemb) - 2.0 * list_dot_product(qemb, emb)
        |    + list_dot_product(emb, emb) AS l2
        |  FROM q, e WHERE vec_id <> query_id),
        |ranked AS (SELECT query_id, neighbor_id,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY l2, neighbor_id) AS rank FROM pairs)
        |SELECT COUNT(DISTINCT query_id) AS n_queries, TRUE AS recall_ok
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q108_mmr_rerank" -> mmrOracle,
    "q110_ivfpq_residual_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 50),
        |pairs AS (SELECT query_id, vec_id AS neighbor_id,
        |  list_dot_product(qemb, qemb) - 2.0 * list_dot_product(qemb, emb)
        |    + list_dot_product(emb, emb) AS l2
        |  FROM q, e WHERE vec_id <> query_id),
        |ranked AS (SELECT query_id, neighbor_id,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY l2, neighbor_id) AS rank FROM pairs)
        |SELECT COUNT(DISTINCT query_id) AS n_queries, TRUE AS recall_ok
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "m_ann_lsh"         -> annLshOracle,
    "m_ann_ivf_seeded"  -> annIvfSeededOracle,
    "m_dedup_embedding" -> dedupEmbeddingOracle,
    "m_dedup_simhash"   -> simhashOracle,
    "q19_similarity_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 5),
        |pairs AS (SELECT query_id, vec_id AS neighbor_id,
        |  round(list_dot_product(qemb, emb) /
        |        (sqrt(list_dot_product(qemb, qemb)) * sqrt(list_dot_product(emb, emb))), 6) AS sim_r
        |  FROM q, e WHERE vec_id <> query_id),
        |ranked AS (SELECT query_id, neighbor_id, sim_r,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_r DESC, neighbor_id) AS rank FROM pairs)
        |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, sim_r
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the UNCAPPED truth — no stop-shingle guard; prefix filtering on the
    // Spark side must reproduce it exactly or the gate fails
    "q79_jaccard_prefix" ->
      s"""WITH toks AS (SELECT doc_id, $DToks AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |  unnest(list_transform(range(1, len(t) - 1),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
         |  FROM toks WHERE len(t) >= 3),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) AS jaccard
         |FROM inter JOIN sizes x ON inter.doc_a = x.doc_id
         |           JOIN sizes y ON inter.doc_b = y.doc_id
         |WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q33_ngram_jaccard" ->
      s"""WITH $NgramCtes
         |SELECT doc_a, doc_b,
         |  round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) AS jaccard
         |FROM inter JOIN sizes x ON inter.doc_a = x.doc_id
         |           JOIN sizes y ON inter.doc_b = y.doc_id
         |WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    // transitive closure over the same pair graph (recursive CTE); the
    // component label is the minimum reachable doc_id, as in the Spark
    // min-label propagation
    "q55_dedup_components" ->
      s"""WITH RECURSIVE $NgramCtes,
         |pairs AS (SELECT doc_a, doc_b
         |  FROM inter JOIN sizes x ON inter.doc_a = x.doc_id
         |             JOIN sizes y ON inter.doc_b = y.doc_id
         |  WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) >= 0.5),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT src, dst FROM edges
         |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (SELECT src AS id, LEAST(src, MIN(dst)) AS component
         |  FROM reach GROUP BY src)
         |SELECT id AS doc_id, component, (id = component) AS is_canonical
         |FROM lab ORDER BY doc_id""".stripMargin,
    "q274_capture_recapture" -> captureOracle,
    // union of all three near-dup signals (n-gram Jaccard, SimHash,
    // MinHash band collisions), then the same recursive-CTE closure
    "q73_dedup_union" ->
      s"""WITH RECURSIVE $dedupUnionCtes
         |SELECT id AS doc_id, component, (id = component) AS is_canonical
         |FROM lab ORDER BY doc_id""".stripMargin,
    // the q73 closure verbatim + the per-source audit rollup
    "q73b_dedup_survivorship" ->
      s"""WITH RECURSIVE $dedupUnionCtes,
         |surv AS (SELECT d.source, COUNT(*) AS n_docs,
         |    CAST(SUM(CASE WHEN lab.id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_flagged,
         |    CAST(SUM(CASE WHEN lab.id IS NOT NULL AND lab.id <> lab.component
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.id
         |  GROUP BY d.source)
         |SELECT source, n_docs, n_flagged, n_dropped,
         |  n_docs - n_dropped AS n_kept,
         |  round(CAST(n_docs - n_dropped AS DOUBLE) / n_docs, 6) AS survival_rate
         |FROM surv ORDER BY source""".stripMargin,
    // the q73 closure verbatim, then split assignment per COMPONENT:
    // bucket = md5(group id) % 100 → 80/10/10, and the leak probe
    // (max distinct splits per group) re-derived rather than assumed
    "q100_component_split" ->
      s"""WITH RECURSIVE $dedupUnionCtes,
         |grouped AS (SELECT d.doc_id,
         |    COALESCE(lab.component, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.id),
         |asg AS (SELECT doc_id, grp,
         |  CASE WHEN CAST('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 4)
         |      AS BIGINT) % 100 < 80 THEN 'train'
         |    WHEN CAST('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 4)
         |      AS BIGINT) % 100 < 90 THEN 'val'
         |    ELSE 'test' END AS split
         |  FROM grouped),
         |leak AS (SELECT MAX(ns) AS max_ns FROM (
         |  SELECT grp, COUNT(DISTINCT split) AS ns FROM asg GROUP BY grp))
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
         |  (max_ns = 1) AS leak_free
         |FROM asg, leak GROUP BY split, max_ns ORDER BY split""".stripMargin,
    // the q73 closure + the q72b recursive tokenizer walk + the split
    // assignment + the per-bucket packing ceil-div, in one WITH block:
    // the full curation manifest replayed end-to-end
    "q115_training_manifest" ->
      s"""WITH RECURSIVE $dedupUnionCtes,
         |lex AS (SELECT doc_id,
         |    regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS ps
         |  FROM documents),
         |words AS (SELECT DISTINCT unnest(ps) AS w FROM lex),
         |rec AS (
         |  SELECT w, 1 AS pos, 0 AS cnt FROM words
         |  UNION ALL
         |  SELECT w, pos + ${graft.text.Subword.matchLenSql("w", "pos")}, cnt + 1
         |  FROM rec WHERE pos <= len(w)),
         |wc AS (SELECT w, cnt FROM rec WHERE pos > len(w)),
         |dw AS (SELECT doc_id, unnest(ps) AS w FROM lex),
         |c AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens
         |  FROM dw JOIN wc USING (w) GROUP BY doc_id),
         |stage AS (SELECT d.doc_id, d.source,
         |    COALESCE(lab.component, d.doc_id) AS grp,
         |    (lab.id IS NULL OR lab.id = lab.component) AS is_canonical
         |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.id),
         |asg AS (SELECT doc_id, source, is_canonical,
         |  CASE WHEN CAST('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 4)
         |      AS BIGINT) % 100 < 80 THEN 'train'
         |    WHEN CAST('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 4)
         |      AS BIGINT) % 100 < 90 THEN 'val'
         |    ELSE 'test' END AS split
         |  FROM stage),
         |kept AS (SELECT a.doc_id, a.source, a.split, c.n_tokens,
         |    a.doc_id % 32 AS bucket
         |  FROM asg a JOIN c USING (doc_id)
         |  WHERE a.is_canonical AND c.n_tokens >= 1),
         |cells AS (SELECT split, source, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |  FROM kept GROUP BY split, source),
         |b AS (SELECT split, source, bucket,
         |    CAST(SUM(n_tokens) AS BIGINT) AS bt
         |  FROM kept GROUP BY split, source, bucket),
         |seqs AS (SELECT split, source,
         |    CAST(SUM((bt + 63) // 64) AS BIGINT) AS n_sequences
         |  FROM b GROUP BY split, source),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM kept)
         |SELECT c2.split, c2.source, c2.n_docs, c2.n_tokens, s.n_sequences,
         |  round(CAST(c2.n_tokens AS DOUBLE) / tt, 6) AS token_share
         |FROM cells c2 JOIN seqs s USING (split, source), tot
         |ORDER BY c2.split, c2.source""".stripMargin,
    // the q73 closure composed with the q19 brute cosine ranking: the
    // anchor panel (vec_id % 50 = 0), same-component + self exclusion,
    // per-anchor top-5 by rounded cosine with id tie-breaks
    "q114_hard_negatives" ->
      s"""WITH RECURSIVE $dedupUnionCtes,
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
         |  FROM embeddings),
         |grouped AS (SELECT e.vec_id, e.emb, e.label,
         |    COALESCE(lab.component, e.vec_id) AS grp
         |  FROM e LEFT JOIN lab ON e.vec_id = lab.id),
         |q AS (SELECT vec_id AS query_id, emb AS qemb, grp AS qgrp
         |  FROM grouped WHERE vec_id % 50 = 0),
         |pairs AS (SELECT query_id, vec_id AS neighbor_id,
         |    round(list_dot_product(qemb, emb) /
         |      (sqrt(list_dot_product(qemb, qemb)) *
         |       sqrt(list_dot_product(emb, emb))), 6) AS sim_r,
         |    label AS neighbor_label
         |  FROM q, grouped WHERE vec_id <> query_id AND grp <> qgrp),
         |ranked AS (SELECT query_id, neighbor_id, sim_r, neighbor_label,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY sim_r DESC, neighbor_id) AS rank FROM pairs)
         |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
         |  sim_r, neighbor_label
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // q114's chain + the best same-component partner + ordered string_agg
    "q118_contrastive_triples" ->
      s"""WITH RECURSIVE $dedupUnionCtes,
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings),
         |grouped AS (SELECT e.vec_id, e.emb,
         |    COALESCE(lab.component, e.vec_id) AS grp
         |  FROM e LEFT JOIN lab ON e.vec_id = lab.id),
         |q AS (SELECT vec_id AS query_id, emb AS qemb, grp AS qgrp
         |  FROM grouped WHERE vec_id % 50 = 0),
         |ptri AS (SELECT query_id, vec_id AS positive_id,
         |    round(list_dot_product(qemb, emb) /
         |      (sqrt(list_dot_product(qemb, qemb)) *
         |       sqrt(list_dot_product(emb, emb))), 6) AS pos_sim_r
         |  FROM q, grouped WHERE grp = qgrp AND vec_id <> query_id),
         |p1 AS (SELECT query_id, positive_id, pos_sim_r FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY pos_sim_r DESC, positive_id) AS prn FROM ptri)
         |  WHERE prn = 1),
         |pairs AS (SELECT query_id, vec_id AS neighbor_id,
         |    round(list_dot_product(qemb, emb) /
         |      (sqrt(list_dot_product(qemb, qemb)) *
         |       sqrt(list_dot_product(emb, emb))), 6) AS sim_r
         |  FROM q, grouped WHERE vec_id <> query_id AND grp <> qgrp),
         |ranked AS (SELECT query_id, neighbor_id,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY sim_r DESC, neighbor_id) AS rank FROM pairs),
         |negagg AS (SELECT query_id,
         |    string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rank)
         |      AS negatives,
         |    CAST(COUNT(*) AS BIGINT) AS n_negatives
         |  FROM ranked WHERE rank <= 5 GROUP BY query_id)
         |SELECT p1.query_id, positive_id, pos_sim_r, negatives, n_negatives
         |FROM p1 JOIN negagg USING (query_id)
         |ORDER BY query_id""".stripMargin,
    // the q73 closure crossed with the q217 NAIVE doc-hash split
    // (splitmix64 replayed via HUGEINT limbs): groups whose members
    // straddle splits are the near-dup leakage the group-aware split
    // exists to prevent
    "q229_naive_split_leakage" -> {
      def mm(x: String, c: BigInt): String = {
        val base = BigInt(4294967296L)
        val lo = c % base
        val hi = c / base
        s"((($x % 4294967296) * $lo + " +
          s"((($x % 4294967296) * $hi + ($x // 4294967296) * $lo) " +
          s"% 4294967296) * 4294967296) % 18446744073709551616)"
      }
      val z1 = "(z + 11400714819323198485) % 18446744073709551616"
      val m2 = mm("x1", BigInt("13787848793156543929"))
      val m3 = mm("x2", BigInt("10723151780598845931"))
      s"""WITH RECURSIVE $dedupUnionCtes,
         |grouped AS (SELECT d.doc_id,
         |    COALESCE(lab.component, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.id),
         |z0 AS (SELECT doc_id, grp, CAST(doc_id AS HUGEINT) AS z
         |  FROM grouped),
         |t1 AS (SELECT doc_id, grp, $z1 AS z1 FROM z0),
         |t2 AS (SELECT doc_id, grp, xor(z1, z1 // 1073741824) AS x1
         |  FROM t1),
         |t3 AS (SELECT doc_id, grp, $m2 AS z2 FROM t2),
         |t4 AS (SELECT doc_id, grp, xor(z2, z2 // 134217728) AS x2
         |  FROM t3),
         |t5 AS (SELECT doc_id, grp, $m3 AS z3 FROM t4),
         |t6 AS (SELECT doc_id, grp, xor(z3, z3 // 2147483648) AS m
         |  FROM t5),
         |asg AS (SELECT doc_id, grp,
         |    CASE WHEN ((((CASE WHEN m >= 9223372036854775808
         |        THEN m - 18446744073709551616 ELSE m END) % 100) + 100)
         |        % 100) < 80 THEN 'train'
         |      WHEN ((((CASE WHEN m >= 9223372036854775808
         |        THEN m - 18446744073709551616 ELSE m END) % 100) + 100)
         |        % 100) < 90 THEN 'val' ELSE 'test' END AS nsplit
         |  FROM t6),
         |pg AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS sz,
         |    CAST(COUNT(DISTINCT nsplit) AS BIGINT) AS ns
         |  FROM asg GROUP BY grp),
         |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         |    CAST(SUM(sz) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_leaky_groups,
         |    CAST(SUM(CASE WHEN ns >= 2 THEN sz ELSE 0 END) AS BIGINT)
         |      AS docs_in_leaky,
         |    CAST(MAX(ns) AS BIGINT) AS max_span FROM pg)
         |SELECT n_groups, n_docs, n_leaky_groups, docs_in_leaky, max_span,
         |  (1000 * docs_in_leaky) // n_docs AS leaked_permille,
         |  n_leaky_groups = 0 AS leak_free_naive
         |FROM ag""".stripMargin
    },
    // the q73 closure, then group sizes (component coalesced to the doc
    // id for untouched singletons) and the size histogram
    "q109_component_sizes" ->
      s"""WITH RECURSIVE $dedupUnionCtes,
         |grouped AS (SELECT d.doc_id,
         |    COALESCE(lab.component, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.id),
         |sizes AS (SELECT grp, COUNT(*) AS sz FROM grouped GROUP BY grp)
         |SELECT sz AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
         |  CAST(SUM(sz) AS BIGINT) AS n_docs
         |FROM sizes GROUP BY sz ORDER BY group_size""".stripMargin,
    // the q73 closure, then the (split × source) stage matrix: kept =
    // never flagged OR component canonical; groups counted per cell
    "q101_curation_report" ->
      s"""WITH RECURSIVE $dedupUnionCtes,
         |stage AS (SELECT d.doc_id, d.source,
         |    COALESCE(lab.component, d.doc_id) AS grp,
         |    (lab.id IS NULL OR lab.id = lab.component) AS is_canonical
         |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.id),
         |asg AS (SELECT doc_id, source, grp, is_canonical,
         |  CASE WHEN CAST('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 4)
         |      AS BIGINT) % 100 < 80 THEN 'train'
         |    WHEN CAST('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 4)
         |      AS BIGINT) % 100 < 90 THEN 'val'
         |    ELSE 'test' END AS split
         |  FROM stage)
         |SELECT split, source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups
         |FROM asg GROUP BY split, source ORDER BY split, source""".stripMargin)

  /** Generated twin of q108: exact top-20 candidates, then the R greedy
    * MMR rounds unrolled as MATERIALIZED stages — per stage the argmax
    * (same 0.7·rel − 0.3·maxsim expression, ties on cid) and the
    * running-maxsim update via greatest(); cosine mirrored op-for-op
    * (dot / (√aa·√bb), left-to-right folds), literals CAST to DOUBLE so
    * DuckDB's decimal parse can't perturb the score doubles. */
  private lazy val mmrOracle: String = {
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
    val score = "CAST(0.7 AS DOUBLE) * rel - CAST(0.3 AS DOUBLE) * maxsim"
    val rounds = (1 to 5).map { r =>
      s"""sel$r AS MATERIALIZED (SELECT query_id, cid AS sel_cid, score FROM (
         |  SELECT query_id, cid, $score AS score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY $score DESC, cid) AS rk
         |  FROM st${r - 1}) WHERE rk = 1),
         |st$r AS MATERIALIZED (SELECT s.query_id, s.cid, s.rel,
         |    greatest(s.maxsim, ${cos("a.emb", "b.emb")}) AS maxsim
         |  FROM st${r - 1} s
         |  JOIN sel$r x ON s.query_id = x.query_id AND s.cid <> x.sel_cid
         |  JOIN e a ON a.vec_id = x.sel_cid
         |  JOIN e b ON b.vec_id = s.cid)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5).map(r =>
      s"SELECT query_id, $r AS rank, sel_cid AS neighbor_id, " +
        s"round(score, 6) AS score_r FROM sel$r")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |q AS MATERIALIZED (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 50),
       |rel AS MATERIALIZED (SELECT query_id, vec_id AS cid,
       |    ${cos("qemb", "emb")} AS rel
       |  FROM q, e WHERE vec_id <> query_id),
       |cand AS MATERIALIZED (SELECT query_id, cid, rel FROM (
       |  SELECT query_id, cid, rel, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, cid) AS rk FROM rel) WHERE rk <= 20),
       |st0 AS MATERIALIZED (SELECT query_id, cid, rel, CAST(0.0 AS DOUBLE) AS maxsim FROM cand),
       |$rounds
       |SELECT query_id, rank, neighbor_id, score_r FROM (
       |$out)
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q73's full closure chain (three signal families → union → recursive
    * transitive closure → `lab(id, component)`), shared by the q73 gate
    * and q73b's survivorship rollup. */
  /** The three near-dup signal pair sets + their union, WITHOUT the
    * closure — shared by q73's fixpoint twins and q274's
    * capture-recapture audit. */
  private lazy val unionPairsCtes: String = {
    val minhashSig = graft.text.TextOps.MinhashSeeds.zipWithIndex
      .map { case (seed, i) => s" min(md5('$seed' || term)) AS h${i + 1}" }
      .mkString(",\n")
    val minhashBands = (1 to 4)
      .map(i => s"SELECT doc_id, $i AS band, h$i AS h FROM msig")
      .mkString(" UNION ALL ")
    s"""${ngramCtes("j")},
       |jpairs AS (SELECT doc_a, doc_b
       |  FROM jinter JOIN jsizes x ON jinter.doc_a = x.doc_id
       |              JOIN jsizes y ON jinter.doc_b = y.doc_id
       |  WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) >= 0.5),
       |${simhashCtes("s")},
       |msig AS (SELECT doc_id,
       |$minhashSig
       | FROM stoks GROUP BY doc_id),
       |mbands AS ($minhashBands),
       |mok AS (SELECT band, h FROM mbands GROUP BY band, h
       |  HAVING COUNT(*) BETWEEN 2 AND 20),
       |mpairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM mbands a JOIN mbands b ON a.band = b.band AND a.h = b.h
       |    AND a.doc_id < b.doc_id
       |  JOIN mok ON a.band = mok.band AND a.h = mok.h),
       |upairs AS (SELECT doc_a, doc_b FROM jpairs
       |  UNION SELECT doc_a, doc_b FROM spairs WHERE hamming <= 12
       |  UNION SELECT doc_a, doc_b FROM mpairs)""".stripMargin
  }

  private lazy val dedupUnionCtes: String =
    s"""$unionPairsCtes,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM upairs
       |  UNION SELECT doc_b, doc_a FROM upairs),
       |reach AS (SELECT src, dst FROM edges
       |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lab AS (SELECT src AS id, LEAST(src, MIN(dst)) AS component
       |  FROM reach GROUP BY src)""".stripMargin

  /** Shared CTE chain producing the near-dup candidate `inter` counts +
    * `sizes` (the q33 kernel) — composed into q33's scoring and q55's /
    * q73's closures. `p` prefixes every CTE name so multiple signal
    * chains can coexist in one WITH block without name collisions. */
  private def ngramCtes(p: String): String =
    s"""${p}toks AS (SELECT doc_id, $DToks AS t FROM documents),
       |${p}sh AS (SELECT DISTINCT doc_id,
       |  unnest(list_transform(range(1, len(t) - 1),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
       |  FROM ${p}toks WHERE len(t) >= 3),
       |${p}sizes AS (SELECT doc_id, COUNT(*) AS n FROM ${p}sh GROUP BY doc_id),
       |${p}rare AS (SELECT shingle FROM (SELECT shingle, COUNT(*) AS df FROM ${p}sh
       |  GROUP BY 1) WHERE df <= 20),
       |${p}shj AS (SELECT doc_id, ${p}sh.shingle FROM ${p}sh JOIN ${p}rare ON ${p}sh.shingle = ${p}rare.shingle),
       |${p}inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM ${p}shj a JOIN ${p}shj b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  private lazy val NgramCtes: String = ngramCtes("")
}
