package graft.ml

import graft.Tables
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}

/** Integer-exact seeded k-means over the embedding table (q178-q180) —
  * the cluster-then-curate primitive behind cluster-balanced data
  * selection (SemDeDup's cluster stage, Abbas et al. 2023; DataComp-style
  * topic balancing): Lloyd's algorithm (Lloyd 1982) with every quantity
  * an exact BIGINT, so assignments, centroids, inertia and the balanced
  * sample all rows+schema+hash-gate against an unrolled DuckDB twin.
  *
  * Exactness protocol: embeddings integerize ONCE to micro-units
  * (round(10⁶·x) — one IEEE multiply on identical input doubles, then
  * half-away-from-zero rounding, bit-identical cross-engine, no libm).
  * Distances are Σ(xu−c)² BIGINTs (|xu| ≤ ~10⁶, 64 dims → ≤ ~10¹⁵, far
  * inside Long). Argmin packs d·K+cid so the min is ONE map-side-combined
  * aggregate with the deterministic low-cid tiebreak. Centroid updates
  * are per-dim BIGINT sums (summation-order-proof) followed by
  * round-half-up-to-+∞ integer division ((2s+n) floorDiv 2n, the pmod
  * floor construction both engines evaluate identically) — so the next
  * round's inputs are again exact integers. Fixed R synchronous rounds
  * from seeded centroids (the first K vec_ids), like the q166 LPA
  * unrolled-round contract.
  *
  * Scale: each round is one broadcast of K·d longs against the corpus
  * scan (no shuffle for assignment), one (cid, dim) rollup (K·d output
  * rows), and a K-row centroid rebuild — Lloyd's is embarrassingly
  * map-side at any corpus size. The per-vector distance kernel is a
  * native codegen expression ([[L2SqDistL]], the DotProductD/I8Dot
  * pattern) — a primitive loop inside WholeStageCodegen, not an
  * interpreted HOF. At 100 TB the micro-unit frame would be pinned once
  * (the q73 shared-stage pattern) instead of re-derived per round.
  */
object ClusterUtil {
  /** Σ (a_i − b_i)² over two long arrays (truncated to the shorter). */
  def sqdistL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Σ |a_i − b_i| over two long arrays (truncated to the shorter). */
  def l1distL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.abs(a.getLong(i) - b.getLong(i))
      i += 1
    }
    s
  }
}

case class L1DistL(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "l1_dist_l"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ClusterUtil.l1distL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ml.ClusterUtil.l1distL($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1DistL =
    copy(left = newLeft, right = newRight)
}

case class L2SqDistL(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "l2_sqdist_l"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ClusterUtil.sqdistL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ml.ClusterUtil.sqdistL($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqDistL =
    copy(left = newLeft, right = newRight)
}

object Cluster {
  private val K = 4
  private val Dims = 64
  private val Rounds = 3
  private val SampleCap = 32

  def l2_sqdist_l(a: Column, b: Column): Column =
    GraftSqlBridge.column(L2SqDistL(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** (vec_id, xu): embeddings in exact micro-units. */
  private[ml] def microEmb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * lit(1000000.0), 0).cast(LongType)).as("xu"))

  /** Shared round-half-up-to-+∞ integer division text (b > 0), evaluated
    * identically by Spark (`div`) and DuckDB (`//`) because the pmod
    * construction reduces the dividend to an exact multiple first. */
  private def fdivHalfUp(a: String, b: String): String =
    s"(($a) - ((($a) % ($b)) + ($b)) % ($b)) div ($b)"

  /** One assignment pass: per vec, packed argmin d·K+cid vs `cent`
    * (cid, c, n). Returns (vec_id, xu, packed). */
  private def assign(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent.select(col("cid"), col("c"))))
      .select(col("vec_id"), col("xu"),
        (l2_sqdist_l(col("xu"), col("c")) * lit(K.toLong) + col("cid"))
          .as("pk"))
      .groupBy(col("vec_id"), col("xu"))
      .agg(min(col("pk")).as("packed"))

  private val fitMemo =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Embedding-table file fingerprint (length+mtime digest, the
    * Similarity.corpusFingerprint shape) — keys the trainer memo so a
    * changed input re-trains. */
  private def embFingerprint(s: SparkSession, dir: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
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

  /** The fitted model (cid, c, n), trained ONCE per (application,
    * corpus) through the trainer-memo pattern (the r15-verdict-item-5
    * shape, like Pca.fittedDirection): the fit is deterministic
    * (seeded init, fixed synchronous rounds, exact integer updates),
    * so the memoized K·(d+1) longs are bit-identical to a fresh fit
    * and every oracle contract is unchanged — consumers (q178-q180,
    * q254, q256, q261) broadcast the model instead of re-running
    * Lloyd's corpus passes per consumer. */
  private[graft] def kmeans(s: SparkSession, dir: String): DataFrame = {
    val model = fitMemo.computeIfAbsent(
      s"${s.sparkContext.applicationId}|kmeans|$dir|" +
        embFingerprint(s, dir),
      _ => fitKmeans(s, dir).select(col("cid"), col("c"), col("n"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSeq
    ).asInstanceOf[Seq[(Long, Seq[Long], Long)]]
    import s.implicits._
    model.toDF("cid", "c", "n")
  }

  /** R rounds of Lloyd's from the seeded init; returns the final
    * centroid frame (cid, c, n). */
  private def fitKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = microEmb(s, dir)
    var cent = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("xu").as("c"),
        lit(0L).as("n"))
    for (_ <- 1 to Rounds) {
      val su = assign(e, cent)
        .select(pmod(col("packed"), lit(K.toLong)).as("cid"),
          posexplode(col("xu")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col")).as("su"), count(lit(1)).as("n"))
        .selectExpr("cid", "pos", "n",
          s"${fdivHalfUp("2*su + n", "2*n")} AS cu")
      val upd = su.groupBy(col("cid"), col("n"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cu")))),
          p => p.getField("cu")).as("c"))
      cent = cent.alias("p")
        .join(upd.alias("u"), Seq("cid"), "left")
        .select(col("cid"),
          coalesce(col("u.c"), col("p.c")).as("c"),
          coalesce(col("u.n"), lit(0L)).as("n"))
    }
    cent
  }

  /** Final centroids, exploded to (cid, dim, c_u, n) — the consumable
    * model surface (K·d rows, catalog-sized at any corpus). */
  def q178_kmeans_centroids(s: SparkSession, dir: String): DataFrame =
    kmeans(s, dir)
      .select(col("cid"), col("n"), posexplode(col("c")))
      .select(col("cid"), (col("pos") + 1).cast(IntegerType).as("dim"),
        col("col").as("c_u"), col("n"))
      .orderBy(col("cid"), col("dim"))

  /** Per-cluster fit report from the post-fit assignment: member count
    * and exact BIGINT inertia (Σ squared micro-unit distance). */
  def q179_cluster_report(s: SparkSession, dir: String): DataFrame =
    assign(microEmb(s, dir), kmeans(s, dir))
      // packed div K, not `/`: Long `/` is DOUBLE division (2^53 cliff)
      .selectExpr(s"pmod(packed, $K) AS cid", s"packed div $K AS d")
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), sum(col("d")).as("inertia"))
      .orderBy(col("cid"))

  /** Cluster-balanced selection: ≤ [[SampleCap]] members per cluster in
    * md5 pseudo-random order — the topic-rebalancing pick (over-
    * represented clusters truncate, small ones keep everything). Bounded
    * heap per cluster via rank ≤ cap; output ≤ K·cap rows. */
  def q180_cluster_balanced_sample(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid"))
      .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
    assign(microEmb(s, dir), kmeans(s, dir))
      .select(pmod(col("packed"), lit(K.toLong)).as("cid"), col("vec_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SampleCap)
      .select(col("cid"), col("vec_id"))
      .orderBy(col("cid"), col("vec_id"))
  }

  // --------------------------------------------------- generated twins
  /** Unrolled round CTEs c0..c{R} (the q166 protocol): every round is
    * assignment (packed argmin) → per-dim sums → half-up floor division →
    * list rebuild, with LEFT JOIN + COALESCE carrying empty clusters. */
  private def kmeansCtes: String = {
    val dist = s"CAST(list_sum(list_transform(range(1, ${Dims + 1}), " +
      "i -> (xu[i]-c[i])*(xu[i]-c[i]))) AS BIGINT)"
    val fdiv = fdivHalfUp("2*su + n", "2*n").replace(" div ", " // ")
    val rounds = (1 to Rounds).map { r =>
      s"""a$r AS (SELECT vec_id, xu, MIN($dist * $K + cid) AS packed
         |  FROM e CROSS JOIN c${r - 1} GROUP BY vec_id, xu),
         |s$r AS (SELECT packed % $K AS cid, t.i AS i,
         |    CAST(SUM(xu[t.i]) AS BIGINT) AS su,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM a$r CROSS JOIN range(1, ${Dims + 1}) t(i) GROUP BY 1, 2),
         |u$r AS (SELECT cid, n, list($fdiv ORDER BY i) AS c
         |  FROM s$r GROUP BY cid, n),
         |c$r AS (SELECT p.cid, COALESCE(u.c, p.c) AS c,
         |    COALESCE(u.n, CAST(0 AS BIGINT)) AS n
         |  FROM c${r - 1} p LEFT JOIN u$r u USING (cid))""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(round(x * 1000000.0) AS BIGINT)) AS xu
       |  FROM embeddings),
       |c0 AS (SELECT CAST(vec_id AS BIGINT) AS cid, xu AS c,
       |    CAST(0 AS BIGINT) AS n
       |  FROM e WHERE vec_id < $K),
       |$rounds""".stripMargin
  }

  private def finalAssign: String =
    s"""fa AS (SELECT vec_id,
       |    MIN(CAST(list_sum(list_transform(range(1, ${Dims + 1}),
       |      i -> (xu[i]-c[i])*(xu[i]-c[i]))) AS BIGINT) * $K + cid) AS packed
       |  FROM e CROSS JOIN c$Rounds GROUP BY vec_id, xu)""".stripMargin

  // --------------------------------------------- q254 Davies-Bouldin
  /** q254: Davies-Bouldin cluster-validity index (Davies & Bouldin,
    * IEEE TPAMI 1979) over the q178 integer k-means fit — the
    * clustering EVAL the family lacked: q179 reports inertia (how
    * tight), DB reads tightness AGAINST separation — for each cluster,
    * R_i = max_{j≠i} (S_i + S_j)/M_ij, and the index is the mean R.
    * Computed at the paper's (p=1, q=1) Minkowski parameterization so
    * every quantity is EXACT: S_j is the L1 scatter sum a_j/n_j (kept
    * as a rational), M_ij the L1 centroid distance, and
    * R_micro = (10⁶·(a_i·n_j + a_j·n_i)) div (n_i·n_j·M_ij) — one
    * DECIMAL(38,0) expression (the cross-products are corpus²-shaped).
    * The per-cluster argmax runs on the quantized R (max(struct(R,−j)),
    * min-j ties) and DB_micro = Σ R_max div k — quantize-before-
    * aggregate, the house discipline.
    *
    * Scale shape: one assignment pass + a members×dims explode with
    * map-side combine into K rows; everything after is K²·d catalog
    * algebra. */
  def q254_davies_bouldin(s: SparkSession, dir: String): DataFrame = {
    val e = microEmb(s, dir)
    val cent = kmeans(s, dir)
    val centD = cent.select(col("cid"), posexplode(col("c")))
      .select(col("cid"), col("pos").as("i"), col("col").as("cu"))
    val mem = assign(e, cent)
      .select(pmod(col("packed"), lit(K.toLong)).as("cid"), col("xu"))
    val scat = mem.select(col("cid"), posexplode(col("xu")))
      .toDF("cid", "i", "xi")
      .join(broadcast(centD), Seq("cid", "i"))
      .groupBy(col("cid"))
      .agg(sum(abs(col("xi") - col("cu"))).as("a"),
        (count(lit(1)) / Dims).cast("long").as("nm"))
    val m = centD.alias("x")
      .join(centD.alias("y"), col("x.i") === col("y.i"))
      .filter(col("x.cid") =!= col("y.cid"))
      .groupBy(col("x.cid").as("ci"), col("y.cid").as("cj"))
      .agg(sum(abs(col("x.cu") - col("y.cu"))).as("mij"))
    val r = m
      .join(broadcast(scat.select(col("cid").as("ci"),
        col("a").as("ai"), col("nm").as("ni"))), Seq("ci"))
      .join(broadcast(scat.select(col("cid").as("cj"),
        col("a").as("aj"), col("nm").as("nj"))), Seq("cj"))
      .withColumn("r_micro", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * " +
          "(CAST(ai AS DECIMAL(38,0)) * nj + " +
          "CAST(aj AS DECIMAL(38,0)) * ni)) div " +
          "(CAST(ni AS DECIMAL(38,0)) * nj * greatest(mij, 1L)) " +
          "AS BIGINT)"))
    val per = r.groupBy(col("ci").as("cid"))
      .agg(max(struct(col("r_micro"), (-col("cj")).as("nc"))).as("sel"))
      .select(col("cid"), col("sel.r_micro").as("r_max_micro"),
        (-col("sel.nc")).as("nearest_cid"))
    val db = per.agg(
      expr("sum(r_max_micro) div count(1)").as("db_micro"))
    scat.join(per, Seq("cid"))
      .crossJoin(broadcast(db))
      .select(col("cid"), col("nm").as("n_members"),
        col("a").as("scatter_l1"), col("nearest_cid"),
        col("r_max_micro"), col("db_micro"))
      .orderBy(col("cid"))
  }

  private lazy val dbOracle: String =
    s"""WITH $kmeansCtes,
       |$finalAssign,
       |cd AS (SELECT cid, CAST(t.i AS BIGINT) AS i, c[t.i] AS cu
       |  FROM c$Rounds CROSS JOIN range(1, ${Dims + 1}) t(i)),
       |mem AS (SELECT fa.packed % $K AS cid, e.xu
       |  FROM fa JOIN e USING (vec_id)),
       |sc AS (SELECT m.cid,
       |    CAST(SUM(abs(m.xu[t.i] - cd.cu)) AS BIGINT) AS a,
       |    CAST(COUNT(*) // ${Dims} AS BIGINT) AS nm
       |  FROM mem m CROSS JOIN range(1, ${Dims + 1}) t(i)
       |  JOIN cd ON cd.cid = m.cid AND cd.i = t.i
       |  GROUP BY 1),
       |mm AS (SELECT x.cid AS ci, y.cid AS cj,
       |    CAST(SUM(abs(x.cu - y.cu)) AS BIGINT) AS mij
       |  FROM cd x JOIN cd y ON x.i = y.i AND x.cid <> y.cid
       |  GROUP BY 1, 2),
       |r AS (SELECT mm.ci, mm.cj,
       |    CAST((1000000 * (CAST(si.a AS HUGEINT) * sj.nm +
       |      CAST(sj.a AS HUGEINT) * si.nm)) //
       |      (CAST(si.nm AS HUGEINT) * sj.nm * GREATEST(mm.mij, 1))
       |      AS BIGINT) AS r_micro
       |  FROM mm JOIN sc si ON si.cid = mm.ci
       |  JOIN sc sj ON sj.cid = mm.cj),
       |per AS (SELECT ci AS cid,
       |    (MAX(struct_pack(r := r_micro, nc := -cj))).r AS r_max_micro,
       |    -(MAX(struct_pack(r := r_micro, nc := -cj))).nc AS nearest_cid
       |  FROM r GROUP BY 1),
       |db AS (SELECT CAST(SUM(r_max_micro) // COUNT(*) AS BIGINT)
       |    AS db_micro FROM per)
       |SELECT sc.cid, sc.nm AS n_members, sc.a AS scatter_l1,
       |  per.nearest_cid, per.r_max_micro, db.db_micro
       |FROM sc JOIN per USING (cid) CROSS JOIN db ORDER BY sc.cid"""
      .stripMargin

  // ------------------------------------------ q256 Calinski-Harabasz
  /** q256: the Calinski-Harabasz variance-ratio criterion (Calinski &
    * Harabasz, Comm. in Statistics 1974 — sklearn's default k-picker)
    * over the same q178 fit: CH = (SSB/(k−1)) / (SSW/(n−k)). Unlike
    * silhouette or L2-Davies-Bouldin it needs NO square roots —
    * between/within scatter are sums of SQUARED micro distances, so
    * the whole criterion is exact: SSW is the assignment's packed
    * inertia (q179's quantity), the grand mean quantizes through the
    * centroid-update's own half-up division, SSB = Σ n_j·‖c_j − ḡ‖²
    * is one K·d aggregate, and ch_micro = (10⁶·SSB·(n−k)) div
    * (SSW·(k−1)) lives in DECIMAL(38,0) with the BIGINT output
    * frontier asserted loudly. DB (q254) and CH read opposite
    * conventions — lower-better vs higher-better — which is why eval
    * suites ship both.
    *
    * Scale shape: one assignment pass + one vecs×dims map-side
    * aggregate for the grand mean; SSB is K·d algebra. */
  def q256_calinski_harabasz(s: SparkSession, dir: String): DataFrame = {
    val e = microEmb(s, dir)
    val cent = kmeans(s, dir)
    val asg = assign(e, cent)
    val ssw = asg.agg(
      sum(expr(s"CAST(packed div $K AS DECIMAL(38,0))")).as("ssw_dec"),
      count(lit(1)).as("nv"))
    val gmean = e.select(posexplode(col("xu")))
      .groupBy(col("pos").as("i"))
      .agg(sum(col("col")).as("su"), count(lit(1)).as("n"))
      .selectExpr("i", s"${fdivHalfUp("2*su + n", "2*n")} AS g")
    val nPer = asg.select(pmod(col("packed"), lit(K.toLong)).as("cid"))
      .groupBy(col("cid")).agg(count(lit(1)).as("nj"))
    val ssb = cent.select(col("cid"), posexplode(col("c")))
      .select(col("cid"), col("pos").as("i"), col("col").as("cu"))
      .join(broadcast(gmean), Seq("i"))
      .groupBy(col("cid"))
      .agg(sum(expr(
        "CAST(cu - g AS DECIMAL(38,0)) * (cu - g)")).as("d2"))
      .join(nPer, Seq("cid"))
      .agg(sum(expr("d2 * nj")).as("ssb_dec"),
        count(lit(1)).as("k_used"))
    ssw.crossJoin(broadcast(ssb))
      .filter(coalesce(assert_true(
        expr(s"ssw_dec <= CAST(${Long.MaxValue} AS DECIMAL(38,0)) " +
          s"and ssb_dec <= CAST(${Long.MaxValue} AS DECIMAL(38,0))"),
        lit("CH scatter sums leave BIGINT: report them in wider units " +
          "at this corpus scale")), lit(true)))
      .select(col("nv").as("n_vecs"), col("k_used"),
        expr("CAST(ssw_dec AS BIGINT)").as("ssw"),
        expr("CAST(ssb_dec AS BIGINT)").as("ssb"),
        expr(s"CAST((CAST(1000000 AS DECIMAL(38,0)) * ssb_dec * " +
          s"(nv - k_used)) div (greatest(ssw_dec, " +
          s"CAST(1 AS DECIMAL(38,0))) * (k_used - 1)) AS BIGINT)")
          .as("ch_micro"))
  }

  private lazy val chOracle: String =
    s"""WITH $kmeansCtes,
       |$finalAssign,
       |ssw AS (SELECT SUM(CAST(packed // $K AS HUGEINT)) AS ssw_h,
       |    CAST(COUNT(*) AS BIGINT) AS nv FROM fa),
       |gm AS (SELECT t.i AS i,
       |    ${fdivHalfUp("2*su + n", "2*n").replace(" div ", " // ")} AS g
       |  FROM (SELECT t.i, CAST(SUM(xu[t.i]) AS BIGINT) AS su,
       |      CAST(COUNT(*) AS BIGINT) AS n
       |    FROM e CROSS JOIN range(1, ${Dims + 1}) t(i) GROUP BY t.i)
       |    t),
       |np AS (SELECT packed % $K AS cid, CAST(COUNT(*) AS BIGINT) AS nj
       |  FROM fa GROUP BY 1),
       |sb AS (SELECT SUM(d2 * nj) AS ssb_h,
       |    CAST(COUNT(*) AS BIGINT) AS k_used
       |  FROM (SELECT cd.cid,
       |      SUM(CAST(cd.cu - gm.g AS HUGEINT) * (cd.cu - gm.g)) AS d2
       |    FROM (SELECT cid, CAST(t.i AS BIGINT) AS i, c[t.i] AS cu
       |      FROM c$Rounds CROSS JOIN range(1, ${Dims + 1}) t(i)) cd
       |    JOIN gm ON gm.i = cd.i GROUP BY cd.cid) d
       |  JOIN np USING (cid))
       |SELECT ssw.nv AS n_vecs, sb.k_used,
       |  CAST(ssw.ssw_h AS BIGINT) AS ssw,
       |  CAST(sb.ssb_h AS BIGINT) AS ssb,
       |  CAST((1000000 * sb.ssb_h * (ssw.nv - sb.k_used)) //
       |    (GREATEST(ssw.ssw_h, 1) * (sb.k_used - 1)) AS BIGINT)
       |    AS ch_micro
       |FROM ssw CROSS JOIN sb""".stripMargin

  // ------------------------------------------------ q261 silhouette
  /** q261: the simplified (centroid-based) silhouette coefficient
    * (Rousseeuw, J. Comput. Appl. Math. 1987; the "simplified
    * silhouette" medoid shortcut of Hruschka et al. 2004 that replaces
    * the O(n²) neighbor means with centroid distances — the ONLY
    * silhouette that exists at corpus scale) over the q178 fit,
    * completing the validity trio: q254's DB reads scatter/separation
    * per CLUSTER, q256's CH reads the global variance ratio, the
    * silhouette reads per-POINT placement quality and surfaces the
    * misplaced mass (s < 0 ⟺ another centroid is closer than your
    * own in the scoring metric).
    *
    * Exactness: assignment stays the fit's own packed-L2 argmin (the
    * q178 contract); the silhouette distances are L1 — the q254
    * parameterization choice, declared — so a and b are exact BIGINTs
    * (≤ d·2·10⁶), s_milli = (1000·(b−a)) div max(a,b,1) quantizes
    * per point BEFORE the means (the house rule), and both per-cluster
    * and overall means are exact integer divisions of milli sums.
    * Negative quotients agree because both engines truncate integer
    * division toward zero (the r16 measurement). Because the scoring
    * metric (L1) differs from the assignment metric (L2), s < 0 rows
    * are possible and meaningful — the metric-disagreement audit.
    *
    * Scale shape: one n·K broadcast join with the codegen [[L1DistL]]
    * kernel (no explode), one vec-keyed aggregate, K-row algebra
    * after. */
  def q261_silhouette(s: SparkSession, dir: String): DataFrame = {
    val e = microEmb(s, dir)
    val cent = kmeans(s, dir)
    val own = assign(e, cent)
      .select(col("vec_id"), pmod(col("packed"), lit(K.toLong)).as("own"))
    val d = e.crossJoin(broadcast(cent.select(col("cid"), col("c"))))
      .select(col("vec_id"), col("cid"),
        l1_dist_l(col("xu"), col("c")).as("dist"))
    val ab = d.join(own, Seq("vec_id"))
      .groupBy(col("vec_id"), col("own"))
      .agg(max(when(col("cid") === col("own"), col("dist"))).as("a"),
        min(when(col("cid") =!= col("own"), col("dist"))).as("b"))
      .withColumn("s_milli",
        expr("(1000 * (b - a)) div greatest(greatest(a, b), 1L)"))
    val per = ab.groupBy(col("own").as("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("s_milli")).as("s_sum"),
        sum(when(col("s_milli") < 0, 1L).otherwise(0L)).as("n_negative"))
    val tot = per.agg(
      expr("sum(s_sum) div sum(n_members)").as("overall_milli"))
    per.crossJoin(broadcast(tot))
      .select(col("cid"), col("n_members"), col("n_negative"),
        expr("s_sum div n_members").as("sil_milli"),
        col("overall_milli"))
      .orderBy(col("cid"))
  }

  private lazy val silOracle: String = {
    val l1 = s"CAST(list_sum(list_transform(range(1, ${Dims + 1}), " +
      "i -> abs(xu[i]-c[i]))) AS BIGINT)"
    s"""WITH $kmeansCtes,
       |$finalAssign,
       |own AS (SELECT vec_id, packed % $K AS own FROM fa),
       |d AS (SELECT e.vec_id, cr.cid, $l1 AS dist
       |  FROM e CROSS JOIN c$Rounds cr),
       |ab AS (SELECT d.vec_id, o.own,
       |    MAX(CASE WHEN d.cid = o.own THEN d.dist END) AS a,
       |    MIN(CASE WHEN d.cid <> o.own THEN d.dist END) AS b
       |  FROM d JOIN own o USING (vec_id) GROUP BY 1, 2),
       |sm AS (SELECT own,
       |    (1000 * (b - a)) // GREATEST(GREATEST(a, b), 1) AS s_milli
       |  FROM ab),
       |per AS (SELECT own AS cid, CAST(COUNT(*) AS BIGINT) AS n_members,
       |    CAST(SUM(s_milli) AS BIGINT) AS s_sum,
       |    CAST(SUM(CASE WHEN s_milli < 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_negative
       |  FROM sm GROUP BY 1),
       |tot AS (SELECT CAST(SUM(s_sum) // SUM(n_members) AS BIGINT)
       |    AS overall_milli FROM per)
       |SELECT per.cid, per.n_members, per.n_negative,
       |  per.s_sum // per.n_members AS sil_milli, tot.overall_milli
       |FROM per CROSS JOIN tot ORDER BY per.cid""".stripMargin
  }

  def l1_dist_l(a: Column, b: Column): Column =
    GraftSqlBridge.column(L1DistL(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q178_kmeans_centroids" -> (q178_kmeans_centroids _),
    "q179_cluster_report" -> (q179_cluster_report _),
    "q180_cluster_balanced_sample" -> (q180_cluster_balanced_sample _),
    "q254_davies_bouldin" -> (q254_davies_bouldin _),
    "q256_calinski_harabasz" -> (q256_calinski_harabasz _),
    "q261_silhouette" -> (q261_silhouette _))

  val oracle: Map[String, String] = Map(
    "q178_kmeans_centroids" ->
      s"""WITH $kmeansCtes
         |SELECT cid, CAST(t.i AS INTEGER) AS dim, c[t.i] AS c_u, n
         |FROM c$Rounds CROSS JOIN range(1, ${Dims + 1}) t(i)
         |ORDER BY cid, dim""".stripMargin,
    "q179_cluster_report" ->
      s"""WITH $kmeansCtes,
         |$finalAssign
         |SELECT packed % $K AS cid, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(SUM(packed // $K) AS BIGINT) AS inertia
         |FROM fa GROUP BY 1 ORDER BY cid""".stripMargin,
    "q180_cluster_balanced_sample" ->
      s"""WITH $kmeansCtes,
         |$finalAssign,
         |rk AS (SELECT packed % $K AS cid, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY packed % $K
         |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
         |  FROM fa)
         |SELECT cid, vec_id FROM rk WHERE rk <= $SampleCap
         |ORDER BY cid, vec_id""".stripMargin,
    "q254_davies_bouldin" -> dbOracle,
    "q256_calinski_harabasz" -> chOracle,
    "q261_silhouette" -> silOracle)
}
