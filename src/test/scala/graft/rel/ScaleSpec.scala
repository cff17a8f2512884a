package graft.rel

import graft.Tables
import graft.text.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique specs (SCALING.md): these don't test a query's answer —
  * they pin the *physical plan properties* that matter at 100 TB, so a
  * regression that silently reintroduces a shuffle or breaks the salting
  * algebra fails CI. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables co-locate the join: no Exchange in the joined plan") {
    val wh = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    Tables.orders(spark, dir)
      .write.mode("overwrite").option("path", s"$wh/b_orders")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, dir)
      .write.mode("overwrite").option("path", s"$wh/b_lineitem")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    try {
      // disable auto-broadcast so the join would otherwise shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q124's bucketed join subtree plans no Exchange and no extra Sort") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val inner = Relational.bucketedJoinInner(spark, dir)
      val plan = inner.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ; plan:\n$plan")
      assert(!plan.contains("Exchange"),
        s"q124's join must read co-located buckets; plan:\n$plan")
      assert(inner.count() > 0)
      // Spark 3 stopped propagating the written per-bucket sort order by
      // default; the documented knob restores it and, with one file per
      // bucket (the repartition-before-write in writeBucketed), the merge
      // join then drops its runtime Sorts too
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val sorted = spark.table("graft_orders_bkt")
          .join(spark.table("graft_lineitem_bkt"),
            col("o_orderkey") === col("l_orderkey"))
        val p2 = sorted.queryExecution.executedPlan.toString
        assert(!p2.contains("Exchange") && !p2.contains("Sort "),
          s"sorted-bucket scan must need neither exchange nor sort; plan:\n$p2")
      } finally spark.conf
        .set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_bkt")
    }
  }

  test("salted two-stage aggregation equals direct aggregation (skew recipe)") {
    val salts = 8
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("k"), col("l_quantity").as("v"))
    val direct = base.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    // stage 1: spread each hot key over `salts` sub-keys; stage 2: merge.
    // sum/count are algebraic — partials compose exactly.
    val salted = base
      .withColumn("salt", pmod(xxhash64(rand(7) * 1e6), lit(salts)))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pn"))
      .groupBy(col("k"))
      .agg(sum(col("ps")).as("s"), sum(col("pn")).as("n"))
    val d = direct.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val s = salted.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(d.keySet == s.keySet)
    d.foreach { case (k, (sv, n)) =>
      assert(math.abs(sv - s(k)._1) < 1e-6 && n == s(k)._2, s"key $k differs")
    }
  }

  test("partial aggregation present: groupBy plans a map-side HashAggregate") {
    val plan = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
      .queryExecution.executedPlan.toString
    // partial + final pair = two HashAggregate nodes around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("filters reach the parquet scan (PushedFilters non-empty)") {
    val plan = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(l_quantity"),
      s"quantity filter must reach the scan; plan:\n$plan")
    // column pruning: the scan's ReadSchema carries only the 2 used columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan must prune to the projected columns; plan:\n$plan")
  }

  test("per-domain cap plans a bounded WindowGroupLimit, and nothing joins") {
    val plan = graft.text.CorpusFilters.q67_source_cap(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=N filter must become a bounded per-partition heap; plan:\n$plan")
    assert(!plan.contains("Join"), s"no join belongs in this plan:\n$plan")
  }

  test("temperature mix plans a bounded WindowGroupLimit and broadcasts quotas") {
    val plan = graft.text.CorpusFilters.q107_temperature_mix(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"the literal max-quota bound must become a bounded heap; plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the source-cardinality quota dim must broadcast; plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in this plan should sort-merge; plan:\n$plan")
  }

  test("bloom decontamination scores the corpus without any join") {
    val plan = graft.ml.Bloom.m_bloom_decontaminate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the probe must be a scalar against a plan constant, not a join:\n$plan")
  }

  test("span dedup is one aggregation shape: no joins, no window") {
    val plan = graft.text.CorpusFilters.q66_span_dedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("WindowExec"),
      s"first-occurrence argmin must live inside the digest agg:\n$plan")
  }

  test("curation funnel stays at its declared specialized gram passes") {
    // the public query pins its 8-row result (plan = LogicalRDD scan), so
    // assert pass shape on the lazy inner plan over the shared token frame
    val df = graft.text.CorpusFilters.q70FunnelOver(spark,
      graft.text.CorpusFilters.q70TokenFrame(spark, dir).localCheckpoint())
    df.collect() // finalize AQE so the executed plan is the real one
    // AQE's toString appends the pre-adaptive plan under "== Initial
    // Plan ==" — count nodes in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // tagged corpus explode + unigram LM explode + bench 5-gram explode +
    // span posexplode; the near-dup pass's explodes run inside the
    // component fixpoint (checkpointed — a LogicalRDD leaf here). A
    // regression back to per-signal composition multiplies these
    val explodes = "Generate (pos)?explode".r.findAllIn(plan).size
    assert(explodes <= 4,
      s"funnel must not re-explode the corpus per signal ($explodes explodes):\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"funnel joins are broadcast or co-partitioned, never corpus sort-merge:\n$plan")
  }

  test("quantized ANN broadcasts the query side, never sort-merges") {
    val plan = graft.ml.Quantize.m_ann_quantized(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"tiny query set must broadcast against the streaming corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing here may shuffle-sort the corpus for a join:\n$plan")
  }

  test("semdedup keep-list: labels closed, minima canonical, ids real") {
    // NOTE: q92's returned plan is a LogicalRDD (components pins its
    // labels), so join-shape assertions can't run here — the bucketed
    // candidate generation (equi-joins on band+key / list_id, no
    // crossJoin call anywhere on the path) is documented in the query
    // scaladoc and exercised by the oracle gate; this spec pins the
    // STRUCTURAL keep-list invariants instead.
    val df = graft.ml.Similarity.q92_semdedup(spark, dir)
    df.collect()
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    assert(df.columns.toSeq == Seq("vec_id", "component", "is_canonical"))
    // every vec in the output must exist in the embedding table, and
    // components must be closed under their own labels (label is a member)
    val labels = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ids = e.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    labels.foreach { case (v, c) =>
      assert(ids.contains(v), s"unknown vec $v in keep-list")
      assert(labels.getOrElse(c, -1L) == c || labels.contains(c),
        s"component label $c of $v is not itself labeled")
      assert(c <= v || labels(c) == c, s"label $c not the component minimum")
    }
    val canonicals = df.filter(col("is_canonical")).collect()
      .map(_.getLong(0)).toSet
    assert(labels.values.toSet == canonicals,
      "every component's minimum must be its canonical survivor")
  }
}
