package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AggPack, JoinsPack}

class AggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("driver contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every oracle key has a matching query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query has an oracle unless it is on the documented no-oracle list") {
    // the driver's correctness gate only checks queries WITH oracle SQL; a
    // query that silently loses its oracle would look green while being
    // unverified. Pin the exact allowed set (each member is probabilistic/
    // engine-specific, spec-bounded elsewhere — SURVEY §8 — and since
    // round 9 ALSO golden-pinned in GoldenDriftSpec: 12 of 12, zero
    // unpinned).
    val allowedNoOracle = Set(
      "q34_approx_distinct",    // HLL sketch (AggSpec bound vs exact)
      "q63_langid_rollup",      // heuristic (TextSpec crafted fixtures)
      "q67_dedup_minhash_lsh",  // recall vs q66 (DedupSpec)
      "q68_dedup_simhash",      // DedupSpec
      "q71_ann_lsh_topk",       // recall vs q70 (SimilaritySpec)
      "q72_ann_ivf_topk",       // recall vs q70 (SimilaritySpec)
      "q73_dedup_embedding_lsh",// recall vs brute force (DedupSpec)
      "q89_approx_percentiles", // sketch (AggSpec bound vs exact q85)
      "q106_ann_ivf_trained_topk", // recall vs q70 (SimilaritySpec)
      "q112_hll_sketch_union",  // DataSketches HLL binary (AggSpec bound vs exact)
      "q116_semantic_dedup",    // k-means blocking (DedupSpec precision/recall)
      "q124_dedup_keeplist_lsh")// LSH pair graph (DedupSpec bound vs exact q115)
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == allowedNoOracle,
      s"unexpected oracle coverage drift: missing=${missing -- allowedNoOracle}, " +
        s"newly-covered=${allowedNoOracle -- missing}")
  }

  test("approx_count_distinct within 5% of exact per group") {
    val exact = AggPack.countDistincts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = AggPack.approxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$k: exact=$ex approx=$ap")
    }
  }

  test("q112: HLL sketch estimates within 5% of exact; union row covers every source") {
    val rows = AggPack.hllSketchCardinality(spark, dir).collect()
    val (all, perSrc) = rows.partition(_.getString(0) == "__all__")
    assert(all.length == 1 && perSrc.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getLong(2).toDouble
      assert(math.abs(est - exact) / exact <= 0.05,
        s"${r.getString(0)}: exact=$exact est=$est")
    }
    // the merged-sketch estimate is monotone over its inputs: it can never
    // fall below the largest single per-source estimate it unioned
    assert(all.head.getLong(2) >= perSrc.map(_.getLong(2)).max)
  }

  test("approx_percentile within 1% relative rank error of exact") {
    // accuracy=10000 guarantees rank error <= n/10000; on value scales this
    // means each approx quantile must sit between the exact quantiles one
    // percentile-point either side (columns are identically ordered)
    val exact = AggPack.percentiles(spark, dir).collect().head
    val approx = AggPack.approxPercentiles(spark, dir).collect().head
    assert(exact.schema.fieldNames.sameElements(approx.schema.fieldNames))
    // qty percentiles: integer-valued 1..50 — 1% rank error can move the
    // value by at most one integer step here
    (0 until 4).foreach { i =>
      assert(math.abs(approx.getDouble(i) - exact.getDouble(i)) <= 1.0,
        s"${exact.schema.fieldNames(i)}: exact=${exact.getDouble(i)} approx=${approx.getDouble(i)}")
    }
    // price cents: wide range — bound relatively
    (4 until 6).foreach { i =>
      val ex = exact.getDouble(i)
      val ap = approx.getLong(i).toDouble
      assert(math.abs(ap - ex) / ex < 0.02,
        s"${exact.schema.fieldNames(i)}: exact=$ex approx=$ap")
    }
  }

  test("histogram percentiles are bit-identical to the buffered percentile()") {
    // q105's rewrite claim: two-phase histogram + Spark's own interpolation
    // formula == the TypedImperativeAggregate that buffers every value
    val buffered = AggPack.percentiles(spark, dir).collect().head
    val hist = AggPack.percentilesViaHistogram(spark, dir).collect().head
    assert(buffered.schema.fieldNames.sameElements(hist.schema.fieldNames))
    (0 until 6).foreach { i =>
      assert(buffered.getDouble(i) == hist.getDouble(i),
        s"${buffered.schema.fieldNames(i)}: buffered=${buffered.getDouble(i)} " +
          s"hist=${hist.getDouble(i)} must match to the last bit")
    }
  }

  test("histogram percentiles match buffered percentile() on degenerate inputs") {
    // lineitem never exercises the edges: a single row (every pos = 0),
    // all-equal values (the hi == lo single-bucket branch), negatives
    // (bucket math below zero), and a two-row split (interpolation across
    // the only boundary). Craft each as a lineitem-shaped parquet dir and
    // require bit-equality between the two formulations.
    import spark.implicits._
    val cases = Seq(
      "single row" -> Seq((7.0, 13.50)),
      "all equal" -> Seq.fill(5)((3.0, 99.99)),
      "two rows" -> Seq((1.0, 10.0), (2.0, 20.0)),
      "negatives" -> Seq((-5.0, -1.25), (-1.0, -0.75), (4.0, 2.0)))
    cases.foreach { case (label, rows) =>
      val dir = java.nio.file.Files.createTempDirectory("pct_edge").toString
      rows.toDF("l_quantity", "l_extendedprice").write.parquet(s"$dir/lineitem.parquet")
      val buffered = AggPack.percentiles(spark, dir).collect().head
      val hist = AggPack.percentilesViaHistogram(spark, dir).collect().head
      (0 until 6).foreach { i =>
        assert(buffered.getDouble(i) == hist.getDouble(i),
          s"[$label] ${buffered.schema.fieldNames(i)}: " +
            s"buffered=${buffered.getDouble(i)} hist=${hist.getDouble(i)}")
      }
    }
  }

  test("registered exact percentile plan: no Percentile buffer, every window partitioned") {
    // the q85/q105 scale contract: no TypedImperativeAggregate buffering a
    // whole column, and no partitionless window funneling the histogram
    // through one single-partition sort (AQE pinned off so the physical
    // tree is inspectable — the DedupSpec plan-assert pattern)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q85 = SparkEntry.queries("q85_percentiles")(spark, dir)
      val plan = q85.queryExecution.executedPlan
      assert(!plan.toString.toLowerCase.contains("percentile("),
        "q85 must not plan the buffered Percentile aggregate")
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, "expected the bucket-local cumsum window")
      windows.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"partitionless window (single-partition exchange) in:\n$plan")
      }
      // global scalar aggs (bounds/count) still finish on one partition —
      // those move O(nPartitions) rows and are fine; the histogram-sized
      // single-partition pass was the window's, asserted above
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("weighted percentiles match a driver-side brute-force fold") {
    // q105's definition pin: lower weighted percentile — smallest price
    // (cents) whose cumulative l_quantity weight reaches p·W — checked
    // against a sequential sort-and-accumulate over the raw rows
    import org.apache.spark.sql.functions._
    val rows = Tables.t(spark, dir, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("v"),
        col("l_quantity").cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = rows.map(_._2).sum
    def brute(p: Double): Double = {
      var cum = 0L
      rows.find { case (_, w) => cum += w; cum.toDouble >= p * total.toDouble }
        .get._1.toDouble
    }
    val got = AggPack.weightedPercentiles(spark, dir).collect().head
    Seq(0.25, 0.5, 0.75, 0.95).zipWithIndex.foreach { case (p, i) =>
      assert(got.getDouble(i) == brute(p),
        s"wp$p: got ${got.getDouble(i)} expected ${brute(p)}")
    }
  }

  test("weighted percentile plan: every window partitioned") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = AggPack.weightedPercentiles(spark, dir).queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, "expected the bucket-local cumsum window")
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"partitionless window (single-partition exchange) in:\n$plan"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("TopKLongs aggregator == window row_number top-k formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val src = Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
    val viaWindow = src
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("pc").desc)))
      .filter(col("rn") <= 3)
      .groupBy(col("l_returnflag"))
      .agg(array_join(sort_array(collect_list(col("pc")), asc = false)
        .cast("array<string>"), ",").as("top3"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaAgg = AggPack.topkPerGroup(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaAgg == viaWindow)
  }

  test("exact-sum stddev/corr agree with the streaming builtins within 1e-9") {
    import org.apache.spark.sql.functions._
    val formula = AggPack.stats(spark, dir).head()
    val builtin = Tables.t(spark, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("q"),
        round(col("l_extendedprice")).cast("long").as("pd"))
      .agg(stddev_samp(col("q")), corr(col("q"), col("pd"))).head()
    assert(math.abs(formula.getDouble(1) - builtin.getDouble(0)) < 1e-9)
    assert(math.abs(formula.getDouble(2) - builtin.getDouble(1)) < 1e-9)
  }

  test("topk limit plans as TakeOrderedAndProject, not a global sort") {
    val plan = AggPack.topkOrders(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("TPC-H-shaped flagships: top-k avoids global sort; dims broadcast in the 6-way join") {
    // q17 (Q3 shape): orderBy+limit must compile to TakeOrderedAndProject
    val q3plan = JoinsPack.shippingPriority(spark, dir).queryExecution.executedPlan.toString
    assert(q3plan.contains("TakeOrderedAndProject"), s"q17 global-sorts:\n$q3plan")
    // q54 (Q5 shape): every dim side joins as a broadcast — the 100 TB plan
    // shuffles only the two fact tables
    val q5plan = JoinsPack.localSupplierVolume(spark, dir).queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(q5plan).length
    assert(bhj >= 3, s"expected >=3 broadcast joins in q54, got $bhj:\n$q5plan")
  }

  test("broadcast hint produces BroadcastHashJoin for dim joins") {
    val plan = JoinsPack.joinBroadcast(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q118: sketch counts are exact at this vocabulary; global row == combined sketches") {
    import org.apache.spark.sql.functions._
    val rows = AggPack.topkSketchTokens(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // independent exact counts (64 tracked slots > 31 distinct tokens →
    // the space-saving sketch never evicts, so estimates must be EQUAL)
    val exact = Tables.t(spark, dir, "documents")
      .select(col("source"), explode(graft.functions.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val globalExact = exact.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val (globalRows, perRows) = rows.partition(_._1._1 == "__all__")
    assert(perRows == exact)
    assert(globalRows.map { case ((_, tok), n) => tok -> n } == globalExact)
  }

  test("q113 unpivot: every flag melts to exactly its 3 metrics, values lossless") {
    import org.apache.spark.sql.functions._
    val long = AggPack.unpivotMetrics(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // independent recompute of the wide side, different plan shape
    val li = Tables.t(spark, dir, "lineitem")
    val flags = li.select("l_returnflag").distinct().collect().map(_.getString(0))
    assert(flags.nonEmpty)
    assert(long.keySet == flags.flatMap(f =>
      Seq((f, "sum_qty"), (f, "max_qty"), (f, "n_rows"))).toSet)
    flags.foreach { f =>
      val sub = li.filter(col("l_returnflag") === f)
      assert(long((f, "n_rows")) == sub.count().toDouble)
      assert(long((f, "sum_qty")) ==
        sub.agg(sum("l_quantity")).head().getDouble(0))
      assert(long((f, "max_qty")) ==
        sub.agg(max("l_quantity")).head().getDouble(0))
    }
  }

  test("except/intersect rewrite to anti/semi joins") {
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val ex = JoinsPack.exceptKeys(spark, dir).queryExecution.optimizedPlan
    assert(ex.collect { case j: Join if j.joinType == LeftAnti => j }.nonEmpty)
    val in = JoinsPack.intersectKeys(spark, dir).queryExecution.optimizedPlan
    assert(in.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty)
  }
}
