package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WideColumnPack

/** Pins for the r19 wide-column rewrite: the latest-version views (q47,
  * q51, q52) moved from row_number()-over-window + rn=1 to a
  * `max_by(value, version)` aggregate (map-side partial aggregation, no
  * per-partition sort). max_by is only deterministic when the ordering
  * key is tie-free, so (a) the precondition — versions unique within a
  * (rowkey, family, qualifier) cell — is asserted on the fixture, and
  * (b) the rewrite is asserted row-identical to the reference window
  * form it replaced (the oracle SQL stays the window form, so the driver
  * re-proves the same equivalence against DuckDB every round).
  */
class WideColumnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  /** The pre-r19 reference form: newest cell per (rowkey, family,
    * qualifier) via ranking window.
    */
  private def latestViaWindow = {
    val w = Window.partitionBy(col("rowkey"), col("family"), col("qualifier"))
      .orderBy(col("version").desc)
    Tables.cells(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("rowkey"), col("family"), col("qualifier"),
        col("value"), col("version"))
  }

  test("cells versions are unique per (rowkey, family, qualifier) — the max_by precondition") {
    val dups = Tables.cells(spark, dir)
      .groupBy(col("rowkey"), col("family"), col("qualifier"), col("version"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .count()
    assert(dups == 0L, "duplicate versions inside one cell would make max_by nondeterministic")
  }

  test("max_by latest-cells equals the row_number window form") {
    val viaAgg = Tables.cells(spark, dir)
      .groupBy(col("rowkey"), col("family"), col("qualifier"))
      .agg(max_by(col("value"), col("version")).as("value"),
        max(col("version")).as("version"))
    assert(viaAgg.exceptAll(latestViaWindow).isEmpty &&
      latestViaWindow.exceptAll(viaAgg).isEmpty,
      "aggregate and window forms must select identical newest cells")
  }

  test("fused single-aggregate pivot (q47) equals the two-step window+pivot form") {
    val fused = WideColumnPack.latestPivot(spark, dir)
    val twoStep = latestViaWindow
      .groupBy(col("rowkey"))
      .agg(
        max(when(col("family") === "order" && col("qualifier") === "status",
          col("value"))).as("status"),
        max(when(col("family") === "order" && col("qualifier") === "totalprice",
          col("value"))).as("totalprice"),
        max(when(col("family") === "info" && col("qualifier") === "priority",
          col("value"))).as("priority"))
      .orderBy(col("rowkey"))
    assert(fused.collect().toSeq == twoStep.collect().toSeq,
      "q47's one-aggregate pivot must reproduce the window form exactly")
  }

  test("q47/q51/q52 plans carry no Window node and q47 exactly one shuffle exchange") {
    def plan(name: String) = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.executedPlan.toString
    }
    Seq("q47_widecol_latest_pivot", "q51_widecol_family_map",
      "q52_widecol_binary_roundtrip").foreach { n =>
      assert(!plan(n).contains("Window"), s"$n must not plan a ranking window")
    }
    // q47: one hash aggregate exchange + the deterministic final sort's
    // range exchange — anything more means the fusion regressed
    val p47 = plan("q47_widecol_latest_pivot")
    val nEx = "Exchange ".r.findAllIn(p47).size
    assert(nEx <= 2, s"q47 should shuffle once plus the final sort, got $nEx exchanges:\n$p47")
  }

  // operators that still NEED the ranking window (rn <= 3 retention) keep it
  test("prefix scan (rn<=3) still returns multiple retained versions") {
    val out = WideColumnPack.prefixScan(spark, dir)
      .groupBy(col("rowkey"), col("family"), col("qualifier"))
      .agg(count(lit(1)).as("n"))
    assert(out.agg(max(col("n"))).head().getLong(0) <= 3)
  }
}
