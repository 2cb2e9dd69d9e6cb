package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{events, tsMillis}

/** Temporal join pack — as-of and banded range joins, the two join shapes
  * the standard equi-join family can't express (SURVEY.md §2.3 lists them
  * absent from both the reference and Spark).
  *
  * The as-of join follows preference (a) of the custom-operator ladder:
  * composed from built-ins — tag both sides, union, and carry the last
  * right-side payload forward with an ignore-nulls window. One shuffle on
  * the join key, no point-in-time probe per row, no range explosion: the
  * scalable formulation at any corpus size. DuckDB's native ASOF JOIN is
  * the oracle.
  *
  * Timestamps compare at ms granularity on BOTH engines — the parquet is
  * ns-precision and Spark truncates to µs, so comparing raw timestamps
  * would disagree exactly at sub-ms boundaries.
  */
object AsOfPack extends QueryPack {

  /** Generic as-of join: for each left row, attach the right row with the
    * greatest `rightTime <= leftTime` per key (inner semantics — unmatched
    * left rows dropped). The right side must be unique per (key, time);
    * pre-aggregate it if not. `rightCols` are the right-side payload
    * columns carried onto the match.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(_ == key).toSeq
    val payload = struct((rightTime +: rightCols.filterNot(_ == rightTime))
      .map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType.catalogString
    // a NULL right time can never satisfy time >= rightTime (ASOF semantics),
    // but its payload STRUCT is non-null and would sort NULLS-first and be
    // carried by last(ignoreNulls) — drop such rows up front
    val rightClean = right.filter(col(rightTime).isNotNull)
    // side 0 (right) sorts before side 1 (left) at equal time, so an
    // equal-timestamp right row matches (>= semantics)
    val rightSide = Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
      payload.as("__match")
    val leftSide = Seq(col(key), col(leftTime).as("__t"), lit(1).as("__side")) ++
      leftCols.map(col) :+ lit(null).cast(payloadType).as("__match")
    val tagged = rightClean.select(rightSide: _*).unionAll(left.select(leftSide: _*))
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = (col(key) +: leftCols.map(col)) ++
      (rightTime +: rightCols.filterNot(_ == rightTime))
        .map(c => col(s"__matched.$c").as(c))
    tagged
      .withColumn("__matched", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__matched").isNotNull)
      .select(out: _*)
  }

  /** For each purchase event: the user's most recent error at-or-before it.
    * Right side is pre-aggregated to one row per (user, ms) so ties are
    * deterministic in both engines.
    */
  def asOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), tsMillis(col("ts")).as("p_ms"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), tsMillis(col("ts")).as("err_ms"), col("value"))
      .groupBy(col("user_id"), col("err_ms"))
      .agg(max(col("value")).as("err_value"))
    asOf(purchases, errors, key = "user_id",
        leftTime = "p_ms", rightTime = "err_ms",
        rightCols = Seq("err_ms", "err_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Banded range join: orders classified into price bands via a broadcast
    * nested-loop join on range predicates (tiny band table replicated —
    * the scan side never shuffles).
    */
  def rangeBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 50000.0),
      ("mid", 50000.0, 150000.0),
      ("high", 150000.0, 1e12))
      .toDF("band", "lo", "hi")
    graft.Tables.t(spark, dir, "orders")
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      .orderBy(col("band"))
  }

  val queries = Map(
    "q80_asof_join" -> asOfJoin _,
    "q81_range_band_join" -> rangeBandJoin _)

  val oracle = Map(
    "q80_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS p_ms FROM events
        |  WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT user_id, epoch_ms(ts) AS err_ms, max(value) AS err_value
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id, p.p_ms, e.err_ms, e.err_value
        |FROM p ASOF JOIN e
        |  ON p.user_id = e.user_id AND p.p_ms >= e.err_ms
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    "q81_range_band_join" ->
      """SELECT band, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |JOIN (VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
        |             ('high', 150000.0, 1e12)) AS bands(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin)
}
