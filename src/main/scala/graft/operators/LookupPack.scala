package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** hw2 pack — the RPC point-lookup capability as a query.
  *
  * Reference (homework-2/.../CallRpc.java:9-13 + service/CallRpcImp.java:
  * 17-22): `String call(stuId)` returns the student's name for an exact id
  * match, else null — a point lookup `String → Option[String]`. (The
  * reference's own guard is buggy — `isNullOrEmpty(x) && "...".equals(x)` is
  * always false; we implement the *intended* lookup, per SURVEY.md §1.2.)
  * The service boundary itself maps to the harness contract, not to user
  * code. At scale a point lookup is a pushed-down equality predicate on a
  * sorted/partitioned key — never a full scan on the executor side.
  */
object LookupPack extends QueryPack {

  /** Point lookup by key: 0-or-1 rows, Option-like. */
  def lookup(spark: SparkSession, dir: String, custkey: Long): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_custkey") === custkey)
      .select(col("c_custkey"), col("c_name"))

  def lookupHit(spark: SparkSession, dir: String): DataFrame =
    lookup(spark, dir, 42L)

  /** Miss path — the reference's null return ≡ empty result. */
  def lookupMiss(spark: SparkSession, dir: String): DataFrame =
    lookup(spark, dir, -1L)

  /** Batched lookup: many keys at once via a broadcast hash join against a
    * tiny in-memory key relation — the scale path when the "RPC" is called
    * for thousands of ids (one scan, no per-key jobs).
    */
  def lookupBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keys = Seq(1L, 42L, 77L, 100L, 1234567L).toDF("key")
    t(spark, dir, "customer")
      .join(broadcast(keys), col("c_custkey") === col("key"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val queries = Map(
    "q48_lookup_hit" -> lookupHit _,
    "q49_lookup_miss" -> lookupMiss _,
    "q50_lookup_batch" -> lookupBatch _)

  val oracle = Map(
    "q48_lookup_hit" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey = 42",
    "q49_lookup_miss" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey = -1",
    "q50_lookup_batch" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (1, 42, 77, 100, 1234567) ORDER BY c_custkey""".stripMargin)
}
