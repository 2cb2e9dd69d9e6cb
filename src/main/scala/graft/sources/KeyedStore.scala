package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** hw3 write path — HBase-like keyed cell store over parquet.
  *
  * Reference (homework-3/.../HBaseClient.java): namespace+table DDL with
  * column families and maxVersions=3 (:122-144), Put upserts (:83-120),
  * Get/Scan reads (:63-80). Model: one parquet-backed SQL table in
  * long cell format `(rowkey, family, qualifier, value, version)`;
  * a Put is an append (immutable storage — the LSM philosophy), and
  * reads resolve the newest `maxVersions` per cell with a ranking window,
  * exactly like HBase's read-side version filtering. At scale: appends are
  * blind writes (no read-modify-write), version resolution happens once
  * per read and can be compacted by rewriting the latest-N per cell.
  */
object KeyedStore {

  val schemaDdl = "rowkey STRING, family STRING, qualifier STRING, value STRING, version BIGINT"

  /** DDL: create the cell table over a parquet location
    * (HBaseClient.java:122-144 createTable parity).
    */
  def create(spark: SparkSession, table: String, location: String): Unit =
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $table ($schemaDdl) USING parquet LOCATION '$location'")

  /** Put: append cells (HBaseClient.java:83-120). Accepts any DataFrame
    * with the cell schema; a single Put row is a 1-row DataFrame.
    */
  def put(spark: SparkSession, table: String, cells: DataFrame): Unit =
    cells.select(col("rowkey"), col("family"), col("qualifier"),
      col("value").cast("string"), col("version").cast("long"))
      .write.mode("append").insertInto(table)

  private val verWin =
    Window.partitionBy(col("rowkey"), col("family"), col("qualifier"))
      .orderBy(col("version").desc)

  /** Read-side version resolution: newest `maxVersions` per cell. */
  def scan(spark: SparkSession, table: String, maxVersions: Int = 3): DataFrame =
    spark.table(table)
      .withColumn("rn", row_number().over(verWin))
      .filter(col("rn") <= maxVersions)
      .drop("rn")

  /** Prefix scan, optionally reversed (HBaseClient.java:64-68). */
  def prefixScan(spark: SparkSession, table: String, prefix: String,
                 reversed: Boolean = false, maxVersions: Int = 3): DataFrame = {
    val s = scan(spark, table, maxVersions).filter(col("rowkey").startsWith(prefix))
    if (reversed)
      s.orderBy(col("rowkey").desc, col("family"), col("qualifier"), col("version").desc)
    else
      s.orderBy(col("rowkey"), col("family"), col("qualifier"), col("version").desc)
  }

  /** Compaction: rewrite the table keeping only the newest `maxVersions`
    * per cell — the background process that makes blind-append Puts
    * sustainable (read amplification stays bounded). Rewrites through a
    * temp view snapshot because the scan reads the table being replaced.
    */
  def compact(spark: SparkSession, table: String, maxVersions: Int = 3): Unit = {
    val kept = scan(spark, table, maxVersions)
    val snapshot = kept.collectAsList() // test-scale; at scale: write temp dir + swap
    val df = spark.createDataFrame(snapshot, kept.schema)
    df.write.mode("overwrite").insertInto(table)
  }

  /** Point Get (HBaseClient.java:71-80): newest value per qualifier. */
  def get(spark: SparkSession, table: String, rowkey: String): DataFrame =
    scan(spark, table, maxVersions = 1)
      .filter(col("rowkey") === rowkey)
      .select(col("family"), col("qualifier"), col("value"))
      .orderBy(col("family"), col("qualifier"))
}
