package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Partitioned parquet output — the shape a 100 TB corpus actually ships
  * in: `path/part_col=value/part-*.parquet`, with bounded file sizes so
  * downstream readers get splittable, evenly-sized inputs.
  *
  * Why each knob exists at scale:
  * - `partitionBy` columns become directory keys → readers prune whole
  *   partitions from the listing (no data touched), and incremental
  *   pipelines overwrite single partitions instead of the corpus.
  * - `maxRecordsPerFile` caps file size without an extra repartition job
  *   (the writer rolls files mid-task); without it one fat task writes one
  *   fat unsplittable-row-group file.
  * - `repartition(partitionCols)` before the write lines task boundaries
  *   up with directory keys so each partition directory is written by few
  *   tasks (default hash layout sprays every task across every directory
  *   → small-file explosion, the classic 100 TB output bug).
  */
object CorpusSink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Read back with partition-column recovery (values come from directory
    * names, typed by inference).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
