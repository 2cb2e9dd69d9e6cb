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
  * - repartitioning on the directory keys PLUS a bounded content salt
  *   lines task boundaries up with directories without serializing them:
  *   bare `repartition(partitionCols)` hashes each partition VALUE onto
  *   exactly one task, so one skewed `source` worth half the corpus would
  *   be written by a single core; the salt spreads every directory over
  *   up to `tasksPerPartition` tasks. (The default no-repartition layout
  *   fails the other way — every task writes into every directory →
  *   small-file explosion, the classic 100 TB output bug.)
  */
object CorpusSink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 1000000L,
                       tasksPerPartition: Int = 8): Unit = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    // salt over the hashable columns only: xxhash64 rejects MapType at
    // analysis (maps have no canonical order), and a legal corpus schema
    // may carry map-typed metadata. Any non-map subset spreads a skewed
    // directory over tasks just as well; if EVERY column is a map the
    // salt degenerates to a constant (single task per directory — the
    // pre-salt behavior, still correct).
    val hashable = df.schema.fields
      .filterNot(f => hasMap(f.dataType)).map(f => col(f.name)).toIndexedSeq
    val salt =
      if (hashable.isEmpty) lit(0)
      else pmod(xxhash64(hashable: _*), lit(tasksPerPartition))
    df.repartition(partitionCols.map(col) :+ salt: _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Range-sorted output — the clustered-index layout: `repartitionByRange`
    * gives each task a contiguous, non-overlapping slice of the key space
    * (bounds come from a sample pass, so no global sort ever runs) and
    * `sortWithinPartitions` orders rows inside each file. The corpus then
    * ships as a globally ordered file sequence whose per-file parquet
    * min/max column statistics are DISJOINT — a downstream point or range
    * predicate on the sort key skips whole files and row groups instead of
    * scanning the corpus (the single-key form of what z-ordering does for
    * multiple keys). Cost at 100 TB: one range exchange + local sorts,
    * strictly cheaper than the orderBy().write() formulation that funnels
    * through a global sort.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                       numFiles: Int): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode("overwrite")
      .parquet(path)

  /** Read back with partition-column recovery (values come from directory
    * names, typed by inference).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** True when the type contains a MapType anywhere (maps are not
    * hashable by xxhash64 — no canonical key order).
    */
  private def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
  }
}
