package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: derives an sf×N dataset from an existing
  * driver-generated scale factor by key-offset replication, so scaling
  * exponents (SCALE.md) can be MEASURED instead of argued from plan shape.
  *
  * Replication preserves the reference distributions inside each replica
  * and keeps cross-table referential integrity by offsetting every key
  * column with a per-table stride (max(key)+1), applied consistently on
  * both sides of each FK (orders.o_custkey moves with customer.c_custkey,
  * lineitem.l_orderkey with orders.o_orderkey, …). Two columns need more
  * than offsets to keep the WORKLOAD's structure scaling linearly rather
  * than quadratically:
  *
  *  - `documents.text`: a verbatim copy would make every doc a near-dup of
  *    its N−1 clones, growing MinHash/Jaccard pair counts ~N² and melting
  *    any dedup rehearsal. Every token gets a per-replica suffix instead —
  *    shingle sets across replicas are disjoint, so the intra-replica dup
  *    structure is replicated exactly and pair counts scale ~N.
  *  - `embeddings.embedding`: verbatim copies are exact cosine dups across
  *    replicas (same N² blowup). Each replica applies a deterministic
  *    per-replica sign-flip pattern (x_j ← x_j·s_ij, s_ij ∈ {±1} from
  *    murmur hash(i,j)): norms are preserved, cross-replica cosines
  *    decorrelate to ~0, intra-replica geometry is untouched.
  *
  * region/nation stay fixed (they are constant across TPC-H scale factors).
  * Usage: `runMain graft.tools.ScaleData [srcDir outDir factor]`.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_scale/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor >= 1, s"factor must be >= 1, got $factor")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-data")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts has shipped as TIMESTAMP(NANOS) or timestamp[us] across
      // testdata generations; the legacy flag makes the nanos era readable
      // (as a raw long) and is a no-op on the µs era. Whatever form the
      // replica inherits, every reader canonicalizes through
      // Tables.normalizeTs.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    def stride(t: String, c: String): Long =
      rd(t).agg(max(col(c)).cast("long")).head.getLong(0) + 1L

    // one stride per key FAMILY, shared by every table referencing it
    val ordS = stride("orders", "o_orderkey")
    val custS = stride("customer", "c_custkey")
    val partS = stride("part", "p_partkey")
    val suppS = stride("supplier", "s_suppkey")
    val docS = stride("documents", "doc_id")
    val vecS = stride("embeddings", "vec_id")
    val evS = stride("events", "event_id")
    val userS = stride("events", "user_id")

    /** Union of `factor` key-offset replicas, with an optional per-replica
      * extra transform, written to the out dir.
      */
    def replicate(t: String, keys: Map[String, Long], outParts: Int,
                  extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = rd(t)
      val reps = (0 until factor).map { i =>
        val off = keys.foldLeft(base) { case (d, (c, s)) =>
          d.withColumn(c, (col(c) + lit(i * s)).cast(base.schema(c).dataType))
        }
        extra(off, i)
      }
      reps.reduce(_ unionByName _).repartition(outParts)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale] $t x$factor -> $out/$t.parquet")
    }

    for (t <- Seq("region", "nation"))
      rd(t).write.mode("overwrite").parquet(s"$out/$t.parquet")

    // c_name gets a per-replica two-distinct-char suffix (replica 0
    // unchanged): verbatim name copies would make every replica a
    // Levenshtein-0 twin of its clones and every cross-replica pair a
    // candidate, growing the q142 fuzzy join ~N² — the same quadratic
    // replication artifact the documents/embeddings transforms prevent.
    // Any two suffixes differ in both chars (distance ≥ 2 > the join's
    // d=1), so cross-replica pairs vanish and intra-replica edit-distance
    // structure replicates exactly.
    replicate("customer", Map("c_custkey" -> custS), 8, (d, i) =>
      if (i == 0) d
      else d.withColumn("c_name",
        concat(col("c_name"), lit(s"-${('a' + i).toChar}${('A' + i).toChar}"))))
    replicate("supplier", Map("s_suppkey" -> suppS), 4)
    replicate("part", Map("p_partkey" -> partS), 8)
    replicate("orders", Map("o_orderkey" -> ordS, "o_custkey" -> custS), 16)
    replicate("lineitem",
      Map("l_orderkey" -> ordS, "l_partkey" -> partS, "l_suppkey" -> suppS), 32)
    replicate("events", Map("event_id" -> evS, "user_id" -> userS), 16)
    replicate("documents", Map("doc_id" -> docS), 16, (d, i) =>
      if (i == 0) d
      else d.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + s"r$i"))
        .withColumn("n_chars", length(col("text"))))
    replicate("embeddings", Map("vec_id" -> vecS), 16, (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding", expr(
        s"transform(embedding, (x, j) -> cast(x * (1 - 2 * pmod(hash($i, j), 2)) as float))")))

    spark.stop()
  }
}
