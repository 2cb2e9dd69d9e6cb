package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupPack, TextPack}
import graft.sources.CorpusSink

/** End-to-end corpus pipeline — the packs composed the way a user of the
  * library actually chains them: near-dup collapse (one survivor per
  * cluster) → context-window packing → partitioned parquet write →
  * read-back. Each stage is individually oracle-/spec-verified;
  * this pins that they COMPOSE (schemas line up, survivors really are
  * dup-free, nothing is lost or invented across the write boundary).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("dedup survivors → pack → partitioned write round-trips") {
    val docs = Tables.t(spark, dir, "documents")

    // 1. survivors of near-dup collapse: the component-minimum doc keeps
    // its cluster, docs in no cluster keep themselves (q115's rule,
    // materialized as rows instead of counts)
    val clusters = DedupPack.clusterIndex(spark, dir)
      .withColumnRenamed("doc_id", "member_id")
    val survivors = docs
      .join(clusters, docs("doc_id") === col("member_id"), "left")
      .filter(col("label").isNull || col("label") === col("doc_id"))
      .select(docs.columns.map(col): _*)
    val nDocs = docs.count()
    val nSurvivors = survivors.count()
    assert(nSurvivors > 0 && nSurvivors <= nDocs)
    // conservation: survivors = total − non-representative cluster members
    val nDropped = docs.join(clusters, docs("doc_id") === col("member_id"))
      .filter(col("label") =!= col("doc_id")).count()
    assert(nSurvivors == nDocs - nDropped)

    // 2. no near-dup edge has BOTH endpoints surviving — the property the
    // collapse stage exists to deliver (every edge joins two same-cluster
    // members, and a cluster keeps exactly its minimum)
    val survivorIds = survivors.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val bothSurvive = DedupPack.dedupJaccard(spark, dir, 0.5)
      .select(col("d1"), col("d2")).collect()
      .count(r => survivorIds(r.getLong(0)) && survivorIds(r.getLong(1)))
    assert(bothSurvive == 0, s"$bothSurvive near-dup pairs survived the collapse")

    // 3. pack survivors into context windows; token counts conserve
    val packed = TextPack.sequencePackingOf(survivors, ctxTokens = 512)
    assert(packed.count() == nSurvivors)
    val tokensIn = survivors
      .agg(sum(size(graft.functions.tokens(col("text"))))).head().getLong(0)
    assert(packed.agg(sum(col("n_tokens"))).head().getLong(0) == tokensIn)

    // 4. partitioned write + read-back loses nothing
    val out = java.nio.file.Files.createTempDirectory("pipeline_out").toString
    CorpusSink.writePartitioned(
      packed.join(survivors.select(col("doc_id"), col("text")), "doc_id"),
      out, Seq("source"), maxRecordsPerFile = 200)
    val back = spark.read.parquet(out)
    assert(back.count() == nSurvivors)
    assert(back.select(col("doc_id")).distinct().count() == nSurvivors)
    // partition layout: one directory per source
    assert(back.select(col("source")).distinct().count() ==
      survivors.select(col("source")).distinct().count())
  }
}
