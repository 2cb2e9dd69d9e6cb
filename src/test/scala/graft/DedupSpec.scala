package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupPack

/** Sketch-based dedup verified against the exact jaccard ground truth. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  private lazy val exactPairs: Map[(Long, Long), Double] =
    DedupPack.dedupJaccard(spark, dir, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("minhash LSH: perfect precision (verification step), recall >= 0.8 at j>=0.5") {
    val lsh = DedupPack.dedupMinhashLsh(spark, dir, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exactPairs.keySet),
      s"false positives: ${lsh -- exactPairs.keySet}")
    val recall = lsh.size.toDouble / exactPairs.size.max(1)
    assert(recall >= 0.8, s"recall=$recall (${lsh.size}/${exactPairs.size})")
  }

  test("simhash: near-identical docs collide; distant docs don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // craft a corpus with one known near-dup pair and unrelated docs
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    val docs = Seq(
      (1L, base), (2L, base + "lambda"),
      (3L, "totally different words here about other topics entirely " * 10),
      (4L, "yet another unrelated document speaking of cabbages and kings " * 9))
      .toDF("doc_id", "text")
    val sig = docs.select(col("doc_id"),
      graft.functions.simhashBits(graft.functions.tokens(col("text"))).as("bits"))
    val pairs = sig.as("a").crossJoin(sig.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        graft.functions.hammingBits(col("a.bits"), col("b.bits")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) <= 6, s"near-dup hamming ${pairs((1L, 2L))}")
    assert(pairs((1L, 3L)) > 10 && pairs((1L, 4L)) > 10 && pairs((3L, 4L)) > 10,
      s"distant pairs too close: $pairs")
  }

  test("exact dedup keeps one representative per distinct text") {
    val d = DedupPack.dedupExact(spark, dir).collect()
    val docs = Tables.t(spark, dir, "documents")
    assert(d.map(_.getLong(1)).sum == docs.count())
    assert(d.map(_.getLong(0)).distinct.length == d.length)
  }
}
