package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md B2: the exact reference corpus (InvertedMain.scala:12) and its
  * hand-known postings, through the same dataflow the pack uses.
  */
class InvertedGoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    Seq(("it is what it is", 0), ("what is it", 1), ("it is a banana", 2))
      .toDF("text", "doc_id")
  }

  test("v1: word -> distinct docs matches the reference's known output") {
    val got = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1).toList)
      .toMap
    assert(got == Map(
      "it" -> List(0, 1, 2), "is" -> List(0, 1, 2), "what" -> List(0, 1),
      "a" -> List(2), "banana" -> List(2)))
  }

  test("v2: word -> (doc, count) postings match, e.g. it -> [(0,2),(1,1),(2,1)]") {
    val got = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"), col("doc_id")).count()
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got(("it", 0)) == 2 && got(("it", 1)) == 1 && got(("it", 2)) == 1)
    assert(got(("is", 0)) == 2 && got(("what", 0)) == 1 && got(("banana", 2)) == 1)
    assert(got.size == 10)
  }

  test("property: every (word, doc) occurrence appears in v1 postings") {
    val dir = SparkTestSession.sfDir
    val docs = Tables.t(spark, dir, "documents")
    val pairs = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .distinct().count()
    val postingsTotal = operators.InvertedIndexPack.invertedV2(spark, dir).count()
    assert(pairs == postingsTotal)
  }
}
