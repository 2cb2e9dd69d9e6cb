package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** hw4 pack — the Spark-RDD inverted index re-expressed declaratively.
  *
  * Reference (homework-4/.../InvertedMain.scala):
  *  - v1 (:13-20): flatMap(text.split(" ")) → reduceByKey(ary ++ ary) →
  *    distinct — word → distinct doc ids.
  *  - v2 (:22-29): ((word,doc),1) → reduceByKey(+) → regroup by word —
  *    word → (doc, count) postings.
  *
  * Here: explode(split) → groupBy → collect_set / count. The RDD
  * `reduceByKey` map-side combine is exactly Spark SQL's partial
  * HashAggregate; `collect_set` dedups in the aggregation buffer instead of
  * the reference's post-hoc `.distinct`. Postings are dumped as sorted
  * comma-joined strings so the oracle compare is representation-stable.
  */
object InvertedIndexPack extends QueryPack {

  private def words(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))

  /** v1: word → sorted distinct doc-id postings list. */
  def invertedV1(spark: SparkSession, dir: String): DataFrame =
    words(spark, dir)
      .groupBy(col("word"))
      .agg(concat_ws(",",
        transform(sort_array(collect_set(col("doc_id"))), _.cast("string")))
        .as("postings"))
      .orderBy(col("word"))

  /** v2: (word, doc) → occurrence count, flat postings rows. */
  def invertedV2(spark: SparkSession, dir: String): DataFrame =
    words(spark, dir)
      .groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word"), col("doc_id"))

  /** v2 nested: word → [(doc_id, n), ...] postings array, doc-sorted —
    * the reference's exact output shape (InvertedMain.scala:27-29). Dumped
    * as a string for compare-stability.
    */
  def invertedV2Nested(spark: SparkSession, dir: String): DataFrame =
    words(spark, dir)
      .groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("word"))
      .agg(concat_ws(",",
        transform(
          array_sort(collect_list(struct(col("doc_id"), col("n")))),
          s => concat(lit("("), s("doc_id").cast("string"), lit(":"),
            s("n").cast("string"), lit(")"))))
        .as("postings"))
      .orderBy(col("word"))

  val queries = Map(
    "q40_inverted_v1" -> invertedV1 _,
    "q41_inverted_v2" -> invertedV2 _,
    "q42_inverted_v2_nested" -> invertedV2Nested _)

  val oracle = Map(
    "q40_inverted_v1" ->
      """SELECT word,
        |  array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
        |GROUP BY word ORDER BY word""".stripMargin,
    "q41_inverted_v2" ->
      """SELECT word, doc_id, count(*) AS n
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
        |GROUP BY word, doc_id ORDER BY word, doc_id""".stripMargin,
    "q42_inverted_v2_nested" ->
      """SELECT word,
        |  array_to_string(
        |    list_transform(
        |      list_sort(list({'doc_id': doc_id, 'n': n})),
        |      s -> '(' || CAST(s.doc_id AS VARCHAR) || ':' || CAST(s.n AS VARCHAR) || ')'),
        |    ',') AS postings
        |FROM (SELECT word, doc_id, count(*) AS n
        |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) w
        |      GROUP BY word, doc_id) t
        |GROUP BY word ORDER BY word""".stripMargin)
}
