package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingestion — the arrival path of the dedup family: new
  * documents flow in as micro-batches and must be rejected if they
  * duplicate (a) the EXISTING corpus or (b) an earlier arrival in the
  * stream itself.
  */
object CorpusStreamJobs {

  /** Hash index of an existing corpus: one narrow md5 column — what a
    * pipeline persists (e.g. via KeyedStore) so ingestion never rereads
    * text. Distinct so the anti-join side carries no duplicate keys.
    */
  def corpusHashIndex(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("text_md5")).distinct()

  /** Ingestion dedup, both directions in one declarative plan:
    * stream-static LEFT ANTI join against the corpus hash index drops
    * already-known texts (per micro-batch; the static side is
    * re-resolved each batch so a growing index is picked up), and
    * `dropDuplicatesWithinWatermark` on the hash suppresses repeats
    * WITHIN the stream with state bounded by the watermark horizon —
    * the same residual-risk contract as EventStreamJobs.dedupStream.
    * Works identically on a batch frame (watermark is a no-op there),
    * which is what the spec equivalence pins.
    */
  def ingestDedup(newDocs: DataFrame, corpusIndex: DataFrame,
                  watermark: String = "1 hour"): DataFrame =
    newDocs
      .withColumn("text_md5", md5(col("text")))
      .withWatermark("ts", watermark)
      .join(corpusIndex, Seq("text_md5"), "left_anti")
      .dropDuplicatesWithinWatermark("text_md5")
}
