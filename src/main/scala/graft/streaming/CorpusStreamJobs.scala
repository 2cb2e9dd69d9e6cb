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
    * On a batch frame the same plan keeps the same TEXTS: the watermark
    * node is analyzer-eliminated, and the within-watermark dedup (which
    * Spark rejects outright on batch) degrades to a plain
    * `dropDuplicates` — set-identical output, though WHICH doc_id
    * represents a repeated text is a streaming-only (first-arrival)
    * guarantee, since batch dropDuplicates keeps an arbitrary row per
    * key. EventStreamSpec pins both modes.
    */
  def ingestDedup(newDocs: DataFrame, corpusIndex: DataFrame,
                  watermark: String = "1 hour"): DataFrame = {
    val novel = newDocs
      .withColumn("text_md5", md5(col("text")))
      .withWatermark("ts", watermark)
      .join(corpusIndex, Seq("text_md5"), "left_anti")
    if (newDocs.isStreaming) novel.dropDuplicatesWithinWatermark("text_md5")
    else novel.dropDuplicates("text_md5")
  }
}
