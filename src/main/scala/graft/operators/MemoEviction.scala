package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** App-lifecycle eviction for per-application memo caches (cluster labels,
  * k-means/PCA models): one SparkListener per (application, owner) runs the
  * owner's evict callback at application end, so a long-lived JVM hosting
  * many sessions doesn't accumulate dead entries. Shared by DedupPack and
  * SimilarityPack — the registration/removal protocol lives in exactly one
  * place so a lifecycle fix can't silently miss one of the copies.
  */
private[operators] object MemoEviction {

  /** (appId, ownerTag) pairs whose listener is already registered. */
  private val hooked = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Idempotently register `evict(appId)` to run when `spark`'s application
    * ends. `owner` distinguishes independent callers hooking the same app —
    * each gets its own listener exactly once.
    */
  def hook(spark: SparkSession, owner: String)(evict: String => Unit): Unit = {
    val appId = spark.sparkContext.applicationId
    if (hooked.add((appId, owner))) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          evict(appId)
          hooked.remove((appId, owner)): Unit
        }
      })
    }
  }
}
