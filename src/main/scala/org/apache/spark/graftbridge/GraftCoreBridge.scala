package org.apache.spark.graftbridge

import java.io.File

import org.apache.spark.SparkEnv

/** The one place the library touches `private[spark]` core API: allocating
  * executor-local scratch files from the block manager's managed local
  * dirs. Spill files created there (a) live on the disks the cluster
  * operator provisioned for shuffle/spill (`spark.local.dir` /
  * YARN/K8s-provided dirs), not a possibly-tiny `/tmp`, (b) are counted by
  * Spark's disk-usage accounting, and (c) are swept with the executor's
  * block-manager directory tree if the JVM dies before task-completion
  * listeners run. Lives under org.apache.spark.* solely for access; kept
  * minimal and auditable (the same contract as GraftSqlBridge).
  */
object GraftCoreBridge {

  /** A fresh empty temp file in Spark's managed local dirs; falls back to
    * `java.io.tmpdir` when no SparkEnv exists (plain-JVM unit contexts).
    */
  def createLocalSpillFile(prefix: String): File =
    Option(SparkEnv.get) match {
      case Some(env) => env.blockManager.diskBlockManager.createTempLocalBlock()._2
      case None => File.createTempFile(prefix, ".run")
    }
}
