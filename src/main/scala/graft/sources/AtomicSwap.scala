package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory replacement — the compaction swap protocol shared
  * by [[KeyedStore.compact]] and the PCA model-dump compaction
  * (SimilarityPack.pcaProjection). Write the replacement into a sibling
  * `_tmp`, rename live→`_old`, `_tmp`→live, drop `_old`: a crash at any
  * step leaves the data recoverable in exactly one of live/tmp/old, never
  * a half-deleted dir — in-place overwrite (delete-then-write) would
  * destroy everything if it died mid-write. One definition so a
  * recovery-branch fix can't land in one copy and miss the other (the PCA
  * copy originally lacked the crash-recovery restore entirely).
  *
  * Concurrency contract: SINGLE WRITER per live dir — two concurrent
  * swaps race on the same `_tmp`/`_old` paths destructively. Crash
  * recovery here is single-process recovery, not mutual exclusion.
  *
  * Filesystem contract: requires ATOMIC directory rename (HDFS, posix
  * local). Object stores whose "rename" is copy+delete (s3a, GCS without
  * the rename-capable connector) can crash mid-copy leaving files split
  * across live and `_old` — a state the recovery branch (which keys on
  * live being fully absent) cannot repair; on such stores use a
  * manifest/pointer swap instead.
  */
object AtomicSwap {

  /** Replace `live`'s contents with whatever `writeTmp` writes to the tmp
    * path. `what` labels errors (e.g. "compact of tableX"). Recovery: if a
    * prior swap crashed after rename live→old (live missing, `_old`
    * present), `_old` is restored before anything destructive runs.
    * `writeTmp` may read the live dir — it runs while live is intact.
    */
  /** Restore a crashed swap: if live is missing and `_old` holds the only
    * copy of the data, rename it back. No-op when live exists or there is
    * no `_old`. Callers that GATE their replaceDir call (e.g. the PCA
    * dump compacts only past a file-count threshold) must invoke this
    * unconditionally before touching the live dir — otherwise a crashed
    * swap's `_old` is invisible until the gate next opens, by which time
    * a fresh append has recreated live and the stale-`_old` drop inside
    * replaceDir would destroy the pre-crash data.
    */
  def recover(fs: FileSystem, live: Path, what: String): Unit = {
    val old = new Path(live.getParent, s".${live.getName}_compact_old")
    if (!fs.exists(live) && fs.exists(old) && !fs.rename(old, live))
      throw new java.io.IOException(
        s"$what recovery failed: could not restore $old to $live")
  }

  def replaceDir(fs: FileSystem, live: Path, what: String)(writeTmp: Path => Unit): Unit = {
    val tmp = new Path(live.getParent, s".${live.getName}_compact_tmp")
    val old = new Path(live.getParent, s".${live.getName}_compact_old")
    // recover from a previous crash mid-swap: the only copy of the data
    // is in _old — restore it, never delete it
    recover(fs, live, what)
    // delete() returning false is only checked via exists(): a stale dir
    // that survives deletion would make the renames below NEST the moved
    // tree inside it (Hadoop rename-into-existing-directory semantics),
    // silently corrupting the swap state machine — fail loudly instead
    fs.delete(tmp, true)
    if (fs.exists(tmp))
      throw new java.io.IOException(s"$what: could not clear $tmp")
    writeTmp(tmp)
    // the live dir exists here (writeTmp just read it), so a leftover _old
    // is stale output of a COMPLETED prior swap — safe to drop now
    fs.delete(old, true)
    if (fs.exists(old))
      throw new java.io.IOException(
        s"$what: could not clear stale $old — aborting before rename")
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"$what swap failed at $live")
    if (!fs.rename(tmp, live)) {
      // roll back so the data is never left missing — and say so honestly
      // if even the rollback fails (data then sits in _old; the recovery
      // branch above restores it on the next run)
      val restored = fs.rename(old, live)
      throw new java.io.IOException(s"$what swap failed at $live " +
        (if (restored) "(rolled back)"
         else s"(ROLLBACK ALSO FAILED — data preserved at $old; rerun to recover)"))
    }
    fs.delete(old, true): Unit
  }
}
