package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AtomicSwap

/** Direct protocol pins for the compaction swap shared by KeyedStore and
  * the PCA model dump. KeyedStoreSpec exercises one end-to-end recovery
  * (crash after rename live→_old, retried through compact()); these pin
  * the remaining branches of the state machine at the filesystem level so
  * a protocol regression is named by the branch that broke, not by a
  * store-level symptom.
  */
class AtomicSwapSpec extends AnyFunSuite {

  private val fs: FileSystem = FileSystem.getLocal(new Configuration())

  /** Fresh live dir containing one file `f` with `content`. */
  private def mkLive(content: String): Path = {
    val dir = Files.createTempDirectory("swap_live")
    Files.writeString(dir.resolve("f"), content)
    new Path(dir.toUri.getPath)
  }

  private def sibling(live: Path, suffix: String): Path =
    new Path(live.getParent, s".${live.getName}_compact_$suffix")

  private def readF(dir: Path): String = {
    val in = fs.open(new Path(dir, "f"))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def writeF(dir: Path, content: String): Unit = {
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, "f"), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  test("replaceDir swaps content and leaves no _tmp/_old siblings") {
    val live = mkLive("v1")
    AtomicSwap.replaceDir(fs, live, "spec")(tmp => writeF(tmp, "v2"))
    assert(readF(live) == "v2")
    assert(!fs.exists(sibling(live, "tmp")), "_tmp must be consumed by the swap")
    assert(!fs.exists(sibling(live, "old")), "_old must be dropped after a completed swap")
  }

  test("writeTmp runs while live is intact and may read it") {
    val live = mkLive("base")
    AtomicSwap.replaceDir(fs, live, "spec") { tmp =>
      // the documented contract: the live dir is readable during writeTmp
      writeF(tmp, readF(live) + "+delta")
    }
    assert(readF(live) == "base+delta")
  }

  test("a writeTmp failure propagates and leaves live untouched") {
    val live = mkLive("keep")
    val e = intercept[RuntimeException] {
      AtomicSwap.replaceDir(fs, live, "spec") { tmp =>
        writeF(tmp, "half-written")
        throw new RuntimeException("simulated writer crash")
      }
    }
    assert(e.getMessage.contains("simulated writer crash"))
    // the failure happened before any destructive rename: live is intact
    assert(readF(live) == "keep")
  }

  test("a stale _tmp from a crash before the renames is cleared, not nested into") {
    val live = mkLive("v1")
    // crash remnant: a prior swap died after writing _tmp, before renaming
    writeF(sibling(live, "tmp"), "stale-crash-remnant")
    AtomicSwap.replaceDir(fs, live, "spec")(tmp => writeF(tmp, "v2"))
    assert(readF(live) == "v2", "stale _tmp content must not survive into live")
    assert(!fs.exists(sibling(live, "tmp")))
  }

  test("a stale _old from a COMPLETED prior swap is dropped while live exists") {
    val live = mkLive("v2")
    // remnant of a swap that finished its renames but died before the
    // final _old cleanup — live holds current data, _old holds the
    // superseded copy
    writeF(sibling(live, "old"), "superseded")
    AtomicSwap.replaceDir(fs, live, "spec")(tmp => writeF(tmp, "v3"))
    assert(readF(live) == "v3")
    assert(!fs.exists(sibling(live, "old")),
      "stale _old must be cleared before the renames (nesting corrupts the swap)")
  }

  test("crash at EVERY mutating step leaves the data recoverable (fault-injection sweep)") {
    // the file's headline claim: "a crash at any step leaves the data
    // recoverable in exactly one of live/tmp/old". Model a crash at the
    // k-th mutating filesystem operation (rename/delete/tmp-write) by an
    // injected IOException — the op does not happen and the protocol
    // aborts there — then assert the recovery contract: recover() + one
    // clean retry always converges to the new content, never loses the
    // old content mid-way, and leaves no siblings.
    class CrashFs(under: FileSystem, tick: () => Unit) extends org.apache.hadoop.fs.FilterFileSystem(under) {
      override def rename(src: Path, dst: Path): Boolean = { tick(); super.rename(src, dst) }
      override def delete(p: Path, recursive: Boolean): Boolean = { tick(); super.delete(p, recursive) }
    }
    var completedAt = -1
    for (budget <- 0 to 10 if completedAt < 0) {
      var left = budget
      val tick: () => Unit = () => {
        if (left == 0) throw new java.io.IOException(s"injected crash (budget $budget)")
        left -= 1
      }
      val crashFs = new CrashFs(fs, tick)
      val live = mkLive("v1")
      val crashed =
        try {
          AtomicSwap.replaceDir(crashFs, live, s"crash-sweep-$budget") { tmp =>
            fs.mkdirs(tmp)      // tmp dir can exist before its content does:
            tick()              // a crash here leaves an EMPTY stale _tmp
            writeF(tmp, "v2")
          }
          completedAt = budget
          false
        } catch { case _: java.io.IOException => true }

      // recoverable NOW: recover() must yield a live dir holding a
      // complete copy — the old content or the new, never neither
      AtomicSwap.recover(fs, live, s"crash-sweep-$budget")
      assert(fs.exists(new Path(live, "f")),
        s"budget $budget: no complete copy recoverable after crash")
      val content = readF(live)
      assert(content == "v1" || content == "v2",
        s"budget $budget: recovered a mixed/partial copy: $content")

      // a clean retry from the crashed state must converge on the new
      // content and clear every remnant
      AtomicSwap.replaceDir(fs, live, s"crash-sweep-$budget-retry")(tmp => writeF(tmp, "v2"))
      assert(readF(live) == "v2", s"budget $budget: retry did not converge")
      assert(!fs.exists(sibling(live, "tmp")) && !fs.exists(sibling(live, "old")),
        s"budget $budget: retry left siblings behind")
      assert(crashed == (budget < completedAt || completedAt < 0))
    }
    // the sweep must actually cover the whole protocol: some budget let
    // the swap complete without a fault, and every earlier one crashed it
    assert(completedAt > 0, "fault injection never reached a clean completion")
  }

  test("recover restores _old when live is missing, and only then") {
    val live = mkLive("precious")
    val old = sibling(live, "old")
    // crash state: rename live→_old happened, _tmp→live did not
    assert(fs.rename(live, old))
    AtomicSwap.recover(fs, live, "spec")
    assert(readF(live) == "precious", "recover must restore the only copy")
    assert(!fs.exists(old))

    // live present: recover is a strict no-op even with an _old remnant
    writeF(old, "superseded")
    AtomicSwap.recover(fs, live, "spec")
    assert(readF(live) == "precious", "recover must not clobber an existing live")
    assert(fs.exists(old), "recover must not delete anything — cleanup is replaceDir's job")
    fs.delete(old, true)
  }
}
