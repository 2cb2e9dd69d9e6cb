package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the [[Tables.t]] relation cache: hit on an unchanged
  * table, refresh on ANY content change — even one landing inside the same
  * directory-mtime tick (filesystem mtime granularity can be 1 s; the
  * round-12 advice scenario is a fixture regenerated fast enough to
  * collide) — and bounded growth: a rewrite must REPLACE the entry for its
  * (session, path), not accumulate one dead relation per regeneration.
  */
class TablesCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeTable(dir: String, rows: Int): Unit = {
    import spark.implicits._
    (0 until rows).map(i => (i.toLong, s"v$i")).toDF("doc_id", "text")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("unchanged table is a cache hit (same relation instance)") {
    val dir = Files.createTempDirectory("tcache1").toString
    writeTable(dir, rows = 10)
    val a = Tables.t(spark, dir, "documents")
    val b = Tables.t(spark, dir, "documents")
    assert(a eq b, "second read of an unchanged table must reuse the cached relation")
  }

  test("rewrite inside the same dir-mtime tick still serves fresh content") {
    val dir = Files.createTempDirectory("tcache2").toString
    writeTable(dir, rows = 10)
    assert(Tables.t(spark, dir, "documents").count() == 10)
    val tableDir = Paths.get(s"$dir/documents.parquet")
    val mtime0 = Files.getLastModifiedTime(tableDir)
    writeTable(dir, rows = 25)
    // force the collision the advice describes: the rewrite lands but the
    // directory mtime reads exactly as before
    Files.setLastModifiedTime(tableDir, mtime0)
    assert(Tables.t(spark, dir, "documents").count() == 25,
      "content signature (file count + bytes) must catch an mtime-tick collision")
  }

  test("tableSig: dir vs file vs missing path") {
    val dir = Files.createTempDirectory("tsig").toString
    writeTable(dir, rows = 10)
    val (mt, n, bytes) = Tables.tableSig(s"$dir/documents.parquet")
    assert(mt > 0 && n >= 2 && bytes > 0,
      s"dir signature must count part files + _SUCCESS with real bytes, got ($mt, $n, $bytes)")
    val part = Files.list(Paths.get(s"$dir/documents.parquet"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    assert(Tables.tableSig(part.toString) == (
      Files.getLastModifiedTime(part).toMillis, 1L, Files.size(part)))
    assert(Tables.tableSig(s"$dir/no_such.parquet") == ((-1L, -1L, -1L)))
  }

  test("non-statable path: sentinel never matches — rebuild per call, never a stale serve") {
    val dir = Files.createTempDirectory("tcache_nosig").toString
    writeTable(dir, rows = 10)
    // "file:$dir" is a valid Spark URI but NOT a statable local path
    // (Paths.get treats it as a literal relative name), so tableSig
    // returns the NoSig sentinel — the round-13 defect served the FIRST
    // cached relation forever because NoSig == NoSig
    val uriDir = s"file:$dir"
    assert(Tables.tableSig(s"$uriDir/documents.parquet") == Tables.NoSig)
    val a = Tables.t(spark, uriDir, "documents")
    assert(a.count() == 10)
    val b = Tables.t(spark, uriDir, "documents")
    assert(!(a eq b),
      "a NoSig-keyed entry must rebuild per call, not serve the cached relation")
    writeTable(dir, rows = 25)
    assert(Tables.t(spark, uriDir, "documents").count() == 25,
      "a rewrite behind a non-statable path must be visible on the next call")
  }

  test("repeated rewrites replace the entry — cache growth is bounded") {
    val dir = Files.createTempDirectory("tcache3").toString
    writeTable(dir, rows = 5)
    Tables.t(spark, dir, "documents").count()
    val size0 = Tables.tCacheSize
    (1 to 4).foreach { i =>
      writeTable(dir, rows = 5 + i)
      assert(Tables.t(spark, dir, "documents").count() == 5 + i)
    }
    assert(Tables.tCacheSize == size0,
      s"rewrites of one path must not grow the cache (was $size0, now ${Tables.tCacheSize})")
  }
}
