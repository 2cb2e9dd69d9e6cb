package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene for the driver contract. `queries`/`oracleSql` are
  * built by flattening the packs into a Map — a duplicated name across
  * packs would silently DROP one implementation (last-wins), and an
  * oracle key without a query would dump SQL the driver can never
  * adjudicate. Both are the kind of wiring bug no per-operator spec sees.
  */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("query names are unique across packs (no silent last-wins drop)") {
    val names = SparkEntry.allPacks.flatMap(_.queries.keys)
    assert(names.size == names.distinct.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle key has a registered query, and names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
    // names feed directory paths + the driver's qNN short-key compaction
    qs.foreach { n =>
      assert(n.matches("q[0-9]+_[a-z0-9_]+"), s"non-conforming query name: $n")
    }
    // the bench's short-key fallback relies on distinct qNN prefixes
    val prefixes = qs.map(_.takeWhile(_ != '_'))
    assert(prefixes.size == qs.size, "qNN prefix collision")
  }

  test("no oracle SQL embeds an absolute scratch path (hermetic aux rule)") {
    // oracles that read persisted aux dumps must go through
    // Tables.AuxPlaceholder (substituted by Verify with a root under its
    // own out_dir) — an absolute /tmp literal couples the DuckDB check to
    // a scratch dir shared between build and check processes
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("/tmp"), s"$name oracle embeds an absolute /tmp path")
    }
  }

  test("no registered query dumps a decimal wider than 18 digits") {
    // precision <= 18 decimals are int64-backed in parquet and the
    // driver's two readers (pyarrow for the Spark dump, DuckDB for the
    // oracle) canonicalize them identically; precision > 18 -> int128
    // parquet -> asymmetric canonicalization -> hash_match false on
    // bit-identical values (round-8 q140). Gate the CLASS of bug at the
    // registry: build every query's frame and walk its schema.
    // The streaming trio is excluded only because building those frames
    // RUNS a real StreamingQuery (~13 s combined); their outputs are
    // all long-typed by construction and adjudicated in EventStreamSpec.
    val skip = Set("q136_streamed_tumbling_counts", "q141_streamed_sessions",
      "q148_streamed_attribution")
    val offenders = SparkEntry.queries.filterNot(q => skip(q._1)).flatMap {
      case (name, fn) =>
        val wide = Verify.wideDecimals(fn(spark, dir).schema)
        if (wide.isEmpty) Nil else Seq(s"$name -> ${wide.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"queries dumping decimal precision > 18: ${offenders.mkString("; ")}")
  }

  test("no two query names are bound to the same pack function (no aliases)") {
    // q85/q105 historically double-registered one function, inflating the
    // query count and duplicating ~3 s of bench work per round
    SparkEntry.allPacks.foreach { p =>
      val fns = p.queries.values.toSeq
      assert(fns.size == fns.distinct.size,
        s"duplicate function registration in ${p.getClass.getSimpleName}")
    }
  }
}
