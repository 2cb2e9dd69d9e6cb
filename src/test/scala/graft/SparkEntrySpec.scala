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

  test("replaceChecked substitutes when present and fails loudly when absent") {
    // oracle constant-substitution helper: a drifted SQL literal must fail
    // at class-init, not silently no-op the replace (the decoupling the
    // mechanism exists to prevent)
    object P extends graft.operators.QueryPack {
      val queries = Map.empty[String, (org.apache.spark.sql.SparkSession,
        String) => org.apache.spark.sql.DataFrame]
      val oracle = Map.empty[String, String]
      def ok(): String = "HAVING count(*) > 100".replaceChecked("> 100", "> 7")
      def drifted(): String = "HAVING count(*)>100".replaceChecked("> 100", "> 7")
    }
    assert(P.ok() == "HAVING count(*) > 7")
    val e = intercept[IllegalArgumentException](P.drifted())
    assert(e.getMessage.contains("pattern not found"))
  }

  test("streamingQueries markers name real registered queries") {
    // the marker is the skip set for registry-wide frame-building specs —
    // a stale entry (renamed query) would silently skip nothing while the
    // renamed streaming query runs live inside a schema test
    SparkEntry.allPacks.foreach { p =>
      val stale = p.streamingQueries -- p.queries.keySet
      assert(stale.isEmpty,
        s"${p.getClass.getSimpleName} streamingQueries not in queries: $stale")
    }
  }

  test("no registered query dumps a DecimalType column at any precision") {
    // the driver's two readers canonicalize decimals asymmetrically at
    // EVERY width: pyarrow (Spark-dump side) yields Decimal with the
    // declared scale's trailing zeros ("194.280000"), the oracle side a
    // float ("194.28") — identical values, different canonical strings,
    // hash FAIL (round-9 q140: all 3,600 rows red on int64-backed
    // decimal(18,6)). Sum in decimal internally, report as double/bigint.
    // Gate the CLASS of bug at the registry: build every query's frame
    // and walk its schema. Streaming-marked queries are excluded only
    // because building those frames RUNS a real StreamingQuery (~13 s
    // combined); their outputs are adjudicated in EventStreamSpec.
    val skip = SparkEntry.allPacks.flatMap(_.streamingQueries).toSet
    val offenders = SparkEntry.queries.filterNot(q => skip(q._1)).flatMap {
      case (name, fn) =>
        val decs = Verify.decimalColumns(fn(spark, dir).schema)
        if (decs.isEmpty) Nil else Seq(s"$name -> ${decs.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"queries dumping DecimalType columns: ${offenders.mkString("; ")}")
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
