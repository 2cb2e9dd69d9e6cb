package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Drift pins for the DETERMINISTIC no-oracle queries. q63 (heuristic
  * lang-ID) and q116 (seeded k-means semantic dedup) have no DuckDB oracle
  * (the heuristic/quantizer isn't SQL-expressible), so the driver's gate
  * records them rows-only — a silent behavior change could hide behind
  * "no_oracle". Both are bit-deterministic given the data (seeded planes,
  * deterministic seeds/iteration counts, no RNG), so their full sf0.001
  * output is pinned as a golden snapshot here: any code change that moves
  * a single row must consciously regenerate the golden (see
  * tools/check_oracle.py + the dump recipe in the resource header commit).
  */
class GoldenDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  private def golden(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name.csv")
    assert(in != null, s"missing golden resource /golden/$name.csv")
    try Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  // shared with the GoldenDump regeneration main — same format both ways
  private def asCsv(name: String): Seq[String] = GoldenCsv.asCsv(name)

  test("q63 lang-ID rollup matches its pinned golden snapshot") {
    assert(asCsv("q63_langid_rollup") == golden("q63_langid_rollup"))
  }

  test("q116 semantic dedup matches its pinned golden snapshot") {
    assert(asCsv("q116_semantic_dedup") == golden("q116_semantic_dedup"))
  }

  // The seeded-LSH family is likewise bit-deterministic (fixed hash seeds,
  // fixed hyperplanes/permutations, no RNG) but only recall/error-BOUNDED
  // against its exact twins — drift inside the bound could pass silently.
  // Full sf0.001 snapshots close that gap.

  test("q67 minhash-LSH dedup matches its pinned golden snapshot") {
    assert(asCsv("q67_dedup_minhash_lsh") == golden("q67_dedup_minhash_lsh"))
  }

  test("q68 simhash dedup matches its pinned golden snapshot") {
    assert(asCsv("q68_dedup_simhash") == golden("q68_dedup_simhash"))
  }

  test("q71 LSH ANN top-k matches its pinned golden snapshot") {
    assert(asCsv("q71_ann_lsh_topk") == golden("q71_ann_lsh_topk"))
  }

  test("q73 embedding-LSH dedup matches its pinned golden snapshot") {
    assert(asCsv("q73_dedup_embedding_lsh") == golden("q73_dedup_embedding_lsh"))
  }

  test("q124 LSH keep-list matches its pinned golden snapshot") {
    assert(asCsv("q124_dedup_keeplist_lsh") == golden("q124_dedup_keeplist_lsh"))
  }

  // The HLL sketch queries are likewise deterministic: register-wise max
  // makes both the HLL++ estimate (q34) and the DataSketches union (q112)
  // order-independent functions of the input multiset — only error-BOUNDED
  // vs exact counts in AggSpec, so estimator drift could pass silently.

  test("q34 approx distinct matches its pinned golden snapshot") {
    assert(asCsv("q34_approx_distinct") == golden("q34_approx_distinct"))
  }

  test("q112 HLL sketch union matches its pinned golden snapshot") {
    assert(asCsv("q112_hll_sketch_union") == golden("q112_hll_sketch_union"))
  }

  // Round 9 closes the last three unpinned no-oracle rows, so ALL 12
  // members of AggSpec's allowed-no-oracle set are now drift-pinned:
  //  - q72's quantizer trains on a driver-local 256-vector sample in
  //    vec_id order — deterministic fold, pin-able as-is;
  //  - q106's cluster-wide k-means folds its update sums in fixed
  //    (partition, vec_id) order and merges partials in partition-index
  //    order (see kmeansTrain), so training is bit-deterministic —
  //    verified bit-identical between local[4] and local[32] Verify runs
  //    at sf0.01 (round 9), so the pin holds at ANY core count;
  //  - q89's approx_percentile sketch holds accuracy=10000 entries, and
  //    sf0.001's lineitem (6 000 rows) fits entirely — no lossy
  //    compression ever triggers, so the sketch is an exact, merge-order-
  //    independent function of the multiset AT THIS SF (at sf0.01+ it is
  //    genuinely approximate, which is exactly what the pin must not
  //    constrain).

  test("q72 sampled-IVF top-k matches its pinned golden snapshot") {
    assert(asCsv("q72_ann_ivf_topk") == golden("q72_ann_ivf_topk"))
  }

  test("q106 trained-IVF top-k matches its pinned golden snapshot") {
    assert(asCsv("q106_ann_ivf_trained_topk") == golden("q106_ann_ivf_trained_topk"))
  }

  test("q89 approx percentiles match their pinned golden snapshot") {
    assert(asCsv("q89_approx_percentiles") == golden("q89_approx_percentiles"))
  }
}
