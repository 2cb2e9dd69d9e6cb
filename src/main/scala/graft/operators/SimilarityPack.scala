package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.CosineSimilarity

/** Similarity-search pack over `embeddings` (64-dim float vectors).
  *
  * Two paths, same output shape:
  *  - brute-force top-k: exact, the correctness baseline. The query side is
  *    small (a handful of probe vectors) and broadcast, so the "cross" join
  *    is a broadcast nested loop over one scan of the corpus — no shuffle
  *    of the big side, embarrassingly parallel at 100 TB.
  *  - LSH-bucketed ANN: sign-bit signatures from seeded pseudo-random
  *    hyperplanes; candidates share a signature band, ranked by exact
  *    cosine within buckets. Recall vs brute force is asserted in
  *    SimilaritySpec.
  */
object SimilarityPack extends QueryPack {

  private def queriesSide(spark: SparkSession, dir: String, nQueries: Int) =
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** Exact top-k neighbors (cosine) for the probe vectors. */
  def bruteForceTopK(spark: SparkSession, dir: String,
                     nQueries: Int = 8, k: Int = 5): DataFrame = {
    CosineSimilarity.register(spark)
    val q = broadcast(queriesSide(spark, dir, nQueries))
    val corpus = t(spark, dir, "embeddings")
    val scored = corpus.join(q, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(CosineSimilarity.cosineFast(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .orderBy(col("q_id"), col("rk"))
  }

  /** Deterministic pseudo-random hyperplanes, generated ONCE driver-side
    * (seeded) and baked into the plan as literals. The first formulation
    * derived each coefficient from xxhash64(plane, dim) per ROW — millions
    * of redundant hash evaluations inside interpreted HOFs (6.5s on sf0.1);
    * literal planes cost nothing at runtime.
    */
  private def planes(nBits: Int, dims: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nBits)(Seq.fill(dims)(rnd.nextDouble() - 0.5))
  }

  /** nBits-bit sign signature of an embedding under the literal planes. */
  def lshSignature(emb: Column, nBits: Int): Column = {
    val p = planes(nBits, 64)
    array(p.map { plane =>
      (aggregate(
        zip_with(emb, typedlit(plane), (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v) > 0).cast("int")
    }: _*)
  }

  /** ANN top-k: candidates = corpus vectors sharing any 4-bit signature
    * band with the probe (32 bits, 8 bands), exact cosine re-rank within
    * candidates. One shuffle on band keys; corpus scanned once.
    *
    * Band geometry note: the testdata embeddings are near-orthogonal
    * (top-neighbor cosine ≈ 0.3-0.5), where sign-LSH is weakest — 8×4 bits
    * gives ≈0.66 expected recall at cos 0.3 while pruning ≈60% of the
    * corpus. On real clustered embeddings (near-dup cos ≥ 0.9) the same
    * code with wider bands prunes ≫99% at recall ≈1 — band/row counts are
    * the tuning surface, deliberately parameterized.
    */
  def annTopK(spark: SparkSession, dir: String,
              nQueries: Int = 8, k: Int = 5): DataFrame = {
    val nBits = 32
    val bands = 8
    val rows = nBits / bands
    def banded(df: DataFrame, idCol: String, embCol: String) =
      df.withColumn("lsh_sig", lshSignature(col(embCol), nBits)) // computed once
        .select(col(idCol), col(embCol),
          explode(array((0 until bands).map { b =>
            struct(lit(b).as("band"),
              concat_ws("", slice(col("lsh_sig"), b * rows + 1, rows)).as("sig"))
          }: _*)).as("bk"))
    val corpus = banded(t(spark, dir, "embeddings"), "vec_id", "embedding")
    val probes = banded(
      queriesSide(spark, dir, nQueries).withColumnRenamed("q_emb", "embedding"),
      "q_id", "embedding")
      .withColumnRenamed("embedding", "q_emb")
    val cand = corpus.as("c").join(broadcast(probes.as("p")),
        col("c.bk") === col("p.bk") && col("vec_id") =!= col("q_id"))
      .dropDuplicates("q_id", "vec_id")
      .select(col("q_id"), col("vec_id"),
        round(CosineSimilarity.cosineFast(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .orderBy(col("q_id"), col("rk"))
  }

  val queries = Map(
    "q70_ann_bruteforce_topk" -> ((s: SparkSession, d: String) => bruteForceTopK(s, d)),
    "q71_ann_lsh_topk" -> ((s: SparkSession, d: String) => annTopK(s, d)))

  val oracle = Map(
    "q70_ann_bruteforce_topk" ->
      """SELECT q_id, vec_id, cos, rk FROM (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
        |  FROM (
        |    SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |      round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                   CAST(c.embedding AS DOUBLE[])), 6) AS cos
        |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |    WHERE q.vec_id < 8) s) t
        |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin)
  // q71: no oracle — approximate; recall vs q70 asserted in SimilaritySpec.
}
