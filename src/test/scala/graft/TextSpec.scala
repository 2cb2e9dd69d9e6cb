package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MultimodalPack, TextPack}

class TextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("langId: crafted multilingual fixtures classify correctly") {
    import spark.implicits._
    val fixtures = Seq(
      ("the cat is on the mat and it is happy", "en"),
      ("el perro de la casa que corre por los campos", "es"),
      ("le chat est dans la maison pour les vacances", "fr"),
      ("der hund ist nicht in das haus und die katze", "de"),
      ("这 是 一个 中文 句子 测试", "zh"),
      ("это русское предложение для теста", "ru"),
      ("xyzzy plugh qwerty asdf", "und"))
      .toDF("text", "expected")
    val got = fixtures.select(col("expected"),
      TextPack.langId(col("text")).as("pred")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)}, predicted ${r.getString(1)}"))
  }

  test("langId is deterministic across runs") {
    val a = TextPack.langIdRollup(spark, dir).collect().toSeq
    val b = TextPack.langIdRollup(spark, dir).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("q76 oracle precondition: fixture text is pure ASCII at every test SF") {
    // the q76 DuckDB oracle iterates CODEPOINTS (ord per char) while the
    // Spark side sums UTF-8 BYTES — they agree iff every char is single-byte
    // ASCII. This pins that invariant for each testdata dir so a future
    // non-ASCII fixture fails HERE with a clear message, not as an opaque
    // oracle hash mismatch.
    import org.apache.spark.sql.functions.{length => strlen, octet_length}
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d, "documents.parquet").exists()).foreach { d =>
        val nonAscii = Tables.t(spark, d, "documents")
          .filter(strlen(col("text")) =!= octet_length(col("text"))).count()
        assert(nonAscii == 0,
          s"$d has $nonAscii non-ASCII documents — q76's oracle (codepoint " +
            "stats) no longer matches the Spark side (byte stats); derive the " +
            "oracle from the encoded blob before regenerating fixtures")
      }
  }

  test("media features: fake decode matches a local recompute") {
    val feats = MultimodalPack.mediaFeatures(spark, dir)
      .filter(col("media_id") < 3).collect()
    val docs = Tables.t(spark, dir, "documents")
      .filter(col("doc_id") < 3).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    feats.foreach { r =>
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      assert(r.getInt(1) == bytes.length)
      assert(math.abs(r.getDouble(2) - bytes.map(_ & 0xff).sum.toDouble / bytes.length) < 1e-9)
      assert(r.getInt(4) == (bytes(0) & 0xff))
    }
  }
}
