package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native sign-LSH signature: embedding → array<int> of nBits 0/1 values,
  * bit p = (dot(embedding, plane_p) > 0).
  *
  * The hyperplanes are seeded pseudo-random (driver/executor both derive
  * the identical matrix from (nBits, dims, seed) — no data shipped) and
  * cached per-JVM. Replaces the interpreted formulation that ran nBits
  * aggregate/zip_with higher-order functions per row (nBits array walks
  * with per-element lambda dispatch); this is one fused pass in generated
  * Java, the same fix CosineSimilarity/SimHash64/MinHashSig got.
  * Bit-identical to the HOF reference (index-order double accumulation) —
  * asserted in SimilaritySpec.
  */
case class HyperplaneSignature(child: Expression, nBits: Int, dims: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig needs array<float|double>, got ${dt.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSignature.compute(
      input.asInstanceOf[ArrayData], nBits, dims, seed, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSignature.compute($c, $nBits, $dims, ${seed}L, $elemIsFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  val fnName = "graft_hyperplane_sig"

  /** Deterministic plane matrix, flattened row-major (plane p at
    * [p*dims, (p+1)*dims)). Generation order matches the original
    * driver-side formulation (scala.util.Random(seed), nextDouble-0.5 per
    * coefficient, plane-major), so signatures are unchanged across the
    * HOF → native migration. Cached per (nBits, dims, seed) per JVM.
    */
  private val planeCache = new ConcurrentHashMap[(Int, Int, Long), Array[Double]]()

  def planesFlat(nBits: Int, dims: Int, seed: Long): Array[Double] =
    planeCache.computeIfAbsent((nBits, dims, seed), { key =>
      val (b, d, s) = key
      val rnd = new scala.util.Random(s)
      Array.fill(b * d)(rnd.nextDouble() - 0.5)
    })

  /** Shared kernel for eval and codegen: one pass per plane, index-order
    * double accumulation (bit-identical to the HOF aggregate/zip_with).
    */
  def compute(emb: ArrayData, nBits: Int, dims: Int, seed: Long,
              isFloat: Boolean): ArrayData = {
    val flat = planesFlat(nBits, dims, seed)
    val n = math.min(emb.numElements(), dims)
    val out = new Array[Any](nBits)
    var p = 0
    while (p < nBits) {
      val base = p * dims
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
        dot += x * flat(base + i)
        i += 1
      }
      out(p) = if (dot > 0.0) 1 else 0
      p += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => HyperplaneSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int],
        exprs(3).eval().asInstanceOf[Int].toLong), "scala_udf")

  /** Column builder (requires register(spark) once per session). */
  def signature(emb: Column, nBits: Int, dims: Int = 64, seed: Int = 42): Column =
    call_function(fnName, emb, lit(nBits), lit(dims), lit(seed))
}
