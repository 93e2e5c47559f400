package org.apache.spark.sql.graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native random-hyperplane LSH band keys — kernel twin of
 * `Similarity.lshBandKeys`: project the vector on `nBands × bitsPerBand`
 * deterministic pseudo-hyperplanes (`Similarity.planeValue`, cached per
 * (planes, dim)), take sign bits, emit one `b<band>:<bits>` key per band.
 *
 * The Column form evaluates an interpreted `aggregate(zip_with(...))` fold
 * per plane per row — nPlanes × dim lambda calls for EVERY corpus row, the
 * scan-side cost of the LSH ANN and approximate near-dup paths. Semantics
 * replicated exactly (equivalence-tested): left-to-right summation,
 * zip_with padding to max(len, dim) with null→0 contributions (`coalesce`),
 * `proj >= 0` sign rule (NaN → 0 bit).
 */
case class LshBandKeys(child: Expression, nBands: Int, bitsPerBand: Int, dim: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override def nullSafeEval(v: Any): Any =
    LshBandKernel.bandKeys(v.asInstanceOf[ArrayData], nBands, bitsPerBand, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.LshBandKernel.bandKeys($c, $nBands, $bitsPerBand, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBandKernel {
  // (nPlanes, dim) come from plan literals — a handful per workload; the cap
  // bounds the executor-global map against hostile many-config plans (past
  // it, plane tables are derived per call — correct, just uncached)
  private val planeCache = new ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private val CacheCap = 64
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    def build = Array.tabulate(nPlanes, dim)((pl, i) => graft.similarity.Similarity.planeValue(pl, i))
    val key = (nPlanes, dim)
    val hit = planeCache.get(key)
    if (hit != null) hit
    else if (planeCache.size < CacheCap) planeCache.computeIfAbsent(key, _ => build)
    else build
  }

  def bandKeys(vec: ArrayData, nBands: Int, bitsPerBand: Int, dim: Int): GenericArrayData = {
    val nPlanes = nBands * bitsPerBand
    val w = planes(nPlanes, dim)
    val n = vec.numElements()
    val lim = math.min(n, dim) // beyond either length the padded product is 0
    val bits = new Array[Boolean](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val wp = w(p)
      var s = 0.0
      var i = 0
      while (i < lim) {
        if (!vec.isNullAt(i)) s += vec.getDouble(i) * wp(i)
        i += 1
      }
      bits(p) = s >= 0.0 // NaN → false, like the `when(proj >= 0.0, 1)` form
      p += 1
    }
    val keys = new Array[AnyRef](nBands)
    val sb = new java.lang.StringBuilder
    var b = 0
    while (b < nBands) {
      sb.setLength(0)
      sb.append('b').append(b).append(':')
      var k = 0
      while (k < bitsPerBand) {
        sb.append(if (bits(b * bitsPerBand + k)) '1' else '0')
        k += 1
      }
      keys(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(keys)
  }
}

object LshBandKeysExpr {
  private def intLit(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      "lsh_band_keys expects foldable integer literals for nBands/bitsPerBand/dim")
  }

  /** Idempotent per-session registration: `lsh_band_keys(vec, nBands, bitsPerBand, dim)`. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("lsh_band_keys")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[LshBandKeys].getName, null, "lsh_band_keys",
          "random-hyperplane LSH band keys of a vector", "", "", "", "hash_funcs", "4.0.0", "", "built-in"),
        (children: Seq[Expression]) => {
          require(children.length == 4, "lsh_band_keys expects (vec, nBands, bitsPerBand, dim)")
          LshBandKeys(children(0), intLit(children(1)), intLit(children(2)), intLit(children(3)))
        })
    }
  }
}
