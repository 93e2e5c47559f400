package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, DoubleType}

/**
 * Native cosine similarity over two `array<tinyint>` (int8-quantized)
 * vectors — the inner loop of SQ8 approximate ANN
 * ([[graft.similarity.Quantize]]). Kernel twin of `Quantize.sq8CosineHof`
 * (equivalence-tested in QuantizeSpec).
 *
 * The dot product and both norms accumulate in LONG — exact for any int8
 * vectors up to 2^47 dimensions (127² per element), so the only floating
 * point is the final `dot / sqrt(aa)·sqrt(bb)` — one division and two
 * correctly-rounded sqrts, bit-identical on any engine and partitioning.
 * Semantics mirror the double kernel: 0.0 when either norm is zero; null on
 * length mismatch or any null element.
 */
case class Sq8Cosine(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Kernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two sq8_cosine calls can land in one codegen scope; a
      // fixed local name would collide and force interpreted fallback.
      val r = ctx.freshName("r")
      s"""
         |Object $r = org.apache.spark.sql.graft.Sq8Kernel.cosine($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Sq8Kernel {
  /** Sum of squares in exact integer arithmetic, or null for a null
    * element (null poisoning, like the HOF form). */
  private def sumSq(a: ArrayData): java.lang.Long = {
    var s = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getByte(i).toLong
      s += x * x
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Same decision order as the double kernel: zero denominator wins even
    * when the dot would be null (length mismatch); null element → null. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = sumSq(a)
    val nb = sumSq(b)
    val denom: java.lang.Double =
      if (na == null || nb == null) null
      else java.lang.Double.valueOf(
        math.sqrt(na.longValue().toDouble) * math.sqrt(nb.longValue().toDouble))
    if (denom != null && denom.doubleValue() == 0.0) return java.lang.Double.valueOf(0.0)
    val n = a.numElements()
    if (b.numElements() != n || denom == null) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    java.lang.Double.valueOf(dot.toDouble / denom.doubleValue())
  }
}

object Sq8CosineExpr {
  /** Idempotent per-session registration: `sq8_cosine(a, b)`. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("sq8_cosine")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[Sq8Cosine].getName, null, "sq8_cosine",
          "cosine similarity of two int8-quantized vectors", "", "", "", "math_funcs", "4.0.0", "", "built-in"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "sq8_cosine expects 2 arguments")
          Sq8Cosine(children(0), children(1))
        })
    }
  }
}
