package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native word-shingle Jaccard similarity of two texts — kernel twin of
 * `Dedup.ngramJaccardPairs`' column pipeline (normalize → tokens → distinct
 * k-shingles → |A∩B| / |A∪B|), which evaluates interpreted HOF
 * shingling + `array_intersect` per pair. Same semantics, one kernel call:
 *  - normalization identical to [[MinHashKernel]] (Spark `lower`, `\s+`
 *    collapse, space trim);
 *  - a doc with ≤ k tokens contributes its single full-join shingle, so two
 *    empty texts are both `{""}` → jaccard 1.0 (matching the column form);
 *  - distinct shingles (set semantics), double division.
 */
case class NgramJaccard(left: Expression, right: Expression, shingleK: Int)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramJaccardKernel.jaccard(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.NgramJaccardKernel.jaccard($a, $b, $shingleK)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramJaccardKernel {
  private def shingleSet(text: UTF8String, k: Int): java.util.HashSet[String] = {
    val replaced = text.toLowerCase.toString.replaceAll("\\s+", " ")
    var st = 0
    var en = replaced.length
    while (st < en && replaced.charAt(st) == ' ') st += 1
    while (en > st && replaced.charAt(en - 1) == ' ') en -= 1
    val normalized = replaced.substring(st, en)
    val toks = normalized.split(" ", -1)
    val set = new java.util.HashSet[String]()
    if (toks.length <= k) set.add(normalized)
    else {
      val sb = new java.lang.StringBuilder
      var s = 0
      while (s + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(s + j))
          j += 1
        }
        set.add(sb.toString)
        s += 1
      }
    }
    set
  }

  def jaccard(a: UTF8String, b: UTF8String, k: Int): Double = {
    val sa = shingleSet(a, k)
    val sb = shingleSet(b, k)
    var ni = 0
    val it = (if (sa.size() <= sb.size()) sa else sb).iterator()
    val other = if (sa.size() <= sb.size()) sb else sa
    while (it.hasNext) if (other.contains(it.next())) ni += 1
    ni.toDouble / (sa.size() + sb.size() - ni)
  }
}

object NgramJaccardExpr {
  /** Idempotent per-session registration: `ngram_jaccard(a, b, k)`. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("ngram_jaccard")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[NgramJaccard].getName, null, "ngram_jaccard",
          "word-shingle Jaccard similarity of two texts", "", "", "", "string_funcs", "4.0.0", "", "built-in"),
        (children: Seq[Expression]) => {
          require(children.length == 3, "ngram_jaccard expects (a, b, shingleK)")
          val k = children(2) match {
            case Literal(v: Int, IntegerType) => v
            case _ => throw new IllegalArgumentException(
              "ngram_jaccard expects a foldable integer literal shingleK")
          }
          NgramJaccard(children(0), children(1), k)
        })
    }
  }
}
