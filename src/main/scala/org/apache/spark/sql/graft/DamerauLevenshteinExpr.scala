package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.DamerauLevenshtein

/**
 * Native Catalyst expression for Damerau-Levenshtein distance — the U1
 * upgrade path of SURVEY.md §2.10: Spark's built-in `levenshtein` has no
 * transposition, so reference CER semantics need a custom kernel; as an
 * `Expression` with real `doGenCode` it stays inside whole-stage codegen
 * (a scala UDF would break the codegen span and pay serde per row).
 *
 * Lives under `org.apache.spark.sql.graft` because the input-type contract
 * (`AbstractDataType`) is `private[sql]` — the standard placement for
 * third-party Catalyst expressions.
 *
 * `variant`: 0 = banded OSA (reference semantics, `edit_distance.py:61-123`),
 * 1 = full OSA, 2 = unrestricted/true DL (matches DuckDB
 * `damerau_levenshtein`, used by oracle-checked queries).
 */
case class DamerauLevenshteinExpr(left: Expression, right: Expression, variant: Int)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = variant match {
    case 0 => "dl_distance"
    case 1 => "dl_distance_full"
    case _ => "dl_distance_true"
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshteinExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], variant)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.DamerauLevenshteinExpr.compute($a, $b, $variant)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshteinExpr {
  /** Static kernel entry shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String, variant: Int): Int = variant match {
    case 0 => DamerauLevenshtein.distanceBanded(a.toString, b.toString)
    case 1 => DamerauLevenshtein.distance(a.toString, b.toString)
    case _ => DamerauLevenshtein.distanceUnrestricted(a.toString, b.toString)
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DamerauLevenshteinExpr].getName, null, name, usage,
      "", "", "", "string_funcs", "4.0.0", "", "built-in")

  private[graft] val functions: Seq[(String, String, Int)] = Seq(
    ("dl_distance", "banded restricted (OSA) Damerau-Levenshtein — reference semantics", 0),
    ("dl_distance_full", "full-matrix restricted (OSA) Damerau-Levenshtein", 1),
    ("dl_distance_true", "unrestricted Damerau-Levenshtein (matches DuckDB)", 2))

  /** Idempotent per-session registration (usable without extensions config).
    * Skips names already present — re-registering is a no-op, not a WARN. */
  def register(spark: SparkSession): Unit = functions.foreach { case (name, usage, v) =>
    val id = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id, info(name, usage),
        (children: Seq[Expression]) => {
          require(children.length == 2, s"$name expects 2 arguments")
          DamerauLevenshteinExpr(children(0), children(1), v)
        })
    }
  }
}

/** `SparkSessionExtensions` injector:
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    DamerauLevenshteinExpr.functions.foreach { case (name, _, v) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[DamerauLevenshteinExpr].getName, name),
        (children: Seq[Expression]) => {
          require(children.length == 2, s"$name expects 2 arguments")
          DamerauLevenshteinExpr(children(0), children(1), v)
        }))
    }
    ext.injectFunction((FunctionIdentifier("dl_distance_within"),
      new ExpressionInfo(classOf[DlWithinExpr].getName, "dl_distance_within"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "dl_distance_within expects 3 arguments")
        DlWithinExpr(children(0), children(1), children(2))
      }))
    ext.injectOptimizerRule(_ => BandedDistanceRewrite)
  }
}
