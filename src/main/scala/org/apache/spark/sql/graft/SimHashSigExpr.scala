package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native 32-bit SimHash kernel: normalize → whitespace tokens → one md5 per
 * token occurrence → ±1 votes per bit lane → sign bits, in one codegen'd
 * expression. Value-identical to both restatements in `graft.dedup.Dedup`
 * (`simHash32` HOF fold, `simHash32RelationalExploded` explode+agg) and to
 * the DuckDB oracle — equivalence-tested in DedupSpec.
 *
 * Same motivation as [[MinHashSig]]: the relational form pays an
 * O(tokens) explode through a 32-lane hash aggregate; this kernel keeps the
 * signature NARROW (scan-side map, no exchange), so the banded near-dup
 * pipeline's only wide op is the band-key self-join itself.
 */
case class SimHashSig(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(s: Any): Any =
    SimHashKernel.signature(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.SimHashKernel.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashKernel {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes as an unsigned 32-bit value — identical to
    * `conv(substring(md5(tok), 1, 8), 16, 10)`. */
  private def tokenHash(s: String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(s.getBytes(StandardCharsets.UTF_8))
    ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) | ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
  }

  def signature(text: UTF8String): Long = {
    // normalization mirrors Dedup.normalizeText exactly (see MinHashKernel)
    val replaced = text.toLowerCase.toString.replaceAll("\\s+", " ")
    var st = 0
    var en = replaced.length
    while (st < en && replaced.charAt(st) == ' ') st += 1
    while (en > st && replaced.charAt(en - 1) == ' ') en -= 1
    val toks = replaced.substring(st, en).split(" ", -1)
    val lanes = new Array[Int](32)
    var t = 0
    while (t < toks.length) {
      val hv = tokenHash(toks(t))
      var b = 0
      while (b < 32) {
        if ((hv & (1L << b)) != 0) lanes(b) += 1 else lanes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (lanes(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

object SimHashSigExpr {
  /** Idempotent per-session registration: `simhash_sig(text)`. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("simhash_sig")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[SimHashSig].getName, null, "simhash_sig",
          "32-bit SimHash over whitespace tokens", "", "", "", "hash_funcs", "4.0.0", "", "built-in"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "simhash_sig expects (text)")
          SimHashSig(children.head)
        })
    }
  }
}
