package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.SpanCorruption

class SpanCorruptionSpec extends AnyFunSuite {
  val spark = SparkSpec.spark
  import spark.implicits._

  private val rng = new graft.gen.DetRng(61L)
  private val docs = (0 until 40).map(i =>
    (i.toLong, graft.gen.DocGen.sentence(rng, 20 + (i % 15)))).toDF("doc_id", "text")

  private val sentinel = "<extra_id_(\\d+)>".r

  /** Splice each target span back over its input sentinel — must rebuild
    * the original normalized token stream exactly (the T5 invariant). */
  private def splice(input: String, target: String): Seq[String] = {
    // parse target into k -> span tokens (closing sentinel ends the list)
    val parts = target.split(" ").toSeq
    val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
    var cur = -1
    parts.foreach {
      case s @ sentinel(k) => cur = k.toInt; spans(cur) = Vector.empty
      case t if cur >= 0   => spans(cur) = spans(cur) :+ t
      case t               => fail(s"target token before first sentinel: $t")
    }
    input.split(" ").toSeq.flatMap {
      case s @ sentinel(k) => spans(k.toInt)
      case t               => Seq(t)
    }
  }

  test("splice invariant: input sentinels + target spans rebuild every doc exactly") {
    val out = SpanCorruption.corrupt(docs, pStart = 0.08, maxLen = 4)
      .as[(Long, String, String)].collect()
    assert(out.length == 40)
    val original = docs.select($"doc_id",
        concat_ws(" ", filter(graft.dedup.Dedup.tokens($"text"), t => length(t) > 0)))
      .as[(Long, String)].collect().toMap
    var maskedTotal = 0; var tokensTotal = 0
    out.foreach { case (id, input, target) =>
      val rebuilt = splice(input, target)
      assert(rebuilt.mkString(" ") == original(id), s"doc $id splice mismatch")
      // accounting for the mask-rate check below
      val spanTokens = target.split(" ").count(t => sentinel.findFirstIn(t).isEmpty)
      maskedTotal += spanTokens
      tokensTotal += original(id).split(" ").length
      // target ends with the closing sentinel, numbered = run count
      val ks = sentinel.findAllMatchIn(input).map(_.group(1).toInt).toSeq
      assert(ks == ks.indices.toSeq, s"doc $id input sentinels not sequential: $ks")
      assert(target.split(" ").last == s"<extra_id_${ks.length}>", s"doc $id closing sentinel")
    }
    // expected mask rate ~ pStart*(maxLen+1)/2 = 0.20; allow a wide band
    val rate = maskedTotal.toDouble / tokensTotal
    assert(rate > 0.08 && rate < 0.35, s"mask rate $rate out of band")
  }

  test("deterministic across partitionings; unmasked and empty docs degrade cleanly") {
    val a = SpanCorruption.corrupt(docs.repartition(7), pStart = 0.08, maxLen = 4)
      .as[(Long, String, String)].collect().sortBy(_._1)
    val b = SpanCorruption.corrupt(docs.repartition(3), pStart = 0.08, maxLen = 4)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // empty doc: empty input, closing sentinel alone
    val e = SpanCorruption.corrupt(Seq((99L, "")).toDF("doc_id", "text"))
      .as[(Long, String, String)].head()
    assert(e == ((99L, "", "<extra_id_0>")))
    // a doc whose gates fire nowhere (tiny pStart) passes through unmasked
    val un = SpanCorruption.corrupt(Seq((7L, "alpha beta gamma")).toDF("doc_id", "text"),
        pStart = 0.0001)
      .as[(Long, String, String)].head()
    assert(un._2 == "alpha beta gamma" && un._3 == "<extra_id_0>")
  }

  test("span_corrupt kernel ≡ relational islands pipeline (params × fixtures)") {
    // edge docs: empty, whitespace, single token, uppercase/whitespace runs,
    // unicode, plus the generator corpus — across pStart/maxLen settings,
    // including maxLen 1 (single-token spans) and a high pStart (dense,
    // overlapping spans that exercise run merging and end clipping)
    val edge = docs.unionByName(Seq(
      (900L, ""), (901L, "   "), (902L, "one"),
      (903L, "\tTAB  and\n\nNEWLINES  here maybe more tokens"),
      (904L, "ЖУРНАЛ Русский Текст С Кириллицей опять Кириллицей"),
      (905L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text"))
    for ((p, ml) <- Seq((0.08, 4), (0.3, 1), (0.5, 6), (0.02, 3))) {
      val kernel = SpanCorruption.corrupt(edge, p, ml)
        .as[(Long, String, String)].collect().sortBy(_._1)
      val rel = SpanCorruption.corruptRelational(edge, p, ml)
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(kernel.toSeq == rel.toSeq, s"pStart=$p maxLen=$ml")
    }
  }
}
