package graft

import org.apache.spark.sql.functions._
import graft.text.TextFunctions
import graft.text.TextFunctions.{normalizeWs, tokenize, alphabetString, chunks, mapChunked}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("set ops: char subset validation and whitespace indices (T1/T2)") {
    import spark.implicits._
    val all = Seq("a", "b", "c", " ").toDF("char")
    val good = Seq("a", " ").toDF("char")
    assert(graft.text.TextFunctions.charSubsetViolations(good, all).count() == 0)
    val bad = Seq("a", "z").toDF("char")
    assert(graft.text.TextFunctions.charSubsetViolations(bad, all)
      .as[String].collect().toSeq == Seq("z"))
    assert(graft.text.TextFunctions.whitespaceIndices("ab c\td") == Seq(2, 4))
  }

  test("normalizeWs collapses runs of any whitespace and trims (F5)") {
    val df = Seq("  a\t\tb \n c ", "x", "", "   ").toDF("t")
    val got = df.select(normalizeWs($"t")).as[String].collect().toSeq
    assert(got == Seq("a b c", "x", "", ""))
  }

  test("tokenize matches Python strip().split() incl. empty string (F6)") {
    val df = Seq("  a  b ", "", "   ", "one").toDF("t")
    val got = df.select(tokenize($"t")).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a", "b"), Seq(), Seq(), Seq("one")))
  }

  test("encode/decode round-trip with unk handling (F8/F9)") {
    val alphabet = "abcд"
    val df = Seq("abд", "axb", "").toDF("t")
    val enc = df.select(TextFunctions.encode($"t", alphabet).as("e")).as[Seq[Long]].collect().toSeq
    assert(enc == Seq(Seq(0L, 1L, 3L), Seq(0L, 4L, 1L), Seq())) // x → unk=4
    val dec = df.select(TextFunctions.decode(TextFunctions.encode($"t", alphabet), alphabet)).as[String].collect().toSeq
    assert(dec == Seq("abд", "a�b", "")) // unk decodes to U+FFFD like the reference
  }

  test("decode stops at the first INT_EMPTY like the reference (F9)") {
    val alphabet = "abcд"
    // reference semantics (`neural_corrector.py:113-114`): everything after
    // the first INT_EMPTY (-1) is padding, even valid indices
    val df = Seq(
      Seq(0L, 1L, -1L, 2L, 3L),   // "ab", padding ignored
      Seq(-1L, 0L, 1L),           // leading sentinel → ""
      Seq(0L, 99L, -1L, -1L),     // unk before the sentinel still decodes to �
      Seq(0L, 1L, 2L, 3L)         // no sentinel → full decode
    ).toDF("e")
    val got = df.select(TextFunctions.decode($"e", alphabet)).as[String].collect().toSeq
    assert(got == Seq("ab", "", "a�", "abcд"))
  }

  test("native alphabet codec ≡ HOF forms on random inputs, and stays codegen'd") {
    val alphabet = "abcд0 "
    val r = new scala.util.Random(41)
    val glyphs = "abcдxy0 9з😀"
    val texts = (0 until 200).map(_ =>
      (0 until r.nextInt(40)).map(_ => glyphs(r.nextInt(glyphs.length))).mkString) :+ "" :+ "abд"
    val df = texts.toDF("t")
    // encode equivalence
    val hofE = df.select(TextFunctions.encode($"t", alphabet)).as[Seq[Long]].collect().toSeq
    val natE = df.select(TextFunctions.encodeNative(spark, $"t", alphabet)).as[Seq[Long]].collect().toSeq
    assert(natE == hofE)
    // decode equivalence on arbitrary index arrays incl. sentinel, unk,
    // out-of-range and the try_element_at negative-index semantics
    // null slots included: try_element_at(alpha, null) → '�', and a null is
    // NOT the stop sentinel (array_position skips nulls) — the kernel must
    // not unbox it to 0L (= the first alphabet char)
    val arrs: Seq[Seq[Option[Long]]] = (0 until 200).map(_ =>
      Seq.fill(r.nextInt(12))(
        if (r.nextInt(10) == 0) None else Some(r.nextInt(20).toLong - 8L))) :+
      Seq.empty[Option[Long]] :+ Seq(None, Some(1L), Some(-1L), Some(2L)) :+ Seq[Option[Long]](None) :+
      // int-overflow indices: 2^32+1 would truncate to 2 (or throw under
      // ANSI) without the range guard — must decode to '�' in both forms
      Seq(Some(0L), Some(1L + (1L << 32)), Some(Long.MaxValue), Some(Long.MinValue), Some(2L))
    val adf = arrs.toDF("e")
    val hofD = adf.select(TextFunctions.decode($"e", alphabet)).as[String].collect().toSeq
    val natD = adf.select(TextFunctions.decodeNative(spark, $"e", alphabet)).as[String].collect().toSeq
    assert(natD == hofD)
    // full round-trip via the native path matches the HOF path
    val hofRt = df.select(TextFunctions.decode(TextFunctions.encode($"t", alphabet), alphabet))
      .as[String].collect().toSeq
    val natRt = df.select(TextFunctions.decodeNative(spark,
      TextFunctions.encodeNative(spark, $"t", alphabet), alphabet)).as[String].collect().toSeq
    assert(natRt == hofRt)
    // the native plan is a codegen'd project — no interpreted HOF nodes
    // (a range-backed frame: a local Seq would fold to LocalTableScan)
    val rdf = spark.range(8).select(concat(lit("abд"), $"id".cast("string")).as("t"))
    val plan = rdf.select(TextFunctions.decodeNative(spark,
      TextFunctions.encodeNative(spark, $"t", alphabet), alphabet))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"project not inside whole-stage codegen:\n$plan")
    assert(!plan.contains("transform("), s"native path still uses HOF transform:\n$plan")
  }

  test("alphabet aggregation: distinct chars sorted (A1/S7/O1)") {
    val df = Seq("bca", "ab", "ддa").toDF("text")
    assert(alphabetString(df, "text") == "abcд")
  }

  test("chunks splits by fixed code-point windows (F11)") {
    val df = Seq("abcdefg", "ab", "").toDF("t")
    val got = df.select(chunks($"t", 3).as("c")).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("abc", "def", "g"), Seq("ab"), Seq("")))
  }

  test("mapChunked: chunk → kernel → ordered re-concat is identity for identity kernel (W4)") {
    val df = (0 until 50).map(i => (s"id$i", ("x" * (i * 7 + 1)).take(200) + i)).toDF("id", "t")
    val out = mapChunked(df, Seq("id"), "t", 16, identity).orderBy($"id")
    val orig = df.orderBy($"id")
    assert(out.as[(String, String)].collect().toSeq.sortBy(_._1) ==
      orig.as[(String, String)].collect().toSeq.sortBy(_._1))
  }

  test("mapChunked applies kernel per chunk in order (W4)") {
    val df = Seq(("a", "abcdef")).toDF("id", "t")
    val out = mapChunked(df, Seq("id"), "t", 2, upper).as[(String, String)].head()
    assert(out == (("a", "ABCDEF")))
  }
}
