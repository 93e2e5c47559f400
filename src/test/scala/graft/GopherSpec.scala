package graft

import org.apache.spark.sql.functions._
import graft.gen.DetRng
import graft.textanalysis.TextAnalysis

class GopherSpec extends SparkSpec {
  import spark.implicits._

  /** Mixed corpus exercising every rule: multi-line, bullets, ellipses,
    * symbols, unicode, tabs, gibberish, empty. */
  private lazy val docs = {
    val rng = DetRng.forKey("gopher", 3L)
    val words = Array("the", "be", "to", "of", "and", "that", "have", "with",
      "table", "scan", "row", "merge", "línea", "naïve", "12345", "#tag", "a")
    val gen = (0 until 40).map { i =>
      val n = 5 + rng.nextInt(120)
      (i.toLong, (0 until n).map(_ => words(rng.nextInt(words.length))).mkString(" "))
    }
    val crafted = Seq(
      100L -> "- one\n- two\n- three\n* four\n• five\n\t‣ six",           // bullet-heavy
      101L -> "first part...\nsecond part…  \nthird ends here",           // ellipsis lines
      102L -> "### ## # ...... … lots of symbols here",                   // symbol-heavy
      103L -> "12 34 56 78 90 11 22",                                     // no alpha words
      104L -> "",                                                         // empty
      105L -> "   \t  ",                                                  // whitespace only
      106L -> ("the quick brown fox jumps with energy and that " * 10)    // healthy long doc
    )
    (gen ++ crafted).toDF("doc_id", "text").cache()
  }

  test("native gopher_signals kernel is bit-identical to the Column witness") {
    val rows = docs.select(
      TextAnalysis.gopherSignals(spark, $"text").as("k"),
      TextAnalysis.gopherSignalsColumns($"text").as("w")).collect()
    rows.foreach { r =>
      val k = r.getSeq[Double](0)
      val w = r.getSeq[Double](1)
      assert(k.length == 8 && w.length == 8)
      k.zip(w).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b),
          s"signal $i: kernel $a != witness $b")
      }
    }
  }

  test("rule semantics on crafted documents") {
    val sig = docs.filter($"doc_id" >= 100)
      .select($"doc_id", TextAnalysis.gopherSignals(spark, $"text").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // bullet-heavy: all 6 lines are bullets
    assert(sig(100L)(4) == 1.0)
    // ellipsis: 2 of 3 lines end with .../… (trailing spaces ignored)
    assert(math.abs(sig(101L)(5) - 2.0 / 3.0) < 1e-12)
    // symbol-heavy: '#'×6 + '…'×1 + non-overlapping '...'×2 = 9 over 9 words
    assert(sig(102L)(2) == 1.0)
    // digits only: alpha-word fraction 0
    assert(sig(103L)(3) == 0.0)
    // empty and whitespace-only: zero words, one line, zero fractions
    Seq(104L, 105L).foreach { id =>
      assert(sig(id)(0) == 0.0 && sig(id)(1) == 0.0 && sig(id)(3) == 0.0)
    }
    // healthy doc: 90 words, all alpha, stop hits cover the/with/and/that
    assert(sig(106L)(0) == 90.0 && sig(106L)(3) == 1.0 && sig(106L)(6) == 4.0)
  }

  test("gopherKeep: each crafted failure mode is rejected, healthy doc kept") {
    val kept = docs.select($"doc_id",
        TextAnalysis.gopherKeep(
          TextAnalysis.gopherSignals(spark, $"text"), minWords = 5).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept(106L), "healthy doc must pass")
    assert(!kept(100L), "bullet-heavy must fail the 0.9 bullet-line rule")
    assert(!kept(101L), "ellipsis lines (2/3 > 0.3) must fail")
    assert(!kept(102L), "symbol ratio > 0.1 must fail")
    assert(!kept(103L), "digit-only words fail the 0.8 alpha-word rule")
    assert(!kept(104L) && !kept(105L), "empty docs fail the word-count floor")
  }

  test("null text: kernel null-propagates; pipeline gates coalesce first") {
    val out = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(TextAnalysis.gopherSignals(spark, $"text").as("g")).collect()
    assert(out(0).isNullAt(0))
    val coalesced = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(TextAnalysis.gopherSignals(spark, coalesce($"text", lit(""))).as("g"))
      .collect()
    assert(coalesced(0).getSeq[Double](0)(0) == 0.0)
  }
}
