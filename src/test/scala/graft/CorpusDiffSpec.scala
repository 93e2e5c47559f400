package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.CorpusDiff

class CorpusDiffSpec extends AnyFunSuite {
  val spark = SparkSpec.spark
  import spark.implicits._

  test("verdicts: added/removed/changed/unchanged; whitespace drift is not a change") {
    val old = Seq(
      ("a", "the first document"),
      ("b", "the second document"),
      ("c", "the third document"),
      ("d", "the fourth document")).toDF("doc_id", "text")
    val neu = Seq(
      ("a", "the first document"),           // identical
      ("b", "  The SECOND   document "),     // normalized-equal: unchanged
      ("c", "the third document, edited"),   // changed
      ("e", "a brand new document")          // added; d removed
    ).toDF("doc_id", "text")
    val got = CorpusDiff.diff(old, neu).as[(String, String)].collect().toMap
    assert(got == Map("a" -> "unchanged", "b" -> "unchanged",
      "c" -> "changed", "d" -> "removed", "e" -> "added"))
    val sum = CorpusDiff.diffSummary(old, neu).as[(String, Long)].collect().toMap
    assert(sum == Map("unchanged" -> 2L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
    // identical snapshots: everything unchanged
    val same = CorpusDiff.diffSummary(old, old).as[(String, Long)].collect().toMap
    assert(same == Map("unchanged" -> 4L))
  }

  test("token frequency spectrum: counts-of-counts, mass conservation") {
    import graft.textanalysis.TextAnalysis
    val docs = Seq(
      (1L, "alpha alpha alpha beta beta gamma"),
      (2L, "beta delta  GAMMA")).toDF("doc_id", "text")
    // counts: alpha 3, beta 3, gamma 2, delta 1
    val got = TextAnalysis.tokenFrequencySpectrum(docs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 2L, 2L -> 1L, 1L -> 1L))
    // Σ freq·n_types == total token count
    assert(got.map { case (f, n) => f * n }.sum == 9L)
  }
}
