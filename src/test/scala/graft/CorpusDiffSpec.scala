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

  test("Good-Turing adjusted counts: definition and mass identity, exact") {
    import graft.textanalysis.TextAnalysis
    val docs = Seq(
      (1L, "alpha alpha alpha beta beta gamma"),
      (2L, "beta delta gamma epsilon zeta")).toDF("doc_id", "text")
    // counts: alpha 3, beta 3, gamma 2, delta 1, epsilon 1, zeta 1
    // spectrum: n_1=3, n_2=1, n_3=2
    val gt = TextAnalysis.goodTuringAdjusted(docs)
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(gt(1L) == ((3L, Some(2.0 * 1 / 3))))   // r*=2·n_2/n_1
    assert(gt(2L) == ((1L, Some(3.0 * 2 / 1))))   // r*=3·n_3/n_2
    assert(gt(3L) == ((2L, None)))                // n_4 = 0: tail undefined
    // identity: Σ r*·n_r over defined rows = N − n_1 (exact in doubles —
    // r*·n_r = (r+1)·n_{r+1}, an integer product far below 2^53)
    val lhs = gt.values.collect { case (n, Some(rs)) => rs * n }.sum
    assert(lhs == (11 - 3).toDouble)
  }
}
