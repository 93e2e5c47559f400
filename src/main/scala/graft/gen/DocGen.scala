package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model._

/**
 * Deterministic synthetic interleaved-documents generator (FIXTURES.md §1).
 *
 * Produces the driver-contract table shape
 * `(doc_id, spans: array<struct<kind,text,media_ref,offset>>)` plus the
 * derived `noisy_spans` (0.12/char channel — the analog of the reference's
 * parallel messy file, `/root/reference/src/corpus/make_messy_dataset.py:77-83`)
 * and `split` (mod-10 rule, `make_split_csv.py:23-32`: 9→validation, 0→test,
 * else train — 80/10/10).
 *
 * Everything is a pure function of (seed constants, doc index): two runs — or
 * a killed run plus its resume — produce byte-identical tables. Generation is
 * distributed (`spark.range(n).map`), no driver-side materialization, so the
 * same code scales to arbitrary row counts.
 */
object DocGen {

  /** Curated alphabet (the analog of good_chars.txt, README.md:52-55).
    * Lowercase ASCII + a few Serbian Cyrillic letters so code-point handling
    * is exercised end to end (SURVEY.md §7 hard-part 7). */
  val goodCharsStr: String = "abcdefghijklmnopqrstuvwxyzабвгдежзиј"
  val goodChars: Array[Int] = goodCharsStr.codePoints().toArray

  val LexiconSize = 4000

  /** Fixed deterministic lexicon: word i is a pure function of i. */
  lazy val lexicon: Array[String] = {
    val letters = goodChars
    Array.tabulate(LexiconSize) { i =>
      val rng = DetRng.forKey("lexicon", i.toLong)
      val len = 3 + rng.nextInt(8)
      val sb = new java.lang.StringBuilder(len)
      var k = 0
      while (k < len) { sb.appendCodePoint(letters(rng.nextInt(letters.length))); k += 1 }
      sb.toString
    }
  }

  /** Zipf-ish word pick: cubing the uniform skews mass to low indices so the
    * vocabulary has a realistic head/tail frequency profile. */
  private def pickWord(rng: DetRng): String = {
    val u = rng.nextDouble()
    lexicon((u * u * u * LexiconSize).toInt.min(LexiconSize - 1))
  }

  def sentence(rng: DetRng, nWords: Int): String =
    (0 until nWords).map(_ => pickWord(rng)).mkString(" ")

  val MediaFraction = 0.15

  /** Pathological long-doc knob: 1 doc in `PathologicalEvery` gets
    * `PathologicalSpanFactor`× the spans (skew tests, SURVEY.md §4/§7.6). */
  val PathologicalEvery      = 997
  val PathologicalSpanFactor = 60

  def pickSplit(ordinal1: Long): String = (ordinal1 % 10) match {
    case 9 => "validation"
    case 0 => "test"
    case _ => "train"
  }

  /** Build doc `i` (0-based) deterministically. */
  def makeDoc(i: Long, pathological: Boolean): NoisyDoc = {
    val docId = f"doc$i%09d"
    val rng = DetRng.forKey(docId, 0x646F63L)
    val base = 3 + rng.nextInt(6)
    val nSpans =
      if (pathological && i % PathologicalEvery == 0) base * PathologicalSpanFactor
      else base
    val spans = Vector.tabulate(nSpans) { off =>
      if (rng.nextDouble() < MediaFraction)
        Span(Span.KindMedia, "", f"media://${rng.nextLong()}%016x", off)
      else
        Span(Span.KindText, sentence(rng, 4 + rng.nextInt(9)), "", off)
    }
    val noisy = spans.map { s =>
      if (s.kind == Span.KindText)
        s.copy(text = NoiseChannel.mutilateSpan(docId, s.offset, s.text, goodChars))
      else s
    }
    NoisyDoc(docId, spans, noisy, pickSplit(i + 1))
  }

  /** Distributed generation of `n` docs. */
  def docs(spark: SparkSession, n: Long, pathological: Boolean = false): Dataset[NoisyDoc] = {
    import spark.implicits._
    spark.range(n).map(i => makeDoc(i, pathological))
  }

  /** Flattened (doc_id, offset, split, text_noisy, text_clean) pair view over
    * text spans only — the reference's CorrectorDataset analog. */
  def pairs(spark: SparkSession, n: Long, pathological: Boolean = false): Dataset[PairRow] = {
    import spark.implicits._
    docs(spark, n, pathological).flatMap { d =>
      d.spans.zip(d.noisy_spans).collect {
        case (clean, noisy) if clean.kind == Span.KindText =>
          PairRow(d.doc_id, clean.offset, d.split, noisy.text, clean.text)
      }
    }
  }
}
