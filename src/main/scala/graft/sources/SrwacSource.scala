package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * srWaC-style vertical-token corpus source (SURVEY.md §2.1 S1, §2.5 W2).
 *
 * Format (reference `/root/reference/src/corpus/serbian/srwac.py:6-49`):
 * token-per-line files where `<s>`/`</s>` bracket sentences, a token line has
 * 4 whitespace-separated fields (the surface form first —
 * `TOKEN_RE = (\S+)(?:\s+\S+){3}`, fullmatch), `<g/>` means "join the next
 * token to the previous without a space", malformed in-sentence lines are
 * skipped with a warning count.
 *
 * Spark mapping: `spark.read.option("wholetext", true)` gives one row per
 * file; the stateful line fold runs per file inside `flatMap` — per-file
 * parallelism, the same unit of work as the reference's file loop. (For
 * corpora with single files too big for one task, the format would need a
 * splittable source; srWaC-class corpora ship as many moderate files, so
 * file-granular tasks are the right trade and keep the fold trivially
 * correct.) Files sort by name (reference :21) and sentences are numbered
 * per file; the global ordinal (W1) is a one-time window over (file, idx).
 */
object SrwacSource {

  final case class Sentence(file: String, idx: Long, tokens: Seq[String])

  val SentenceOpen = "<s>"
  val SentenceClose = "</s>"
  val NoSpaceTag = "<g/>"
  private val TokenRe = "^(\\S+)(?:\\s+\\S+){3}$".r

  /** Stateful per-file parse: lines → sentences of tokens (joiner tag kept,
    * exactly like the reference which resolves it later in W2). */
  def parseLines(lines: Iterator[String]): Iterator[Seq[String]] = new Iterator[Seq[String]] {
    private var nextSentence: Seq[String] = _
    private def advance(): Unit = {
      nextSentence = null
      var inSentence = false
      val buf = Vector.newBuilder[String]
      while (nextSentence == null && lines.hasNext) {
        val line = lines.next().trim
        if (line == SentenceOpen) { inSentence = true; buf.clear() }
        else if (line == SentenceClose) { if (inSentence) { inSentence = false; nextSentence = buf.result() } }
        else if (inSentence) {
          if (line == NoSpaceTag) buf += NoSpaceTag
          else TokenRe.findFirstMatchIn(line) match {
            case Some(m) if m.matched == line => buf += m.group(1)
            case _ => () // malformed in-sentence line: skipped (reference warns)
          }
        }
      }
    }
    advance()
    def hasNext: Boolean = nextSentence != null
    def next(): Seq[String] = { val s = nextSentence; advance(); s }
  }

  /** W2 — ordered token reassembly with the `<g/>` joiner
    * (`to_plain_text.py:16-28`): joiner glues the next token onto the
    * previous one; tokens otherwise joined by single spaces. */
  def sentenceToString(tokens: Seq[String]): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var sawJoiner = false
    tokens.foreach {
      case NoSpaceTag => sawJoiner = true
      case t if sawJoiner && out.nonEmpty => out(out.length - 1) += t; sawJoiner = false
      case t => out += t; sawJoiner = false
    }
    out.mkString(" ")
  }

  /** Read a directory of srWaC files into (file, idx, tokens) rows. */
  def sentences(spark: SparkSession, dir: String): Dataset[Sentence] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, content) =>
        parseLines(content.linesIterator).zipWithIndex.map {
          case (toks, i) => Sentence(file, i.toLong, toks)
        }
      }
  }

  /** Full ingest: parse → W2 reassembly → global W1 ordinal over the
    * (sorted file, in-file idx) order → (line_id, text). The window is the
    * one global exchange, done once at ingest (SURVEY.md §2.5 W1). */
  def plainText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy(col("file"), col("idx"))
    sentences(spark, dir)
      .map(s => (s.file, s.idx, sentenceToString(s.tokens)))
      .toDF("file", "idx", "text")
      .withColumn("line_id", row_number().over(w))
      .select(col("line_id"), col("text"))
  }
}
