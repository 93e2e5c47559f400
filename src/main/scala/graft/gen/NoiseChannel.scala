package graft.gen

/**
 * OCR-noise channel: per-character random edits.
 *
 * Control flow mirrors the reference's `mutilate_string`
 * (`/root/reference/src/corpus/make_messy_dataset.py:25-62`): walking the
 * string by code point, each position is edited with probability
 * EDIT_CHANCE = 0.12, the edit type drawn uniformly from
 * {DELETE, CHANGE, INSERT, SWAP}; INSERT does not advance (so the same
 * character may be edited again, exactly like the reference); SWAP pads a
 * trailing space when transposing at end-of-string; after the walk a
 * geometric tail of inserts is appended with p = 0.12/4 = 0.03.
 *
 * Unlike the reference (global unseeded RNG), all draws come from a [[DetRng]]
 * derived from the row coordinates — the corpus is a pure function of the
 * clean table (required for distributed determinism + resume idempotence).
 */
object NoiseChannel {

  val EditChance   = 0.12
  val NEditTypes   = 4
  val InsertChance = EditChance / NEditTypes

  // EditType ordinals (make_messy_dataset.py:13-17)
  private final val Delete = 0
  private final val Change = 1
  private final val Insert = 2
  private final val Swap   = 3

  /** Corrupt `text` deterministically with the stream `rng`; `goodChars` is
    * the curated alphabet (code points) replacement/insert chars come from. */
  def mutilate(text: String, goodChars: Array[Int], rng: DetRng): String = {
    val cps = text.codePoints().toArray
    val n = cps.length
    val sb = new java.lang.StringBuilder(n + 8)
    var i = 0
    while (i < n) {
      if (rng.nextDouble() < EditChance) {
        rng.nextInt(NEditTypes) match {
          case Delete =>
            i += 1
          case Change =>
            sb.appendCodePoint(goodChars(rng.nextInt(goodChars.length)))
            i += 1
          case Insert =>
            sb.appendCodePoint(goodChars(rng.nextInt(goodChars.length)))
            // no advance: the real char is (maybe) appended next iteration
          case Swap =>
            if (i + 1 < n) sb.appendCodePoint(cps(i + 1)) else sb.append(' ')
            sb.appendCodePoint(cps(i))
            i += 2
        }
      } else {
        sb.appendCodePoint(cps(i))
        i += 1
      }
    }
    while (rng.nextDouble() < InsertChance)
      sb.appendCodePoint(goodChars(rng.nextInt(goodChars.length)))
    sb.toString
  }

  /** Deterministic per-span corruption keyed by (docId, offset). */
  def mutilateSpan(docId: String, offset: Int, text: String, goodChars: Array[Int]): String =
    mutilate(text, goodChars, DetRng.forKey(docId, offset.toLong, 0x6E6F697365L /* "noise" */))

  /** Corrupt the text spans of a whole doc table (media untouched) — the
    * simulated-OCR stage between extraction and correction. Narrow map. */
  def noiseDocs(docs: org.apache.spark.sql.Dataset[graft.model.Doc],
                goodChars: Array[Int] = DocGen.goodChars): org.apache.spark.sql.Dataset[graft.model.Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { d =>
      graft.model.Doc(d.doc_id, d.spans.map { s =>
        if (s.kind == graft.model.Span.KindText)
          s.copy(text = mutilateSpan(d.doc_id, s.offset, s.text, goodChars))
        else s
      })
    }
  }
}
