package graft.extract

import scala.collection.mutable
import graft.extract.PdfLayout.TextBox

/**
 * From-scratch byte-level PDF decode — no external libraries. Covers the
 * subset a layout pipeline needs:
 *
 *  - object scan: `N 0 obj ... endobj`; every stream, delimited by its
 *    declared direct `/Length` (fallback: `endstream` scan, also for
 *    indirect lengths), is parsed for content; pages resolve through
 *    `/Type /Page` objects' `/Contents` references when present (blank
 *    pages and interleaved non-content streams handled exactly), else by
 *    ordinal among box-producing streams;
 *  - `/Filter /FlateDecode` streams (the real-world common case) are
 *    inflated with JDK-built-in `java.util.zip.Inflater` when no
 *    incompatible `/DecodeParms` predictor is declared; inflation is capped
 *    at 64 MiB per stream so a hostile zip-bomb page cannot OOM an executor
 *    task. Other filters (DCT, LZW, predictor rows) are skipped — those
 *    need real codecs; documents where every stream is undecodable decode
 *    to no boxes and the caller falls back;
 *  - content-stream text operators: `BT`/`ET` text blocks, `Td`/`TD`
 *    (relative line translation, real PDF semantics), `Tm` (absolute),
 *    `(...) Tj` show-text with `\(`, `\)`, `\\` escapes, `<hex> Tj` hex
 *    strings, kerned `[(a) -120 (b)] TJ` arrays (kern numbers dropped),
 *    and the `'` / `"` show-text shorthands;
 *  - figures: `q a b c d e f cm /Name Do Q` XObject draws become figure
 *    boxes (`media://pdfobj-<Name>`) at the translation components (e, f).
 *
 * Coordinates are normalized to [0,1] with y flipped (PDF y points up;
 * [[PdfLayout.readingOrder]] expects y growing downward) against US-Letter
 * 612×792 unless the first `/MediaBox [0 0 w h]` says otherwise.
 */
object PdfCodec extends Serializable {

  def isPdf(b: Array[Byte]): Boolean =
    b.length > 5 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' && b(4) == '-'

  /** Parse text/figure boxes from raw PDF bytes (empty if nothing decodable).
    * Never throws — malformed bytes are routine at web scale and must not
    * kill a task; anything unparseable decodes to no boxes. */
  def parse(bytes: Array[Byte]): Seq[TextBox] =
    try {
      if (!isPdf(bytes)) return Seq.empty
      val s = new String(bytes, "ISO-8859-1") // byte-preserving charset
      val (pw, ph) = mediaBox(s).getOrElse((612.0, 792.0))
      val streams = contentStreams(s) // (object id, body) in document order
      // Page resolution, best first:
      //  1. /Type /Page objects' /Contents references, in document order —
      //     handles blank pages and interleaved non-content streams exactly;
      //  2. fallback (no parseable page objects): ordinal among streams that
      //     produce boxes, so uncompressed NON-content streams (XMP metadata
      //     is conventionally unfiltered) don't consume page slots.
      val byId = streams.toMap
      // a page keeps its slot if ANY of its content refs decoded; its
      // decodable streams concatenate in array order (one content stream
      // split across objects, §7.7.3.3)
      val contentsIds = pageContentsIds(s)
        .map(_.filter(byId.contains)).filter(_.nonEmpty)
      val ordered: Seq[Seq[TextBox]] =
        if (contentsIds.nonEmpty)
          contentsIds.map(ids => parseContent(ids.map(byId).mkString("\n"), pw, ph))
        else streams.map { case (_, cs) => parseContent(cs, pw, ph) }.filter(_.nonEmpty)
      ordered.zipWithIndex.flatMap { case (boxes, p) => boxes.map(_.copy(page = p)) }
    } catch {
      case scala.util.control.NonFatal(_) => Seq.empty
    }

  private val MediaBoxRe =
    raw"/MediaBox\s*\[\s*([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s*\]".r

  private def mediaBox(s: String): Option[(Double, Double)] =
    MediaBoxRe.findFirstMatchIn(s).map { m =>
      (m.group(3).toDouble - m.group(1).toDouble,
       m.group(4).toDouble - m.group(2).toDouble)
    }

  private val ObjHeaderRe = raw"(\d+)\s+\d+\s+obj".r
  private val PageTypeRe = raw"/Type\s*/Page\b(?!s)".r
  // single ref `/Contents 3 0 R` or array `/Contents [3 0 R 4 0 R]` — real
  // generators split one page's content across several streams
  private val ContentsRe = raw"/Contents\s+(?:(\d+)\s+\d+\s+R|\[([^\]]*)\])".r
  private val RefRe = raw"(\d+)\s+\d+\s+R".r

  /** /Contents object-id GROUPS of the /Type /Page objects, in document
    * order: one inner Seq per page (an array of refs is one page whose
    * streams concatenate, PDF 32000-1 §7.7.3.3). */
  private def pageContentsIds(s: String): Seq[Seq[Int]] =
    PageTypeRe.findAllMatchIn(s).toSeq.flatMap { m =>
      val window = s.substring(m.start, math.min(s.length, m.start + 600))
      ContentsRe.findFirstMatchIn(window).map { c =>
        if (c.group(1) != null) Seq(c.group(1).toInt)
        else RefRe.findAllMatchIn(c.group(2)).map(_.group(1).toInt).toSeq
      }
    }

  /** All unfiltered (object id, stream body) pairs, in document order. */
  private def contentStreams(s: String): Seq[(Int, String)] = {
    val headers = ObjHeaderRe.findAllMatchIn(s).map(m => (m.start, m.group(1).toInt)).toArray
    def owningObj(pos: Int): Int = {
      var lo = 0; var hi = headers.length - 1; var best = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (headers(mid)._1 < pos) { best = headers(mid)._2; lo = mid + 1 } else hi = mid - 1
      }
      best
    }
    val out = mutable.ArrayBuffer.empty[(Int, String)]
    val intObjCache = mutable.Map.empty[Int, Option[Long]] // indirect /Length targets
    var i = 0
    var prevEnd = 0 // end of the previous stream body — dicts never precede it
    while ({ i = s.indexOf("stream", i); i >= 0 }) {
      // dictionary region = from the object header ("N 0 obj") to `stream`;
      // taking the innermost "<<" would miss a /Filter declared in the OUTER
      // dict when it nests sub-dictionaries (e.g. /DecodeParms << ... >>)
      val objStart = math.max(prevEnd, s.lastIndexOf("obj", i))
      val dict = if (objStart >= 0 && objStart < i) s.substring(objStart, i) else ""
      var body = i + "stream".length
      if (body < s.length && s.charAt(body) == '\r') body += 1
      if (body < s.length && s.charAt(body) == '\n') body += 1
      // delimit by the dict's /Length when available — scanning for the
      // literal "endstream" would truncate a stream whose CONTENT contains
      // that word (e.g. page text about PDFs); an INDIRECT `/Length N 0 R`
      // is resolved through object N when it is a bare integer object; fall
      // back to the scan only when no usable length is resolvable
      val declared = LengthRe.findFirstMatchIn(dict).map(_.group(1).toLong)
        .orElse(IndirectLengthRe.findFirstMatchIn(dict).flatMap(m =>
          intObjCache.getOrElseUpdate(m.group(1).toInt, intObject(s, m.group(1).toInt))))
      val end = declared match {
        case Some(len) if len >= 0 && body + len <= s.length => body + len.toInt
        case _ =>
          val e = s.indexOf("endstream", body)
          if (e < 0) return out.toSeq
          e
      }
      val raw = s.substring(body, end)
      if (!dict.contains("/Filter")) out += ((owningObj(i), raw))
      else decodeFiltered(dict, raw.getBytes("ISO-8859-1")).foreach { b =>
        out += ((owningObj(i), new String(b, "ISO-8859-1")))
      }
      val after = s.indexOf("endstream", end)
      if (after < 0) return out.toSeq
      i = after + "endstream".length
      prevEnd = i
    }
    out.toSeq
  }

  /** Direct /Length only — `(?!\d)` pins the match to the WHOLE number so
    * backtracking cannot split `/Length 123 0 R` into group(1)="12" + a
    * non-R tail, and the second lookahead rejects the INDIRECT form
    * `/Length N 0 R` (capturing N as a byte count would truncate the stream
    * to a handful of bytes); indirect lengths fall back to the scan. */
  private val LengthRe = raw"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)".r

  private val IndirectLengthRe = raw"/Length\s+(\d+)\s+\d+\s+R".r

  /** Value of a bare integer object `N 0 obj <int> endobj` — the target shape
    * of an indirect `/Length N 0 R`. None for any other object shape. */
  private def intObject(s: String, n: Int): Option[Long] = {
    val re = raw"(?<!\d)$n\s+\d+\s+obj\s*(\d+)\s*endobj".r
    re.findFirstMatchIn(s).map(_.group(1).toLong)
  }

  // ---- filter pipeline decode ----

  private val FilterValRe = raw"/Filter\s*(?:/(\w+)|\[([^\]]*)\])".r
  private val NameRe = raw"/(\w+)".r

  /** Filter names in DECODE order (PDF 32000-1 §7.4.1: an array lists the
    * filters in the order they must be applied to decode). */
  private def filterNames(dict: String): Seq[String] =
    FilterValRe.findFirstMatchIn(dict).toSeq.flatMap { m =>
      if (m.group(1) != null) Seq(m.group(1))
      else NameRe.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
    }

  /** Per-filter DecodeParms dict bodies aligned with [[filterNames]]: the
    * array form yields one entry per `null`/`<<...>>` token; the single-dict
    * form applies to the (sole) parms-bearing filter we handle, FlateDecode.
    * Predictor dicts never nest, so the non-greedy `<<(.*?)>>` is exact. */
  private val ParmsArrayRe = raw"(?s)/DecodeParms\s*\[((?:\s*(?:null|<<.*?>>))*)\s*\]".r
  private val ParmsDictRe = raw"(?s)/DecodeParms\s*<<(.*?)>>".r
  private val ParmsTokenRe = raw"(?s)null|<<(.*?)>>".r

  private def parmsFor(dict: String, filters: Seq[String]): Seq[Option[String]] =
    ParmsArrayRe.findFirstMatchIn(dict) match {
      case Some(m) =>
        val toks = ParmsTokenRe.findAllMatchIn(m.group(1))
          .map(t => Option(t.group(1))).toSeq
        filters.indices.map(i => toks.lift(i).flatten)
      case None =>
        val single = ParmsDictRe.findFirstMatchIn(dict).map(_.group(1))
        filters.map(f => if (f == "FlateDecode") single else None)
    }

  private def intParm(parms: Option[String], key: String, default: Int): Int =
    parms.flatMap(p => raw"/$key\s+(\d+)".r.findFirstMatchIn(p).map(_.group(1).toInt))
      .getOrElse(default)

  /**
   * Run the stream's declared filter pipeline: `FlateDecode` (with TIFF
   * predictor 2 and PNG predictors 10–15 from `/DecodeParms`) and
   * `ASCII85Decode`, chained in declaration order — covers pdflatex/
   * Ghostscript output (`/Flate + /DecodeParms << /Predictor 12 ... >>`) and
   * the classic `[/ASCII85Decode /FlateDecode]` mail-safe chain. Any other
   * filter (DCT, LZW, CCITT, crypt) needs a real codec → None, and the
   * caller skips the stream (documents where nothing decodes fall back to
   * the stub, exactly as before).
   */
  private def decodeFiltered(dict: String, data: Array[Byte]): Option[Array[Byte]] = {
    val filters = filterNames(dict)
    if (filters.isEmpty) return None
    val parms = parmsFor(dict, filters)
    filters.zip(parms).foldLeft(Option(data)) {
      case (None, _) => None
      case (Some(bytes), ("ASCII85Decode", _)) => ascii85Decode(bytes)
      case (Some(bytes), ("FlateDecode", p)) =>
        inflate(bytes).flatMap { inflated =>
          intParm(p, "Predictor", 1) match {
            case 1 => Some(inflated)
            case 2 => unTiffPredictor(inflated, intParm(p, "Columns", 1),
              intParm(p, "Colors", 1), intParm(p, "BitsPerComponent", 8))
            case pr if pr >= 10 && pr <= 15 =>
              unPngPredictor(inflated, intParm(p, "Columns", 1),
                intParm(p, "Colors", 1), intParm(p, "BitsPerComponent", 8))
            case _ => None
          }
        }
      case _ => None // unsupported filter in the chain
    }
  }

  /** Undo PNG row filtering (predictors 10–15 all mean "PNG, per-row filter
    * byte"; RFC 2083 §6): each row = 1 type byte + ceil(columns·colors·bpc/8)
    * data bytes; types 0–4 = None/Sub/Up/Average/Paeth against the previous
    * byte (`bpp` back) and the prior row. Truncated/ragged data → None. */
  private def unPngPredictor(data: Array[Byte], columns: Int,
                             colors: Int, bpc: Int): Option[Array[Byte]] = {
    if (columns <= 0 || colors <= 0 || bpc <= 0) return None
    val rowBytes = (columns * colors * bpc + 7) / 8
    val bpp = math.max(1, colors * bpc / 8)
    if (rowBytes <= 0 || data.length % (rowBytes + 1) != 0) return None
    val nRows = data.length / (rowBytes + 1)
    val out = new Array[Byte](nRows * rowBytes)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowBytes + 1)) & 0xff
      if (ft > 4) return None
      val src = r * (rowBytes + 1) + 1
      val dst = r * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val above = if (r > 0) out(dst - rowBytes + i) & 0xff else 0
        val upLeft = if (r > 0 && i >= bpp) out(dst - rowBytes + i - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + above
          case 3 => x + ((left + above) >> 1)
          case 4 => // Paeth
            val p = left + above - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - above); val pc = math.abs(p - upLeft)
            x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) above else upLeft)
        }
        out(dst + i) = (recon & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some(out)
  }

  /** Undo TIFF predictor 2 (horizontal differencing; 8-bit components only —
    * sub-byte TIFF differencing is a tag-2 rarity not worth the bit math). */
  private def unTiffPredictor(data: Array[Byte], columns: Int,
                              colors: Int, bpc: Int): Option[Array[Byte]] = {
    if (bpc != 8 || columns <= 0 || colors <= 0) return None
    val rowBytes = columns * colors
    if (data.length % rowBytes != 0) return None
    val out = data.clone()
    var r = 0
    while (r < out.length / rowBytes) {
      var i = colors
      while (i < rowBytes) {
        out(r * rowBytes + i) =
          ((out(r * rowBytes + i) + out(r * rowBytes + i - colors)) & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some(out)
  }

  /** ASCII85 decode (PDF 32000-1 §7.4.3): 5 chars `!`–`u` → 4 bytes, `z` →
    * four zero bytes, whitespace skipped, `~` ends the stream, a final
    * partial group of n chars yields n−1 bytes (padded with `u`). Hostile
    * input (chars out of range, lone final char, group overflow) → None. */
  private def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val group = new Array[Int](5)
    var gi = 0
    var i = 0
    // skip an optional leading "<~"
    if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
    var done = false
    def emit(n: Int): Boolean = { // n = chars in group (2..5)
      var v = 0L
      var j = 0
      while (j < 5) { v = v * 85 + (if (j < n) group(j) else 84); j += 1 }
      if (v > 0xffffffffL) return false
      var k = 0
      while (k < n - 1) { out.write(((v >>> (24 - 8 * k)) & 0xff).toInt); k += 1 }
      true
    }
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && gi == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (c >= '!' && c <= 'u') {
        group(gi) = c - '!'
        gi += 1
        if (gi == 5) { if (!emit(5)) return None; gi = 0 }
      } else if (!Character.isWhitespace(c)) return None
      i += 1
    }
    if (gi == 1) return None // a lone trailing char encodes nothing
    if (gi >= 2 && !emit(gi)) return None
    Some(out.toByteArray)
  }

  /** PNG-filter rows for [[encode]] (inverse of [[unPngPredictor]], bpp 1):
    * predictor 12 emits all-Up rows (the common generator shape); 15 cycles
    * row filters 0–4 so a round-trip exercises every unfilter branch; other
    * 10–14 values pin the corresponding single filter. */
  private def pngPredict(data: Array[Byte], rowBytes: Int, predictor: Int): Array[Byte] = {
    val nRows = data.length / rowBytes
    val out = new Array[Byte](nRows * (rowBytes + 1))
    var r = 0
    while (r < nRows) {
      val ft = predictor match {
        case 15 => r % 5
        case p => math.min(4, math.max(0, p - 10))
      }
      out(r * (rowBytes + 1)) = ft.toByte
      var i = 0
      while (i < rowBytes) {
        val x = data(r * rowBytes + i) & 0xff
        val left = if (i >= 1) data(r * rowBytes + i - 1) & 0xff else 0
        val above = if (r > 0) data((r - 1) * rowBytes + i) & 0xff else 0
        val upLeft = if (r > 0 && i >= 1) data((r - 1) * rowBytes + i - 1) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - left
          case 2 => x - above
          case 3 => x - ((left + above) >> 1)
          case 4 =>
            val p = left + above - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - above); val pc = math.abs(p - upLeft)
            x - (if (pa <= pb && pa <= pc) left else if (pb <= pc) above else upLeft)
        }
        out(r * (rowBytes + 1) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** TIFF predictor-2 differencing for [[encode]] (colors 1, bpc 8). */
  private def tiffPredict(data: Array[Byte], rowBytes: Int): Array[Byte] = {
    val out = data.clone()
    var r = 0
    while (r < data.length / rowBytes) {
      var i = rowBytes - 1
      while (i >= 1) {
        out(r * rowBytes + i) =
          ((data(r * rowBytes + i) - data(r * rowBytes + i - 1)) & 0xff).toByte
        i -= 1
      }
      r += 1
    }
    out
  }

  /** ASCII85 encode (for [[encode]]'s chain fixtures + round-trip tests). */
  private[extract] def ascii85Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder(data.length * 5 / 4 + 8)
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (if (j < n) data(i + j) & 0xff else 0); j += 1 }
      if (v == 0 && n == 4) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var k = 4
        var x = v
        while (k >= 0) { cs(k) = ('!' + (x % 85).toInt).toChar; x /= 85; k -= 1 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += n
    }
    sb.append("~>").toString
  }

  /** Inflate cap: a content stream that expands past this is a zip bomb, not
    * a page — 64 MiB of text operators is ~3 orders of magnitude beyond any
    * real page. At 10^12-doc scale hostile payloads are routine; the cap
    * bounds per-task memory instead of trusting the input. */
  private val MaxInflatedBytes = 1 << 26

  private def inflate(compressed: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(compressed)
      val out = new java.io.ByteArrayOutputStream(math.min(MaxInflatedBytes, math.max(64, compressed.length * 4)))
      val buf = new Array[Byte](8192)
      var total = 0
      while (!inf.finished() && total <= MaxInflatedBytes) {
        val k = inf.inflate(buf)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return None // truncated / preset-dict
        out.write(buf, 0, k)
        total += k
      }
      if (inf.finished() && total <= MaxInflatedBytes) Some(out.toByteArray) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  private val NumRe = raw"[-+]?[0-9]*\.?[0-9]+"

  /** Tokenize a content stream into PDF strings, numbers and operators.
    * String tokens (literal, hex, array elements) accumulate until a
    * show-text operator (`Tj`, `TJ`, `'`, `"`) consumes them — for a kerned
    * `[(w) -120 (orld)] TJ` array that concatenates the string elements and
    * drops the kern numbers, which is exactly the text a layout pipeline
    * wants. */
  private def parseContent(cs: String, pw: Double, ph: Double): Seq[TextBox] = { // page stamped by the caller
    val out = mutable.ArrayBuffer.empty[TextBox]
    var tx = 0.0; var ty = 0.0           // text-line origin (PDF space)
    var cmE = 0.0; var cmF = 0.0         // last cm translation
    var lastName: String = null
    val nums = mutable.ArrayBuffer.empty[Double]
    val strs = mutable.ArrayBuffer.empty[String] // string tokens since last operator
    var i = 0
    val n = cs.length
    def flush(): Unit = { nums.clear(); strs.clear() }
    def norm(x: Double, y: Double): (Double, Double) =
      (math.max(0.0, math.min(1.0, x / pw)), math.max(0.0, math.min(1.0, (ph - y) / ph)))
    def emitShow(): Unit = {
      val text = strs.mkString
      if (text.nonEmpty) {
        val (x, y) = norm(tx, ty)
        out += TextBox(0, x, y, text, isFigure = false)
      }
    }
    while (i < n) {
      val c = cs.charAt(i)
      if (c == '(') {
        // PDF literal string with escapes and balanced parens
        val sb = new StringBuilder
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val ch = cs.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(cs.charAt(i + 1)); i += 2 }
          else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) sb.append(ch); i += 1 }
          else { sb.append(ch); i += 1 }
        }
        strs += sb.toString
      } else if (c == '<') {
        if (i + 1 < n && cs.charAt(i + 1) == '<') i += 2 // dict open — contents tokenize normally
        else {
          // hex string: pairs of hex digits, whitespace ignored, odd final
          // digit implicitly padded with 0 (PDF 32000-1 §7.3.4.3)
          var j = i + 1
          val sb = new StringBuilder
          var hi = -1
          while (j < n && cs.charAt(j) != '>') {
            val d = Character.digit(cs.charAt(j), 16)
            if (d >= 0) {
              if (hi < 0) hi = d
              else { sb.append(((hi << 4) | d).toChar); hi = -1 }
            }
            j += 1
          }
          if (hi >= 0) sb.append((hi << 4).toChar)
          strs += sb.toString
          i = if (j < n) j + 1 else j
        }
      } else if (c == '[' || c == ']') {
        i += 1 // TJ array brackets: elements accumulate in strs/nums as-is
      } else if (c == '\'' || c == '"') {
        emitShow() // show-text shorthands (move-show / aw-ac-show)
        flush()
        i += 1
      } else if (c == '/') {
        val m = i + 1
        var j = m
        while (j < n && !Character.isWhitespace(cs.charAt(j)) && "([<>]/".indexOf(cs.charAt(j)) < 0) j += 1
        lastName = cs.substring(m, j)
        i = j
        nums.clear()
      } else if ((c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.') {
        var j = i
        while (j < n && "0123456789+-.eE".indexOf(cs.charAt(j)) >= 0) j += 1
        try nums += cs.substring(i, j).toDouble catch { case _: NumberFormatException => () }
        i = j
      } else if (Character.isLetter(c)) {
        var j = i
        while (j < n && (Character.isLetter(cs.charAt(j)) || cs.charAt(j) == '*')) j += 1
        val op = cs.substring(i, j)
        op match {
          case "Td" | "TD" if nums.length >= 2 => tx += nums(nums.length - 2); ty += nums.last
          case "Tm" if nums.length >= 6        => tx = nums(nums.length - 2); ty = nums.last
          case "BT"                            => tx = 0.0; ty = 0.0
          case "cm" if nums.length >= 6        => cmE = nums(nums.length - 2); cmF = nums.last
          case "Tj" | "TJ"                     => emitShow()
          case "Do" if lastName != null =>
            val (x, y) = norm(cmE, cmF)
            out += TextBox(0, x, y, s"media://pdfobj-$lastName", isFigure = true)
          case _ => ()
        }
        flush()
        i = j
      } else i += 1
    }
    out.toSeq
  }

  // ---- minimal uncompressed single-xref encoder (round-trip tests + demos) ----

  /** One page = a list of boxes: Left(text at (x, y)) or Right(figure name at
    * (x, y)); coordinates in PDF points, y up, page 612×792.
    *
    * `compress` emits each content stream `/Filter /FlateDecode` via
    * `java.util.zip.Deflater` (round-trip exercise for [[inflate]]);
    * `textOp` selects the show-text form: 0 = `(s) Tj` literal, 1 =
    * kerned `[(a) -120 (b)] TJ` array, 2 = `<hex> Tj` hex string.
    * `predictor` (with `compress`) applies PNG row filtering before deflate
    * and declares `/DecodeParms << /Predictor p /Columns n >>` — 12 uses
    * Up rows (the pdflatex/Ghostscript shape), 15 cycles all five PNG row
    * filters, 2 is TIFF horizontal differencing; content is space-padded to
    * a row multiple (whitespace is operator-neutral in a content stream).
    * `ascii85` additionally wraps the deflated bytes and declares the
    * `[/ASCII85Decode /FlateDecode]` chain (parms as an aligned array). */
  def encode(
      pages: Seq[Seq[(Double, Double, Either[String, String])]],
      compress: Boolean = false,
      textOp: Int = 0,
      predictor: Int = 1,
      predictorColumns: Int = 24,
      ascii85: Boolean = false): Array[Byte] = {
    // object ids assigned up front (contents, font, pages, page tree,
    // catalog) so every reference — including each page's /Parent — is
    // emitted directly; a post-hoc placeholder substitution would also
    // rewrite matching byte runs inside page TEXT
    val n = pages.length
    val contentIds = (1 to n)
    val fontId = n + 1
    val pageIds = (n + 2 until n + 2 + n)
    val pagesId = 2 * n + 2
    val catalogId = 2 * n + 3
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    def obj(id: Int, body: String): Unit = { sb.append(s"$id 0 obj\n$body\nendobj\n"); () }
    pages.zip(contentIds).foreach { case (boxes, cid) =>
      val cs = new StringBuilder
      // Locale.ROOT: the f-interpolator uses the JVM default locale, which
      // on de_DE/fr_FR prints comma decimals the parser would split in two
      def num(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
      def lit(t: String) =
        "(" + t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)") + ")"
      def hex(t: String) =
        "<" + t.getBytes("ISO-8859-1").map(b => f"${b & 0xff}%02X").mkString + ">"
      boxes.foreach {
        case (x, y, Left(text)) =>
          val show = textOp match {
            case 1 => // kerned array: split midway, kern number between halves
              val mid = text.length / 2
              s"[${lit(text.substring(0, mid))} -120 ${lit(text.substring(mid))}] TJ"
            case 2 => s"${hex(text)} Tj"
            case _ => s"${lit(text)} Tj"
          }
          cs.append(s"BT /F1 12 Tf ${num(x)} ${num(y)} Td $show ET\n")
        case (x, y, Right(name)) =>
          cs.append(s"q 1 0 0 1 ${num(x)} ${num(y)} cm /$name Do Q\n")
      }
      val body =
        if (!compress) cs.toString
        else {
          var bytes = cs.toString.getBytes("ISO-8859-1")
          if (predictor >= 2) {
            // pad to a whole number of rows, then apply the predictor's
            // row transform (the decoder inverts it post-inflate)
            val rowBytes = predictorColumns
            val padded = bytes.padTo(
              ((bytes.length + rowBytes - 1) / rowBytes) * rowBytes, ' '.toByte)
            bytes =
              if (predictor == 2) tiffPredict(padded, rowBytes)
              else pngPredict(padded, rowBytes, predictor)
          }
          val defl = new java.util.zip.Deflater()
          defl.setInput(bytes)
          defl.finish()
          val out = new java.io.ByteArrayOutputStream(cs.length)
          val buf = new Array[Byte](8192)
          while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
          defl.end()
          if (ascii85) ascii85Encode(out.toByteArray)
          else new String(out.toByteArray, "ISO-8859-1")
        }
      val parmsDict = s"<< /Predictor $predictor /Columns $predictorColumns >>"
      val filter =
        if (!compress) ""
        else if (ascii85) " /Filter [/ASCII85Decode /FlateDecode]" +
          (if (predictor >= 2) s" /DecodeParms [null $parmsDict]" else "")
        else " /Filter /FlateDecode" +
          (if (predictor >= 2) s" /DecodeParms $parmsDict" else "")
      obj(cid, s"<< /Length ${body.length}$filter >>\nstream\n$body\nendstream")
    }
    obj(fontId, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    pageIds.zip(contentIds).foreach { case (pid, cid) =>
      obj(pid,
        s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontId 0 R >> >> /Contents $cid 0 R >>")
    }
    obj(pagesId,
      s"<< /Type /Pages /Kids [${pageIds.map(id => s"$id 0 R").mkString(" ")}] /Count $n >>")
    obj(catalogId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    sb.append(s"trailer\n<< /Size ${catalogId + 1} /Root $catalogId 0 R >>\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }
}
