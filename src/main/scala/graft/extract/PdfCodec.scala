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
      else if (isPlainFlate(dict))
        inflate(raw.getBytes("ISO-8859-1")).foreach { b =>
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

  /** SINGLE FlateDecode filter only: bare name, or a one-element array whose
    * `]` must follow immediately — `/Filter [/FlateDecode /ASCII85Decode]`
    * is a multi-stage pipeline whose inflate output is still encoded, and
    * feeding it to the content parser would fabricate garbage boxes. */
  private val FlateFilterRe = raw"/Filter\s*(?:/FlateDecode\b|\[\s*/FlateDecode\s*\])".r
  private val DecodeParmsOkRe =
    raw"/DecodeParms\s*(?:null|<<\s*/Predictor\s+1\s*>>)".r

  /** Stream we can inflate: single FlateDecode filter, no predictor (absent,
    * null, or explicit Predictor 1). PNG/TIFF row predictors (>1) need a
    * second decode pass we don't implement — those streams are skipped. */
  private def isPlainFlate(dict: String): Boolean =
    FlateFilterRe.findFirstIn(dict).isDefined &&
      (!dict.contains("/DecodeParms") || DecodeParmsOkRe.findFirstIn(dict).isDefined)

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
    * kerned `[(a) -120 (b)] TJ` array, 2 = `<hex> Tj` hex string. */
  def encode(
      pages: Seq[Seq[(Double, Double, Either[String, String])]],
      compress: Boolean = false,
      textOp: Int = 0): Array[Byte] = {
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
          val defl = new java.util.zip.Deflater()
          defl.setInput(cs.toString.getBytes("ISO-8859-1"))
          defl.finish()
          val out = new java.io.ByteArrayOutputStream(cs.length)
          val buf = new Array[Byte](8192)
          while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
          defl.end()
          new String(out.toByteArray, "ISO-8859-1")
        }
      val filter = if (compress) " /Filter /FlateDecode" else ""
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
