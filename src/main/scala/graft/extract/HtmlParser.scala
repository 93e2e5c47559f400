package graft.extract

import scala.collection.mutable

/**
 * Minimal, dependency-free HTML block parser — the DOM layer of the
 * main-content extraction pipeline (north_rule: "HTML boilerplate strip,
 * PDF/layout parse, DOM heuristics"). Written from scratch: a linear tag
 * tokenizer + an enclosing-element stack; no external parser libraries exist
 * in this environment and a full DOM is unnecessary — boilerpipe-style
 * heuristics need only flat text BLOCKS with (tag path, link-char, media)
 * annotations, which a single pass provides at parse cost O(|html|).
 *
 * Model:
 *  - Block-level elements (p, div, li, headers, td, article, …) delimit text
 *    blocks; inline elements (a, b, span, em, …) do not.
 *  - Characters inside <a> count toward the block's linkChars (link-density
 *    heuristics). <script>/<style>/comments are dropped entirely.
 *  - Media elements (img/video/audio/source/embed) yield media items carrying
 *    their src attribute, positioned in document order between blocks.
 *  - Ancestor semantic tags (nav/header/footer/aside) are recorded per block.
 */
object HtmlParser {

  final case class Block(text: String, linkChars: Int, docPos: Int,
                         inBoilerplateTag: Boolean, headingLevel: Int) {
    def textLen: Int = text.length
    def linkDensity: Double = if (text.isEmpty) 0.0 else linkChars.toDouble / text.length
  }

  final case class Media(src: String, kind: String, docPos: Int)

  final case class Page(blocks: Vector[Block], media: Vector[Media], title: String)

  private val BlockTags = Set("p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "td", "th", "tr", "table", "article", "section", "main", "blockquote", "pre",
    "nav", "header", "footer", "aside", "body", "html", "figure", "figcaption", "br")
  private val BoilerplateTags = Set("nav", "header", "footer", "aside")
  private val DropTags = Set("script", "style", "noscript", "template")

  /** HTML5 raw-text elements: content ends only at the literal close tag —
    * everything inside is code/CSS, never markup. */
  private val RawTextTags = Set("script", "style")

  /** HTML5's whitespace set (TAB/LF/FF/CR/SPACE), narrower than Java's. */
  private def isHtmlWs(c: Char): Boolean =
    c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == ' '

  /** Case-insensitive search for the close tag `</name`, accepting it only
    * when the name is FOLLOWED by whitespace, '/', '>' or end-of-input —
    * HTML5's "appropriate end tag" rule. Without the boundary check a
    * string literal like `"</scriptz"` inside the code would end the
    * element early. No whole-document lowercasing (that would be O(n) per
    * script tag → O(n²) on script-heavy pages). */
  private def indexOfCloseTag(s: String, name: String, from: Int): Int = {
    val n = s.length
    val target = s"</$name"
    val m = target.length
    var i = math.max(0, from)
    while (i + m <= n) {
      if (s.regionMatches(true, i, target, 0, m)) {
        val after = i + m
        // HTML5 whitespace is exactly TAB/LF/FF/CR/SPACE — Java's
        // isWhitespace would also accept e.g. U+2028, ending the raw-text
        // region where a spec parser keeps scanning
        if (after >= n || s.charAt(after) == '>' || s.charAt(after) == '/' ||
            isHtmlWs(s.charAt(after))) return i
      }
      i += 1
    }
    -1
  }
  private val MediaTags = Map("img" -> "image", "video" -> "video", "audio" -> "audio",
    "source" -> "media", "embed" -> "media")

  private val SrcAttr = """(?i)\bsrc\s*=\s*["']([^"']*)["']""".r

  /** Decode the handful of entities the heuristics care about. */
  def decodeEntities(s: String): String =
    s.replace("&nbsp;", " ").replace("&amp;", "&").replace("&lt;", "<")
      .replace("&gt;", ">").replace("&quot;", "\"").replace("&#39;", "'")

  def parse(html: String): Page = {
    val blocks = Vector.newBuilder[Block]
    val media = Vector.newBuilder[Media]
    var title = ""
    val text = new StringBuilder
    var linkChars = 0
    var docPos = 0
    var anchorDepth = 0
    var dropDepth = 0
    var rawSkipTo = -1 // raw-text (script/style) fast-forward target
    var titleDepth = 0
    var boilerDepth = 0
    var headingLevel = 0
    val titleBuf = new StringBuilder

    def flushBlock(): Unit = {
      val t = decodeEntities(text.toString).replaceAll("\\s+", " ").trim
      if (t.nonEmpty) {
        blocks += Block(t, math.min(linkChars, t.length), docPos,
          boilerDepth > 0, headingLevel)
        docPos += 1
      }
      text.clear(); linkChars = 0
    }

    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // quote-aware tag terminator: a bare indexOf('>') would cut
          // `<a href="x>y">` at the `>` INSIDE the quoted attribute value,
          // spilling `y">` into the text and mis-parsing the attribute.
          // Quote mode opens ONLY when the quote follows `=` (+ optional
          // whitespace) — HTML5 attribute-value position. Treating ANY bare
          // quote as an opener would let a stray `<` in prose or script
          // (`if (x < 10) print("<b>")`) swallow the real closing tag and
          // drop the document tail.
          val end = {
            var j = i + 1
            var quote: Char = 0
            var afterEq = false
            var e = -1
            while (j < n && e < 0) {
              val ch = html.charAt(j)
              if (quote != 0) { if (ch == quote) quote = 0 }
              else if ((ch == '"' || ch == '\'') && afterEq) quote = ch
              else if (ch == '>') e = j
              if (quote == 0) {
                if (ch == '=') afterEq = true
                else if (!Character.isWhitespace(ch)) afterEq = false
              }
              j += 1
            }
            e
          }
          if (end < 0) { i = n } // unterminated tag (or unclosed quote): discard the tail
          else {
            val rawTag = html.substring(i + 1, end)
            val closing = rawTag.startsWith("/")
            val body = if (closing) rawTag.substring(1) else rawTag
            val name = body.takeWhile(ch => ch.isLetterOrDigit).toLowerCase
            if (name.nonEmpty) {
              if (DropTags.contains(name)) {
                if (closing) dropDepth = math.max(0, dropDepth - 1)
                else if (!rawTag.endsWith("/")) {
                  dropDepth += 1
                  if (RawTextTags.contains(name)) {
                    // HTML5 raw-text elements: the content is CODE, not
                    // markup — jump straight to the closing tag so stray
                    // '<', '=' and quoted strings inside ('if (x < 10)
                    // y = "a>b"') can never derail the tag scanner and
                    // swallow the close tag (which drops the whole tail)
                    val close = indexOfCloseTag(html, name, end + 1)
                    rawSkipTo = if (close < 0) n else close
                  }
                }
              } else if (name == "title") {
                if (closing) { titleDepth = 0; title = decodeEntities(titleBuf.toString).trim }
                else titleDepth = 1
              } else if (MediaTags.contains(name) && !closing) {
                flushBlock()
                val src = SrcAttr.findFirstMatchIn(rawTag).map(_.group(1)).getOrElse("")
                media += Media(src, MediaTags(name), docPos)
                docPos += 1
              } else if (name == "a") {
                if (closing) anchorDepth = math.max(0, anchorDepth - 1) else anchorDepth += 1
              } else if (BlockTags.contains(name)) {
                flushBlock()
                if (BoilerplateTags.contains(name)) {
                  if (closing) boilerDepth = math.max(0, boilerDepth - 1) else boilerDepth += 1
                }
                if (name.length == 2 && name.charAt(0) == 'h' && name.charAt(1).isDigit) {
                  headingLevel = if (closing) 0 else name.charAt(1) - '0'
                }
              }
              // other inline tags: ignored (text flows through)
            }
            i = end + 1
            if (rawSkipTo >= 0) { i = rawSkipTo; rawSkipTo = -1 } // raw-text jump
          }
        }
      } else {
        if (dropDepth == 0) {
          if (titleDepth > 0) titleBuf.append(c)
          else {
            text.append(c)
            if (anchorDepth > 0) linkChars += 1
          }
        }
        i += 1
      }
    }
    flushBlock()
    Page(blocks.result(), media.result(), title)
  }
}
