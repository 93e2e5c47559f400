package graft.extract

import graft.model.Span

/**
 * Boilerplate-strip heuristics over parsed HTML blocks — a from-scratch
 * density classifier in the boilerpipe/Arc90 family (public algorithmic
 * ideas, re-implemented):
 *
 *  1. Blocks inside nav/header/footer/aside are boilerplate.
 *  2. High link density (> maxLinkDensity) ⇒ boilerplate (menus, link farms).
 *  3. Short isolated blocks (< minChars) are boilerplate UNLESS adjacent to a
 *     content block (captions, short paragraphs inside the article) or a
 *     heading directly above content.
 *  4. Everything else is content.
 *
 * Media items are kept only when they sit inside the content region —
 * between the first and last content block (figures inside the article) —
 * mirroring how extraction pipelines keep article images but drop logo/ad
 * assets in chrome.
 *
 * Output: the driver-contract span sequence `(kind, text, media_ref, offset)`
 * with offsets dense in document order.
 */
object MainContent {

  final case class Config(minChars: Int = 25, maxLinkDensity: Double = 0.33)

  def extractSpans(html: String, config: Config = Config()): Vector[Span] = {
    val page = HtmlParser.parse(html)
    val blocks = page.blocks

    // pass 1: confident classification
    val confident = blocks.map { b =>
      if (b.inBoilerplateTag) false
      else if (b.linkDensity > config.maxLinkDensity) false
      else b.textLen >= config.minChars
    }
    // pass 2: rescue short neighbors of content (captions, headings, short paras)
    val isContent = blocks.indices.map { i =>
      val b = blocks(i)
      if (confident(i)) true
      else if (b.inBoilerplateTag || b.linkDensity > config.maxLinkDensity) false
      else {
        val prev = i > 0 && confident(i - 1)
        val next = i + 1 < blocks.length && confident(i + 1)
        prev || next || (b.headingLevel > 0 && next)
      }
    }.toVector

    val contentPos = blocks.indices.filter(isContent).map(blocks(_).docPos)
    if (contentPos.isEmpty) return Vector.empty
    val lo = contentPos.min
    val hi = contentPos.max

    val textSpans = blocks.indices.collect {
      case i if isContent(i) => (blocks(i).docPos, Span(Span.KindText, blocks(i).text, "", 0))
    }
    val mediaSpans = page.media.collect {
      case m if m.docPos > lo && m.docPos < hi && m.src.nonEmpty =>
        (m.docPos, Span(Span.KindMedia, "", m.src, 0))
    }
    (textSpans ++ mediaSpans).sortBy(_._1).zipWithIndex
      .map { case ((_, s), off) => s.copy(offset = off) }.toVector
  }
}
