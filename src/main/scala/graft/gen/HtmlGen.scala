package graft.gen

import graft.model.Span

/**
 * Deterministic synthetic HTML pages with KNOWN main content — the test
 * fixture for the extraction pipeline (FIXTURES.md pattern: ground truth by
 * construction, no external data).
 *
 * Page i = chrome (header with nav link lists, aside, footer — all
 * boilerplate) around an article of paragraphs drawn from the [[DocGen]]
 * lexicon with images interleaved. The generator returns the expected span
 * sequence alongside the html, so extraction is checked by span-sequence
 * equality `(kind, text, media_ref, order)` — the driver contract's own
 * invariant.
 */
object HtmlGen {

  final case class PageFixture(docId: String, html: String, expected: Vector[Span])

  /** Pathological long-page knob (skew tests): 1 page in [[PathologicalEvery]]
    * gets [[PathologicalFactor]]× the paragraphs. */
  val PathologicalEvery  = 997
  val PathologicalFactor = 40

  def page(i: Long, pathological: Boolean = false): PageFixture = {
    val rng = DetRng.forKey(f"page$i%06d", 0x68746D6CL)
    val docId = f"page$i%06d"
    val base = 3 + rng.nextInt(5)
    val nParas =
      if (pathological && i % PathologicalEvery == 0) base * PathologicalFactor
      else base
    val sb = new StringBuilder
    val expected = Vector.newBuilder[Span]
    var off = 0

    def navLinks(n: Int): String =
      (0 until n).map(k => s"""<li><a href="/x$k">${DocGen.lexicon(rng.nextInt(200))}</a></li>""").mkString

    sb.append("<html><head><title>")
    val titleText = DocGen.sentence(rng, 3)
    sb.append(titleText)
    sb.append("</title><style>body { color: red }</style></head><body>")
    sb.append(s"<header><ul>${navLinks(6)}</ul></header>")
    sb.append(s"<nav><ul>${navLinks(8)}</ul></nav>")
    // a short promo blurb outside the article — boilerplate by isolation
    sb.append(s"""<div><a href="/promo">${DocGen.lexicon(rng.nextInt(200))}</a></div>""")
    sb.append("<article>")
    (0 until nParas).foreach { p =>
      val para = DocGen.sentence(rng, 12 + rng.nextInt(20))
      sb.append(s"<p>$para</p>")
      expected += Span(Span.KindText, para, "", { val o = off; off += 1; o })
      if (p < nParas - 1 && rng.nextDouble() < 0.5) {
        val src = f"media://img${rng.nextLong()}%016x"
        sb.append(s"""<figure><img src="$src"/></figure>""")
        expected += Span(Span.KindMedia, "", src, { val o = off; off += 1; o })
      }
    }
    sb.append("</article>")
    sb.append(s"<aside><ul>${navLinks(5)}</ul></aside>")
    sb.append(s"<footer>${DocGen.lexicon(rng.nextInt(100))} © site</footer>")
    sb.append("<script>var x = '<p>not content</p>';</script>")
    sb.append("</body></html>")
    PageFixture(docId, sb.toString, expected.result())
  }

  def pages(spark: org.apache.spark.sql.SparkSession, n: Long,
            pathological: Boolean = false): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(n).map { i => val p = page(i, pathological); (p.docId, p.html) }
      .toDF("doc_id", "html")
  }
}
