package graft

import org.apache.spark.sql.functions._
import graft.extract.{Extract, HtmlParser, MainContent, PdfLayout}
import graft.gen.HtmlGen
import graft.model.{Doc, Span}

class ExtractSpec extends SparkSpec {
  import spark.implicits._

  test("html parser: blocks, link chars, media, title, script stripping") {
    val html = """<html><head><title>My &amp; Title</title><style>p{}</style></head>
      |<body><nav><ul><li><a href="/a">home link</a></li></ul></nav>
      |<p>Real paragraph with enough characters to count as content here.</p>
      |<img src="media://pic1"/>
      |<p>Another <b>real</b> paragraph, also long enough to be considered content.</p>
      |<script>var a = '<p>fake</p>';</script>
      |<footer>copyright</footer></body></html>""".stripMargin
    val page = HtmlParser.parse(html)
    assert(page.title == "My & Title")
    assert(page.media.map(_.src) == Vector("media://pic1"))
    val texts = page.blocks.map(_.text)
    assert(texts.exists(_.startsWith("Real paragraph")))
    assert(texts.exists(_.startsWith("Another real paragraph")))
    assert(!texts.exists(_.contains("fake")))
    val navBlock = page.blocks.find(_.text == "home link").get
    assert(navBlock.inBoilerplateTag && navBlock.linkDensity == 1.0)
  }

  test("main-content extraction recovers exactly the generated article spans") {
    (0L until 40L).foreach { i =>
      val fix = HtmlGen.page(i)
      val got = MainContent.extractSpans(fix.html)
      assert(got.map(s => (s.kind, s.text, s.media_ref)) ==
        fix.expected.map(s => (s.kind, s.text, s.media_ref)),
        s"page $i span mismatch")
      assert(got.map(_.offset) == got.indices.toVector)
    }
  }

  test("distributed extraction: span-sequence equality against fixtures") {
    val n = 60L
    val pages = HtmlGen.pages(spark, n)
    val docs = Extract.extractDocs(pages).collect().map(d => d.doc_id -> d.spans).toMap
    (0L until n).foreach { i =>
      val fix = HtmlGen.page(i)
      assert(docs(fix.docId).map(s => (s.kind, s.text, s.media_ref)) ==
        fix.expected.map(s => (s.kind, s.text, s.media_ref)))
    }
  }

  test("extracted docs flow through the correction pipeline unchanged shape") {
    val pages = HtmlGen.pages(spark, 20)
    val docs = Extract.extractDocs(pages).toDF()
    val out = graft.pipeline.CorrectionPipeline.run(docs, graft.correct.NullCorrector)
    assert(graft.pipeline.CorrectionPipeline.spanSequenceViolations(out, docs).count() == 0)
  }

  test("media refs / title column extractors match the kernel parser") {
    val pages = HtmlGen.pages(spark, 25)
    val viaCol = pages.select($"doc_id", Extract.mediaRefs($"html").as("refs")).
      as[(String, Seq[String])].collect().toMap
    (0L until 25L).foreach { i =>
      val fix = HtmlGen.page(i)
      val expectedRefs = fix.expected.filter(_.kind == Span.KindMedia).map(_.media_ref)
      assert(viaCol(fix.docId) == expectedRefs, s"page $i")
    }
  }

  test("pdf layout: reading order is column-major, deterministic, media preserved") {
    val boxes = Seq(
      PdfLayout.TextBox(0, 0.55, 0.1, "right top", isFigure = false),
      PdfLayout.TextBox(0, 0.05, 0.3, "left bottom", isFigure = false),
      PdfLayout.TextBox(0, 0.06, 0.1, "left top", isFigure = false),
      PdfLayout.TextBox(0, 0.56, 0.3, "media://f1", isFigure = true))
    val ordered = PdfLayout.readingOrder(boxes).map(_.text)
    assert(ordered == Seq("left top", "left bottom", "right top", "media://f1"))

    val spans = PdfLayout.toSpans(boxes)
    assert(spans.map(_.offset) == spans.indices.toVector)
    assert(spans.count(_.kind == Span.KindMedia) == 1)

    val docs = PdfLayout.extractDocs(spark.range(10).toDF("doc_id"))
    val a = docs.collect().map(d => d.doc_id -> d.spans).toMap
    val b = PdfLayout.extractDocs(spark.range(10).toDF("doc_id"))
      .collect().map(d => d.doc_id -> d.spans).toMap
    assert(a == b)
    a.values.foreach(spans => assert(spans.map(_.offset) == spans.indices.toVector))
  }

  test("single-column pages fall back to pure y-order") {
    val boxes = Seq(
      PdfLayout.TextBox(0, 0.1, 0.5, "second", isFigure = false),
      PdfLayout.TextBox(0, 0.12, 0.1, "first", isFigure = false))
    assert(PdfLayout.readingOrder(boxes).map(_.text) == Seq("first", "second"))
  }

  test("pdf codec: encode → parse round-trips text, order, escapes, figures, pages") {
    import graft.extract.PdfCodec
    // two-column page (PDF y points UP: y=700 is near the top) + a figure,
    // plus a second page — encoded, parsed back, run through reading order
    val pdf = PdfCodec.encode(Seq(
      Seq(
        (306.0, 700.0, Left("right top")),
        (50.0, 300.0, Left("left (bottom) \\ special")),
        (50.0, 700.0, Left("left top")),
        (306.0, 300.0, Right("Im7"))),
      Seq((50.0, 700.0, Left("page two")))))
    val boxes = PdfCodec.parse(pdf)
    assert(boxes.length == 5)
    val spans = PdfLayout.toSpans(boxes)
    assert(spans.map(s => if (s.kind == Span.KindMedia) s.media_ref else s.text) == Vector(
      "left top", "left (bottom) \\ special", "right top", "media://pdfobj-Im7", "page two"))
    assert(spans.map(_.offset) == spans.indices.toVector)

    val viaDs = PdfLayout.extractPdfDocs(
      Seq(("d1", pdf)).toDF("doc_id", "pdf")).collect().head
    assert(viaDs.spans == spans)
  }

  test("pdf codec property: random texts with parens/backslashes round-trip exactly") {
    import graft.extract.PdfCodec
    val r = new scala.util.Random(7)
    val glyphs = "abc XYZ09()\\/<>[]{}#%.,'\"!?-"
    (0 until 60).foreach { trial =>
      val nPages = 1 + r.nextInt(3)
      val pages = (0 until nPages).map { _ =>
        (0 until 1 + r.nextInt(5)).map { b =>
          val y = 700.0 - b * 40 // top-down within the page
          if (r.nextDouble() < 0.2) (50.0, y, Right(s"Im${r.nextInt(99)}"))
          else {
            val text = (0 until 1 + r.nextInt(30))
              .map(_ => glyphs(r.nextInt(glyphs.length))).mkString
            (50.0, y, Left(text))
          }
        }
      }
      val parsed = PdfCodec.parse(PdfCodec.encode(pages))
      val want = pages.zipWithIndex.flatMap { case (boxes, p) =>
        boxes.collect {
          case (_, _, Left(t)) if t.nonEmpty => (p, t, false)
          case (_, _, Right(n))              => (p, s"media://pdfobj-$n", true)
        }
      }
      val got = parsed.map(b => (b.page, b.text, b.isFigure))
      assert(got == want, s"trial $trial: $got != $want")
    }
  }

  test("pdf codec: filtered streams and non-PDF bytes decode to nothing (stub fallback)") {
    import graft.extract.PdfCodec
    val filtered =
      ("%PDF-1.4\n1 0 obj\n<< /Length 10 /Filter /FlateDecode >>\nstream\n" +
        "xxxxxxxxxx\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.parse(filtered).isEmpty)
    assert(PdfCodec.parse("not a pdf at all".getBytes("ISO-8859-1")).isEmpty)
    // /Filter in the OUTER dict must be seen even when a sub-dictionary nests
    // after it (the innermost "<<" is the wrong dict to inspect)
    val nested =
      ("%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /DecodeParms << /Predictor 12 >> >>\nstream\n" +
        "(fake) Tj\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.parse(nested).isEmpty, "nested DecodeParms hid the outer /Filter")
    // text containing object-reference-shaped bytes must round-trip intact
    val tricky = PdfCodec.encode(Seq(Seq((50.0, 700.0, Left("see PAGES 0 R and 4 0 obj")))))
    val boxes = PdfCodec.parse(tricky)
    assert(boxes.map(_.text) == Seq("see PAGES 0 R and 4 0 obj"))
    // extractPdfDocs falls back to the deterministic stub
    val doc = PdfLayout.extractPdfDocs(Seq(("d9", filtered)).toDF("doc_id", "pdf"))
      .collect().head
    val stub = PdfLayout.toSpans(PdfLayout.stubDecode("d9"))
    assert(doc.spans == stub)
  }
}
