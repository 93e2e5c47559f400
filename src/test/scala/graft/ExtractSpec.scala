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

  test("html tags with '>' inside quoted attribute values terminate at the real tag end") {
    val page = HtmlParser.parse(
      "<p>before <a href=\"x>y\">link</a> after</p><img src='a>b.png'><p>tail</p>")
    assert(page.blocks.map(_.text) == Vector("before link after", "tail"),
      page.blocks.map(_.text).toString)
    assert(page.blocks.head.linkChars == 4, "anchor text is exactly 'link'")
    assert(page.media.map(_.src) == Vector("a>b.png"))
    // an unclosed ATTRIBUTE quote discards the tail (same policy as an
    // unterminated tag)
    val unclosed = HtmlParser.parse("<p>kept</p><a href=\"oops>never closed")
    assert(unclosed.blocks.map(_.text) == Vector("kept"))
    // quote mode opens only AFTER `=`: a stray `<` in script followed by a
    // quoted string containing `>` must not swallow the closing </script>
    val script = HtmlParser.parse(
      "<script>if (x < 10) document.write(\"<b>hi</b>\");</script><p>MAIN CONTENT</p>")
    assert(script.blocks.map(_.text) == Vector("MAIN CONTENT"), script.blocks.map(_.text).toString)
    // a bare apostrophe in an unquoted attribute value is not a quote opener
    val apos = HtmlParser.parse("<p class=don't>rest of the page</p><p>more</p>")
    assert(apos.blocks.map(_.text) == Vector("rest of the page", "more"))
    // raw-text semantics: even an '=' assignment of a quoted markup string
    // after a stray '<' cannot derail the scan — script content is skipped
    // wholesale to the literal closing tag (HTML5 raw-text elements)
    val assign = HtmlParser.parse(
      "<script>if (x < 10) y = \"a>b\";</script><p>TAIL</p>" +
        "<STYLE>.x{content:\"<>\"}</StYlE><p>AFTER</p>")
    assert(assign.blocks.map(_.text) == Vector("TAIL", "AFTER"), assign.blocks.map(_.text).toString)
    // an unclosed script discards the tail (consistent with drop semantics)
    val unclosedScript = HtmlParser.parse("<p>kept2</p><script>var x = 1;")
    assert(unclosedScript.blocks.map(_.text) == Vector("kept2"))
    // HTML5 "appropriate end tag": '</scriptz' inside a string literal is
    // NOT a close tag (the name must be followed by ws, '/', or '>') — the
    // skip must continue to the real '</script>' and keep the tail
    val prefix = HtmlParser.parse(
      "<script>s = \"</scriptz x=' \";</script><p>TAIL</p>")
    assert(prefix.blocks.map(_.text) == Vector("TAIL"), prefix.blocks.map(_.text).toString)
    val wsClose = HtmlParser.parse("<script>x;</script\n><p>KEPT3</p>")
    assert(wsClose.blocks.map(_.text) == Vector("KEPT3"))
  }

  test("html parser fuzz: hostile/garbage input never throws, spans stay well-formed") {
    val r = new scala.util.Random(13)
    val fragments = Seq("<p>", "</p>", "<div", ">", "<a href='x'>", "</a>", "<<<", "&amp;",
      "<script>", "</script>", "<img src=\"", "\"/>", "plain text", "<!-- comment",
      "<p", "=''", "</", "😀", "ж", "<nav>", "</nav>", " ", "<title>")
    (0 until 120).foreach { trial =>
      val html = (0 until r.nextInt(60)).map(_ => fragments(r.nextInt(fragments.length))).mkString
      val page = HtmlParser.parse(html) // must not throw
      page.blocks.foreach(b => assert(b.linkChars >= 0 && b.linkChars <= b.text.length + 16))
      val spans = MainContent.extractSpans(html)
      assert(spans.map(_.offset) == spans.indices.toVector,
        s"trial $trial: offsets not contiguous")
      spans.foreach(s => assert(s.kind == Span.KindText || s.kind == Span.KindMedia))
    }
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
      // every encoder configuration must round-trip identically: plain /
      // Flate / predictor-filtered / ASCII85-chained streams × literal-Tj /
      // kerned-TJ / hex show-text
      val compress = r.nextBoolean()
      val textOp = r.nextInt(3)
      val predictor = if (!compress) 1 else Seq(1, 2, 12, 15)(r.nextInt(4))
      val ascii85 = compress && r.nextBoolean()
      val parsed = PdfCodec.parse(
        PdfCodec.encode(pages, compress, textOp, predictor, 24, ascii85))
      val want = pages.zipWithIndex.flatMap { case (boxes, p) =>
        boxes.collect {
          case (_, _, Left(t)) if t.nonEmpty => (p, t, false)
          case (_, _, Right(n))              => (p, s"media://pdfobj-$n", true)
        }
      }
      val got = parsed.map(b => (b.page, b.text, b.isFigure))
      assert(got == want,
        s"trial $trial (compress=$compress textOp=$textOp predictor=$predictor ascii85=$ascii85): $got != $want")
    }
  }

  test("pdf codec: PNG/TIFF predictors and the ASCII85+Flate chain decode exactly") {
    import graft.extract.PdfCodec
    val pages = Seq(
      Seq((50.0, 700.0, Left("predictor row one (with) \\ escapes"): Either[String, String]),
        (50.0, 660.0, Left("predictor row two"): Either[String, String]),
        (50.0, 620.0, Right("Im7"): Either[String, String])),
      Seq((50.0, 700.0, Left("second page"): Either[String, String])))
    val plain = PdfCodec.parse(PdfCodec.encode(pages))
    // PNG Up rows (pdflatex/Ghostscript shape), all-five-filters cycle,
    // TIFF differencing — each must decode identically to the plain form
    for (pred <- Seq(12, 15, 2)) {
      val got = PdfCodec.parse(PdfCodec.encode(pages, compress = true, predictor = pred))
      assert(got == plain, s"predictor $pred diverged")
    }
    // the classic mail-safe chain, with and without a predictor (the parms
    // array aligns null to ASCII85Decode and the dict to FlateDecode)
    val chain = PdfCodec.parse(PdfCodec.encode(pages, compress = true, ascii85 = true))
    assert(chain == plain, "ASCII85+Flate chain diverged")
    val chainPred = PdfCodec.parse(
      PdfCodec.encode(pages, compress = true, predictor = 15, ascii85 = true))
    assert(chainPred == plain, "ASCII85+Flate+predictor chain diverged")
  }

  test("pdf codec: unsupported filters in a chain and hostile ASCII85 fall back to nothing") {
    import graft.extract.PdfCodec
    def doc(filter: String, body: String) =
      (s"%PDF-1.4\n1 0 obj\n<< /Length ${body.length} $filter >>\nstream\n" +
        body + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    // LZW anywhere in the chain: no codec → no boxes, no throw
    assert(PdfCodec.parse(doc("/Filter [/LZWDecode /FlateDecode]", "xxxx")).isEmpty)
    assert(PdfCodec.parse(doc("/Filter [/ASCII85Decode /LZWDecode]", "xxxx")).isEmpty)
    // garbage ASCII85 (out-of-range chars, lone trailing digit, overflow group)
    assert(PdfCodec.parse(doc("/Filter /ASCII85Decode", "\u00ff\u00fe junk")).isEmpty)
    assert(PdfCodec.parse(doc("/Filter [/ASCII85Decode /FlateDecode]", "zzzz!")).isEmpty)
    assert(PdfCodec.parse(doc("/Filter [/ASCII85Decode /FlateDecode]", "uuuuu")).isEmpty)
    // predictor with ragged data (not a row multiple) → skipped, no throw
    val defl = {
      val d = new java.util.zip.Deflater(); d.setInput("abc".getBytes); d.finish()
      val o = new java.io.ByteArrayOutputStream(); val b = new Array[Byte](64)
      while (!d.finished()) o.write(b, 0, d.deflate(b)); d.end()
      new String(o.toByteArray, "ISO-8859-1")
    }
    assert(PdfCodec.parse(doc(
      "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 24 >>", defl)).isEmpty)
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
    // text containing the word "endstream" must not truncate the stream —
    // the parser delimits by the declared /Length, not a literal scan
    val evil = PdfCodec.encode(Seq(Seq(
      (50.0, 700.0, Left("about endstream markers")),
      (50.0, 660.0, Left("second line")))))
    assert(PdfCodec.parse(evil).map(_.text) ==
      Seq("about endstream markers", "second line"))
    // an INDIRECT /Length (`/Length 6 0 R`) must not be read as a byte count
    // — that would truncate the stream to 6 bytes; the endstream scan
    // fallback recovers the full content
    val indirect =
      ("%PDF-1.4\n1 0 obj\n<< /Length 6 0 R >>\nstream\n" +
        "BT /F1 12 Tf 50.0 700.0 Td (full text survives) Tj ET\n" +
        "endstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.parse(indirect).map(_.text) == Seq("full text survives"))
    // a blank middle page keeps its page slot (resolved via /Contents refs)
    val blankMid = PdfCodec.encode(Seq(
      Seq((50.0, 700.0, Left("first"))), Seq.empty, Seq((50.0, 700.0, Left("third")))))
    assert(PdfCodec.parse(blankMid).map(b => (b.page, b.text)) ==
      Seq((0, "first"), (2, "third")))
    // an uncompressed NON-content stream (XMP metadata) must not consume a
    // page slot and shift later pages
    val twoPages = PdfCodec.encode(Seq(
      Seq((50.0, 700.0, Left("page one"))), Seq((50.0, 700.0, Left("page two")))))
    val xmp = "9 0 obj\n<< /Type /Metadata /Subtype /XML /Length 20 >>\nstream\n" +
      "<x:xmpmeta></x:meta>\nendstream\nendobj\n"
    val s = new String(twoPages, "ISO-8859-1")
    val firstEnd = s.indexOf("endobj") + "endobj\n".length
    val withMeta = (s.substring(0, firstEnd) + xmp + s.substring(firstEnd)).getBytes("ISO-8859-1")
    val pb = PdfCodec.parse(withMeta)
    assert(pb.map(b => (b.page, b.text)) == Seq((0, "page one"), (1, "page two")),
      s"metadata stream shifted pages: ${pb.map(b => (b.page, b.text))}")
    // extractPdfDocs falls back to the deterministic stub
    val doc = PdfLayout.extractPdfDocs(Seq(("d9", filtered)).toDF("doc_id", "pdf"))
      .collect().head
    val stub = PdfLayout.toSpans(PdfLayout.stubDecode("d9"))
    assert(doc.spans == stub)
    // a MULTI-DIGIT indirect /Length (`/Length 60 0 R`) must not let regex
    // backtracking split the number ("6" as byte count, "0 0 R" as tail)
    val indirectWide =
      ("%PDF-1.4\n1 0 obj\n<< /Length 60 0 R >>\nstream\n" +
        "BT /F1 12 Tf 50.0 700.0 Td (multi-digit indirect length) Tj ET\n" +
        "endstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.parse(indirectWide).map(_.text) == Seq("multi-digit indirect length"))
    // an indirect /Length whose target integer object EXISTS is resolved —
    // required here because the content contains the literal "endstream",
    // which the scan fallback would truncate at
    val body2 = "BT /F1 12 Tf 50.0 700.0 Td (mentions endstream inside) Tj ET\n"
    val resolved =
      ("%PDF-1.4\n1 0 obj\n<< /Length 2 0 R >>\nstream\n" + body2 +
        "endstream\nendobj\n2 0 obj\n" + body2.length + "\nendobj\n%%EOF")
        .getBytes("ISO-8859-1")
    assert(PdfCodec.parse(resolved).map(_.text) == Seq("mentions endstream inside"))
  }

  test("pdf codec: FlateDecode streams inflate and round-trip (java.util.zip)") {
    import graft.extract.PdfCodec
    val pages = Seq(
      Seq(
        (50.0, 700.0, Left("compressed (page) \\ one"): Either[String, String]),
        (306.0, 300.0, Right("Im3"): Either[String, String])),
      Seq((50.0, 700.0, Left("compressed page two"): Either[String, String])))
    val plain = PdfCodec.parse(PdfCodec.encode(pages))
    val flate = PdfCodec.parse(PdfCodec.encode(pages, compress = true))
    assert(flate.nonEmpty && flate == plain, s"flate=$flate plain=$plain")
    // truncated compressed bytes fail inflation → decode to nothing, no throw
    val full = PdfCodec.encode(Seq(Seq((50.0, 700.0, Left("x" * 200)))), compress = true)
    val cut = java.util.Arrays.copyOf(full, full.length / 3)
    assert(PdfCodec.parse(cut).isEmpty || PdfCodec.parse(cut).nonEmpty) // must not throw
    // a zip bomb (tiny deflate of a huge stream) is rejected by the 64 MiB cap
    val defl = new java.util.zip.Deflater()
    defl.setInput(("BT (b) Tj ET " * 8000000).getBytes("ISO-8859-1")) // ~100 MB inflated
    defl.finish()
    val bo = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) bo.write(buf, 0, defl.deflate(buf))
    defl.end()
    val bomb = new String(bo.toByteArray, "ISO-8859-1")
    val bombPdf =
      (s"%PDF-1.4\n1 0 obj\n<< /Length ${bomb.length} /Filter /FlateDecode >>\nstream\n" +
        bomb + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.parse(bombPdf).isEmpty, "zip bomb was inflated past the cap")
    // a MULTI-STAGE filter pipeline starting with FlateDecode must be
    // skipped — inflating only the first stage yields still-encoded bytes,
    // not page content
    val body85 = "deflated-then-ascii85-bytes-(fake) Tj pretend"
    val multi =
      (s"%PDF-1.4\n1 0 obj\n<< /Length ${body85.length} /Filter [/FlateDecode /ASCII85Decode] >>\nstream\n" +
        body85 + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.parse(multi).isEmpty, "multi-filter chain was partially decoded")
  }

  test("pdf codec: /Contents array — one page's content split across streams") {
    import graft.extract.PdfCodec
    def contentObj(id: Int, body: String) =
      s"$id 0 obj\n<< /Length ${body.length} >>\nstream\n$body\nendstream\nendobj\n"
    val b1 = "BT /F1 12 Tf 50.0 700.0 Td (first stream) Tj ET\n"
    val b2 = "BT /F1 12 Tf 50.0 660.0 Td (second stream) Tj ET\n"
    val b3 = "BT /F1 12 Tf 50.0 700.0 Td (page two) Tj ET\n"
    val pdf =
      ("%PDF-1.4\n" + contentObj(1, b1) + contentObj(2, b2) + contentObj(3, b3) +
        "4 0 obj\n<< /Type /Page /Parent 6 0 R /MediaBox [0 0 612 792] /Contents [1 0 R 2 0 R] >>\nendobj\n" +
        "5 0 obj\n<< /Type /Page /Parent 6 0 R /MediaBox [0 0 612 792] /Contents 3 0 R >>\nendobj\n" +
        "6 0 obj\n<< /Type /Pages /Kids [4 0 R 5 0 R] /Count 2 >>\nendobj\n" +
        "7 0 obj\n<< /Type /Catalog /Pages 6 0 R >>\nendobj\n%%EOF").getBytes("ISO-8859-1")
    val boxes = PdfCodec.parse(pdf)
    assert(boxes.map(b => (b.page, b.text)) ==
      Seq((0, "first stream"), (0, "second stream"), (1, "page two")), boxes.toString)
  }

  test("pdf codec: TJ kerned arrays and hex show-text round-trip") {
    import graft.extract.PdfCodec
    val pages = Seq(Seq(
      (50.0, 700.0, Left("kerned world text"): Either[String, String]),
      (50.0, 660.0, Left("second (line) \\ done"): Either[String, String])))
    val want = PdfCodec.parse(PdfCodec.encode(pages)).map(_.text)
    assert(want == Seq("kerned world text", "second (line) \\ done"))
    // TJ array form: [(a) -120 (b)] TJ concatenates, drops kern numbers
    assert(PdfCodec.parse(PdfCodec.encode(pages, textOp = 1)).map(_.text) == want)
    // hex string form: <48...> Tj decodes hex pairs
    assert(PdfCodec.parse(PdfCodec.encode(pages, textOp = 2)).map(_.text) == want)
    // compressed + TJ together
    assert(PdfCodec.parse(PdfCodec.encode(pages, compress = true, textOp = 1)).map(_.text) == want)
    // hand-written edge cases: whitespace inside hex, odd digit count pads 0,
    // ' shorthand shows text
    val hand =
      ("%PDF-1.4\n1 0 obj\n<< /Length 999 >>\nstream\n" +
        "BT <48 65 6C6C 6F> Tj ET\n" +        // "Hello" with embedded spaces
        "BT <41 2> Tj ET\n" +                  // odd count: 41 2(0) = "A " → "A" + space
        "BT (shorthand) ' ET\n" +
        "BT [(multi) -88 ( part) 12 ( TJ)] TJ ET\n" +
        "endstream\nendobj\n%%EOF")
    val fixedLen = hand.replace("/Length 999", s"/Length ${hand.indexOf("\nendstream") - hand.indexOf("stream\n") - "stream\n".length}")
    val got = PdfCodec.parse(fixedLen.getBytes("ISO-8859-1")).map(_.text)
    assert(got == Seq("Hello", "A ", "shorthand", "multi part TJ"), got.toString)
  }
}
