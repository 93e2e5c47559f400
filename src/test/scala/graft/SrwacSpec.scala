package graft

import java.nio.file.{Files, Paths}
import graft.sources.SrwacSource

class SrwacSpec extends SparkSpec {

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("srwac").toString
    // file 2 sorts after file 1 — global line_id must follow file order
    Files.writeString(Paths.get(dir, "corpus1.xml"),
      """<s>
        |Dobar	A	B	C
        |dan	A	B	C
        |<g/>
        |!	A	B	C
        |</s>
        |junk outside sentence
        |<s>
        |druga	x	y	z
        |malformed line
        |rečenica	x	y	z
        |</s>
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "corpus2.xml"),
      """<s>
        |treća	a	b	c
        |</s>
        |""".stripMargin)
    dir
  }

  test("parse: sentence brackets, 4-field token lines, <g/> joiner, malformed skipped (S1)") {
    val lines =
      """<s>
        |tok1	a	b	c
        |<g/>
        |tok2	a	b	c
        |bad
        |</s>""".stripMargin.linesIterator
    val got = SrwacSource.parseLines(lines).toSeq
    assert(got == Seq(Seq("tok1", "<g/>", "tok2")))
  }

  test("W2 joiner fold matches the reference sentence_to_string") {
    assert(SrwacSource.sentenceToString(Seq("Dobar", "dan", "<g/>", "!")) == "Dobar dan!")
    assert(SrwacSource.sentenceToString(Seq("a", "<g/>", "b", "<g/>", "c")) == "abc")
    assert(SrwacSource.sentenceToString(Seq()) == "")
    assert(SrwacSource.sentenceToString(Seq("<g/>", "x")) == "x") // leading joiner: nothing to glue
  }

  test("end-to-end ingest: file order, global line ids, joined text (S1+W1+W2)") {
    import spark.implicits._
    val dir = writeFixture()
    val got = SrwacSource.plainText(spark, dir).as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1, "Dobar dan!"),
      (2, "druga rečenica"),
      (3, "treća")))
  }
}
