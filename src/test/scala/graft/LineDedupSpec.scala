package graft

import org.apache.spark.sql.functions._
import graft.dedup.LineDedup

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Int, seed: Int): String =
    (0 until n).map(i => s"w${(i * 7 + seed) % 23}").mkString(" ")

  test("segment dedup: first occurrence wins, later copies cut, partials kept") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // one full segment
    val docs = Seq(
      // d1: boilerplate at segment 1 (first occurrence corpus-wide)
      ("d1", boiler + " " + toks(10, 1)),
      // d2: same boilerplate at segment 2 — the loser
      ("d2", toks(10, 2) + " " + boiler),
      // d3: unrelated + a PARTIAL trailing copy prefix (4 tokens — kept)
      ("d3", toks(10, 3) + " b1 b2 b3 b4"),
      // d4: two copies of the same segment WITHIN one doc — second loses
      ("d4", boiler + " " + boiler)).toDF("doc_id", "text")

    val losers = LineDedup.duplicateSegments(docs, width = 10, minTokens = 10)
      .as[(String, Int)].collect().toSet
    // d1 seg1 is the corpus-wide winner, so BOTH of d4's copies lose
    assert(losers == Set(("d2", 2), ("d4", 1), ("d4", 2)), losers.toString)

    val out = LineDedup.dedupSegments(docs, width = 10, minTokens = 10)
      .select($"doc_id", $"deduped_text").as[(String, String)].collect().toMap
    assert(out("d1") == boiler + " " + toks(10, 1), "winner doc unchanged")
    assert(out("d2") == toks(10, 2), "losing copy cut")
    assert(out("d3") == toks(10, 3) + " b1 b2 b3 b4", "partial fragments never cut")
    assert(out("d4") == "", "a doc whose every segment lost rebuilds to empty")

    // idempotence: re-detection on the deduped corpus finds nothing
    val again = LineDedup.duplicateSegments(
      out.toSeq.toDF("doc_id", "text"), width = 10, minTokens = 10)
    assert(again.count() == 0, "re-detection must find nothing")
  }

  test("segment dedup: winner is min (doc_id, unit_no), not arbitrary") {
    val seg = (1 to 10).map(i => s"x$i").mkString(" ")
    // three occurrences: (a, 2), (b, 1), (a, 1) — winner must be (a, 1)
    val docs = Seq(
      ("a", seg + " " + seg),
      ("b", seg + " " + toks(10, 9))).toDF("doc_id", "text")
    val losers = LineDedup.duplicateSegments(docs, width = 10, minTokens = 10)
      .as[(String, Int)].collect().toSet
    assert(losers == Set(("a", 2), ("b", 1)), losers.toString)
  }

  test("line dedup: duplicate lines cut with separator preserved, short lines immune") {
    val docs = Seq(
      ("d1", "unique first line here\nshared boilerplate footer line\nok"),
      ("d2", "another document body line\nshared boilerplate footer line\nok"),
      ("d3", "ok\nok")).toDF("doc_id", "text")
    val losers = LineDedup.duplicateLines(docs, minTokens = 3)
      .as[(String, Int)].collect().toSet
    // the footer repeats (4 tokens >= 3): d1 line 2 wins, d2 line 2 loses;
    // 'ok' lines are 1 token — immune everywhere
    assert(losers == Set(("d2", 2)), losers.toString)
    val out = LineDedup.dedupLines(docs, minTokens = 3)
      .select($"doc_id", $"deduped_text").as[(String, String)].collect().toMap
    assert(out("d1") == "unique first line here\nshared boilerplate footer line\nok")
    assert(out("d2") == "another document body line\nok")
    assert(out("d3") == "ok\nok")
  }

  test("segment dedup naive-reference equivalence on random docs") {
    val rnd = new scala.util.Random(42)
    // a small pool of 10-token boilerplate chunks shared across docs
    // (segment-ALIGNED insertion — fixed windows only collide on aligned
    // repeats) plus per-doc unique filler chunks and a random partial tail
    val pool = (0 until 5).map(b => (1 to 10).map(i => s"boiler${b}_$i").mkString(" "))
    val docs = (0 until 60).map { i =>
      val chunks = (0 until 1 + rnd.nextInt(4)).map { _ =>
        if (rnd.nextInt(3) == 0) pool(rnd.nextInt(pool.size))
        else (1 to 10).map(k => s"u${i}_${rnd.nextInt(1000)}_$k").mkString(" ")
      }
      val tail = (0 until rnd.nextInt(9)).map(k => s"tail$k").mkString(" ")
      (f"doc$i%03d", (chunks :+ tail).filter(_.nonEmpty).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    // naive reference: materialize all segments, first (doc, no) per key wins
    val segs = docs.flatMap { case (id, text) =>
      text.split(" ").grouped(10).zipWithIndex.map { case (g, i) =>
        (id, i + 1, g.mkString(" "), g.length)
      }
    }
    val byKey = segs.filter(_._4 >= 10).groupBy(_._3)
    val expected = byKey.values.filter(_.size > 1).flatMap { occ =>
      val w = occ.minBy(o => (o._1, o._2))
      occ.filterNot(o => (o._1, o._2) == ((w._1, w._2))).map(o => (o._1, o._2))
    }.toSet
    assert(expected.nonEmpty, "fixture must produce duplicate segments")
    val got = LineDedup.duplicateSegments(df, width = 10, minTokens = 10)
      .as[(String, Int)].collect().toSet
    assert(got == expected, s"got $got\nexpected $expected")
  }
  test("token_segments kernel ≡ pure-Column segment builder") {
    val edge = Seq(
      (0L, ""), (1L, "   "), (2L, "one"), (3L, "two words"),
      (4L, "\tTAB  and\n\nNEWLINES  here maybe more tokens now"),
      (5L, (0 until 37).map(i => s"tok$i").mkString(" ")),
      (6L, "ЖУРНАЛ Русский Текст С Кириллицей"),
      (7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    for (w <- Seq(1, 3, 10)) {
      val kernel = graft.dedup.LineDedup.segmentTable(edge, w)
        .as[(Long, Long, String, Int)].collect().toSet
      val witness = edge.select($"doc_id",
          posexplode(graft.dedup.LineDedup.segmentsColWitness($"text", w)).as(Seq("p0", "unit")))
        .select($"doc_id", ($"p0" + 1).as("unit_no"), $"unit",
          size(split($"unit", " ")).as("n_tokens"))
        .as[(Long, Long, String, Int)].collect().toSet
      assert(kernel == witness, s"width=$w")
    }
  }

}
