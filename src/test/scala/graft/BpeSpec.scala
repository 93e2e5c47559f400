package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.textanalysis.Bpe

class BpeSpec extends AnyFunSuite {
  val spark = SparkSpec.spark
  import spark.implicits._

  // ---- driver-side reference BPE (the Sennrich'16 pseudocode, verbatim) ----
  private def refSymbols(word: String): List[String] =
    word.map(_.toString).toList :+ Bpe.EndOfWord

  private def refMerge(sym: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) { out += (a + b); i += 2 }
      else { out += sym(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(wordCounts: Map[String, Long], numMerges: Int,
                       minPairCount: Long = 2L): Seq[(String, String)] = {
    var syms = wordCounts.map { case (w, n) => (refSymbols(w), n) }.toList
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, n) =>
        s.sliding(2).foreach {
          case List(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + n
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties (l, r) lexicographic ascending
        val ((l, r), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        if (c < minPairCount) done = true
        else {
          merges += ((l, r))
          syms = syms.map { case (s, n) => (refMerge(s, l, r), n) }
        }
      }
    }
    merges.toSeq
  }

  private val texts = Seq(
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the newest lowest the the")
  private val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")
  private val refWc: Map[String, Long] = texts.flatMap(_.split(" ")).groupBy(identity)
    .map { case (w, ws) => w -> ws.length.toLong }

  test("trained merges equal the reference implementation exactly (ranks + ties)") {
    val got = Bpe.trainMerges(docs, numMerges = 25)
    val want = refTrain(refWc, 25)
    assert(got == want, s"\n got: $got\nwant: $want")
    assert(got.nonEmpty)
    // repartition-proof: integer counts + lexicographic ties
    val got2 = Bpe.trainMerges(docs.repartition(7), numMerges = 25)
    assert(got2 == got)
  }

  test("batched training bit-equals the sequential loop at batch 1/4/16 (small-alphabet fuzz)") {
    // Tiny alphabets force heavy symbol reuse: count ties at batch
    // boundaries, conflicting top pairs, and concat collisions with live
    // symbols — every trim/freshness path in the batched selector.
    val rnd = new scala.util.Random(20260818L)
    for ((alpha, trial) <- Seq("ab", "cde", "abc").zipWithIndex) {
      val words = (0 until 120).map(_ =>
        (0 until (1 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val wc = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      val fdocs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      val want = refTrain(wc, 40, 1L)
      for (b <- Seq(1, 4, 16)) {
        val got = Bpe.trainMerges(fdocs, numMerges = 40, minPairCount = 1L, maxBatch = b)
        assert(got == want, s"trial=$trial batch=$b\n got: $got\nwant: $want")
      }
    }
  }

  test("driver-local delta-maintained training bit-equals the relational loop and the reference") {
    val want = refTrain(refWc, 25)
    assert(Bpe.trainMergesLocal(docs, numMerges = 25) == want)
    // delta maintenance vs full recount, on adversarial small alphabets
    val rnd = new scala.util.Random(42L)
    for (alpha <- Seq("ab", "abc", "abcd")) {
      val words = (0 until 150).map(_ =>
        (0 until (1 + rnd.nextInt(8))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val wc = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      val fdocs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      val want2 = refTrain(wc, 80, 1L)
      assert(Bpe.trainMergesLocal(fdocs, 80, minPairCount = 1L) == want2, s"alpha=$alpha")
    }
    // maxWords truncation == training on the truncated word table
    val top2 = refWc.toSeq.sortBy { case (w, n) => (-n, w) }.take(2).toMap
    assert(Bpe.trainMergesLocal(docs, 25, maxWords = 2) == refTrain(top2, 25))
  }

  test("early stop: no pair reaches minPairCount => shorter merge list") {
    val tiny = Seq((0L, "ab cd")).toDF("doc_id", "text")
    // every adjacent pair occurs exactly once: nothing to merge at the
    // default floor of 2
    assert(Bpe.trainMerges(tiny, numMerges = 10) == Nil)
    // with the floor at 1 it merges until single symbols remain
    val all = Bpe.trainMerges(tiny, numMerges = 100, minPairCount = 1L)
    assert(all == refTrain(Map("ab" -> 1L, "cd" -> 1L), 100, 1L))
  }

  test("merge rewrite is leftmost-first non-overlapping") {
    val words = Seq("aaa", "aaaa", "aab").toDF("word")
    val enc = Bpe.encodeWords(words, Seq(("a", "a")))
      .as[(String, Seq[String])].collect().toMap
    assert(enc("aaa") == Seq("aa", "a", Bpe.EndOfWord))
    assert(enc("aaaa") == Seq("aa", "aa", Bpe.EndOfWord))
    assert(enc("aab") == Seq("aa", "b", Bpe.EndOfWord))
  }

  test("encodeWords applies long merge lists (checkpoint chunking) and is lossless") {
    val merges = Bpe.trainMerges(docs, numMerges = 40, minPairCount = 1L)
    assert(merges.length > 20, s"fixture should yield > 20 merges, got ${merges.length}")
    val words = refWc.keys.toSeq.toDF("word")
    val enc = Bpe.encodeWords(words, merges)
      .as[(String, Seq[String])].collect().toMap
    // the kernel and the fold-column witness stay bit-equal
    val encFold = Bpe.encodeWordsFold(words, merges, chunk = 8)
      .as[(String, Seq[String])].collect().toMap
    assert(enc == encFold)
    refWc.keys.foreach { w =>
      // engine tokens == reference merges applied in rank order
      var ref = refSymbols(w)
      merges.foreach { case (a, b) => ref = refMerge(ref, a, b) }
      assert(enc(w) == ref, s"word $w")
      // lossless: concatenated tokens spell the word + marker
      assert(enc(w).mkString == w + Bpe.EndOfWord, s"word $w")
    }
    // frequent whole words collapse to single symbols (+ marker merge)
    assert(enc("low").length <= 2, s"'low' should be fully merged: ${enc("low")}")
  }

  test("bpe_encode kernel ≡ fold-column chain at 1/16/1000 merges (fuzz)") {
    val rnd = new scala.util.Random(20260822L)
    val alpha = "abc"
    val words = ((0 until 80).map(_ =>
      (0 until (1 + rnd.nextInt(9))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      :+ "").distinct.toDF("word")
    // arbitrary (not just trained) merge lists: random non-empty symbol
    // pairs over the alphabet's closure — encode semantics are defined for
    // any list, and the kernel must match the fold on all of them
    def randSym(): String =
      (0 until (1 + rnd.nextInt(3))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pool = (0 until 1000).map(_ => (randSym(), randSym()))
    for (n <- Seq(1, 16, 1000)) {
      val merges = pool.take(n)
      val kernel = Bpe.encodeWords(words, merges)
        .as[(String, Seq[String])].collect().toMap
      val fold = Bpe.encodeWordsFold(words, merges)
        .as[(String, Seq[String])].collect().toMap
      assert(kernel == fold, s"n=$n")
    }
    // trained-table case with the marker-bearing merges included
    val trained = Bpe.trainMerges(docs, numMerges = 30, minPairCount = 1L)
    val tw = refWc.keys.toSeq.toDF("word")
    assert(Bpe.encodeWords(tw, trained).as[(String, Seq[String])].collect().toMap ==
      Bpe.encodeWordsFold(tw, trained).as[(String, Seq[String])].collect().toMap)
  }

  test("encodeDocs reassembles per-doc subword streams in word order") {
    val merges = Bpe.trainMerges(docs, numMerges = 10)
    val got = Bpe.encodeDocs(docs, merges)
      .as[(Long, Seq[String])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = t.split(" ").filter(_.nonEmpty).flatMap { w =>
        var ref = refSymbols(w)
        merges.foreach { case (a, b) => ref = refMerge(ref, a, b) }
        ref
      }.toSeq
      assert(got(i.toLong) == want, s"doc $i")
    }
  }

  test("merge table round-trips through parquet") {
    val merges = Bpe.trainMerges(docs, numMerges = 12)
    val dir = java.nio.file.Files.createTempDirectory("bpe-merges").toString
    Bpe.saveMerges(spark, merges, dir)
    assert(Bpe.loadMerges(spark, dir) == merges)
  }
}
