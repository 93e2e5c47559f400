package graft

import org.apache.spark.sql.functions._
import graft.textanalysis.SubstringDup

class SubstringDupSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String) = s.toLowerCase.replaceAll("\\s+", " ").trim

  /** Brute-force longest common substring (code units; fixtures are ASCII). */
  private def lcs(a: String, b: String): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    best
  }

  test("k-gram hash table: positions, short-doc guard, normalization") {
    val df = Seq((1L, "abcde"), (2L, "abc"), (3L, "AB  CDE")).toDF("doc_id", "text")
    val kg = SubstringDup.kgramHashTable(df, k = 4)
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(kg(1L).map(_._2).sorted.toSeq == Seq(1, 2))       // "abcd", "bcde"
    assert(!kg.contains(2L))                                  // len 3 < k
    assert(kg(3L).map(_._2).sorted.toSeq == Seq(1, 2, 3))   // "ab cde" len 6
    // same normalized k-gram ⇒ same hash across docs
    val h1 = SubstringDup.kgramHashTable(Seq((1L, "xABCDx")).toDF("doc_id", "text"), 4)
      .filter($"pos" === 2).as[(Long, Int, Long)].head()._3
    val h2 = SubstringDup.kgramHashTable(Seq((2L, "abcd")).toDF("doc_id", "text"), 4)
      .as[(Long, Int, Long)].head()._3
    assert(h1 == h2)
  }

  test("planted shared substrings are found with exact character lengths") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"prefix one $shared and a unique tail here"),
      (2L, s"$shared totally different continuation text"),
      (3L, "no overlap with anything else in this corpus at all"),
      (4L, s"two hits: $shared middle filler words $shared end")).toDF("doc_id", "text")
    val pairs = SubstringDup.sharedSubstringPairs(docs, minLen = 20, k = 8)
      .as[(Long, Long, Long, Long)].collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // run length equals the true longest common substring
    assert(pairs((1L, 2L))._2 == lcs(norm(s"prefix one $shared and a unique tail here"),
      norm(s"$shared totally different continuation text")))
    // doc 4 contains the shared block twice → two runs against doc 1
    assert(pairs((1L, 4L))._1 == 2L)
  }

  test("property: max_run_chars == brute-force LCS on random near-dup texts") {
    val r = new scala.util.Random(52)
    val rng = new graft.gen.DetRng(13L)
    val base = (0 until 12).map(i => DocGenHelpers.sentence(rng, 6 + r.nextInt(6)))
    // half the docs borrow a long middle slice from another doc
    val texts = base.zipWithIndex.map { case (t, i) =>
      if (i % 2 == 1) {
        val donor = base(i - 1)
        val slice = donor.substring(donor.length / 4, donor.length * 3 / 4)
        s"${DocGenHelpers.sentence(rng, 2)} $slice ${DocGenHelpers.sentence(rng, 2)}"
      } else t
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val minLen = 15
    val got = SubstringDup.sharedSubstringPairs(docs, minLen = minLen, k = 5, maxDocFreq = 1000L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r2 => (r2._1, r2._2) -> r2._4).toMap
    val normed = texts.map(norm)
    for (a <- normed.indices; b <- normed.indices if a < b) {
      val l = lcs(normed(a), normed(b))
      if (l >= minLen)
        assert(got.get((a.toLong, b.toLong)).contains(l.toLong), s"pair ($a,$b) want $l, got ${got.get((a.toLong, b.toLong))}")
      else
        assert(!got.contains((a.toLong, b.toLong)), s"pair ($a,$b) spurious (lcs $l)")
    }
  }

  test("native rolling-hash table ≡ md5 witness table (keys + pair output)") {
    val rng = new graft.gen.DetRng(17L)
    val docs = (0L until 20L).map { i =>
      val t = DocGenHelpers.sentence(rng, 5 + (i % 5).toInt)
      (i, if (i % 3 == 2) t + " " + DocGenHelpers.sentence(rng, 3) else t)
    }.toDF("doc_id", "text")
    // same (id, pos) key set — the hash FAMILIES differ by design
    val nk = SubstringDup.kgramHashTable(docs, 6).select($"doc_id", $"pos")
      .as[(Long, Int)].collect().toSet
    val mk = SubstringDup.kgramHashTableMd5(docs, 6).select($"doc_id", $"pos")
      .as[(Long, Int)].collect().toSet
    assert(nk == mk)
    // identical pair output (runs depend only on hash-equality structure)
    def pairsWith(kg: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] = {
      // rebuild sharedSubstringPairs' tail over a given k-gram table
      import org.apache.spark.sql.expressions.Window
      val dfc = kg.groupBy($"h").agg(countDistinct($"doc_id").as("c"))
        .filter($"c" <= 1000).select($"h")
      val capped = kg.join(dfc, "h")
      val m = capped.select($"h", $"doc_id".as("doc_a"), $"pos".as("pa"))
        .join(capped.select($"h", $"doc_id".as("doc_b"), $"pos".as("pb")), "h")
        .filter($"doc_a" < $"doc_b")
        .withColumn("diag", $"pa" - $"pb")
      val w = Window.partitionBy($"doc_a", $"doc_b", $"diag").orderBy($"pa")
      m.withColumn("island", $"pa" - row_number().over(w))
        .groupBy($"doc_a", $"doc_b", $"diag", $"island").agg(count(lit(1)).as("r"))
        .withColumn("rc", $"r" + 5).filter($"rc" >= 12)
        .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_runs"), max($"rc").as("mx"))
        .as[(Long, Long, Long, Long)].collect().toSet
    }
    assert(pairsWith(SubstringDup.kgramHashTable(docs, 6)) ==
      pairsWith(SubstringDup.kgramHashTableMd5(docs, 6)))
  }

  test("removal intervals: lower id keeps its copy; overlaps merge") {
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"alpha $shared omega"),
      (2L, s"$shared beta"),                     // one cut vs doc 1
      (3L, s"gamma $shared delta $shared")).toDF("doc_id", "text") // two cuts
    val iv = SubstringDup.duplicateRunIntervals(docs, minLen = 30, k = 8)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(!iv.contains(1L), "the minimum-id holder must keep its copy")
    assert(iv(2L).length == 1)
    assert(iv(3L).length == 2, s"doc 3 has two occurrences: ${iv(3L).toSeq}")
    // interval boundaries carry exact character coordinates: cutting them
    // removes the shared block (plus any shared boundary chars) from doc 2
    val deduped = SubstringDup.removeDuplicateRuns(docs, minLen = 30, k = 8)
      .select($"doc_id", $"deduped_text").as[(Long, String)].collect().toMap
    assert(deduped(1L) == norm(s"alpha $shared omega"), "survivor text untouched")
    assert(!deduped(2L).contains("quick brown"))
    assert(deduped(2L).endsWith("beta"))
    assert(!deduped(3L).contains("quick brown"))
  }

  test("property: after removeDuplicateRuns re-detection finds nothing") {
    val r = new scala.util.Random(53)
    val rng = new graft.gen.DetRng(19L)
    val base = (0 until 10).map(_ => DocGenHelpers.sentence(rng, 8 + r.nextInt(5)))
    val texts = base.zipWithIndex.map { case (t, i) =>
      if (i % 2 == 1) {
        val donor = base(i - 1)
        s"${DocGenHelpers.sentence(rng, 2)} ${donor.substring(0, donor.length * 2 / 3)} ${DocGenHelpers.sentence(rng, 2)}"
      } else t
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val minLen = 20
    val before = SubstringDup.sharedSubstringPairs(docs, minLen, k = 6, maxDocFreq = 1000L).count()
    assert(before > 0, "fixture must contain shared substrings")
    val deduped = SubstringDup.removeDuplicateRuns(docs, minLen, k = 6, maxDocFreq = 1000L)
      .select($"doc_id", $"deduped_text".as("text"))
    val after = SubstringDup.sharedSubstringPairs(deduped, minLen, k = 6, maxDocFreq = 1000L).count()
    assert(after == 0L, s"re-detection still finds $after pairs")
  }

  test("self-repeats: planted within-doc block found, clean docs absent") {
    val block = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"alpha $block middle filler $block omega"),
      (2L, "no internal repetition in this document at all whatsoever"),
      (3L, s"cross-doc only: $block appears once here")).toDF("doc_id", "text")
    val reps = SubstringDup.selfRepeats(docs, minLen = 20, k = 8)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(reps.keySet == Set(1L), s"got $reps")
    // both occurrences are followed by ' ' so the maximal run extends one
    // char past the block — exactly the brute-force LRS
    assert(reps(1L)._2 == lrsOverlap(norm(s"alpha $block middle filler $block omega")))
    // doc 3 shares the block with doc 1 CROSS-doc but has no self-repeat;
    // the cross-doc query is the one that must flag (1,3)
    val pairs = SubstringDup.sharedSubstringPairs(docs, minLen = 20, k = 8)
      .as[(Long, Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 3L)))
  }

  test("property: self max_run_chars == brute-force longest repeated substring") {
    val r = new scala.util.Random(57)
    val rng = new graft.gen.DetRng(31L)
    val texts = (0 until 12).map { i =>
      val t = DocGenHelpers.sentence(rng, 8 + r.nextInt(5))
      if (i % 2 == 1) {
        // repeat a long middle slice of the doc within itself
        val slice = t.substring(t.length / 4, t.length * 3 / 4)
        s"$t ${DocGenHelpers.sentence(rng, 2)} $slice"
      } else t
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val minLen = 15
    val got = SubstringDup.selfRepeats(docs, minLen, k = 6)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = lrsOverlap(norm(t))
      if (want >= minLen) assert(got(i.toLong) == want, s"doc $i: ${got.get(i.toLong)} vs $want")
      else assert(!got.contains(i.toLong), s"doc $i flagged below minLen: ${got.get(i.toLong)}")
    }
  }

  test("self-repeat cut keeps the FIRST occurrence; periodic text collapses to its period") {
    val block = "an exactly repeated boilerplate fragment here"
    val docs = Seq(
      (1L, s"alpha $block middle $block omega"),
      (2L, "abcd" * 10)).toDF("doc_id", "text")
    val out = SubstringDup.removeSelfRepeats(docs, minLen = 16, k = 8)
      .select($"doc_id", $"deduped_text").as[(Long, String)].collect().toMap
    // first occurrence survives, the later one is cut
    assert(out(1L).indexOf(block) >= 0)
    assert(out(1L).indexOf(block) == out(1L).lastIndexOf(block), out(1L))
    // periodic doc: overlapping-diagonal intervals merge to one cut from
    // the second period to the end
    assert(out(2L) == "abcd", out(2L))
    // re-detection on the cut corpus finds nothing
    val again = SubstringDup.selfRepeats(
      out.toSeq.toDF("doc_id", "text"), minLen = 16, k = 8).count()
    assert(again == 0L, s"re-detection still finds $again docs")
  }

  test("self-repeat per-(doc, hash) occurrence cap silences pathological repeaters") {
    val docs = Seq((1L, "abcd" * 50)).toDF("doc_id", "text")
    // every 4-gram of the periodic doc occurs ~50 times > cap 2: all hash
    // candidates are dropped, so the doc emits no runs (the documented
    // stop-hash trade, scoped per doc)
    assert(SubstringDup.selfRepeats(docs, minLen = 8, k = 4, maxOcc = 2L).count() == 0L)
    // with the cap off it is flagged
    assert(SubstringDup.selfRepeats(docs, minLen = 8, k = 4, maxOcc = 0L).count() == 1L)
  }

  /** Brute-force longest repeated substring, overlap allowed: max common
    * extension over start pairs i < j (suffix DP, O(n²)). */
  private def lrsOverlap(s: String): Int = {
    val n = s.length
    val ext = Array.ofDim[Int](n + 1, n + 1)
    var best = 0
    for (i <- (n - 1) to 0 by -1; j <- (n - 1) to 0 by -1)
      if (s(i) == s(j)) {
        ext(i)(j) = ext(i + 1)(j + 1) + 1
        if (i < j && ext(i)(j) > best) best = ext(i)(j)
      }
    best
  }

  test("winnow-prefiltered form ≡ plain form (exactness guarantee at minLen >= 2k-1)") {
    val r = new scala.util.Random(54)
    val rng = new graft.gen.DetRng(29L)
    val base = (0 until 14).map(_ => DocGenHelpers.sentence(rng, 7 + r.nextInt(5)))
    val texts = base.zipWithIndex.map { case (t, i) =>
      if (i % 2 == 1) {
        val donor = base(i - 1)
        s"${DocGenHelpers.sentence(rng, 2)} ${donor.substring(0, donor.length * 3 / 4)}"
      } else t
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val plain = SubstringDup.sharedSubstringPairs(docs, minLen = 15, k = 8, maxDocFreq = 10000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val pre = SubstringDup.sharedSubstringPairsPrefiltered(docs, minLen = 15, k = 8, maxDocFreq = 10000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(plain.nonEmpty, "fixture must produce shared-substring pairs")
    assert(pre == plain)
    intercept[IllegalArgumentException] { // guarantee window enforced
      SubstringDup.sharedSubstringPairsPrefiltered(docs, minLen = 10, k = 8)
    }
  }

  test("detectAndIntervals ≡ the two separate operators (one runs computation)") {
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"alpha $shared omega"),
      (2L, s"$shared beta"),
      (3L, s"gamma $shared delta $shared"),
      (4L, "entirely unrelated filler content goes here")).toDF("doc_id", "text")
    val (pairs, ivs) = SubstringDup.detectAndIntervals(docs, minLen = 30, k = 8)
    assert(pairs.as[(Long, Long, Long, Long)].collect().toSet ==
      SubstringDup.sharedSubstringPairs(docs, minLen = 30, k = 8)
        .as[(Long, Long, Long, Long)].collect().toSet)
    assert(ivs.as[(Long, Long, Long)].collect().toSet ==
      SubstringDup.duplicateRunIntervals(docs, minLen = 30, k = 8)
        .as[(Long, Long, Long)].collect().toSet)
    assert(pairs.count() > 0 && ivs.count() > 0)
  }

  test("stop-hash df cap drops boilerplate-only pairs") {
    // 30 docs all share one boilerplate banner; only two share unique text
    val banner = "copyright footer all rights reserved banner"
    val unique = "completely unique duplicated investigative paragraph"
    val docs = ((1L to 30L).map(i => (i, s"$banner doc number $i")) ++
      Seq((31L, s"$unique alpha"), (32L, s"beta $unique"))).toDF("doc_id", "text")
    val capped = SubstringDup.sharedSubstringPairs(docs, minLen = 20, k = 8, maxDocFreq = 8L)
      .as[(Long, Long, Long, Long)].collect()
    assert(capped.map(r => (r._1, r._2)).toSet == Set((31L, 32L)),
      s"boilerplate pairs not capped: ${capped.length} pairs")
    // without the cap the banner floods in quadratically
    val uncapped = SubstringDup.sharedSubstringPairs(docs, minLen = 20, k = 8, maxDocFreq = 10000L)
    assert(uncapped.count() == 30L * 29L / 2 + 1)
  }
}

/** Local alias so the spec reads naturally (DocGen.sentence is package-public). */
private object DocGenHelpers {
  def sentence(rng: graft.gen.DetRng, words: Int): String = graft.gen.DocGen.sentence(rng, words)
}
