package graft

import graft.correct._
import graft.gen.DocGen
import graft.pipeline.{CorrectionPipeline => CP}
import graft.text.DamerauLevenshtein

class NoisyChannelCorrectorSpec extends SparkSpec {

  test("trie search ≡ brute-force distance filter (Levenshtein automaton correctness)") {
    val r = new scala.util.Random(11)
    val words = (0 until 400).map { _ =>
      new String(Array.fill(1 + r.nextInt(8))(('a' + r.nextInt(6)).toChar))
    }.distinct.map(w => (w, 1L + r.nextInt(50))).toMap
    val trie = TokenTrie.build(words)
    (0 until 120).foreach { _ =>
      val q = new String(Array.fill(1 + r.nextInt(9))(('a' + r.nextInt(7)).toChar))
      (0 to 3).foreach { d =>
        val got = trie.searchWithin(q, d).map { case (w, f, dist) => (w, f, dist) }.toSet
        val want = words.collect {
          case (w, f) if DamerauLevenshtein.distance(q, w) <= d =>
            (w, f, DamerauLevenshtein.distance(q, w))
        }.toSet
        assert(got == want, s"q=$q d=$d missing=${want -- got} extra=${got -- want}")
      }
    }
  }

  test("fuzz: hostile unicode (astral plane, combining, huge tokens) never throws, deterministic") {
    val vocab = DocGen.lexicon.take(300).zipWithIndex.map { case (w, i) => w -> (i + 1).toLong }.toMap
    val m = new NoisyChannelModel(vocab, 1L, 30)
    val r = new scala.util.Random(5)
    val pools = Seq("abcxyz", "😀🧪𝔘𝔫", "ж╬ñçü", "éä", " \t")
    (0 until 150).foreach { trial =>
      val s = (0 until r.nextInt(40)).map { _ =>
        val p = pools(r.nextInt(pools.length)); p.charAt(r.nextInt(p.length))
      }.mkString + (if (trial % 17 == 0) "x" * 300 else "") // occasional huge token
      val a = m.inferSentence(s)
      val b = m.inferSentence(s)
      assert(a == b, s"nondeterministic on ${s.take(40)}…")
    }
  }

  test("channel log-prob: identity beats any single edit; edits ranked by channel weights") {
    val m = new NoisyChannelModel(Map("abc" -> 1L), 1L, goodCharsCount = 30)
    val id = m.channelLogProb("abc", "abc")
    assert(id > m.channelLogProb("abx", "abc")) // sub
    assert(id > m.channelLogProb("ab", "abc"))  // del
    assert(id > m.channelLogProb("abbc", "abc")) // ins
    assert(id > m.channelLogProb("acb", "abc")) // swap
    // delete (p=.03) is more likely than substitution (p=.03/30)
    assert(m.channelLogProb("ab", "abc") > m.channelLogProb("abx", "abc"))
    // swap cheaper than two substitutions
    assert(m.channelLogProb("acb", "abc") > m.channelLogProb("axy", "abc"))
  }

  test("inferToken: exact hit, nearest, channel trades distance against frequency") {
    val m = new NoisyChannelModel(Map("cat" -> 10L, "bat" -> 5L, "dog" -> 7L), 1L, 30)
    assert(m.inferToken("cat") == "cat")
    assert(m.inferToken("caz") == "cat")
    assert(m.inferToken("aat") == "cat") // dist tie → freq decides through the prior
    // a very frequent word at dist 2 can beat a rare word at dist 1:
    // channel odds per extra edit ≈ log(psub) - log(match) ≈ -6.9; prior gap
    // log(100000/1) ≈ 11.5 overcomes it
    val m2 = new NoisyChannelModel(Map("the" -> 100000L, "thx" -> 1L), 1L, 30)
    assert(m2.inferToken("thz") == "the") // dist(thz,thx)=1 but prior wins
  }

  test("segmentation: merged tokens split back into word pairs") {
    val m = new NoisyChannelModel(
      Map("the" -> 100L, "cat" -> 50L, "table" -> 30L, "spark" -> 40L, "on" -> 20L), 1L, 30)
    assert(m.inferToken("thecat") == "the cat")      // deleted space
    assert(m.inferToken("thexcat") == "the cat")     // space substituted
    assert(m.inferToken("sparktable") == "spark table")
    assert(m.inferToken("thecaz") == "the cat")      // merge + edit in second word
    // a near-miss single word must still win over a contrived split
    assert(m.inferToken("tablex") == "table")
    assert(m.inferSentence("thecat on thextable") == "the cat on the table")
  }

  test("e2e: noisy-channel corrector beats null and at least matches the dictionary corrector") {
    val docs = DocGen.docs(spark, 400).toDF().cache()
    val vocabDf = DictionaryCorrector.trainVocab(docs).cache()
    val spans = CP.explodeSpans(docs, "noisy_spans")

    val nullCer = CP.cer(CP.correct(spans, NullCorrector), docs)
    val dictBc = DictionaryCorrector.buildModel(spark, vocabDf, 2L)
    val dictCer = CP.cer(CP.correct(spans, DictionaryCorrector.corrector(dictBc)), docs)
    val ncBc = NoisyChannelModel.fromVocabDf(spark, vocabDf, 2L)
    val ncCer = CP.cer(CP.correct(spans, new NoisyChannelCorrector(ncBc)), docs)

    info(f"null=${nullCer.avgDistance}%.4f dict=${dictCer.avgDistance}%.4f nc=${ncCer.avgDistance}%.4f")
    info(f"perfect: null=${nullCer.percentPerfect}%.4f dict=${dictCer.percentPerfect}%.4f nc=${ncCer.percentPerfect}%.4f")
    assert(ncCer.avgDistance < nullCer.avgDistance)
    assert(ncCer.avgDistance <= dictCer.avgDistance * 1.05,
      s"noisy-channel ${ncCer.avgDistance} materially worse than dictionary ${dictCer.avgDistance}")
    dictBc.destroy(); ncBc.destroy()
  }

  test("prefixNeighborhoods(L) ≡ per-prefix searchWithin as a set, every L") {
    val r = new scala.util.Random(23)
    val words = (0 until 500).map { _ =>
      new String(Array.fill(1 + r.nextInt(9))(('a' + r.nextInt(6)).toChar))
    }.distinct.map(w => (w, 1L + r.nextInt(50))).toMap
    val trie = TokenTrie.build(words)
    (0 until 80).foreach { _ =>
      val q = new String(Array.fill(3 + r.nextInt(10))(('a' + r.nextInt(7)).toChar))
      (0 to 2).foreach { d =>
        val all = trie.prefixNeighborhoods(q, d)
        (0 to q.length).foreach { l =>
          val got = all(l).toSet
          val want = trie.searchWithin(q.take(l), d).toSet
          assert(got == want, s"q=$q d=$d L=$l missing=${want -- got} extra=${got -- want}")
        }
      }
    }
  }

  test("OSA distance is code-point-reversal invariant (the reversed-trie premise)") {
    val r = new scala.util.Random(31)
    def rev(s: String): String = {
      val cp = s.codePoints().toArray.reverse
      val sb = new java.lang.StringBuilder; cp.foreach(sb.appendCodePoint); sb.toString
    }
    (0 until 3000).foreach { _ =>
      val a = new String(Array.fill(r.nextInt(10))(('a' + r.nextInt(5)).toChar))
      val b = new String(Array.fill(r.nextInt(10))(('a' + r.nextInt(5)).toChar))
      assert(DamerauLevenshtein.distance(a, b) == DamerauLevenshtein.distance(rev(a), rev(b)),
        s"a=$a b=$b")
    }
  }

  test("single-walk splitCandidate ≡ per-split-point scan witness") {
    val vocab = DocGen.lexicon.take(400).zipWithIndex.map { case (w, i) => w -> (i % 40 + 1).toLong }.toMap
    val m = new NoisyChannelModel(vocab, 1L, DocGen.goodChars.length)
    val r = new scala.util.Random(47)
    val lex = DocGen.lexicon.take(400).toArray
    // merged word pairs with 0-2 extra edits, plus random junk
    val cases = (0 until 300).map { _ =>
      if (r.nextBoolean()) {
        val merged = lex(r.nextInt(lex.length)) + lex(r.nextInt(lex.length))
        val cs = merged.toCharArray
        if (cs.nonEmpty && r.nextBoolean()) cs(r.nextInt(cs.length)) = ('a' + r.nextInt(26)).toChar
        new String(cs)
      } else new String(Array.fill(5 + r.nextInt(10))(('a' + r.nextInt(26)).toChar))
    }
    cases.foreach { t =>
      val a = m.splitCandidate(t)
      val b = m.splitCandidateScan(t)
      assert(a == b, s"token=$t kernel=$a witness=$b")
    }
  }

  test("capped OSA distance: exact <= cap, strictly above otherwise") {
    val r = new scala.util.Random(53)
    (0 until 4000).foreach { _ =>
      val a = Array.fill(r.nextInt(12))('a' + r.nextInt(5))
      val b = Array.fill(r.nextInt(12))('a' + r.nextInt(5))
      val full = DamerauLevenshtein.distance(new String(a.map(_.toChar)), new String(b.map(_.toChar)))
      (0 to 6).foreach { cap =>
        val capped = DamerauLevenshtein.distanceBandedCappedCp(a, b, cap)
        if (full <= cap) assert(capped == full, s"cap=$cap full=$full capped=$capped")
        else assert(capped > cap, s"cap=$cap full=$full capped=$capped")
      }
    }
  }
}
