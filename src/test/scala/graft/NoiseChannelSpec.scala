package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gen.{DetRng, DocGen, NoiseChannel}
import graft.text.DamerauLevenshtein

class NoiseChannelSpec extends AnyFunSuite {

  private val good = DocGen.goodChars
  private val goodSet = good.toSet

  test("deterministic: same key → identical output") {
    val t = "the quick brown fox jumps over the lazy dog"
    val a = NoiseChannel.mutilateSpan("doc000000001", 3, t, good)
    val b = NoiseChannel.mutilateSpan("doc000000001", 3, t, good)
    assert(a == b)
    val c = NoiseChannel.mutilateSpan("doc000000001", 4, t, good)
    assert(a != c) // different coordinate → different stream (overwhelmingly)
  }

  test("inserted/changed chars come only from goodChars") {
    val t = "QQQQ QQQQ QQQQ QQQQ QQQQ" // 'Q' and ' ' not in goodChars
    val kept = Set('Q'.toInt, ' '.toInt)
    (0 until 50).foreach { i =>
      val out = NoiseChannel.mutilateSpan("d", i, t, good)
      out.codePoints().toArray.foreach { cp =>
        assert(goodSet.contains(cp) || kept.contains(cp), s"unexpected char ${cp.toChar}")
      }
    }
  }

  test("empirical edit rate consistent with the 0.12 channel") {
    // Normalized DL distance between clean and noisy ≈ the per-char edit rate;
    // SWAP costs 1 for 2 chars and DELETE+INSERT can cancel, so expect a bit
    // under 0.12; EOL inserts push it back up. Wide tolerance — this is a
    // sanity band, not a point estimate (BASELINE.md: floor ≈ 0.12-0.15).
    val rng = new DetRng(42L)
    val texts = (0 until 300).map(_ => DocGen.sentence(rng, 10))
    val dists = texts.zipWithIndex.map { case (t, i) =>
      val noisy = NoiseChannel.mutilateSpan("doc", i, t, good)
      DamerauLevenshtein.normalized(noisy, t)
    }
    val avg = dists.sum / dists.size
    assert(avg > 0.06 && avg < 0.20, s"avg normalized distance $avg outside sanity band")
  }

  test("unchanged fraction matches channel math roughly") {
    // P(no edit on a char) = 0.88; a 40-60 char sentence survives untouched
    // with p ≈ 0.88^n * (1 - 0.03 tail) — i.e. rarely. Just assert most
    // sentences change and a nonzero minority might not on short strings.
    val rng = new DetRng(7L)
    val changed = (0 until 200).count { i =>
      val t = DocGen.sentence(rng, 8)
      NoiseChannel.mutilateSpan("x", i, t, good) != t
    }
    assert(changed > 180)
  }
}
