package graft.tools

import graft.correct.NoisyChannelModel
import graft.gen.{DetRng, DocGen, NoiseChannel}

/** Single-threaded breakdown of where inferToken time goes: stage counts and
  * cumulative time per resolution path (exact / width1 / width2 / split /
  * wide / fallback). Pure JVM — no Spark. */
object KernelBreakdown {
  def main(args: Array[String]): Unit = {
    val nTokens = if (args.nonEmpty) args(0).toInt else 100000
    val vocab: Map[String, Long] = DocGen.lexicon.zipWithIndex.map { case (w, i) =>
      w -> (1L + (DocGen.LexiconSize - i).toLong)
    }.toMap
    val tokens = Array.tabulate(nTokens) { i =>
      val rng = DetRng.forKey("probe", i.toLong)
      val w = DocGen.lexicon(rng.nextInt(DocGen.LexiconSize))
      NoiseChannel.mutilate(w, DocGen.goodChars, rng)
    }
    val model = new NoisyChannelModel(vocab, 1, DocGen.goodChars.length)
    // classify each token by which stage resolves it, timing stages separately
    val nStage = 6
    val cnt = new Array[Long](nStage)
    val tns = new Array[Long](nStage)
    def timed[A](s: Int)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f; tns(s) += System.nanoTime() - t0; a
    }
    (0 until 2).foreach { pass =>
      java.util.Arrays.fill(cnt, 0L); java.util.Arrays.fill(tns, 0L)
      tokens.foreach { t =>
        if (timed(0)(model.contains(t))) cnt(0) += 1
        else {
          val c1 = timed(1)(model.trie.searchWithin(t, 1))
          if (c1.nonEmpty) cnt(1) += 1
          else {
            val c2 = timed(2)(model.trie.searchWithin(t, 2))
            if (c2.nonEmpty) cnt(2) += 1
            else cnt(3) += 1
          }
        }
      }
      if (pass == 1) {
        println("stage        count      ms")
        Seq("exact", "width1", "width2", "deeper").zipWithIndex.foreach { case (s, i) =>
          println(f"$s%-10s ${cnt(i)}%8d ${tns(i) / 1e6}%9.1f")
        }
        // full inferToken for reference
        val t0 = System.nanoTime()
        tokens.foreach(model.inferToken)
        println(f"full inferToken: ${(System.nanoTime() - t0) / 1e6}%.1f ms  (${nTokens / ((System.nanoTime() - t0) / 1e9)}%.0f tok/s)")
      }
    }
  }
}
