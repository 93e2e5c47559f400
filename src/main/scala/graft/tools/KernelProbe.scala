package graft.tools

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import graft.correct.NoisyChannelModel
import graft.gen.{DetRng, DocGen, NoiseChannel}

/** Pure-JVM (no Spark) probe of the correction kernel's thread scaling:
  * distinct corrupted tokens through NoisyChannelModel.inferToken at several
  * thread counts. Separates kernel/GC behavior from Spark scheduling. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val nTokens = if (args.nonEmpty) args(0).toInt else 200000
    // vocabulary = the generator lexicon with Zipf-ish frequencies
    val vocab: Map[String, Long] = DocGen.lexicon.zipWithIndex.map { case (w, i) =>
      w -> (1L + (DocGen.LexiconSize - i).toLong)
    }.toMap
    // distinct corrupted tokens
    val tokens = Array.tabulate(nTokens) { i =>
      val rng = DetRng.forKey("probe", i.toLong)
      val w = DocGen.lexicon(rng.nextInt(DocGen.LexiconSize))
      NoiseChannel.mutilate(w, DocGen.goodChars, rng)
    }
    def runWith(threads: Int): Double = {
      val model = new NoisyChannelModel(vocab, 1, DocGen.goodChars.length)
      model.inferToken("warmupx") // force lazy init outside timing
      val pool = Executors.newFixedThreadPool(threads)
      val chunk = nTokens / threads
      val t0 = System.nanoTime()
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t * chunk
            val end = if (t == threads - 1) nTokens else (t + 1) * chunk
            while (i < end) { model.inferToken(tokens(i)); i += 1 }
          }
        })
      }
      pool.shutdown()
      pool.awaitTermination(600, TimeUnit.SECONDS)
      (System.nanoTime() - t0) / 1e9
    }
    runWith(4) // JIT warmup
    val times = Seq(1, 2, 4, 8, 16, 32).map(t => t -> runWith(t))
    times.foreach { case (t, s) =>
      println(f"[kernel] threads=$t%2d time=$s%7.2f tok/s=${nTokens / s}%9.0f")
    }
    val m = times.toMap
    println(f"[kernel] eff 2->8: ${m(2) / (4 * m(8))}%.3f  eff 8->32: ${m(8) / (4 * m(32))}%.3f")
  }
}
