package graft.tools

import graft.gen.{DetRng, DocGen}
import graft.text.DamerauLevenshtein

/** Pure-JVM probe of the BandedDistanceRewrite payoff: times the full
  * O(m*n) OSA DP against the threshold-bounded O(min(m,n)*k) kernel on the
  * same candidate-pair workload (sentence-length strings, small k — the
  * dictionary-correction candidate-join shape). The optimizer rule swaps
  * exactly these two kernels under a `dl_distance_full(a,b) <= k` filter,
  * so this ratio is the per-row speedup the rewrite buys.
  *
  * Usage: runMain graft.tools.RewriteProbe [nPairs] [avgWords] [k]
  */
object RewriteProbe {
  def main(args: Array[String]): Unit = {
    val nPairs = if (args.length > 0) args(0).toInt else 20000
    val words = if (args.length > 1) args(1).toInt else 8
    val k = if (args.length > 2) args(2).toInt else 2
    val rng = new DetRng(21L)
    // half unrelated pairs (distance far above k — early exit territory),
    // half noised pairs (distance near/below k — full band scanned)
    val pairs = Array.tabulate(nPairs) { i =>
      val a = DocGen.sentence(rng, 2 + (i % words))
      val b =
        if (i % 2 == 0) DocGen.sentence(rng, 2 + ((i * 7 + 3) % words))
        else graft.gen.NoiseChannel.mutilateSpan("rp", i, a, DocGen.goodChars)
      (a, b)
    }
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val acc = f
      ((System.nanoTime() - t0) / 1e9, acc)
    }
    def runFull(): Long = {
      var acc = 0L; var i = 0
      while (i < nPairs) {
        val (a, b) = pairs(i)
        if (DamerauLevenshtein.distance(a, b) <= k) acc += 1
        i += 1
      }
      acc
    }
    def runWithin(): Long = {
      var acc = 0L; var i = 0
      while (i < nPairs) {
        val (a, b) = pairs(i)
        if (DamerauLevenshtein.distanceWithin(a, b, k) <= k) acc += 1
        i += 1
      }
      acc
    }
    // warmup both paths, then best-of-3 each
    (0 until 2).foreach { _ => runFull(); runWithin() }
    val (tF, hitsF) = (0 until 3).map(_ => time(runFull())).minBy(_._1)
    val (tW, hitsW) = (0 until 3).map(_ => time(runWithin())).minBy(_._1)
    require(hitsF == hitsW, s"decision mismatch: $hitsF vs $hitsW")
    println(f"""{"probe":"rewrite","pairs":$nPairs,"k":$k,"hits":$hitsF,""" +
      f""""full_sec":$tF%.3f,"within_sec":$tW%.3f,"speedup":${tF / tW}%.2f}""")
  }
}
