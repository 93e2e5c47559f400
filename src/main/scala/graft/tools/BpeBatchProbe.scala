package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure BPE training throughput (merges/minute) batched vs sequential on
  * the sf0.1 documents corpus — the evidence for the batched merge
  * selector's driver-latency win. Sequential runs a shorter merge budget
  * (its cost is per-merge-constant, so the rate extrapolates); batched runs
  * the full budget.
  *
  *   sbt "runMain graft.tools.BpeBatchProbe /root/testdata/sf0.1 1000 100"
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val batchedMerges = if (args.length > 1) args(1).toInt else 1000
    val seqMerges = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // floor 1: the synthetic corpus exhausts at ~107 merges at the default
    // floor of 2; a 1k-merge budget (the production-vocab regime the probe
    // models) needs the long tail
    val (seqList, seqSecs) =
      time(graft.textanalysis.Bpe.trainMerges(docs, seqMerges, minPairCount = 1L, maxBatch = 1))
    val seqRate = seqList.length / seqSecs * 60
    println(f"sequential: ${seqList.length} merges in $seqSecs%.1f s = $seqRate%.1f merges/min")

    val (batList, batSecs) =
      time(graft.textanalysis.Bpe.trainMerges(docs, batchedMerges, minPairCount = 1L, maxBatch = 16))
    val batRate = batList.length / batSecs * 60
    println(f"batched:    ${batList.length} merges in $batSecs%.1f s = $batRate%.1f merges/min")
    println(f"batched speedup: ${batRate / seqRate}%.2fx")

    // the production path: one distributed agg, then the driver-side
    // delta-maintained loop (what real tokenizer trainers do)
    val (locList, locSecs) =
      time(graft.textanalysis.Bpe.trainMergesLocal(docs, batchedMerges, minPairCount = 1L))
    val locRate = locList.length / locSecs * 60
    println(f"local:      ${locList.length} merges in $locSecs%.1f s = $locRate%.1f merges/min")
    println(f"local speedup: ${locRate / seqRate}%.2fx")

    // bit-equality on the shared prefixes, on the real corpus
    val shared = math.min(seqList.length, batList.length)
    require(seqList.take(shared) == batList.take(shared),
      "batched merge list diverged from sequential on the shared prefix")
    require(locList == batList, "local merge list diverged from batched")
    println(s"shared ${shared}-merge prefix bit-equal: true; local == batched: true " +
      s"(corpus exhausts every learnable merge at ${batList.length})")
    spark.stop()
  }
}
