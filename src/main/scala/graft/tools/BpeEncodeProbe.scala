package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.textanalysis.Bpe

/** Measure the `bpe_encode` kernel against the fold-column encode chain
  * (round-6 verdict item 2): train a merge table driver-locally on the sf
  * corpus, then encode its distinct words with both paths.
  * Usage: runMain graft.tools.BpeEncodeProbe [sfDir] [numMerges] */
object BpeEncodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val numMerges = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val merges = Bpe.trainMergesLocal(docs, numMerges, minPairCount = 1L)
    println(f"trained ${merges.length} merges in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val words = Bpe.wordCounts(docs).select(col("word")).localCheckpoint()
    println(s"distinct words: ${words.count()}")
    def time(tag: String)(f: => Unit): Double = {
      val t = System.nanoTime(); f; val s = (System.nanoTime() - t) / 1e9
      println(f"$tag%-28s $s%8.2f s"); s
    }
    // cold + warm for the kernel; the fold chain once (it is minutes-scale)
    val k1 = time("kernel cold") {
      Bpe.encodeWords(words, merges).write.mode("overwrite").format("noop").save()
    }
    val k2 = time("kernel warm") {
      Bpe.encodeWords(words, merges).write.mode("overwrite").format("noop").save()
    }
    val f1 = time("fold chain (chunk 16)") {
      Bpe.encodeWordsFold(words, merges).write.mode("overwrite").format("noop").save()
    }
    println(f"speedup cold ${f1 / k1}%.1f x, vs warm ${f1 / k2}%.1f x at ${merges.length} merges")
    spark.stop()
  }
}
