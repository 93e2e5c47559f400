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

    // The sf corpus has a tiny closed vocabulary (training exhausts after
    // ~100 merges), so the production regime — thousands of merges over a
    // large distinct-word table — is probed on a synthetic corpus: md5-hex
    // pseudo-words (16-char alphabet, unbounded pairable structure).
    import spark.implicits._
    val synWords = (0 until 10000).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"w$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val synDocs = synWords.grouped(200).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val t1 = System.nanoTime()
    val synMerges = Bpe.trainMergesLocal(synDocs, numMerges, minPairCount = 1L)
    println(f"synthetic: trained ${synMerges.length} merges in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val sw = Bpe.wordCounts(synDocs).select(col("word")).localCheckpoint()
    println(s"synthetic distinct words: ${sw.count()}")
    val sk1 = time("syn kernel cold") {
      Bpe.encodeWords(sw, synMerges).write.mode("overwrite").format("noop").save()
    }
    val sk2 = time("syn kernel warm") {
      Bpe.encodeWords(sw, synMerges).write.mode("overwrite").format("noop").save()
    }
    val sf1 = time("syn fold chain (chunk 16)") {
      Bpe.encodeWordsFold(sw, synMerges).write.mode("overwrite").format("noop").save()
    }
    println(f"synthetic speedup cold ${sf1 / sk1}%.1f x, vs warm ${sf1 / sk2}%.1f x " +
      f"at ${synMerges.length} merges")
    spark.stop()
  }
}
