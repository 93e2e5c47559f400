package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cardinality probe for the substring-dedup join input: how many k-gram
  * positions / distinct hashes exist, and what fraction of each survives a
  * cross-doc document-frequency >= 2 filter (the self-join only produces
  * cross-doc matches from those). Sizes the shared-hash semi-join prefilter.
  * Usage: runMain graft.tools.KgramCardProbe [sfDir] */
object KgramCardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val kg = graft.textanalysis.SubstringDup.kgramHashTable(docs, 8).localCheckpoint()
    val nPos = kg.count()
    val df = kg.groupBy("h").agg(countDistinct(col("doc_id")).as("df")).localCheckpoint()
    val nHash = df.count()
    val shared = df.filter(col("df") >= 2)
    val nShared = shared.count()
    val nHot = df.filter(col("df") > 64).count()
    // positions that survive a semi-join against the shared (2 <= df <= cap) set
    val sharedPos = kg.join(shared.filter(col("df") <= 64).select("h"), Seq("h"), "left_semi").count()
    println(s"""{"probe":"kgram_card","positions":$nPos,"distinct_hashes":$nHash,""" +
      s""""shared_hashes_df2":$nShared,"hot_hashes_df64":$nHot,"shared_positions":$sharedPos}""")
    spark.stop()
  }
}
