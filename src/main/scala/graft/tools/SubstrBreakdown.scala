package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the shared-substring plan: kernel+explode scan,
  * df-cap agg, capped self-join match volume, islands window — to find which
  * stage carries the ~5 s of q_shared_substrings at sf0.1.
  * Usage: runMain graft.tools.SubstrBreakdown [sfDir] [reps] */
object SubstrBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def best(f: => Unit): Double = (0 until reps).map(_ => time(f)).min

    val kg = graft.textanalysis.SubstringDup.kgramHashTable(docs, 8)
    val tScan = best(kg.write.mode("overwrite").format("noop").save())
    val hot = kg.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > 64).select("h")
    val tAgg = best(hot.write.mode("overwrite").format("noop").save())
    val capped = kg.join(broadcast(hot), Seq("h"), "left_anti")
    val tCapped = best(capped.write.mode("overwrite").format("noop").save())
    val a = capped.select(col("h"), col("doc_id").as("doc_a"), col("pos").as("pa"))
    val m = a.join(capped.select(col("h"), col("doc_id").as("doc_b"), col("pos").as("pb")), "h")
      .filter(col("doc_a") < col("doc_b"))
    val tJoin = best(m.write.mode("overwrite").format("noop").save())
    val nMatches = m.count()
    val full = graft.textanalysis.SubstringDup.sharedSubstringPairs(docs, minLen = 25)
    val tFull = best(full.write.mode("overwrite").format("noop").save())
    println(f"""{"probe":"substr_breakdown","scan_sec":$tScan%.2f,"agg_sec":$tAgg%.2f,""" +
      f""""capped_sec":$tCapped%.2f,"join_sec":$tJoin%.2f,"match_rows":$nMatches,""" +
      f""""full_sec":$tFull%.2f}""")
    spark.stop()
  }
}
