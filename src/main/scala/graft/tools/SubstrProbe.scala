package graft.tools

import org.apache.spark.sql.SparkSession
import graft.textanalysis.SubstringDup

/** Measures the plain vs winnowing-prefiltered shared-substring plans on
  * the documents table (best-of-N noop writes) and checks they agree.
  * Usage: runMain graft.tools.SubstrProbe [sfDir] [reps] */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def bestOf(f: => Unit): Double = (0 until reps).map(_ => time(f)).min
    val plain = bestOf {
      SubstringDup.sharedSubstringPairs(docs, minLen = 25)
        .write.mode("overwrite").format("noop").save()
    }
    val pre = bestOf {
      SubstringDup.sharedSubstringPairsPrefiltered(docs, minLen = 25)
        .write.mode("overwrite").format("noop").save()
    }
    // two-consumer shapes: pairs + intervals recomputed separately (the
    // contract-query shape) vs detectAndIntervals' shared checkpointed runs
    val sep = bestOf {
      SubstringDup.sharedSubstringPairs(docs, minLen = 25)
        .write.mode("overwrite").format("noop").save()
      SubstringDup.duplicateRunIntervals(docs, minLen = 25)
        .write.mode("overwrite").format("noop").save()
    }
    val comb = bestOf {
      val (p2, iv) = SubstringDup.detectAndIntervals(docs, minLen = 25)
      p2.write.mode("overwrite").format("noop").save()
      iv.write.mode("overwrite").format("noop").save()
    }
    val p = SubstringDup.sharedSubstringPairs(docs, minLen = 25)
      .collect().map(_.toSeq).toSet
    val q = SubstringDup.sharedSubstringPairsPrefiltered(docs, minLen = 25)
      .collect().map(_.toSeq).toSet
    println(f"""{"probe":"substr","plain_sec":$plain%.2f,"prefiltered_sec":$pre%.2f,""" +
      f""""separate_sec":$sep%.2f,"combined_sec":$comb%.2f,""" +
      f""""pairs_plain":${p.size},"pairs_pre":${q.size},"equal":${p == q}}""")
    spark.stop()
  }
}
