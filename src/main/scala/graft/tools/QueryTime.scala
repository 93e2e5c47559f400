package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries (noop sink), best-of-N — the local
  * iteration loop for plan-level performance work. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = sys.env.getOrElse("QT_REPS", "2").toInt
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_ngram_jaccard", "q_minhash", "q_lsh_pairs", "q_simhash", "q_ann_topk")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val secs = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-20s best ${secs.min}%.3f s  (runs: ${secs.map(s => f"$s%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
