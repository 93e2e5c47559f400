package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of named SparkEntry queries — the
  * plan-audit loop (is the filter pushed, the small side broadcast, the
  * codegen span wide?). Usage: runMain graft.tools.ExplainProbe [sfDir] q1 q2... */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q1_agg")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
