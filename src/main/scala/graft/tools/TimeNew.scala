package graft.tools
import org.apache.spark.sql.SparkSession
object TimeNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("timenew").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    }
    for (w <- 1 to 2) {
      println(s"--- pass $w")
      time("q_tfidf") { graft.SparkEntry.queries("q_tfidf")(spark, dir).count() }
      time("q_bm25") { graft.SparkEntry.queries("q_bm25")(spark, dir).count() }
      time("q_dedup_cc") { graft.SparkEntry.queries("q_dedup_cc")(spark, dir).count() }
    }
    graft.SparkEntry.queries("q_bm25")(spark, dir).explain("formatted")
    spark.stop()
  }
}
