package graft.tools

import org.apache.spark.sql.SparkSession

/** Times named SparkEntry queries (noop writes, best-of-N) — the per-query
  * drill-down behind bench investigations.
  * Usage: runMain graft.tools.QueryProbe [sfDir] [reps] q1 q2 ... */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val out = names.map { n =>
      val fn = graft.SparkEntry.queries(n)
      val secs = (0 until reps).map(_ =>
        time(fn(spark, sfDir).write.mode("overwrite").format("noop").save()))
      n -> secs.min
    }
    println(out.map { case (n, s) => f""""$n":$s%.2f""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
