package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected SparkEntry queries — used to
  * verify scan pruning (`ReadSchema`), filter pushdown (`PushedFilters`),
  * broadcast-join selection, and WholeStageCodegen span coverage. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_join_agg", "q_vocab_agg", "q_minhash", "q_ann_topk", "q_window_events")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
