package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distribution of self-join match volume across (pair, diagonal) groups —
  * decides whether a qualifying-diagonal prefilter before the islands
  * window can shrink the window input (a run of >= minLen chars needs
  * >= minLen-k+1 matches on its diagonal, so diagonals under that count
  * cannot produce output).
  * Usage: runMain graft.tools.DiagProbe [sfDir] */
object DiagProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val kg = graft.textanalysis.SubstringDup.kgramHashTable(docs, 8)
    val hot = kg.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > 64).select("h")
    val capped = kg.join(broadcast(hot), Seq("h"), "left_anti")
    val a = capped.select(col("h"), col("doc_id").as("doc_a"), col("pos").as("pa"))
    val m = a.join(capped.select(col("h"), col("doc_id").as("doc_b"), col("pos").as("pb"))
        .hint("shuffle_hash"), "h")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), (col("pa") - col("pb")).as("diag"), col("pa"))
      .localCheckpoint()
    val minRun = 25 - 8 + 1 // minLen - k + 1
    val diag = m.groupBy(col("doc_a"), col("doc_b"), col("diag"))
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val total = m.count()
    val nDiags = diag.count()
    val qual = diag.filter(col("c") >= minRun)
    val nQual = qual.count()
    val rowsOnQual = qual.agg(sum(col("c"))).head().getLong(0)
    // the same statistics for the WITHIN-doc selfRuns shape (maxOcc cap)
    val hotSelf = kg.groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 64).select(col("doc_id"), col("h"))
    val cappedSelf = kg.join(hotSelf.hint("shuffle_hash"), Seq("doc_id", "h"), "left_anti")
    val sm = cappedSelf.select(col("doc_id"), col("pos").as("pa"), col("h"))
      .join(cappedSelf.select(col("doc_id"), col("pos").as("pb"), col("h"))
        .hint("shuffle_hash"), Seq("doc_id", "h"))
      .filter(col("pa") < col("pb"))
      .select(col("doc_id"), (col("pa") - col("pb")).as("diag"), col("pa"))
      .localCheckpoint()
    val sMinRun = 16 - 8 + 1
    val sDiag = sm.groupBy(col("doc_id"), col("diag")).agg(count(lit(1)).as("c")).localCheckpoint()
    val sTotal = sm.count()
    val sQual = sDiag.filter(col("c") >= sMinRun)
    val sRowsOnQual = sQual.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    println(f"""{"probe":"diag","match_rows":$total,"diag_groups":$nDiags,""" +
      f""""qual_diags":$nQual,"rows_on_qual_diags":$rowsOnQual,""" +
      f""""self_match_rows":$sTotal,"self_diag_groups":${sDiag.count()},""" +
      f""""self_qual_diags":${sQual.count()},"self_rows_on_qual":$sRowsOnQual}""")
    spark.stop()
  }
}
