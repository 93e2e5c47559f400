package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump a SUBSET of SparkEntry queries to parquet for oracle comparison —
  * the targeted cousin of graft.Verify (which is frozen and runs all 89)
  * for large-scale spot validation where the full sweep is hours of
  * DuckDB. Writes the same per-query parquet layout; reuse an existing
  * Verify output dir's oracle_sql.json for the comparison.
  * Usage: runMain graft.tools.VerifySubset <sfDir> <outDir> q1 q2... */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifySubset <sfDir> <outDir> q1 [q2...]")
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[verify-subset] wrote $name")
    }
    spark.stop()
  }
}
