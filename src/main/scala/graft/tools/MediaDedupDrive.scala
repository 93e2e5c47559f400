package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the production `RunPipeline` main end-to-end with the full
  * multi-modality `--media-dedup` grammar on a generated corpus — the
  * CLI-surface check for the dhash+ahash+vhash path.
  * Usage: runMain graft.tools.MediaDedupDrive [nDocs] */
object MediaDedupDrive {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200
    val base = java.nio.file.Files.createTempDirectory("media_drive").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.gen.DocGen.docs(spark, n).toDF().write.parquet(s"$base/in")
    val json = graft.RunPipeline.run(spark, Map(
      "input" -> s"$base/in", "output" -> s"$base/out", "corrector" -> "null",
      "media-dedup" -> "dhash:4+ahash:8+vhash:6", "buckets" -> "4", "group-size" -> "2"))
    println(json)
    val nOut = spark.read.parquet(s"$base/out").count()
    println(s"""{"probe":"media_dedup_drive","docs_in":$n,"docs_out":$nOut}""")
    spark.stop()
  }
}
