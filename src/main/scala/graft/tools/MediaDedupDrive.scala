package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the production `RunPipeline` main end-to-end on a generated
  * corpus with caller-supplied curation flags — the CLI-surface check for
  * the dedup/curation family (defaults to the full multi-modality
  * media-dedup grammar).
  * Usage: runMain graft.tools.MediaDedupDrive [nDocs] [--flag value ...] */
object MediaDedupDrive {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200
    val extra = args.drop(1).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val flags = if (extra.nonEmpty) extra
                else Map("media-dedup" -> "dhash:4+ahash:8+vhash:6")
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
      "buckets" -> "4", "group-size" -> "2") ++ flags)
    println(json)
    val nOut = spark.read.parquet(s"$base/out").count()
    println(s"""{"probe":"pipeline_drive","docs_in":$n,"docs_out":$nOut,"flags":"${flags.mkString(" ")}"}""")
    spark.stop()
  }
}
