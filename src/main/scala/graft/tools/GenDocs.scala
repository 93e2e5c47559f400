package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write the deterministic synthetic interleaved-docs table as parquet —
  * `<out>/noisy` (spans = noised) and `<out>/clean` (ground truth), the
  * input shape graft.RunPipeline consumes.
  * `sbt "runMain graft.tools.GenDocs [nDocs] [outDir]"` */
object GenDocs {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000L)
    val out = if (args.length > 1) args(1) else "/tmp/graft_docs"
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-gendocs")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = graft.gen.DocGen.docs(spark, n).toDF().cache()
    docs.select(col("doc_id"), col("noisy_spans").as("spans"))
      .write.mode("overwrite").parquet(s"$out/noisy")
    docs.select(col("doc_id"), col("spans"))
      .write.mode("overwrite").parquet(s"$out/clean")
    println(s"wrote ${docs.count()} docs to $out/{noisy,clean}")
    spark.stop()
  }
}
