package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolate the scan-stage parallelism question: the bench-scale documents
  * parquet is ONE scan partition, so every scan-side kernel runs serially
  * unless an exchange fans the rows out first. Times the doc-profile build
  * of LangProfile.classify (the round-7 counted-kernel experiment) under:
  *   A. the relational form (explode → (id, gram) agg → per-doc window)
  *   B. the char_ngram_profile kernel, no exchange (serial on the scan)
  *   C. the kernel over an EXPLICIT n-way repartition (AQE cannot coalesce
  *      a user-specified partition count)
  *   D. the kernel over repartition(col) (AQE may coalesce to one)
  * plus the same grid for the Dsir hashed_gram_counts table.
  */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = sys.env.getOrElse("QT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.TokenCountExpr.register(spark)
    org.apache.spark.sql.graft.TextGramExpr.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val par = spark.sparkContext.defaultParallelism

    def time(name: String)(mk: => DataFrame): Unit = {
      val secs = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best ${secs.min}%.3f s  (runs: ${secs.map(s => f"$s%.2f").mkString(", ")})")
    }

    def kernelDp(d: DataFrame): DataFrame =
      d.select(col("doc_id"),
          explode(call_function("char_ngram_profile", col("text"), lit(3), lit(100))).as("__p"))
        .select(col("doc_id"), col("__p.gram").as("gram"), col("__p.rank_d").as("rank_d"))

    time("dp relational (A)") {
      graft.textanalysis.LangProfile.docProfilesWindowed(docs, 100)
    }
    time("dp kernel serial (B)") { kernelDp(docs) }
    time(s"dp kernel repart($par) (C)") { kernelDp(docs.repartition(par)) }
    time("dp kernel repart(col) (D)") { kernelDp(docs.repartition(col("doc_id"))) }

    def kernelFt(d: DataFrame): DataFrame =
      d.select(col("doc_id"),
          explode(call_function("hashed_gram_counts", col("text"), lit(4096), lit(2))).as("__fc"))
        .select(col("doc_id"), col("__fc.f").as("f"), col("__fc.c").as("c"))

    time("ft relational grouped (A)") {
      graft.textanalysis.Dsir.featureTableColumns(docs, 4096)
    }
    time("ft kernel serial (B)") { kernelFt(docs) }
    time(s"ft kernel repart($par) (C)") { kernelFt(docs.repartition(par)) }

    // how many scan / post-repartition partitions do we actually get?
    println("scan partitions: " + docs.rdd.getNumPartitions)
    println("repart(col) partitions (pre-AQE plan value): " +
      docs.repartition(col("doc_id")).rdd.getNumPartitions)
    spark.stop()
  }
}
