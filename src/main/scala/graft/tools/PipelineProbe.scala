package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing of the bench pipeline: extraction / noise / correction /
  * reassembly+sink, each isolated by materializing the previous stage. */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 4000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }

    val pages = graft.gen.HtmlGen.pages(spark, nDocs, pathological = true).cache()
    pages.count()
    // warmup whole path once
    val clean0 = graft.extract.Extract.extractDocs(pages).toDF().cache(); clean0.count()
    val vocab = graft.correct.DictionaryCorrector.trainVocab(clean0, "spans", splitFilter = None)
    val model = graft.correct.NoisyChannelModel.fromVocabDf(spark, vocab.filter("freq >= 2"), 2)

    (0 until 2).foreach { round =>
      println(s"--- pass $round ---")
      val corrector = new graft.correct.NoisyChannelCorrector(
        graft.correct.NoisyChannelModel.fromVocabDf(spark, vocab.filter("freq >= 2"), 2))
      val extracted = time("extract")(
        { val d = graft.extract.Extract.extractDocs(pages).toDF().cache(); d.count(); d })
      val noisy = time("noise")(
        { val d = graft.gen.NoiseChannel.noiseDocs(extracted.as[graft.model.Doc]).toDF().cache(); d.count(); d })
      val exploded = time("explode")(
        { val d = graft.pipeline.CorrectionPipeline.explodeSpans(noisy, "spans").cache(); d.count(); d })
      val corrected = time("correct")(
        { val d = graft.pipeline.CorrectionPipeline.correct(exploded, corrector).cache(); d.count(); d })
      time("reassemble+write")(
        graft.pipeline.CorrectionPipeline.reassembleSalted(corrected)
          .write.mode("overwrite").parquet("/tmp/graft_probe_out"))
      Seq(extracted, noisy, corrected).foreach(_.unpersist())
      exploded.unpersist()
    }
    val _ = model
    spark.stop()
  }
}
