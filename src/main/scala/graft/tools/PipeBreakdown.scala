package graft.tools

import org.apache.spark.sql.SparkSession

import graft.correct.{DictionaryCorrector, NoisyChannelCorrector, NoisyChannelModel}
import graft.pipeline.CorrectionPipeline

/** Stage-cost breakdown of the Bench part-2 timed section (the production
  * job: extract → noise → correct → salted reassembly → parquet sink) at
  * the bench's own shape (8 cores, 8000 pathological-skew docs), by timing
  * successively longer prefixes of the chain against a noop sink. */
object PipeBreakdown {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 8000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val pages = graft.gen.HtmlGen.pages(spark, nDocs, pathological = true).cache()
    val clean = graft.extract.Extract.extractDocs(pages).toDF().cache()
    pages.count(); clean.count()
    val vocab = DictionaryCorrector.trainVocab(clean, "spans", splitFilter = None)
    val model = NoisyChannelModel.fromVocabDf(spark, vocab.filter("freq >= 2"), 2)
    val corrector = new NoisyChannelCorrector(model)

    def time(name: String)(f: => Unit): Unit = {
      val reps = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[pipe] $name%-28s best ${reps.min}%6.2f s  (${reps.map(s => f"$s%.2f").mkString(", ")})")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    time("extract") { noop(graft.extract.Extract.extractDocs(pages).toDF()) }
    time("extract+noise") {
      noop(graft.gen.NoiseChannel.noiseDocs(graft.extract.Extract.extractDocs(pages)).toDF())
    }
    time("..+explode") {
      noop(CorrectionPipeline.explodeSpans(
        graft.gen.NoiseChannel.noiseDocs(graft.extract.Extract.extractDocs(pages)).toDF(), "spans").toDF())
    }
    time("..+correct") {
      noop(CorrectionPipeline.correct(CorrectionPipeline.explodeSpans(
        graft.gen.NoiseChannel.noiseDocs(graft.extract.Extract.extractDocs(pages)).toDF(), "spans"), corrector).toDF())
    }
    time("..+reassemble (noop)") {
      noop(CorrectionPipeline.reassembleSalted(CorrectionPipeline.correct(CorrectionPipeline.explodeSpans(
        graft.gen.NoiseChannel.noiseDocs(graft.extract.Extract.extractDocs(pages)).toDF(), "spans"), corrector)))
    }
    time("full (parquet sink)") {
      CorrectionPipeline.reassembleSalted(CorrectionPipeline.correct(CorrectionPipeline.explodeSpans(
        graft.gen.NoiseChannel.noiseDocs(graft.extract.Extract.extractDocs(pages)).toDF(), "spans"), corrector))
        .write.mode("overwrite").parquet("/tmp/graft_pipe_probe")
    }
    spark.stop()
  }
}
