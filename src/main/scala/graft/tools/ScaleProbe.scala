package graft.tools

import org.apache.spark.sql.SparkSession
import graft.correct.{DictionaryCorrector, NoisyChannelModel, NoisyChannelCorrector}
import graft.gen.DocGen
import graft.pipeline.CorrectionPipeline

/** Stage-wise scaling diagnosis: times kernel-only, +reassembly, +write at
  * two parallelism levels to locate lost efficiency. */
object ScaleProbe {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def run(cores: Int, nDocs: Long): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = DocGen.docs(spark, nDocs, pathological = true).toDF().cache()
    docs.count()
    val vocabDf = DictionaryCorrector.trainVocab(docs).filter("freq >= 2")
    // fresh model (and therefore fresh executor-wide memo) per timed pass
    def freshCorrector = new NoisyChannelCorrector(
      NoisyChannelModel.fromVocabDf(spark, vocabDf, 2))

    val exploded = CorrectionPipeline.explodeSpans(docs, "noisy_spans")
    // warmup (JIT only; its memo is its own)
    CorrectionPipeline.correct(exploded, freshCorrector).write.format("noop").mode("overwrite").save()

    val tExplode = time(exploded.write.format("noop").mode("overwrite").save())
    val tKernelCold = time(CorrectionPipeline.correct(exploded, freshCorrector)
      .write.format("noop").mode("overwrite").save())
    val warm = freshCorrector
    CorrectionPipeline.correct(exploded, warm).write.format("noop").mode("overwrite").save()
    val tKernelWarm = time(CorrectionPipeline.correct(exploded, warm)
      .write.format("noop").mode("overwrite").save())
    val tReasm = time(CorrectionPipeline.reassembleSalted(
        CorrectionPipeline.correct(exploded, freshCorrector))
      .write.format("noop").mode("overwrite").save())
    val tParquet = time(CorrectionPipeline.reassembleSalted(
        CorrectionPipeline.correct(exploded, freshCorrector))
      .write.mode("overwrite").parquet(s"/tmp/scaleprobe_$cores"))
    println(f"[probe] cores=$cores%2d explode=$tExplode%6.2f kernelCold=$tKernelCold%6.2f kernelWarm=$tKernelWarm%6.2f coldReasm=$tReasm%6.2f coldParquet=$tParquet%6.2f")
    docs.unpersist()
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 16000L
    val levels = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 32)
    levels.foreach(run(_, nDocs))
  }
}
