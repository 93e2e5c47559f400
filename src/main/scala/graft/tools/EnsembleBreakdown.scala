package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing of the LSH-Ensemble containment index (q_containment_lsh
  * shape): signature+size kernel scan, banded key generation, candidate
  * join, exact verification — to find where the remaining warm seconds
  * live. Usage: runMain graft.tools.EnsembleBreakdown [sfDir] [reps] */
object EnsembleBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def best(tag: String)(f: => Unit): Double = {
      val s = (0 until reps).map(_ => time(f)).min
      println(f"$tag%-28s $s%7.2f s"); s
    }
    val (shingleK, nHashes, threshold) = (2, 64, 0.2)
    org.apache.spark.sql.graft.ShingleHashExpr.register(spark)
    val es = call_function("ensemble_minhash", col("text"), lit(shingleK), lit(nHashes))
    val withPPlan = docs.select(col("doc_id"), es.as("__es"))
      .filter(col("__es").isNotNull)
      .select(col("doc_id"), slice(col("__es"), 1, nHashes).as("__sig"),
        element_at(col("__es"), nHashes + 1).as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__p", floor(log(2.0, col("__n")) + 1e-9).cast("long"))
    best("withP kernel scan (no ckpt)")(
      withPPlan.write.mode("overwrite").format("noop").save())
    // the operator end-to-end (construction incl. checkpoint + collect is
    // inside the timed region, like the bench)
    best("full containmentPairsEnsemble")(
      Dedup.containmentPairsEnsemble(docs, threshold, shingleK, nHashes)
        .write.mode("overwrite").format("noop").save())
    // candidates only (no verification): rebuild the internals
    val withP = withPPlan.localCheckpoint()
    val parts = withP.select(col("__p")).distinct().collect().map(_.getLong(0)).sorted
    def recall(j: Double, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(j, r), nHashes / r)
    val schemes = for {
      s <- parts; l <- parts if l >= s
      jsl = threshold * math.pow(2.0, s.toDouble) /
        (math.pow(2.0, s.toDouble) + math.pow(2.0, (l + 1).toDouble))
      r <- (nHashes to 1 by -1).find(r => recall(jsl, r) >= 0.9)
    } yield (s, l, r, nHashes / r)
    import spark.implicits._
    val schemeDf = broadcast(schemes.toSeq.toDF("__s", "__l", "__r", "__b"))
    def keysFor(sideCol: String, idAs: String) =
      withP.join(schemeDf, col("__p") === col(sideCol))
        .select(col("doc_id").as(idAs), col("__s"), col("__l"),
          explode(transform(sequence(lit(0), col("__b") - 1), bi =>
            md5(concat(lit("ce:"), col("__s").cast("string"), lit(":"),
              col("__l").cast("string"), lit(":"), bi.cast("string"), lit(":"),
              array_join(transform(slice(col("__sig"), bi * col("__r") + 1, col("__r")),
                h => h.cast("string")), ","))))).as("__bk"))
    best("keysFor one side")(
      keysFor("__s", "__ia").write.mode("overwrite").format("noop").save())
    val cands = keysFor("__s", "__ia")
      .join(keysFor("__l", "__ib"), Seq("__s", "__l", "__bk"))
      .filter(col("__ia") =!= col("__ib"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"))
      .distinct()
    best("candidate join + distinct")(
      cands.write.mode("overwrite").format("noop").save())
    val nCands = cands.count()
    println(s"candidates: $nCands")
    best("verify stage only")(
      Dedup.containmentVerify(docs, cands.localCheckpoint(), shingleK)
        .filter(greatest(col("containment_a"), col("containment_b")) >= threshold)
        .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
