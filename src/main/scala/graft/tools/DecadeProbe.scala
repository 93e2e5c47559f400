package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-decade evidence: run the heavy-query group once at sf0.1 and once at
 * a synthesized sf1 (10× rows, same distribution family) and report
 * per-query wall time plus a plan-shape histogram at both scales — the
 * measured decade behind the 100×-scale claims (plan shape alone says a
 * strategy WOULD hold; one decade of data says it DID).
 *
 * The sf1 tables derive deterministically from the driver's sf0.1 parquet
 * (no external data): copy 0 is sf0.1 verbatim; copies 1..9 keep every
 * doc's length/lang/source and unigram stats but deterministically rotate
 * the token sequence (fresh shingle/bigram structure, so dedup families
 * see new near-dup topology rather than 10 exact clones of the corpus),
 * and embeddings rotate dimensions per copy (norms and cluster geometry
 * preserved). Idempotent: generation is skipped when the output exists.
 *
 *   sbt "runMain graft.tools.DecadeProbe /tmp/graft_sf1"
 */
object DecadeProbe {

  private val Sf01 = "/root/testdata/sf0.1"

  private val heavy = Seq(
    "q_shared_substrings", "q_dup_intervals", "q_substr_cut", "q_self_repeats",
    "q_semdedup", "q_dedup_cc", "q_lang_profile", "q_dsir", "q_containment_lsh")

  /** Node-type histogram of the executed plan — the "same plan at both
    * scales" check (exchange count, join strategies, no Cartesian). */
  private def planShape(df: DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.executedPlan.toString()
    Seq("Exchange", "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct", "HashAggregate", "SortAggregate")
      .map(n => n -> ("(?<![A-Za-z])" + n).r.findAllIn(plan).length)
      .filter(_._2 > 0).toMap
  }

  private def gen(spark: SparkSession, out: String): Unit = {
    if (new java.io.File(s"$out/documents.parquet/_SUCCESS").exists() &&
        new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists()) {
      println(s"[decade] $out exists — generation skipped"); return
    }
    val docs = spark.read.parquet(s"$Sf01/documents.parquet")
    val nDocs = docs.count()
    val copies = spark.range(0, 10).select(col("id").as("__c"))
    // token rotation by a per-(copy, doc) deterministic offset: same words,
    // same length, fresh adjacency structure
    val rotated = docs.crossJoin(copies)
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("__off",
        when(col("__c") === 0, lit(0)).otherwise(
          pmod(conv(substring(md5(concat_ws(":",
              col("__c").cast("string"), col("doc_id").cast("string"))), 1, 15), 16, 10)
            .cast("long"), greatest(size(col("__toks")).cast("long"), lit(1L))).cast("int")))
      .select(
        (col("__c") * nDocs + col("doc_id")).as("doc_id"),
        array_join(concat(slice(col("__toks"), col("__off") + 1,
            size(col("__toks")) - col("__off")),
          slice(col("__toks"), lit(1), col("__off"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    rotated.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$Sf01/embeddings.parquet")
    val nVecs = emb.count()
    val embOut = emb.crossJoin(copies)
      .select(
        (col("__c") * nVecs + col("vec_id")).as("vec_id"),
        concat(
          slice(col("embedding"), col("__c").cast("int") + 1,
            size(col("embedding")) - col("__c").cast("int")),
          slice(col("embedding"), lit(1), col("__c").cast("int"))).as("embedding"),
        col("label"))
    embOut.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[decade] wrote ${nDocs * 10} docs + ${nVecs * 10} vecs to $out")
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val names = if (args.length > 1) args.drop(1).toSeq else heavy
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    gen(spark, out)

    def run(name: String, dir: String): (Double, Map[String, Int]) = {
      val mk = () => graft.SparkEntry.queries(name)(spark, dir)
      mk().write.mode("overwrite").format("noop").save() // warm (JIT + codegen)
      val t0 = System.nanoTime()
      val df = mk()
      df.write.mode("overwrite").format("noop").save()
      ((System.nanoTime() - t0) / 1e9, planShape(df))
    }
    names.foreach { n =>
      val (t01, p01) = run(n, Sf01)
      val (t1, p1) = run(n, out)
      val delta = (p1.keySet ++ p01.keySet).filter(k => p01.getOrElse(k, 0) != p1.getOrElse(k, 0))
        .map(k => s"$k ${p01.getOrElse(k, 0)}->${p1.getOrElse(k, 0)}")
      println(f"[decade] $n%-20s sf0.1 $t01%7.2f s   sf1 $t1%7.2f s   x${t1 / t01}%5.2f   " +
        (if (delta.isEmpty) "plan: unchanged" else s"plan: ${delta.mkString(", ")}") +
        s"   [${p1.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(" ")}]")
    }
    spark.stop()
  }
}
