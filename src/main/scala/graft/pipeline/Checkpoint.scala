package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.correct.Corrector
import graft.model.CerMetrics

/**
 * Checkpointed, resumable correction run (SURVEY.md §7 step 6; reference
 * analogs: Lightning checkpoint/resume `train.py:75-82,99` and the
 * interrupt-safe partial eval loops `dictionary_corrector.py:218-237`).
 *
 * Work is keyed by a stable hash bucket of `doc_id` (`pmod(xxhash64(doc_id))`
 * — the same partitioning an Iceberg table would be bucket-partitioned by at
 * production scale). Buckets are processed in groups; each group is one Spark
 * job whose parquet commit is atomic (job-level output committer), and a
 * state row `(run_id, bucket, status, rows, cer_sum, perfect, lineage)` is
 * appended only AFTER the group's data commit. Resume therefore re-derives
 * remaining work as an anti-join of buckets against the state table: a killed
 * run reprocesses at most the one uncommitted group, and because every
 * upstream stage is deterministic (hash-seeded generator/channel), the
 * resumed output is byte-identical to an unkilled run (tested).
 */
object CheckpointedRun {

  final case class StateRow(run_id: String, bucket: Int, status: String,
                            rows: Long, cer_sum: Double, perfect: Long, lineage: String)

  /** Injected-failure hook for kill-and-resume tests. */
  final class KilledException(msg: String) extends RuntimeException(msg)

  def bucketOf(nBuckets: Int) = pmod(xxhash64(col("doc_id")), lit(nBuckets)).cast("int")

  /** Fingerprint of a frame's CANONICALIZED analyzed plan + schema — the
    * default stage token. Canonicalization normalizes expression ids, so the
    * same rebuilt plan fingerprints identically on resume (stage reused),
    * while a different source/shape with the same outDir/nBuckets gets a
    * different staging directory instead of silently reusing stale rows.
    * The ANALYZED plan, not the raw parsed one: canonicalizing an
    * unresolved tree (`spark.sql(...)` inputs contain UnresolvedRelation)
    * throws on `.output`, and the resolved tree also distinguishes what a
    * table name actually resolved to. */
  def planToken(df: DataFrame): String = {
    val s = df.queryExecution.analyzed.canonicalized.toString + "\n" + df.schema.treeString
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
  }

  /** Normalized DL distance as a NATIVE column expression — the column form
    * of [[graft.text.DamerauLevenshtein.normalized]] (same equality shortcut
    * and empty-`clean` guard) built on the codegen'd `dl_distance`
    * expression instead of a ScalaUDF, so per-bucket metrics stay inside the
    * whole-stage-codegen span with no per-row serde. Requires
    * [[org.apache.spark.sql.graft.DamerauLevenshteinExpr.register]]
    * (idempotent; [[run]] calls it). `length()` counts code points
    * (UTF8String.numChars), matching the kernel's codePointCount. */
  def normalizedDistCol(noisy: Column, clean: Column): Column =
    when(noisy === clean, 0.0)
      .when(length(clean) === 0, 1.0) // unequal (first branch) + empty clean
      .otherwise(
        call_function("dl_distance", noisy, clean).cast("double") / length(clean))

  /** Write `docs` + bucket column partitioned by `bucket`, exactly once:
    * skipped when a committed (_SUCCESS) stage already exists — a stage
    * interrupted mid-write has no marker and is overwritten on resume. */
  def stageBucketed(spark: SparkSession, docs: DataFrame, stagingDir: String, nBuckets: Int): Unit = {
    val dir = new org.apache.hadoop.fs.Path(stagingDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
      docs.withColumn("bucket", bucketOf(nBuckets))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(stagingDir)
    }
  }

  /** Stage the clean tables's exploded TEXT spans `(doc_id, offset,
    * text_clean)` partitioned by bucket — the CER-metrics side of the same
    * once-not-per-group rule as [[stageBucketed]]. */
  def stageCleanSpans(spark: SparkSession, cleanDocs: DataFrame, stagingDir: String,
                      nBuckets: Int, cleanSpansCol: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(stagingDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
      CorrectionPipeline.explodeSpans(cleanDocs, cleanSpansCol)
        .filter(col("kind") === graft.model.Span.KindText)
        .select(col("doc_id"), col("offset"), col("text").as("text_clean"))
        .withColumn("bucket", bucketOf(nBuckets))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(stagingDir)
    }
  }

  /** Buckets already committed for this run. */
  def doneBuckets(spark: SparkSession, stateDir: String, runId: String): Set[Int] = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Set.empty
    else {
      import spark.implicits._
      spark.read.parquet(stateDir).as[StateRow]
        .filter(s => s.run_id == runId && s.status == "done")
        .map(_.bucket).collect().toSet
    }
  }

  /**
   * Run (or resume) the correction pipeline over `docs`.
   *
   * @param docs        input table `(doc_id, <spansCol>, ...)` — noisy spans in
   * @param cleanDocs   clean table for CER metrics (may be the same table)
   * @param failAfterGroups  test hook: throw KilledException after N groups commit
   * @param onStaged  invoked once with the staged bucketed input (cheap
   *                  metrics reads; not called when nothing remains to do)
   * @return per-run metrics summed over the buckets THIS invocation processed
   */
  def run(spark: SparkSession,
          docs: DataFrame,
          cleanDocs: DataFrame,
          corrector: Corrector,
          outDir0: String,
          stateDir: String,
          runId: String,
          spansCol: String = "noisy_spans",
          nBuckets: Int = 16,
          groupSize: Int = 4,
          salted: Boolean = false,
          lineage: String = "",
          cleanSpansCol: String = "spans",
          stageToken: String = "",
          failAfterGroups: Option[Int] = None,
          onStaged: DataFrame => Unit = _ => ()): CerMetrics = {
    import spark.implicits._
    org.apache.spark.sql.graft.DamerauLevenshteinExpr.register(spark)

    // normalize: stage dirs are SIBLINGS of outDir by string concatenation —
    // a trailing slash would nest them inside the output and break the
    // prefix-based cleanup sweep
    val outDir = outDir0.stripSuffix("/")
    val done = doneBuckets(spark, stateDir, runId)
    val remaining = (0 until nBuckets).filterNot(done)
    val groups = remaining.grouped(groupSize).toSeq
    var totals = CerMetrics(0, 0, 0.0)
    if (groups.isEmpty) { cleanupStages(spark, outDir); return totals }

    // Stage the bucketed input ONCE, partitioned by bucket. The bucket
    // predicate is a derived column (pmod(xxhash64(doc_id))) that can never
    // push down to the original source, so filtering `docs` directly would
    // re-read and re-derive the ENTIRE upstream plan once per group — at
    // 100 TB that multiplies total work by the group count. Staging turns
    // each group job into a partition-pruned read of only its buckets.
    // The stage is committed atomically (_SUCCESS) and the upstream plan is
    // deterministic, so a resumed run reuses or identically rewrites it.
    // nBuckets and the stage token are part of the directory names: a resume
    // with a DIFFERENT bucketing must not filter a stage built under the old
    // one (it would silently drop every bucket id the old stage never
    // produced), and a resume against a DIFFERENT input or clean table must
    // not reuse the previous source's staged rows. Callers may pass an
    // explicit token (RunPipeline fingerprints its paths); by DEFAULT the
    // token is a fingerprint of the input plans themselves, so a stage left
    // by a killed run over a different source with the same outDir/nBuckets
    // is never silently reused. The clean side is staged the same way — its
    // exploded text spans would otherwise be re-derived once per group by
    // the metrics join. All stages under this outDir are deleted once every
    // bucket is committed.
    val token = if (stageToken.nonEmpty) stageToken
                else planToken(docs) + (if (cleanDocs eq docs) "" else planToken(cleanDocs))
    val suffix = s"b$nBuckets-$token"
    val stagingDir = s"$outDir.staging-$suffix"
    val cleanStagingDir = s"$outDir.staging-clean-$suffix"
    stageBucketed(spark, docs, stagingDir, nBuckets)
    // staged reads carry EXPLICIT schemas: a legitimately-empty stage (an
    // aggressive curation config dropping every doc, or a media-only corpus
    // with zero text spans on the clean side) writes a directory with no
    // part files, and schema inference would fail the whole run on it
    import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
    val staged = spark.read.schema(docs.schema.add("bucket", IntegerType))
      .parquet(stagingDir)
    // metrics hook: callers that want an input count read it off the staged
    // copy (footer-level, no column materialization) instead of re-scanning
    // the original upstream plan after the run
    onStaged(staged)
    // when the clean side IS the input plan, derive its spans from the
    // already-staged parquet instead of re-evaluating the upstream a 2nd time
    val cleanSource = if (cleanDocs eq docs) staged.drop("bucket") else cleanDocs
    stageCleanSpans(spark, cleanSource, cleanStagingDir, nBuckets, cleanSpansCol)
    val cleanStaged = spark.read.schema(new StructType()
        .add("doc_id", StringType).add("offset", IntegerType)
        .add("text_clean", StringType).add("bucket", IntegerType))
      .parquet(cleanStagingDir)

    groups.zipWithIndex.foreach { case (group, gi) =>
      failAfterGroups.foreach(k => if (gi >= k) throw new KilledException(s"injected kill before group $gi"))

      val bucketed = staged.filter(col("bucket").isin(group: _*))
      val corrected = CorrectionPipeline
        .correct(CorrectionPipeline.explodeSpans(bucketed.drop("bucket"), spansCol), corrector)
        .cache()
      try {
        val assembled = (if (salted) CorrectionPipeline.reassembleSalted(corrected)
                         else CorrectionPipeline.reassemble(corrected))
          .withColumn("bucket", bucketOf(nBuckets))
        // data commit (atomic at job level)
        assembled.write.mode(SaveMode.Append).partitionBy("bucket").parquet(outDir)

        // per-bucket metrics vs the staged clean spans (partition-pruned)
        val clean = cleanStaged.filter(col("bucket").isin(group: _*))
          .select(col("doc_id"), col("offset"), col("text_clean"))
        val perBucket = corrected.toDF()
          .filter(col("kind") === "text")
          .join(clean, Seq("doc_id", "offset"))
          .withColumn("bucket", bucketOf(nBuckets))
          .withColumn("dist", normalizedDistCol(col("text"), col("text_clean")))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("rows"),
            sum(col("dist")).as("cer_sum"),
            sum(when(col("dist") === 0.0, 1L).otherwise(0L)).as("perfect"))
          .collect()
          .map(r => StateRow(runId, r.getInt(0), "done", r.getLong(1), r.getDouble(2), r.getLong(3), lineage))
        // buckets with zero text spans still need a done-marker
        val covered = perBucket.map(_.bucket).toSet
        val markers = group.filterNot(covered).map(b => StateRow(runId, b, "done", 0L, 0.0, 0L, lineage))
        val stateRows = perBucket.toSeq ++ markers
        spark.createDataset(stateRows).write.mode(SaveMode.Append).parquet(stateDir)
        totals = CerMetrics(
          totals.n + stateRows.map(_.rows).sum,
          totals.nPerfect + stateRows.map(_.perfect).sum,
          totals.sumNormDist + stateRows.map(_.cer_sum).sum)
      } finally corrected.unpersist()
    }
    // every bucket is committed — the stages are dead weight now (a kill
    // before this point leaves them for the resume to reuse). Sweeping all
    // `<outDir>.staging*` siblings also reclaims stages abandoned under a
    // different bucketing/token, and covers the resume-after-kill-between-
    // last-commit-and-cleanup path (groups.isEmpty calls this too).
    cleanupStages(spark, outDir)
    totals
  }

  /** Delete every staging directory belonging to `outDir`. */
  def cleanupStages(spark: SparkSession, outDir0: String): Unit = {
    val out = new org.apache.hadoop.fs.Path(outDir0.stripSuffix("/"))
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = out.getParent
    if (parent != null && fs.exists(parent)) {
      val prefix = s"${out.getName}.staging"
      fs.listStatus(parent).foreach { st =>
        if (st.getPath.getName.startsWith(prefix)) { fs.delete(st.getPath, true); () }
      }
    }
  }

  /** Aggregate metrics for a completed run from its state table. */
  def metrics(spark: SparkSession, stateDir: String, runId: String): CerMetrics = {
    import spark.implicits._
    val rows = spark.read.parquet(stateDir).as[StateRow]
      .filter(s => s.run_id == runId && s.status == "done").collect()
    CerMetrics(rows.map(_.rows).sum, rows.map(_.perfect).sum, rows.map(_.cer_sum).sum)
  }
}
