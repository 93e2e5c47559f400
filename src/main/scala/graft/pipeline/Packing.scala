package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing bookkeeping — the pretraining preprocessing step that
 * concatenates documents in a deterministic order and slices the token
 * stream into fixed-length training sequences (GPT-style "pack then
 * chunk"). This operator computes, per document, WHERE in that stream it
 * lands: its global token offset and the first/last sequence (bin) ids it
 * occupies — the index a downstream batch writer consumes.
 *
 * Scale design: a naive global running sum is a single-partition window —
 * unusable at 100 TB. Here the prefix sum is TWO-PHASE: documents are
 * bucketed by `floor(id / bucketSize)` (monotone numeric ids — exactly what
 * a corpus with assigned sequence ids has), the in-bucket running sum is an
 * ordinary per-bucket window (parallel across buckets), and the bucket
 * base offsets come from a window over the per-bucket totals — a table with
 * one row per bucket, orders of magnitude smaller than the corpus, then
 * broadcast back. Result is IDENTICAL to the global window for every
 * bucketSize (spec-asserted), so bucketSize is purely a parallelism knob.
 *
 * Tokens are the canonical normalized whitespace tokens
 * ([[graft.dedup.Dedup.tokens]], empties dropped) — the same count every
 * other text operator uses.
 */
object Packing {

  /**
   * `partitionCols` (optional) makes the packing PER-GROUP: each distinct
   * key of `partitionCols` gets its own independent token stream starting
   * at offset 0 — the per-shard packing a shard writer runs (each shard is
   * consumed by one dataloader, so its sequences number from 0). With
   * `Nil` (the default) the stream is corpus-global, exactly as before.
   * Within a group the same two-phase prefix sum applies, so the id must
   * be numeric and dense-ish PER GROUP (a shard assignment's `pos` is).
   */
  def packSequences(docs: DataFrame, seqLen: Int, bucketSize: Long = 4096L,
                    idCol: String = "doc_id",
                    textCol: String = "text",
                    partitionCols: Seq[String] = Nil): DataFrame = {
    require(seqLen >= 1, s"sequence length must be >= 1, got $seqLen")
    require(bucketSize >= 1, s"bucket size must be >= 1, got $bucketSize")
    // fail FAST on a non-numeric id: floor(id / bucketSize) over strings
    // would throw mid-stage under ANSI, or (ANSI off) silently null every
    // bucket key and return an empty join — an index claiming zero docs
    require(docs.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packSequences needs a numeric monotone $idCol for bucketing, got " +
        docs.schema(idCol).dataType.simpleString)
    val parts = partitionCols.map(col)
    // materialize the tokenized projection ONCE: both the per-bucket window
    // and the totals aggregate consume it, and without a boundary each
    // branch re-tokenizes the full corpus (2× the dominant cost). Unlike
    // the SubstringDup case (see measure-before-materialize), the
    // checkpointed shape here is 3 narrow columns per DOC — tiny next to
    // the text scan it saves.
    val toks = docs.select(parts ++ Seq(col(idCol),
      size(filter(graft.dedup.Dedup.tokens(col(textCol)), t => length(t) > 0))
        .cast("long").as("n_tokens"),
      floor(col(idCol) / bucketSize).as("__b")): _*)
      .localCheckpoint(true)
    val inBucket = Window.partitionBy(parts :+ col("__b"): _*).orderBy(col(idCol))
    val withLocal = toks.withColumn("__cum_in",
      coalesce(sum(col("n_tokens")).over(
        inBucket.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // per-bucket totals: tiny (|groups × buckets| rows) — the
    // single-order-per-group window below runs over THIS table, never the
    // corpus (and with partitionCols it parallelizes across groups too)
    val totals = toks.groupBy(parts :+ col("__b"): _*).agg(sum(col("n_tokens")).as("__tot"))
    val baseW =
      if (parts.isEmpty) Window.orderBy(col("__b"))
      else Window.partitionBy(parts: _*).orderBy(col("__b"))
    val base = totals.withColumn("__base",
      coalesce(sum(col("__tot")).over(
        baseW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(parts ++ Seq(col("__b"), col("__base")): _*)
    // a zero-token doc occupies NO sequence — its bins are NULL (a
    // tok_start landing exactly on a boundary at corpus end would otherwise
    // name a phantom bin past the last real sequence, and downstream
    // writers sizing output as max(end_bin)+1 would allocate it)
    withLocal.join(broadcast(base), partitionCols :+ "__b")
      .withColumn("tok_start", col("__base") + col("__cum_in"))
      .select(parts ++ Seq(col(idCol), col("n_tokens"), col("tok_start"),
        when(col("n_tokens") === 0, lit(null))
          .otherwise(floor(col("tok_start") / seqLen))
          .cast("long").as("start_bin"),
        when(col("n_tokens") === 0, lit(null))
          .otherwise(floor((col("tok_start") + col("n_tokens") - 1) / seqLen))
          .cast("long").as("end_bin")): _*)
  }

  /**
   * Length-bucketed batch assignment — the padded-batch counterpart of
   * [[packSequences]]: sort documents by token length and cut consecutive
   * `batchSize`-doc batches, so each batch pads to ITS OWN max length
   * instead of the corpus max (the dynamic-batching rule every seq2seq
   * fine-tuning loader uses; padding waste drops from corpus-max to
   * within-batch spread). Output `(idCol, n_tokens, batch_id,
   * pos_in_batch)` with batches in (length, id) rank order.
   *
   * Scale design: the global rank by `(n_tokens, id)` is TWO-PHASE like
   * the packing prefix sum — an in-group `row_number` partitioned by the
   * EXACT length value (parallel across distinct lengths; a hot common
   * length is aggregation-key skew, AQE-splittable) plus base offsets from
   * a prefix sum over the per-length counts table (one row per DISTINCT
   * length — bounded by max doc length, broadcast back). Identical to the
   * single-partition global window at every batchSize (spec-asserted).
   */
  def lengthBucketedBatches(docs: DataFrame, batchSize: Int,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    require(batchSize >= 1, s"batch size must be >= 1, got $batchSize")
    // same materialize-once argument as packSequences: 2 narrow columns
    // per doc, consumed by the window and the counts aggregate
    val toks = docs.select(col(idCol),
      size(filter(graft.dedup.Dedup.tokens(col(textCol)), t => length(t) > 0))
        .cast("long").as("n_tokens"))
      .localCheckpoint(true)
    val inLen = Window.partitionBy(col("n_tokens")).orderBy(col(idCol))
    val withLocal = toks.withColumn("__rn_in", row_number().over(inLen).cast("long"))
    val counts = toks.groupBy(col("n_tokens")).agg(count(lit(1)).as("__cnt"))
    val base = counts.withColumn("__base",
      coalesce(sum(col("__cnt")).over(
        Window.orderBy(col("n_tokens")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("n_tokens"), col("__base"))
    withLocal.join(broadcast(base), "n_tokens")
      .withColumn("__rank", col("__base") + col("__rn_in"))
      .select(col(idCol), col("n_tokens"),
        floor((col("__rank") - 1) / batchSize).cast("long").as("batch_id"),
        ((col("__rank") - 1) % batchSize).cast("long").as("pos_in_batch"))
  }

  /** Per-batch padding accounting over a [[lengthBucketedBatches]]
    * assignment: `(batch_id, n_docs, max_len, padded_tokens)` with
    * `padded_tokens = n_docs·max_len − Σ n_tokens` — the waste a padded
    * loader actually allocates. One hash agg over the assignment. */
  def batchPaddingStats(assignment: DataFrame): DataFrame =
    assignment.groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_tokens")).as("max_len"),
        (count(lit(1)) * max(col("n_tokens")) - sum(col("n_tokens")))
          .cast("long").as("padded_tokens"))
}
