package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Scale-adaptive scan fan-out for kernel-heavy operators.
 *
 * A parquet scan smaller than `spark.sql.files.openCostInBytes` (or with a
 * single row group) plans as ONE partition, so every scan-side kernel —
 * minhash signatures, gram builders, the counted-profile kernels — runs on
 * one core regardless of `local[n]` / cluster width. Historically the
 * operators regained parallelism by accident: their first `groupBy`
 * exchange fanned the EXPANDED rows (gram/shingle occurrences) across the
 * cluster. The round-7 counted kernels remove those exchanges, so the
 * fan-out must happen — when it is needed at all — BEFORE the kernel, on
 * the raw pre-expansion rows, which are a fraction of the exchanged bytes
 * the removed aggregations used to shuffle.
 *
 * [[fanout]] is therefore conditional and parameter-free at scale:
 *  - if the input already carries at least `defaultParallelism` partitions
 *    (any real-scale table), it is a NO-OP — nothing is ever shuffled;
 *  - otherwise it hash-repartitions on `keys` to EXPLICITLY
 *    `defaultParallelism` partitions. The explicit count matters: AQE's
 *    partition coalescing folds a small column-only repartition straight
 *    back to one partition (measured: `repartition(col)` of the probe-scale
 *    documents table plans to 1 partition), re-serializing the kernel; a
 *    user-specified count is exempt from coalescing. The count derives from
 *    the session (cluster cores), never a constant.
 *
 * Determinism: hash partitioning only moves rows between partitions; every
 * operator here is partition-order-independent by construction (ordered
 * per-row folds, integer aggregations), and the oracle gate re-verifies
 * value-identity after the change.
 *
 * WHEN to fan (the round-7 measured rule): only where
 * (serial scan-side work) × (plan executions) outweighs
 * (one exchange + one stage) × (plan executions). Wins: the counted
 * doc-profile kernel, PII regex chains, the 13-gram decontamination
 * probe, the substring k-gram table, PQ encode, the SemDeDup assign
 * (pairs surface). Losses, kept out with numbers in their source notes:
 * light per-row work (tokenize, 200-char winnow, token segments, sq8 /
 * cosine over a 2k-vector corpus), chains that re-execute per consumer
 * (minhash signatures), paths whose driver gate executes the plan twice
 * (semDedup's CC collect), and any site above which a SMALL-key-space
 * aggregation combines map-side (LangProfile.train). Two usage hazards:
 * gate only on scan-level frames (the partition probe re-plans the
 * frame), and expect `repartition(col)` WITHOUT the explicit count to be
 * coalesced straight back to one partition by AQE.
 */
object Fanout {

  /** `df` unchanged if it already has >= defaultParallelism partitions,
    * else hash-repartitioned on `keys` (round-robin when no key fits — e.g.
    * the only natural key would skew) to exactly defaultParallelism. */
  def fanout(df: DataFrame, keys: Column*): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df
    else if (keys.isEmpty) df.repartition(par)
    else df.repartition(par, keys: _*)
  }
}
