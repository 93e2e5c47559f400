package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic (hash-gated) sampling for corpus curation — eval-set
 * carve-outs, per-stratum downsampling, A/B corpus slices.
 *
 * `Dataset.sample`/`sampleBy` draw from a seeded RNG over the PARTITION
 * stream, so membership changes whenever partitioning, ordering, or Spark
 * version changes — useless for a reproducible corpus. Here membership is a
 * pure function of the ROW: keep iff
 * `md5(id)[0:4] as int  <  fraction * 65536`. That makes samples
 *
 *  - reproducible across runs, engines (oracle-checkable SQL), partitioning
 *    and cluster size;
 *  - NESTED for growing fractions: the 1% sample is a subset of the 10%
 *    sample (same hash, higher cutoff) — the standard trick for consistent
 *    eval sets as budgets grow;
 *  - scan-side NARROW: a per-row predicate, no shuffle, pushes past
 *    column pruning like any other filter.
 *
 * The 16-bit gate quantizes fractions to 1/65536 granularity — fine for
 * curation (per-mille precision); not a statistical RNG.
 */
object Sampling {

  /** 16-bit uniform hash of the id column: first 4 hex chars of md5.
    * A NULL id gates to 0 — null-id rows are KEPT by every fraction > 0
    * (and dropped at fraction 0), so `--sample 1.0` is a true identity
    * instead of silently losing rows to null-propagation. */
  def gate16(id: Column): Column =
    coalesce(conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long"), lit(0L))

  /** Cutoff for a fraction in [0, 1] on the 16-bit gate. */
  private def cutoff(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    math.round(fraction * 65536.0)
  }

  /** Keep a deterministic `fraction` of rows, decided per-row by `idCol`. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(gate16(col(idCol)) < cutoff(fraction))

  /**
   * Per-stratum deterministic sampling: `fractions` maps stratum values
   * (of `stratumCol`) to keep-fractions; strata not in the map keep
   * `defaultFraction`. One scan, no shuffle — the stratum column just
   * selects which cutoff the row's hash gate compares against.
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    val cut = fractions.foldLeft(lit(cutoff(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(cutoff(f))).otherwise(acc)
    }
    df.filter(gate16(col(idCol)) < cut)
  }

  /**
   * Weighted sampling WITHOUT replacement, probability ∝ `weightCol` —
   * Efraimidis & Spirakis (IPL 2006) priority sampling in its Gumbel
   * formulation: key = `ln(w) + Gumbel(0,1)`, take the k largest (the
   * u^(1/w)-key rule log-transformed). Like everything here, the random
   * draw is DETERMINISTIC per row (the md5 16-bit uniform through the
   * Gumbel inverse-CDF), so the sample is a pure function of the row set —
   * reproducible across runs, engines, and partitionings, which a seeded
   * partition-stream RNG cannot give. Rows with null or non-positive
   * weight never sample (weight 0 = excluded, matching the ∝-w semantics).
   *
   * Returns `(idCol, weight, gumbel_key)` — selection ordered by the
   * ROUNDED key (ties by id) so the boundary is engine-portable; join back
   * on `idCol` for full rows. Top-k is `orderBy.limit` =
   * TakeOrderedAndProject: per-partition heaps, no global sort shuffle.
   * [[graft.textanalysis.Dsir.resample]] is this sampler applied to log
   * importance weights.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"sample size k must be >= 1, got $k")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("double").as("weight"))
      .select(col(idCol), col("weight"),
        graft.Portable.round4(
          graft.textanalysis.Dsir.gumbelKey(log(col("weight")), col(idCol)))
          .as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }

  /**
   * Deterministic shard assignment — the "write N shuffled training
   * shards" final-mile step: every doc gets a shard (md5 draw mod
   * `nShards`, balanced in expectation) and a position inside it (rank by
   * an INDEPENDENT md5 order key, ties by id) — a reproducible global
   * shuffle, which the dataloader contract requires and a seeded
   * partition-stream RNG cannot give. `seed` re-deals both draws (epoch
   * re-shuffles). Output `(idCol, shard, pos)` with pos 0-based and dense
   * per shard.
   *
   * Scale shape: the shard draw is a scan-side narrow projection; the
   * position is a per-shard window — an O(n/N log n/N) sort per shard,
   * parallel across shards, which is the inherent cost of producing an
   * ORDER (the two-phase prefix trick does not apply: the order key is
   * uniform, not pre-bucketed). Writers compose with
   * `partitionBy("shard")` sinks for storage-pruned shard reads.
   */
  def shardAssignment(df: DataFrame, nShards: Int, seed: String = "",
                      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"shard count must be >= 1, got $nShards")
    def draw(tag: String): Column =
      conv(substring(md5(concat(lit(s"$tag:$seed:"), col(idCol).cast("string"))), 1, 15), 16, 10)
        .cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__ord").asc, col(idCol).asc)
    df.select(col(idCol),
        (draw("shard") % nShards).cast("int").as("shard"),
        draw("order").as("__ord"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__ord")
  }

  /** Per-shard manifest over an assignment joined back to the docs:
    * `(shard, n_docs, n_tokens)` — the sizing table a shard writer and its
    * dataloader consume. */
  def shardManifest(docs: DataFrame, nShards: Int, seed: String = "",
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    manifestOfAssignment(shardAssignment(docs, nShards, seed, idCol),
      docs, idCol, textCol)

  /** [[shardManifest]] over a PRECOMPUTED [[shardAssignment]] — callers
    * that also write the assignment (the RunPipeline `--shards` sink)
    * compute the per-shard sort window once instead of twice. */
  def manifestOfAssignment(assignment: DataFrame, docs: DataFrame,
                           idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    assignment
      .join(docs.select(col(idCol),
        size(filter(graft.dedup.Dedup.tokens(col(textCol)), t => length(t) > 0))
          .cast("long").as("__nt")), idCol)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))

  /**
   * Per-source diversity quota — cap documents per source/domain so no
   * single crawl host dominates the training mix (the standard "domain
   * cap" of web-corpus recipes). Keeps the top `k` docs per `sourceCol`
   * by `rankCols` (e.g. quality DESC), with `idCol` as the deterministic
   * final tie-break.
   *
   * Scale shape: one shuffle keyed by source; within each source the
   * window sorts that source's rows only (Spark 3.5+ inserts
   * WindowGroupLimit, so partial per-partition top-k runs map-side before
   * the exchange — a mega-source never sorts fully). Hot sources are an
   * aggregation-key skew, AQE-splittable.
   */
  def perSourceQuota(df: DataFrame, sourceCol: String, idCol: String, k: Int,
                     rankCols: Seq[org.apache.spark.sql.Column] = Seq.empty): DataFrame = {
    require(k >= 1, s"quota must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(rankCols :+ col(idCol): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Temperature-based source-mixing allocation — the "data mixing" step of
   * LLM corpus recipes (the multinomial source-sampling rule of the GPT-3 /
   * LLaMA / CCNet lineage): re-weight each source's share of the output
   * toward `n_s^alpha` (alpha = 1: natural proportions; alpha = 0: equal
   * share per source; alpha in between up-weights small high-quality
   * sources against the crawl mass). Given a total row budget
   * `budgetFraction * N`, the target take from source s is `B * p_s` with
   * `p_s proportional to n_s^alpha` — but a small source cannot supply more
   * rows than it has, so the allocation solves the exact WATER-FILLING
   * problem: find lambda with `sum_s min(n_s, lambda * w_s) = B`; sources
   * with `n_s <= lambda * w_s` saturate (keep everything) and the budget
   * they cannot absorb spills to the rest — the same fixpoint the iterated
   * "renormalize over unsaturated sources" loop converges to, computed in
   * CLOSED FORM: sources sorted by saturation threshold `t_s = n_s / w_s`
   * make `g(lambda) = sum min(n_s, lambda w_s)` piecewise linear, so one
   * prefix-sum window over the per-source table finds the segment
   * containing lambda and solves the linear equation on it.
   *
   * Returns one row per source: `(source, n, frac)` — the audit surface;
   * `frac` is the per-row keep probability realized by the deterministic
   * [[gate16]] gate in [[temperatureMix]]. `weighCol` generalizes the
   * budget unit: `lit(1L)` budgets ROWS; a token-count column budgets
   * TOKENS (the take from s is then `frac * tokens_s` in expectation,
   * uniform over the source's docs).
   *
   * Scale shape: one hash agg to the per-source table (one row per DISTINCT
   * source — domains saturate like any boilerplate vocabulary), then
   * unpartitioned windows over THAT table only (the q_seq_pack discipline:
   * the corpus never sees a global window; WindowExec's single-partition
   * warning refers to the tiny totals table). Exactness note: alpha 0.5
   * (the common T=2 temperature) computes weights via `sqrt` — correctly
   * rounded per IEEE 754 on every engine, so the DuckDB oracle agrees
   * bit-for-bit; general alpha goes through `pow`, which Java only bounds
   * to 1 ulp — fine for curation, not for cross-engine hash equality.
   */
  def temperatureAllocation(df: DataFrame, sourceCol: String, alpha: Double,
                            budgetFraction: Double,
                            weighCol: Column = lit(1L)): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha out of [0,1]: $alpha")
    require(budgetFraction >= 0.0 && budgetFraction <= 1.0,
      s"budgetFraction out of [0,1]: $budgetFraction")
    val srcs = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(weighCol).cast("long").as("n"))
    val nD = col("n").cast("double")
    val w = alpha match {
      case 0.0 => lit(1.0)
      case 0.5 => sqrt(nD) // exactly rounded — the oracle-grade path
      case 1.0 => nD
      case a   => pow(nD, lit(a))
    }
    val tot = srcs.agg(sum(col("n")).cast("double").as("__nn"))
    val wAsc = org.apache.spark.sql.expressions.Window
      .orderBy(col("t").asc, col("source").asc)
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("t").desc, col("source").desc)
    val seg = srcs
      .withColumn("w", w).withColumn("t", nD / col("w"))
      .crossJoin(broadcast(tot))
      .withColumn("b", lit(budgetFraction) * col("__nn"))
      .withColumn("pre_n",
        coalesce(sum(col("n")).over(wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("post_w",
        sum(col("w")).over(wDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_t", lag(col("t"), 1).over(wAsc))
      .withColumn("cand", (col("b") - col("pre_n")) / col("post_w"))
    // exactly one segment satisfies g(t_{j-1}) <= B <= g(t_j); on a boundary
    // tie two adjacent rows carry the SAME cand, so min() is deterministic.
    // No valid row at all means B >= N: every source saturates, frac = 1
    val lam = seg.agg(min(when(
      col("cand") <= col("t") &&
        (col("prev_t").isNull || col("cand") >= col("prev_t")),
      col("cand"))).as("lambda"))
    seg.select(col("source"), col("n"), col("t"))
      .crossJoin(broadcast(lam))
      .withColumn("frac",
        when(col("lambda").isNull, lit(1.0))
          .otherwise(least(lit(1.0), col("lambda") / col("t"))))
      .select(col("source"), col("n"), col("frac"))
  }

  /**
   * Apply [[temperatureAllocation]]: keep each row iff its [[gate16]] hash
   * clears its source's allocated fraction. Deterministic per row, NESTED
   * across growing budgets (lambda — hence every frac — is monotone in B,
   * so a smaller budget's sample is a subset of a larger one's), and
   * null-source rows form their own stratum (null-safe join). The
   * allocation table is one row per source — broadcast-joined back, so the
   * corpus itself never shuffles: the whole mix is a scan-side filter.
   */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
                     alpha: Double, budgetFraction: Double,
                     weighCol: Column = lit(1L)): DataFrame = {
    val alloc = temperatureAllocation(df, sourceCol, alpha, budgetFraction, weighCol)
      .select(col("source").as("__mix_source"), col("frac").as("__mix_frac"))
    df.join(broadcast(alloc), col(sourceCol) <=> col("__mix_source"))
      .filter(gate16(col(idCol)) <
        floor(col("__mix_frac") * 65536.0 + 0.5).cast("long"))
      .drop("__mix_source", "__mix_frac")
  }
}
