package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
}
