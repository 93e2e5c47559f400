package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff — the versioning primitive behind "what changed
 * between crawl N and crawl N+1": per-doc verdicts `added` / `removed` /
 * `changed` / `unchanged` from a full outer join of two snapshots on the
 * doc id, with content equality decided by the normalized-text
 * [[Dedup.fingerprint]] (whitespace/case drift is NOT a change — the same
 * canonical form every dedup operator keys on).
 *
 * Scale shape: each side reduces scan-side to `(id, 16-byte fingerprint)`
 * before the join — text never shuffles; the join keys on the id (one
 * shuffle per side, or zero with co-bucketed snapshots); the summary is
 * one hash agg over the verdict column. This is the cheap-delta
 * complement of the Bloom sketch: the sketch answers "seen before?"
 * without the old corpus; the diff answers "what exactly changed?" when
 * both snapshots are on hand.
 */
object CorpusDiff {

  /** Per-doc verdicts: `(idCol, status)` with status in
    * added | removed | changed | unchanged. */
  def diff(oldDocs: DataFrame, newDocs: DataFrame,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val o = oldDocs.select(col(idCol), Dedup.fingerprint(col(textCol)).as("__fp_old"))
    val n = newDocs.select(col(idCol), Dedup.fingerprint(col(textCol)).as("__fp_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") === col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Status totals: `(status, n)` — the four-row audit summary. */
  def diffSummary(oldDocs: DataFrame, newDocs: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    diff(oldDocs, newDocs, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
