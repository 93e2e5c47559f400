package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Column profiling — the data-quality census a curation pipeline runs
 * before/after every major transform (did dedup drop a language? did a
 * source start shipping null text?).
 *
 * One row per profiled column: row count, null count, exact distinct count,
 * min/max string length (code points). Emitted long-typed so the output is
 * hash-comparable across engines.
 *
 * Scale shape: the row/null/length stats for ALL columns come from ONE
 * narrow aggregation (single scan, no shuffle beyond the final 1-row
 * reduce). Exact distinct counts are per-column hash aggregations —
 * `count(DISTINCT x)` over n columns expands to n shuffles, so at 100 TB
 * swap `exactDistinct = false` to use `approx_count_distinct` (HLL++, one
 * pass, ~2% error) — the profile's consumers (drift alarms) tolerate that;
 * the exact form is kept as the oracle-checkable restatement.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val n = count(lit(1))
    val perCol: Seq[Column] = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).cast("long").as(s"__dist_$c"),
        min(length(s)).cast("long").as(s"__minl_$c"),
        max(length(s)).cast("long").as(s"__maxl_$c"))
    }
    val agg = df.agg(n.as("__n"), perCol: _*)
    // melt the single stats row into one row per column
    val rows = explode(array(cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__minl_$c").as("min_len"), col(s"__maxl_$c").as("max_len"))
    }: _*))
    agg.select(rows.as("p")).select(col("p.*"))
  }
}
