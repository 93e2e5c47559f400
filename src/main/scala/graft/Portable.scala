package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine-portable numeric helpers.
 *
 * `round(x, 4)` is NOT portable between engines: Spark rounds the shortest
 * decimal representation of the double (BigDecimal.valueOf → HALF_UP), while
 * DuckDB rounds the true binary value — a double whose shortest repr is an
 * exact tie (e.g. 0.71925) rounds up in Spark and down in DuckDB. Observed in
 * practice (1/5000 rows at sf0.1). `floor(x·10⁴ + 0.5) / 10⁴` uses only
 * IEEE-exact double ops, so both engines produce bit-identical results; the
 * oracle SQL mirrors the same formula.
 *
 * Assumption this rests on: the double being rounded is itself bit-identical
 * on both engines. Column-expression folds (`aggregate`/`zip_with`) are
 * explicit left-to-right, and the embedding oracles (q_embed_norm,
 * q_ann_topk, q_cosine_neardup) pin DuckDB to the SAME order via
 * `list_reduce` (explicit left fold over the zipped arrays) — `sum()` over
 * unnest happened to match but its accumulation order is not contractual.
 */
object Portable {
  def roundAt(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5d) / p
  }

  def round4(c: Column): Column = roundAt(c, 4)

  /** The DuckDB-side spelling of [[round4]] for oracle SQL. */
  def round4Sql(expr: String): String = s"floor(($expr) * 10000 + 0.5) / 10000"

  // ---- one-line JSON artifact helpers (Bench / RunPipeline metrics) ----

  /** JSON number with a fixed format, Locale.ROOT (the f-interpolator uses
    * the JVM default locale — comma decimals corrupt the artifact on a
    * de_DE/fr_FR host). Non-finite doubles (NaN cer on an empty run,
    * 0-second ∞ throughput) have no JSON spelling — emitted as `null`
    * instead of the unparseable bare `NaN`/`Infinity`. */
  def jsonNum(fmt: String, v: Double): String =
    if (java.lang.Double.isFinite(v)) String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    else "null"

  /** JSON string literal (quotes included): quote/backslash/control chars
    * escaped so a hostile run id or path can't break the metrics line. */
  def jsonStr(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }.mkString("\"", "", "\"")
}
