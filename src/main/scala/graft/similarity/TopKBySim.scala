package graft.similarity

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate: similarity + neighbor id. Field order matters — it
  * is the udaf argument order (sim, id). */
final case class ScoredId(sim: Double, id: Long)

/**
 * Bounded top-k aggregator by (sim desc, id asc) — the scale-safe form of
 * "window row_number ≤ k": groupBy + typed Aggregator runs as a partial/final
 * ObjectHashAggregate, so each map task keeps at most k candidates per query
 * and the exchange carries k rows per (partition, query) instead of the whole
 * scored cross product. The buffer is a best-first sorted list bounded at k;
 * the common-case insert is one comparison against the current k-th best.
 *
 * Deterministic: the result is the true top-k of the input multiset under the
 * total order (sim desc, NaN worst, id asc), independent of partitioning and
 * merge order (callers round `sim` BEFORE aggregation so float tie order is
 * portable — see graft.Portable).
 */
final class TopKBySim(k: Int) extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  /** Total order: sim desc, id asc — with NaN explicitly WORST. A bare
    * `a.sim > b.sim` is false both ways for NaN, so a NaN (e.g. cosine of a
    * zero-norm vector) sitting at the tail of a full buffer would reject
    * every later candidate and make results merge-order dependent. */
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val an = java.lang.Double.isNaN(a.sim)
    val bn = java.lang.Double.isNaN(b.sim)
    if (an || bn) (!an && bn) || (an && bn && a.id < b.id)
    else a.sim > b.sim || (a.sim == b.sim && a.id < b.id)
  }

  private def insert(sorted: List[ScoredId], x: ScoredId): List[ScoredId] =
    if (sorted.lengthCompare(k) >= 0 && !better(x, sorted.last)) sorted
    else {
      val (pre, post) = sorted.span(s => better(s, x))
      (pre ::: x :: post).take(k)
    }

  override def zero: List[ScoredId] = Nil
  override def reduce(buf: List[ScoredId], x: ScoredId): List[ScoredId] = insert(buf, x)
  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(r: List[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[List[ScoredId]] = ExpressionEncoder[List[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
}

object TopKBySim {
  /**
   * Rank the top `k` rows per `query_id` of a `(query_id, neighbor_id, sim)`
   * frame: output `(query_id, rank, neighbor_id, sim)` with rank 1..k by
   * (sim desc, neighbor_id asc). Input must already be narrow (ids + sim
   * only) — vectors never reach this exchange.
   */
  def rank(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKBySim(k), ExpressionEncoder[ScoredId]())
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("sim"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("t.id").as("neighbor_id"), col("t.sim").as("sim"))
  }
}
