package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-statistics relevance scoring — TF-IDF and BM25 over the
 * `documents`-shaped table. A training-data curation pipeline uses these to
 * rank documents against topic seed queries, weight near-dup survivors, and
 * surface keyword-stuffed spam (pathological tf·idf mass in few terms).
 *
 * Scale design (100 TB):
 *  - every statistic is a hash aggregation over (doc_id, token) rows: term
 *    frequencies, document lengths, document frequencies; shuffles carry
 *    (id/token, long) pairs only, never the text.
 *  - the corpus constants (N, avgdl) are a ONE-ROW aggregate attached via
 *    `crossJoin(broadcast(...))` — no driver-side action, no collect.
 *  - [[bm25Terms]] filters the exploded tokens to the query's terms BEFORE
 *    computing document frequencies, so scoring cost is proportional to
 *    query-term postings, not corpus vocabulary (document lengths still
 *    aggregate over all tokens, as BM25 requires).
 *  - tokens are the lowercased whitespace tokens of the normalized text —
 *    the same canonical form as the dedup layer, so every formula is
 *    reproducible bit-for-bit by an independent SQL engine (oracle-checked).
 *
 * Reference scope note: the reference engine has no relevance layer (its
 * pipeline is correction, post_ocr_correction/README.md); this module is
 * part of the training-data-pipeline surface built over `documents`.
 */
object Relevance {

  /** BM25 saturation / length-normalization defaults (Robertson-Sparck
    * Jones; the values virtually every production system ships). */
  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Lowercased whitespace tokens of the canonical normalized text — the
    * dedup layer's tokenization ([[graft.dedup.Dedup.tokens]]), so relevance
    * statistics and dedup shingles can never desynchronize. */
  def lowerTokens(text: Column): Column = graft.dedup.Dedup.tokens(text)

  /** Exploded `(id, token)` rows, empty tokens dropped. */
  def docTokens(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(lowerTokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)

  /** Document lengths `(id, dl)` as a NARROW per-row projection — token
    * count via `size(...)`, no explode and no shuffle (equal to `sum(tf)`
    * over [[termFrequencies]], which would cost a corpus-wide exploded
    * aggregation). Zero-token docs are dropped, matching the tf table. */
  def docLengths(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        size(filter(lowerTokens(col(textCol)), t => length(t) > 0)).cast("long").as("dl"))
      .where(col("dl") > 0)

  /** Term frequencies: `(id, token, tf)` — one hash aggregation. */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docTokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /**
   * TF-IDF per `(doc, token)`: `tf · (ln((1+N)/(1+df)) + 1)` (the smoothed
   * idf — never negative, defined even for df = N). Returns
   * `(id, token, tf, tfidf)`.
   */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    // tf feeds both the output rows and the df aggregation, so the
    // scan→explode→agg chain executes twice; a lazy localCheckpoint of tf
    // was MEASURED NEUTRAL at sf0.1 (1.21 s vs 1.10 s best-warm — the
    // narrow codegen'd rebuild is cheaper than materializing the rows), so
    // recompute stays, same verdict as the SubstringDup kg probe
    val tf = termFrequencies(docs, idCol, textCol)
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // docs-with-tokens count via the narrow length projection — not a
    // distinct over the exploded tf table (that would re-run the explode)
    val n = docLengths(docs, idCol, textCol).agg(count(lit(1)).as("n"))
    tf.join(df, "token")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("token"), col("tf"),
        (col("tf") * (log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))) + 1.0)).as("tfidf"))
  }

  /**
   * Per-term BM25 contributions of `queryTerms` against every document:
   * `(id, token, score)` where
   * `score = ln(1 + (N - df + 0.5)/(df + 0.5)) · tf·(k1+1) /
   *          (tf + k1·(1 - b + b·dl/avgdl))`.
   * Emitting per-term rows keeps every value a single deterministic
   * arithmetic chain (no cross-term floating-point sum whose accumulation
   * order an independent engine might not reproduce); [[bm25]] sums them.
   */
  def bm25Terms(docs: DataFrame, queryTerms: Seq[String],
                k1: Double = DefaultK1, b: Double = DefaultB,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // document lengths + corpus stats: narrow per-row token counts, no
    // explode — the only exploded aggregation below is query-term-filtered
    val dl = docLengths(docs, idCol, textCol)
    val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    // postings and document frequencies only over the query's terms (the
    // isin filter sits directly above the generator, before any shuffle)
    val tf = termFrequencies(docs, idCol, textCol)
      .where(col("token").isin(queryTerms: _*))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(df), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("token"),
        (idf * col("tf") * lit(k1 + 1.0) / norm).as("score"))
  }

  /** BM25 document scores: `(id, score)`, matched docs only. The cross-term
    * sum folds the per-term scores IN TOKEN ORDER (collect → sort → fold)
    * rather than `sum()`: floating-point addition is not associative, so a
    * partition-order-dependent sum can flip the last ulp between runs and
    * engines — this form is deterministic and oracle-reproducible
    * (`q_bm25_doc`). Scale-safe: the collected list is bounded by the
    * query's term count per doc (partial-aggregatable, never corpus-wide). */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           k1: Double = DefaultK1, b: Double = DefaultB,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25Terms(docs, queryTerms, k1, b, idCol, textCol)
      .groupBy(col(idCol))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("token"), col("score")))),
          x => x("score")),
        lit(0.0), (a, x) => a + x).as("score"))
}
