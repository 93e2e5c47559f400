package graft.textanalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Train/eval decontamination — the cross-corpus n-gram collision check every
 * serious LM training pipeline runs (GPT-3 appendix C / PaLM style: flag a
 * training doc when it shares an n-gram of order ~13 with any benchmark
 * document, then drop or audit it). This is NOT dedup: the right side is a
 * different, usually tiny corpus (the eval sets), and the output is a
 * per-training-doc contamination verdict, not survivor selection.
 *
 * Scale shape: eval n-grams are DISTINCT grams of a benchmark corpus —
 * thousands-to-millions of short strings, broadcast-friendly; the train side
 * explodes its n-grams scan-side ([[TextAnalysis.docNgrams]] shape) and
 * LEFT SEMI joins per gram, so the only wide work is one join keyed by the
 * gram string (broadcast by default — `broadcastEval = false` selects a
 * shuffled hash join for very large eval corpora) and one count per flagged
 * doc. The train corpus text itself never shuffles.
 */
object Decontamination {

  /**
   * Per-training-doc contamination report: `(idCol, n_hits, sample_gram)` —
   * how many of the doc's n-gram OCCURRENCES collide with any eval n-gram,
   * and the lexicographically smallest colliding gram (deterministic,
   * human-auditable evidence). Clean docs are absent; `flagContaminated`
   * with a threshold is a filter away.
   */
  def contaminationReport(train: DataFrame, eval: DataFrame, n: Int = 13,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          broadcastEval: Boolean = true): DataFrame = {
    val evalGrams = eval
      .select(explode(TextAnalysis.ngramArray(col(textCol), n)).as("gram"))
      .distinct()
    // broadcastEval is an EXPLICIT choice, not a silent fallback: the hint
    // bypasses autoBroadcastJoinThreshold, so the caller asserts the
    // distinct eval-gram set fits the driver (true for typical benchmark
    // suites). For a very large eval corpus pass false — the semi-join then
    // plans as an ordinary shuffled hash join.
    val evalSide = if (broadcastEval) broadcast(evalGrams) else evalGrams
    TextAnalysis.docNgrams(train, n, idCol, textCol)
      .join(evalSide, Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), min(col("gram")).as("sample_gram"))
  }

  /** Training docs to DROP: at least `minHits` colliding n-gram occurrences
    * (1 = the standard strict rule). */
  def contaminatedIds(train: DataFrame, eval: DataFrame, n: Int = 13,
                      minHits: Long = 1L, idCol: String = "doc_id",
                      textCol: String = "text",
                      broadcastEval: Boolean = true): DataFrame =
    contaminationReport(train, eval, n, idCol, textCol, broadcastEval)
      .filter(col("n_hits") >= minHits)
      .select(col(idCol))

  /** The decontaminated training corpus: drop flagged docs (anti-join on the
    * id — the train table itself never shuffles by content). */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int = 13,
                    minHits: Long = 1L, idCol: String = "doc_id",
                    textCol: String = "text",
                    broadcastEval: Boolean = true): DataFrame =
    train.join(contaminatedIds(train, eval, n, minHits, idCol, textCol, broadcastEval),
      Seq(idCol), "left_anti")
}
