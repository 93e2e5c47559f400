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
 * thousands-to-millions of entries, broadcast-friendly; the train side
 * explodes its n-grams scan-side ([[TextAnalysis.docNgrams]] shape) and
 * LEFT SEMI joins per gram, so the only wide work is one join keyed by the
 * gram (broadcast by default — `broadcastEval = false` selects a shuffled
 * hash join for very large eval corpora) and one count per flagged doc.
 * The join key is the 60-bit md5 hash of the gram, NOT the 13-token string:
 * a 13-gram averages ~80+ bytes, so probing on the string inflates the
 * exploded train surface ~13× over the underlying text and makes every
 * broadcast-table entry and hash probe string-sized; the 8-byte key cuts
 * that ~10× while `sample_gram` still rides untouched to the aggregation
 * (only flagged rows — a tiny fraction — carry their string into the
 * per-doc min). A 2⁻⁶⁰ hash collision can in principle flag a clean doc;
 * both engines hash identically (the q_shared_substrings discipline), so
 * the oracle agrees bit-for-bit even then, and for an audit-grade exact
 * check the `sample_gram` evidence is re-verifiable against the eval set.
 * The train corpus text itself never shuffles.
 */
object Decontamination {

  /** 60-bit md5-derived gram key (oracle restatement:
    * `CAST(('0x' || substr(md5(gram), 1, 15))::UBIGINT AS BIGINT)`). */
  private def gramHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

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
    val evalHashes = eval
      .select(explode(TextAnalysis.ngramArray(col(textCol), n)).as("gram"))
      .select(gramHash(col("gram")).as("__gh"))
      .distinct()
    // broadcastEval is an EXPLICIT choice, not a silent fallback: the hint
    // bypasses autoBroadcastJoinThreshold, so the caller asserts the
    // distinct eval-gram-hash set fits the driver (true for typical
    // benchmark suites, and 10× truer on 8-byte hashes than on strings).
    // For a very large eval corpus pass false — the semi-join then plans as
    // an ordinary shuffled hash join, where only hashes cross the exchange.
    val evalSide = if (broadcastEval) broadcast(evalHashes) else evalHashes
    // conditional fan-out of the train side before the n-gram explode +
    // per-gram md5 (round 7): the semi join broadcasts the eval hashes, so
    // without it the whole probe chain runs on the raw scan's single
    // probe-scale partition; no-op whenever the scan is already parallel
    TextAnalysis.docNgrams(
        graft.pipeline.Fanout.fanout(
          train.select(col(idCol), col(textCol)), col(idCol)),
        n, idCol, textCol)
      .withColumn("__gh", gramHash(col("gram")))
      .join(evalSide, Seq("__gh"), "left_semi")
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
