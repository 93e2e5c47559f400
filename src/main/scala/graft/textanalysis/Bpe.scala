package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer training — Sennrich, Haddow, Birch, "Neural Machine
 * Translation of Rare Words with Subword Units" (ACL 2016): learn a merge
 * table by repeatedly fusing the most frequent adjacent symbol pair, the
 * vocabulary-construction step every modern LM pipeline runs over its
 * corpus (the engine's `bpeTokenCount` estimates subword counts; this
 * TRAINS the actual subword vocabulary).
 *
 * Scale shape — the part that matters at 100 TB: the corpus collapses ONCE
 * to the distinct-word frequency table `(word, n)` (one hash aggregation;
 * the only corpus-sized shuffle), and every training step runs over that
 * table — bounded by VOCABULARY size (~10⁶ rows for web text), not corpus
 * size. Each merge step is: adjacent-pair explode → one weighted hash agg
 * → `orderBy.limit(1)` top-1 to the driver (one row) → a scan-side fold
 * rewriting the symbol arrays. The per-step `localCheckpoint` keeps the
 * plan flat across iterations (the table is distinct-words-sized — tiny;
 * without it every iteration's fold nests into one ever-deeper HOF
 * expression).
 *
 * Determinism: counts are integers (exact in any partitioning); the argmax
 * pair breaks ties by `(left, right)` lexicographically ascending; the
 * merge rewrite is the LEFTMOST-first non-overlapping rule ("aaa" + merge
 * (a,a) → ["aa","a"]) — all spec-asserted bit-equal against a driver-side
 * reference implementation.
 *
 * Symbols are code units of the normalized word plus a terminal
 * end-of-word marker `</w>` (the paper's formulation — word-final units
 * merge separately from word-internal ones). A merged symbol could in
 * principle spell the literal marker; the standard implementations accept
 * that theoretical collision and so does this one.
 */
object Bpe {

  val EndOfWord = "</w>"

  /** Distinct-word frequency table of the corpus: `(word, n)` — the ONLY
    * corpus-sized aggregation in BPE training. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(graft.dedup.Dedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Initial symbolization of a word: its characters plus [[EndOfWord]]. */
  private def initSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** Weighted adjacent-pair counts over a symbolized word table
    * `(s: array<string>, n)`: `(l, r, cnt)` — overlapping positions count
    * separately (the paper's statistic: "aaa" contributes (a,a) twice). */
  private def pairCountsFromSymbols(sym: DataFrame): DataFrame =
    sym.select(col("n"), posexplode(
        // size guard: a fully merged word has ONE symbol, and Spark's
        // sequence(1, 0) DESCENDS instead of being empty
        when(size(col("s")) >= 2,
          transform(sequence(lit(1), size(col("s")) - 1),
            i => struct(element_at(col("s"), i).as("l"),
              element_at(col("s"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
        .as(Seq("p0", "pr")))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum(col("n")).cast("long").as("cnt"))

  /** The public pair statistic straight from a docs table (the
    * `q_bpe_pairs` surface): weighted adjacent-symbol pair counts of the
    * INITIAL (character) symbolization. */
  def pairCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    pairCountsFromSymbols(
      wordCounts(docs, textCol).select(initSymbols(col("word")).as("s"), col("n")))

  /** One leftmost-first non-overlapping merge of the adjacent pair (a, b)
    * in a symbol array — a single left fold with a one-symbol pending
    * buffer ("" = empty; symbols are never empty strings). */
  private def mergeFold(s: Column, a: String, b: String): Column =
    aggregate(s,
      struct(array().cast("array<string>").as("acc"), lit("").as("pend")),
      (st, x) => when(st("pend") === a && x === b,
          struct(concat(st("acc"), array(lit(a + b))).as("acc"), lit("").as("pend")))
        .otherwise(struct(
          when(st("pend") === "", st("acc"))
            .otherwise(concat(st("acc"), array(st("pend")))).as("acc"),
          x.as("pend"))),
      st => when(st("pend") === "", st("acc"))
        .otherwise(concat(st("acc"), array(st("pend")))))

  /**
   * Learn `numMerges` BPE merges from the corpus. Returns the merge table
   * in rank order; stops early when no pair reaches `minPairCount`
   * (default 2 — merging a pair seen once builds a symbol no second word
   * shares). Each step: one weighted pair aggregation over the
   * distinct-word table, one driver row, one scan-side rewrite.
   */
  def trainMerges(docs: DataFrame, numMerges: Int, minPairCount: Long = 2L,
                  textCol: String = "text"): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var sym = wordCounts(docs, textCol)
      .select(initSymbols(col("word")).as("s"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = pairCountsFromSymbols(sym)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minPairCount) exhausted = true
      else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r))
        sym = sym.withColumn("s", mergeFold(col("s"), l, r)).localCheckpoint()
      }
      i += 1
    }
    merges.toSeq
  }

  /** Tokenize a distinct-word table `(word)` with a learned merge list:
    * `(word, tokens: array<string>)`, marker included on the final token
    * run. Merges apply in rank order; every `chunk` rewrites the plan is
    * cut with a `localCheckpoint` (the table is distinct-words-sized) so
    * arbitrarily long merge lists never build an arbitrarily deep
    * expression tree. */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)],
                  chunk: Int = 16): DataFrame = {
    require(chunk >= 1, s"chunk must be >= 1, got $chunk")
    var df = words.select(col("word"), initSymbols(col("word")).as("tokens"))
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      df = df.withColumn("tokens", mergeFold(col("tokens"), a, b))
      if ((i + 1) % chunk == 0 && i + 1 < merges.length) df = df.localCheckpoint()
    }
    df
  }

  /** Tokenize whole docs: `(idCol, tokens)` — the corpus's DISTINCT words
    * tokenize once through [[encodeWords]] and join back to word
    * occurrences (the same distinct-word discipline as training; per-doc
    * token arrays reassemble in word-position order). */
  def encodeDocs(docs: DataFrame, merges: Seq[(String, String)],
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val occ = docs.select(col(idCol),
        posexplode(filter(graft.dedup.Dedup.tokens(col(textCol)), t => length(t) > 0))
          .as(Seq("pos", "word")))
    val wt = encodeWords(occ.select(col("word")).distinct(), merges)
    occ.join(wt, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("tokens")))),
        x => x("tokens"))).as("tokens"))
  }

  /** Persist a merge table: `dir/merges` = (rank, l, r) parquet. */
  def saveMerges(spark: SparkSession, merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "l", "r").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/merges")
  }

  /** Load a persisted merge table in rank order. */
  def loadMerges(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val df = spark.read.parquet(s"$dir/merges")
    require(df.columns.toSet == Set("rank", "l", "r"),
      s"BPE merges $dir/merges must have (rank, l, r), got ${df.columns.mkString(",")}")
    df.orderBy(col("rank")).collect().map(r => (r.getString(1), r.getString(2))).toSeq
  }
}
