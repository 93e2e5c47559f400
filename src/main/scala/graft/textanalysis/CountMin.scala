package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) for
 * corpus frequency statistics in BOUNDED memory — the companion of the
 * Bloom membership sketch: `d` hash rows × `w` counters; every key adds
 * its weight to one counter per row; the estimate is the MINIMUM over its
 * d counters. Error is ONE-SIDED (`est >= true` always — counters only
 * ever over-count on collisions) and bounded: `est <= true + ε·N` with
 * probability 1−δ at `w = ⌈e/ε⌉`, `d = ⌈ln(1/δ)⌉`, N = total weight.
 *
 * Why it matters at 100 TB: the exact token/gram frequency table is
 * vocabulary-sized (billions of rows for web n-grams); the sketch is
 * `d·w` counters REGARDLESS of corpus or vocabulary size, and sketches of
 * two corpora MERGE by per-cell addition — the mergeable-summary algebra
 * for incremental corpus accounting. Heavy-hitter enumeration composes
 * the sketch with a deterministic candidate sample: true heavy hitters
 * appear in any md5-gated sample w.h.p., and their sketch estimates never
 * under-count, so no true heavy hitter that reached the candidate set is
 * lost (the misses are sample misses, quantifiable by the gate fraction).
 *
 * Engine-portable: cell positions are md5 draws `md5(key || '#' || r)`
 * (60 bits mod w, the Bloom/gate16 family); counters are BIGINTs — every
 * number the sketch produces is integer-exact on any engine and any
 * partitioning, which is why the whole surface is oracle-checkable.
 */
object CountMin {

  /** The row-r counter index of a key: `md5(key || '#' || r)` mod w. */
  def cell(key: Column, r: Int, w: Int): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s"#$r"))), 1, 15), 16, 10)
      .cast("long") % w

  /** Build the sketch from a weighted key table: `(r, c, cnt)`, ≤ d·w
    * rows. One narrow d-way explode + one hash aggregation. */
  def buildSketch(keys: DataFrame, keyCol: String, weightCol: String,
                  d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 16, s"need 1 <= d <= 16 rows, got $d")
    require(w >= 2, s"need w >= 2 counters per row, got $w")
    keys.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cell(col(keyCol), r, w).as("c"),
          col(weightCol).cast("long").as("n"))): _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.c").as("c"))
      .agg(sum(col("e.n")).cast("long").as("cnt"))
  }

  /** Sketch of the corpus TOKEN frequencies: one tokenize pass feeding
    * [[buildSketch]] with unit weights pre-combined per (doc, token) —
    * map-side-friendly, token strings never reach the sketch shuffle
    * beyond the (r, c) cell keys. */
  def buildTokenSketch(docs: DataFrame, d: Int, w: Int,
                       textCol: String = "text"): DataFrame =
    buildSketch(
      docs.select(explode(graft.dedup.Dedup.tokens(col(textCol))).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as("n")),
      "token", "n", d, w)

  /** Point estimates for a candidate key table: `(keyCol, est)` with
    * `est = min over rows r of counter[r][cell_r(key)]` — `est >= true`
    * always. The sketch table broadcasts (≤ d·w rows). */
  def estimate(candidates: DataFrame, sketch: DataFrame, keyCol: String,
               d: Int, w: Int): DataFrame = {
    val probes = candidates.select(col(keyCol),
        explode(array((0 until d).map(r =>
          struct(lit(r).as("r"), cell(col(keyCol), r, w).as("c"))): _*)).as("p"))
      .select(col(keyCol), col("p.r").as("r"), col("p.c").as("c"))
    probes.join(broadcast(sketch), Seq("r", "c"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("est"))
  }

  /** Merge two sketches of the SAME geometry: per-cell addition —
    * `sketch(A ⊎ B) = merge(sketch(A), sketch(B))` exactly. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /**
   * Heavy-hitter tokens: candidates = the distinct tokens of the
   * deterministic md5-gated `sampleFraction` of docs (a token of true
   * frequency f across docs misses the candidate set only if EVERY doc
   * containing it is outside the sample); estimates from the FULL-corpus
   * sketch; keep `est >= threshold`. Output `(token, est)` — never
   * under-counts, so every true heavy hitter in the candidate set
   * survives the threshold.
   */
  def heavyHitters(docs: DataFrame, threshold: Long,
                   sampleFraction: Double = 0.1, d: Int = 4, w: Int = 8192,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sketch = buildTokenSketch(docs, d, w, textCol)
    val cand = graft.pipeline.Sampling.deterministicSample(docs, idCol, sampleFraction)
      .select(explode(graft.dedup.Dedup.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    estimate(cand, sketch, "token", d, w)
      .filter(col("est") >= threshold)
  }

  /** Persist a sketch: `dir/cells` (r, c, cnt) + `dir/meta` one row (d, w). */
  def save(spark: SparkSession, sketch: DataFrame, d: Int, w: Int, dir: String): Unit = {
    import spark.implicits._
    sketch.write.mode("overwrite").parquet(s"$dir/cells")
    Seq((d, w)).toDF("d", "w").coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a persisted sketch: `(cells, d, w)`. */
  def load(spark: SparkSession, dir: String): (DataFrame, Int, Int) = {
    val meta = spark.read.parquet(s"$dir/meta")
    require(meta.columns.toSet == Set("d", "w"),
      s"count-min meta must have (d, w), got ${meta.columns.mkString(",")}")
    val rows = meta.select(col("d").cast("int"), col("w").cast("int")).collect()
    require(rows.length == 1, s"count-min meta $dir/meta must hold exactly one row")
    val cells = spark.read.parquet(s"$dir/cells")
    require(cells.columns.toSet == Set("r", "c", "cnt"),
      s"count-min cells must have (r, c, cnt), got ${cells.columns.mkString(",")}")
    (cells, rows.head.getInt(0), rows.head.getInt(1))
  }
}
