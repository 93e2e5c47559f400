package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus artifact sinks/scans (SURVEY.md §2.1 S2, S5, S8, S9, S10) — the
 * file formats the reference materializes between pipeline stages, as
 * schema-enforced Spark readers/writers.
 */
object CorpusIO {

  /** S2 — plain-text corpus: one sentence per line, UTF-8
    * (`to_plain_text.py:42-46`). */
  def writePlainText(df: DataFrame, textCol: String, path: String): Unit =
    df.select(col(textCol)).write.mode("overwrite").text(path)

  def readPlainText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "text")

  /** S5 — split index CSV `(byte_index_clean, byte_index_messy, split)`
    * becomes `(doc_id, offset, split)` in the columnar model (byte offsets
    * vanish, SURVEY.md S6). The reference asserts the header on read
    * (`corrector_dataset.py:25`); here the explicit schema + FAILFAST is the
    * assertion — a header/type mismatch fails the read, not the query. */
  val splitSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("offset", IntegerType),
    StructField("split", StringType)))

  def writeSplitCsv(df: DataFrame, path: String): Unit =
    df.select(col("doc_id"), col("offset"), col("split"))
      .write.mode("overwrite").option("header", true).csv(path)

  def readSplitCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(splitSchema)
      .option("header", true)
      .option("enforceSchema", false) // verify the file header against the schema
      .option("mode", "FAILFAST")
      .csv(path)

  /** S8 — vocabulary model artifact (`dictionary_corrector.py:157-172`
    * `json.dumps(self.__dict__)`): stored columnar as (token, freq) plus the
    * min_frequency hyperparameter; the reference's key-set assertion on load
    * (:168-171) becomes a schema equality check. */
  val vocabSchema: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("freq", LongType, nullable = false),
    StructField("min_frequency", LongType, nullable = false)))

  def saveVocab(vocabDf: DataFrame, minFrequency: Long, path: String): Unit =
    vocabDf.select(col("token"), col("freq").cast("long").as("freq"),
        lit(minFrequency).as("min_frequency"))
      .write.mode("overwrite").parquet(path)

  /** Load + assert the artifact shape; returns (vocabDf, minFrequency). */
  def loadVocab(spark: SparkSession, path: String): (DataFrame, Long) = {
    val df = spark.read.parquet(path)
    val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val want = vocabSchema.fields.map(f => (f.name, f.dataType)).toSeq
    require(got == want, s"vocab model schema mismatch: got $got, want $want")
    val mf = df.select(col("min_frequency")).head().getLong(0)
    (df.select(col("token"), col("freq")), mf)
  }

  /** S9 — eval-examples CSV `(text_in, text_out, text_correct,
    * edit_distance)` (`eval.py:39-42,49-60`). */
  def writeEvalCsv(df: DataFrame, path: String): Unit =
    df.select(col("text_in"), col("text_out"), col("text_correct"), col("edit_distance"))
      .write.mode("overwrite").option("header", true).csv(path)

  /** S10 — hyperparameters as a single-row JSON document
    * (`tune_hyperparameters.py:115-117` / `data_functions.py:79-82`). */
  def saveHyperparams(spark: SparkSession, params: Map[String, Double], path: String): Unit = {
    val cols = params.toSeq.sortBy(_._1).map { case (k, v) => lit(v).as(k) }
    spark.range(1).select(cols: _*).coalesce(1).write.mode("overwrite").json(path)
  }

  def loadHyperparams(spark: SparkSession, path: String): Map[String, Double] = {
    val row = spark.read.json(path).head()
    row.schema.fieldNames.map(n => n -> row.getAs[Any](n).toString.toDouble).toMap
  }

  /** Interleaved-docs table sink in a chosen columnar format. `parquet` is
    * the default everywhere; `orc` is the drop-in alternative some lakes
    * standardize on — both carry the nested spans struct, column pruning,
    * and predicate pushdown, so the rest of the engine is format-agnostic.
    *
    * Non-empty `partCols` routes the layout by those low-cardinality
    * columns (lang, source, split) so per-partition consumers — per-
    * language corrector models, per-source audits — read ONLY their
    * partition's bytes (storage-enforced pruning; CorpusIOSpec asserts
    * `PartitionFilters` reach the scan). At 100 TB the partition columns
    * ARE the data-layout index; never partition by a high-cardinality key
    * (doc_id would create one directory per doc). */
  def writeDocs(df: DataFrame, path: String, format: String = "parquet",
                partCols: Seq[String] = Seq.empty): Unit = {
    require(Set("parquet", "orc", "jsonl")(format), s"unsupported docs format: $format")
    require(partCols.forall(df.columns.contains),
      s"partition columns ${partCols.mkString(",")} must exist in ${df.columns.mkString(",")}")
    val w = df.write.mode("overwrite").format(if (format == "jsonl") "json" else format)
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).save(path)
  }

  /** The canonical interleaved-docs record for the JSONL interchange
    * boundary — exactly the input-contract shape `(doc_id, spans:
    * array<struct<kind, text, media_ref, offset:int32>>)`. */
  def docsJsonSchema(spansCol: String = "spans"): StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField(spansCol, ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", IntegerType)))))))

  /** Scan an interleaved-docs table, asserting the contract — `doc_id`
    * plus a spans column that is an `array<struct<...kind, text...>>` —
    * STRUCTURALLY, before anything downstream dereferences span fields
    * (a name-only check would let a scalar `spans` column fail later with
    * an opaque AnalysisException deep in the pipeline). */
  def readDocs(spark: SparkSession, path: String, format: String = "parquet",
               spansCol: String = "spans"): DataFrame = {
    require(Set("parquet", "orc", "jsonl")(format), s"unsupported docs format: $format")
    // JSONL (the LLM-corpus interchange format: one JSON doc per line)
    // reads with the EXPLICIT canonical schema — schema inference would
    // cost a full extra pass over 100 TB and silently widen offset to
    // int64; columns beyond the contract are deliberately not carried
    // across this boundary (use parquet/orc for engine-internal tables)
    val df = if (format == "jsonl")
      spark.read.schema(docsJsonSchema(spansCol)).json(path)
    else spark.read.format(format).load(path)
    require(df.columns.contains("doc_id") && df.columns.contains(spansCol),
      s"docs table at $path must have (doc_id, $spansCol), got ${df.columns.mkString(",")}")
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val ok = df.schema(spansCol).dataType match {
      case ArrayType(st: StructType, _) =>
        Set("kind", "text").subsetOf(st.fieldNames.toSet)
      case _ => false
    }
    require(ok, s"docs table at $path: column $spansCol must be " +
      s"array<struct<kind, text, ...>>, got ${df.schema(spansCol).dataType.simpleString}")
    df
  }
}
