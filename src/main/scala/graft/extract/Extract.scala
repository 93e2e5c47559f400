package graft.extract

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Doc

/**
 * Spark surface of main-content extraction: raw page tables in, the
 * driver-contract interleaved span table out — the stage UPSTREAM of the
 * correction pipeline (extract → correct → reassemble).
 *
 * The kernel is a narrow `mapPartitions` (pure function of the html string);
 * at 100 TB this is one scan with no shuffle — partition sizing is the only
 * tuning knob, and pathological giant pages are bounded by the parser's
 * single linear pass.
 */
object Extract {

  /** (id, html) table → `Dataset[Doc]` of extracted span sequences. */
  def extractDocs(pages: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html",
                  config: MainContent.Config = MainContent.Config()): Dataset[Doc] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col(idCol).cast("string"), col(htmlCol))
      .as[(String, String)]
      .mapPartitions(_.map { case (id, html) =>
        Doc(id, MainContent.extractSpans(html, config))
      })
  }

  /** Column form: media srcs in document order (oracle-checkable regex). */
  def mediaRefs(html: Column): Column =
    regexp_extract_all(html, lit("""<(?:img|video|audio)[^>]*src="([^"]*)""""), lit(1))

  /** Column form: page title (oracle-checkable regex). */
  def title(html: Column): Column = regexp_extract(html, "<title>([^<]*)</title>", 1)
}
