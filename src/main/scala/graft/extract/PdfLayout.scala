package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.gen.DetRng
import graft.model.{Doc, Span}

/**
 * PDF/layout parse stage (north_rule). Two decode paths:
 *
 *  - **Real byte decode for uncompressed PDFs** ([[PdfCodec]]): from-scratch
 *    object/stream scan + content-stream text operators (`BT/Td/TD/Tm/Tj`)
 *    and XObject figure draws — no libraries. Compressed (`/Filter`) streams
 *    need a real inflater and are skipped; a document that decodes to zero
 *    boxes falls back to the stub.
 *  - **Stub decode** (`stubDecode`): deterministic fake text boxes derived
 *    from the document ref — the fixture path and the fallback.
 *
 * The layout LOGIC downstream of either decode is real and tested:
 *
 *  - **Reading order**: boxes are grouped per page, split into columns by
 *    x-gap clustering (two-column layouts are the common academic/scan case),
 *    columns read left→right, boxes within a column top→bottom — the
 *    standard geometric reading-order reconstruction.
 *  - Figure boxes become media spans at their in-column position.
 */
object PdfLayout {

  final case class TextBox(page: Int, x: Double, y: Double, text: String, isFigure: Boolean)

  /** STUB decode: deterministic fake boxes for a document ref — two-column
    * pages with interleaved figure boxes. */
  def stubDecode(ref: String): Seq[TextBox] = {
    val rng = DetRng.forKey(ref, 0x706466L)
    val nPages = 1 + rng.nextInt(3)
    (0 until nPages).flatMap { p =>
      (0 until 2).flatMap { colIdx =>
        val x = 0.05 + colIdx * 0.5
        val nBoxes = 2 + rng.nextInt(4)
        (0 until nBoxes).map { b =>
          val fig = rng.nextDouble() < 0.2
          TextBox(p, x + rng.nextDouble() * 0.05, 0.1 + b * 0.2 + rng.nextDouble() * 0.05,
            if (fig) f"media://fig${rng.nextLong()}%016x"
            else graft.gen.DocGen.sentence(rng, 6 + rng.nextInt(8)),
            fig)
        }
      }
    }
  }

  /** REAL layout logic: geometric reading order. Columns are detected by the
    * largest x-gap when it exceeds `columnGap` (else single column). */
  def readingOrder(boxes: Seq[TextBox], columnGap: Double = 0.25): Seq[TextBox] =
    boxes.groupBy(_.page).toSeq.sortBy(_._1).flatMap { case (_, pageBoxes) =>
      val xs = pageBoxes.map(_.x).sorted
      val gaps = xs.zip(xs.drop(1)).map { case (a, b) => (b - a, (a + b) / 2) }
      val split = gaps.sortBy(-_._1).headOption.collect {
        case (gap, mid) if gap >= columnGap => mid
      }
      split match {
        case Some(mid) =>
          val (left, right) = pageBoxes.partition(_.x < mid)
          left.sortBy(_.y) ++ right.sortBy(_.y)
        case None => pageBoxes.sortBy(b => (b.y, b.x))
      }
    }

  def toSpans(boxes: Seq[TextBox]): Vector[Span] =
    readingOrder(boxes).zipWithIndex.map { case (b, off) =>
      if (b.isFigure) Span(Span.KindMedia, "", b.text, off)
      else Span(Span.KindText, b.text, "", off)
    }.toVector

  /** (doc_id) refs table → extracted `Dataset[Doc]`. Narrow mapPartitions. */
  def extractDocs(refs: DataFrame, idCol: String = "doc_id"): Dataset[Doc] = {
    val spark = refs.sparkSession
    import spark.implicits._
    refs.select(col(idCol).cast("string")).as[String]
      .mapPartitions(_.map(id => Doc(id, toSpans(stubDecode(id)))))
  }

  /** (doc_id, pdf binary) table → extracted `Dataset[Doc]` via the REAL
    * uncompressed-PDF byte decode; docs that decode to zero boxes (compressed
    * or non-PDF payloads) fall back to the deterministic stub. Narrow. */
  def extractPdfDocs(pdfs: DataFrame, idCol: String = "doc_id",
                     bytesCol: String = "pdf"): Dataset[Doc] = {
    val spark = pdfs.sparkSession
    import spark.implicits._
    pdfs.select(col(idCol).cast("string"), col(bytesCol)).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val boxes = PdfCodec.parse(bytes)
        Doc(id, toSpans(if (boxes.nonEmpty) boxes else stubDecode(id)))
      })
  }
}
