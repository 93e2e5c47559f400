package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.gen.DetRng
import graft.model.{Doc, Span}

/**
 * PDF/layout parse stage (north_rule). No PDF codec exists in this container,
 * so the byte-level decode is a STUB (deterministic fake text boxes derived
 * from the document ref — same pattern as `Multimodal.StubCodec`); the
 * layout LOGIC is real and tested:
 *
 *  - **Reading order**: boxes are grouped per page, split into columns by
 *    x-gap clustering (two-column layouts are the common academic/scan case),
 *    columns read left→right, boxes within a column top→bottom — the
 *    standard geometric reading-order reconstruction.
 *  - Figure boxes become media spans at their in-column position.
 *
 * Swapping in a real PDF library replaces ONE function (`stubDecode`).
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
}
