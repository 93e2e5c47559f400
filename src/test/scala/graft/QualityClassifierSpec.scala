package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.textanalysis.QualityClassifier

class QualityClassifierSpec extends AnyFunSuite {
  val spark = SparkSpec.spark
  import spark.implicits._

  /** Driver-side mirror of the engine's feature map: 16-bit md5 % dim. */
  private def featId(token: String, dim: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(token.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  private def feats(text: String, dim: Int): Map[Int, Long] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      .groupBy(featId(_, dim)).map { case (f, ts) => f -> ts.length.toLong }

  // deterministic two-vocabulary corpus: positives draw from "good" words,
  // negatives from "spam" words, with a shared stopword so the classes
  // overlap on some feature slots
  private val goodV = Seq("theorem", "proof", "lemma", "analysis", "measure", "bound")
  private val spamV = Seq("winner", "click", "free", "prize", "casino", "offer")
  private def doc(i: Long, v: Seq[String]): String =
    (0 until 8).map(j => v(((i * 31 + j * 7) % v.size).toInt)).mkString("the ", " the ", "")
  private val labeled = ((0L until 60L).map(i => (i, doc(i, goodV), 1)) ++
    (60L until 120L).map(i => (i, doc(i, spamV), 0))).toDF("doc_id", "text", "label")

  test("count-diff model is bit-exactly the first GD step from w = 0") {
    val dim = 256
    val diff = QualityClassifier.countDiffModel(labeled, dim)
      .as[(Int, Long)].collect().toMap
    val lr = 0.4
    val (w1, b1) = QualityClassifier.train(labeled, dim, steps = 1, lr = lr)
    // residuals at w=0 are exactly -1/2 (pos) and +1/2 (neg); the averaged
    // gradient is -diff_f / (2n) — half-integer / n sums are exact, so the
    // step-1 weights must equal lr * diff / (2n) BIT-exactly
    val n = 120.0
    (0 until dim).foreach { f =>
      val want = lr * diff.getOrElse(f, 0L).toDouble / (2.0 * n)
      assert(w1(f) == want, s"f=$f: ${w1(f)} != $want")
    }
    // balanced classes: bias gradient is exactly 0
    assert(b1 == 0.0, s"bias: $b1")
  }

  test("count-diff scores: integer-exact, repartition-proof, empty docs dropped") {
    val dim = 256
    val model = QualityClassifier.countDiffModel(labeled, dim)
    val scored = QualityClassifier.countDiffScores(labeled, model, dim)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // the count-diff gate separates the two vocabularies perfectly here
    scored.foreach { case (id, raw, keep) =>
      assert(keep == (id < 60L), s"doc $id raw=$raw keep=$keep")
    }
    // driver-side integer mirror agrees exactly
    val docs = labeled.select($"doc_id", $"text", $"label")
      .as[(Long, String, Int)].collect()
    val diffRef = docs.flatMap { case (_, t, y) =>
      feats(t, dim).map { case (f, c) => f -> (if (y == 1) c else -c) }
    }.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sum }
    docs.foreach { case (id, t, _) =>
      val raw = feats(t, dim).map { case (f, c) => c * diffRef.getOrElse(f, 0L) }.sum
      val got = scored.find(_._1 == id).get
      assert(got._2 == raw, s"doc $id: ${got._2} != $raw")
    }
    // membership is a pure function of the row
    val rep = QualityClassifier.countDiffScores(labeled.repartition(7), model, dim)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rep.toSeq == scored.toSeq)
    // an empty doc scores 0 and is dropped by the conservative gate
    val withEmpty = labeled.union(Seq((999L, "   ", 0)).toDF("doc_id", "text", "label"))
    val e = QualityClassifier.countDiffScores(withEmpty, model, dim)
      .filter($"doc_id" === 999L).as[(Long, Long, Boolean)].head()
    assert(e == ((999L, 0L, false)))
  }

  test("GD training matches a driver-side reference and separates held-out docs") {
    val dim = 128
    val steps = 3
    val lr = 0.5
    val (w, b) = QualityClassifier.train(labeled, dim, steps, lr, l2 = 0.01)
    // naive full-batch LR on the same hashed features
    val docs = labeled.select($"doc_id", $"text", $"label")
      .as[(Long, String, Int)].collect().map { case (_, t, y) => (feats(t, dim), y.toDouble) }
    val wr = Array.fill(dim)(0.0); var br = 0.0
    val n = docs.length.toDouble
    for (_ <- 0 until steps) {
      val g = Array.fill(dim)(0.0); var gb = 0.0
      docs.foreach { case (fs, y) =>
        val m = fs.map { case (f, c) => c * wr(f) }.sum + br
        val r = 1.0 / (1.0 + math.exp(-m)) - y
        fs.foreach { case (f, c) => g(f) += r * c / n }
        gb += r / n
      }
      (0 until dim).foreach(f => wr(f) -= lr * (g(f) + 0.01 * wr(f)))
      br -= lr * gb
    }
    (0 until dim).foreach { f =>
      assert(math.abs(w(f) - wr(f)) < 1e-8, s"f=$f: ${w(f)} vs ${wr(f)}")
    }
    assert(math.abs(b - br) < 1e-8, s"bias: $b vs $br")

    // held-out docs from each vocabulary (ids the training loop never saw)
    val heldOut = ((500L until 520L).map(i => (i, doc(i, goodV))) ++
      (520L until 540L).map(i => (i, doc(i, spamV)))).toDF("doc_id", "text")
    val (wc, bc) = QualityClassifier.train(labeled, dim, steps = 30, lr = 0.5)
    val sc = QualityClassifier.scoreDocs(heldOut, wc, bc)
      .as[(Long, Double)].collect()
    val acc = sc.count { case (id, s) => (s > 0.5) == (id < 520L) } / 40.0
    assert(acc >= 0.95, s"held-out accuracy $acc")
  }
  test("hashed_grams kernel featureTable ≡ pure-Column witness") {
    val dim = 256
    val edge = labeled.select($"doc_id", $"text")
      .unionByName(Seq((900L, ""), (901L, "  mixed  CASE tokens "),
        (902L, "ЖУРНАЛ текст")).toDF("doc_id", "text"))
    val a = QualityClassifier.featureTable(edge, dim)
      .as[(Long, Int, Long)].collect().toSet
    val b = QualityClassifier.featureTableColumns(edge, dim)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
  }

}
