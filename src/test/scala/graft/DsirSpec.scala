package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.textanalysis.Dsir

class DsirSpec extends AnyFunSuite {
  val spark = SparkSpec.spark
  import spark.implicits._

  /** Driver-side mirror of the engine's feature map: 16-bit md5 % dim. */
  private def featId(gram: String, dim: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(gram.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  /** Driver-side hashed unigram+bigram counts of a doc. */
  private def feats(text: String, dim: Int): Map[Int, Long] = {
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val grams = toks ++ toks.sliding(2).collect { case Seq(a, b) => s"$a $b" }
    grams.groupBy(featId(_, dim)).map { case (f, gs) => f -> gs.length.toLong }
  }

  // two-vocabulary corpus: the target draws from "academic" words, the raw
  // pool is half academic, half spam — DSIR should upweight the academic half
  private val goodV = Seq("theorem", "proof", "lemma", "analysis", "measure", "bound")
  private val spamV = Seq("winner", "click", "free", "prize", "casino", "offer")
  private def doc(i: Long, v: Seq[String]): String =
    (0 until 24).map(j => v(((i * 31 + j * 7) % v.size).toInt)).mkString("the ", " the ", "")
  private val target = (1000L until 1040L).map(i => (i, doc(i, goodV))).toDF("doc_id", "text")
  private val raw = ((0L until 30L).map(i => (i, doc(i, goodV))) ++
    (30L until 60L).map(i => (i, doc(i, spamV)))).toDF("doc_id", "text")

  test("importance weights match a driver-side naive reference") {
    val dim = 512
    val alpha = 0.5
    val rawRows = raw.as[(Long, String)].collect()
    val tgtRows = target.as[(Long, String)].collect()
    val p = tgtRows.flatMap(r => feats(r._2, dim)).groupBy(_._1)
      .map { case (f, cs) => f -> cs.map(_._2).sum }
    val q = rawRows.flatMap(r => feats(r._2, dim)).groupBy(_._1)
      .map { case (f, cs) => f -> cs.map(_._2).sum }
    val np = p.values.sum.toDouble
    val nq = q.values.sum.toDouble
    def naiveLogw(text: String): Double =
      feats(text, dim).toSeq.sortBy(_._1).map { case (f, c) =>
        c * (math.log((p.getOrElse(f, 0L) + alpha) / (np + alpha * dim)) -
             math.log((q.getOrElse(f, 0L) + alpha) / (nq + alpha * dim)))
      }.sum
    val got = Dsir.importanceWeightsFrom(raw, target, dim, alpha)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rawRows.foreach { case (id, text) =>
      val (nf, lw) = got(id)
      assert(nf == feats(text, dim).size.toLong, s"doc $id n_feats")
      assert(math.abs(lw - naiveLogw(text)) < 1e-9, s"doc $id: $lw vs ${naiveLogw(text)}")
    }
    // and the separation DSIR exists for: every academic doc outweighs
    // every spam doc
    val minGood = (0L until 30L).map(got(_)._2).min
    val maxSpam = (30L until 60L).map(got(_)._2).max
    assert(minGood > maxSpam, s"minGood=$minGood maxSpam=$maxSpam")
  }

  test("empty and whitespace docs get logw 0 / n_feats 0 but stay in the output") {
    val withEmpty = raw.union(Seq((100L, ""), (101L, "   ")).toDF("doc_id", "text"))
    val w = Dsir.importanceWeightsFrom(withEmpty, target, dim = 256)
      .as[(Long, Long, Double)].collect()
    assert(w.length == 62)
    Seq(100L, 101L).foreach { id =>
      val row = w.find(_._1 == id).get
      assert(row._2 == 0L && row._3 == 0.0, s"doc $id: $row")
    }
  }

  test("weights are bit-identical across partitionings (ordered fold)") {
    val dim = 256
    val a = Dsir.importanceWeightsFrom(raw.repartition(7), target, dim)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val b = Dsir.importanceWeightsFrom(raw.repartition(2), target.repartition(5), dim)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("Gumbel top-k resample prefers target-like docs; k >= n selects all") {
    val dim = 512
    val tc = Dsir.bucketCounts(target, dim)
    val sel = Dsir.resample(raw, tc, k = 20, dim)
      .as[(Long, Double, Double)].collect()
    assert(sel.length == 20)
    // logw separation (24 tokens/doc) dominates the bounded Gumbel noise:
    // the selected set is overwhelmingly the academic half
    val goodPicked = sel.count(_._1 < 30L)
    assert(goodPicked >= 18, s"picked $goodPicked academic docs of 20")
    // selection ordered by (gumbel_key desc, id): re-derivable from the
    // full weight table
    val all = Dsir.importanceWeights(raw, tc, dim)
      .select(col("doc_id"), Portable.round4(col("logw")).as("logw"),
        Portable.round4(Dsir.gumbelKey(col("logw"), col("doc_id"))).as("k"))
      .as[(Long, Double, Double)].collect()
    val wantIds = all.sortBy(r => (-r._3, r._1)).take(20).map(_._1).toSet
    assert(sel.map(_._1).toSet == wantIds)
    // k >= n: everything selected
    val allSel = Dsir.resample(raw, tc, k = 1000, dim)
    assert(allSel.count() == 60L)
  }

  test("persisted model round-trips and scores identically to in-run training") {
    val dim = 256
    val dir = java.nio.file.Files.createTempDirectory("dsir-model").toString
    Dsir.saveModel(target, dim, dir)
    val (counts, loadedDim) = Dsir.loadModel(spark, dir)
    assert(loadedDim == dim)
    val inRun = Dsir.importanceWeightsFrom(raw, target, dim)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val external = Dsir.importanceWeights(raw, counts, dim)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(inRun.toSeq == external.toSeq)
    // layout assertions fire on a wrong directory shape
    val bad = java.nio.file.Files.createTempDirectory("dsir-bad").toString
    Seq((1, 2L)).toDF("x", "y").write.parquet(s"$bad/counts")
    Seq(dim).toDF("dim").write.parquet(s"$bad/meta")
    assertThrows[IllegalArgumentException](Dsir.loadModel(spark, bad))
  }
  test("hashed_grams kernel featureTable ≡ pure-Column witness") {
    val dim = 512
    val edge = raw.unionByName(Seq((900L, ""), (901L, "   "), (902L, "one"),
      (903L, "ЖУРНАЛ русский  текст")).toDF("doc_id", "text"))
    val a = graft.textanalysis.Dsir.featureTable(edge, dim)
      .as[(Long, Int, Long)].collect().toSet
    val b = graft.textanalysis.Dsir.featureTableColumns(edge, dim)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
    // tiny dim forces unigram/bigram hash collisions — the kernel's
    // run-length merge must match the groupBy's collision merge
    val a7 = graft.textanalysis.Dsir.featureTable(edge, 7)
      .as[(Long, Int, Long)].collect().toSet
    val b7 = graft.textanalysis.Dsir.featureTableColumns(edge, 7)
      .as[(Long, Int, Long)].collect().toSet
    assert(a7 == b7)
  }

}
