package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.textanalysis.CountMin

class CountMinSpec extends AnyFunSuite {
  val spark = SparkSpec.spark
  import spark.implicits._

  // corpus with one planted heavy hitter ("corpus" in every doc, many
  // times) and a long tail of rare tokens
  private val docs = (0 until 60).map { i =>
    val tail = (0 until 6).map(j => s"rare${i}x$j").mkString(" ")
    (i.toLong, s"corpus corpus corpus the the $tail")
  }.toDF("doc_id", "text")

  private val exact: Map[String, Long] = {
    val all = (0 until 60).flatMap { i =>
      Seq("corpus", "corpus", "corpus", "the", "the") ++
        (0 until 6).map(j => s"rare${i}x$j")
    }
    all.groupBy(identity).map { case (t, ts) => t -> ts.length.toLong }
  }

  test("estimates never under-count, and are exact in a collision-free sketch") {
    val (d, w) = (4, 16384)
    val sketch = CountMin.buildTokenSketch(docs, d, w)
    val cand = exact.keys.toSeq.toDF("token")
    val est = CountMin.estimate(cand, sketch, "token", d, w)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"$t under-counted: ${est(t)} < $n")
    }
    // 422 distinct tokens in 4×16384 cells: collisions are possible but a
    // MIN over 4 independent rows colliding in every row is not credible —
    // demand exactness for the planted heavies and near-exactness overall
    assert(est("corpus") == exact("corpus") && est("the") == exact("the"))
    assert(exact.count { case (t, n) => est(t) > n } <= 2,
      "more than 2 over-counted tokens in a near-collision-free sketch")
    // unseen keys estimate to collision mass only (0 here)
    val unseen = CountMin.estimate(Seq("neverseen").toDF("token"), sketch, "token", d, w)
      .as[(String, Long)].head()
    assert(unseen._2 <= 2, s"unseen key estimate too high: $unseen")
  }

  test("sketch is a pure function of the weighted key multiset; merge == union build") {
    val (d, w) = (3, 512)
    val a = CountMin.buildTokenSketch(docs.filter($"doc_id" < 30), d, w)
    val b = CountMin.buildTokenSketch(docs.filter($"doc_id" >= 30), d, w)
    val merged = CountMin.merge(a, b).as[(Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val direct = CountMin.buildTokenSketch(docs.repartition(7), d, w)
      .as[(Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(merged.toSeq == direct.toSeq)
  }

  test("heavy hitters: planted heavies found with exact estimates, tail excluded") {
    val hh = CountMin.heavyHitters(docs, threshold = 60L,
        sampleFraction = 0.5, d = 4, w = 16384)
      .as[(String, Long)].collect().toMap
    // "corpus" (180) and "the" (120) dominate; every rare token has count 1
    assert(hh.keySet == Set("corpus", "the"), s"got ${hh.keySet}")
    assert(hh("corpus") == 180L && hh("the") == 120L)
  }

  test("persisted sketch round-trips and estimates identically") {
    val (d, w) = (4, 2048)
    val sketch = CountMin.buildTokenSketch(docs, d, w)
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    CountMin.save(spark, sketch, d, w, dir)
    val (cells, dL, wL) = CountMin.load(spark, dir)
    assert((dL, wL) == (d, w))
    val cand = exact.keys.toSeq.toDF("token")
    val fresh = CountMin.estimate(cand, sketch, "token", d, w)
      .as[(String, Long)].collect().sortBy(_._1)
    val loaded = CountMin.estimate(cand, cells, "token", dL, wL)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(fresh.toSeq == loaded.toSeq)
  }
}
