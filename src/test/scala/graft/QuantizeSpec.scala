package graft

import org.apache.spark.sql.functions._
import graft.gen.DetRng
import graft.similarity.{Quantize, Similarity}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  /** Same deterministic clustered fixture family as SimilaritySpec, so the
    * top-k recall assertion has known in-cluster nearest neighbors. */
  private lazy val vecs = {
    val dim = 16
    val rows = (0 until 80).map { i =>
      val cluster = i % 4
      val rng = DetRng.forKey(s"qvec$i", 11L)
      val v = Array.tabulate(dim) { d =>
        val center = if (d / 4 == cluster) 5.0f else 0.0f
        center + (rng.nextDouble().toFloat - 0.5f) * 0.5f
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("sq8 codec: codes in [-127,127], max-abs element hits ±127, |x - scale·q| ≤ scale/2") {
    val rows = vecs.select($"vec_id", $"embedding", Quantize.sq8($"embedding").as("s"))
      .select($"embedding", $"s.scale".as("scale"), $"s.q".as("q"))
      .collect()
    assert(rows.length == 80)
    rows.foreach { r =>
      val x = r.getSeq[Float](0)
      val scale = r.getDouble(1)
      val q = r.getSeq[Byte](2)
      assert(q.length == x.length)
      assert(q.forall(c => c >= -127 && c <= 127))
      assert(q.map(_.toInt).map(math.abs).max == 127, "max-abs element must quantize to ±127")
      x.zip(q).foreach { case (xi, qi) =>
        assert(math.abs(xi.toDouble - scale * qi) <= scale / 2 + 1e-12,
          s"reconstruction error above scale/2 for $xi -> $qi (scale $scale)")
      }
    }
  }

  test("sq8 codec: zero and empty vectors quantize to scale 0 and all-zero codes") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),
      (2L, Seq.empty[Float])
    ).toDF("vec_id", "embedding")
    val rows = df.select(Quantize.sq8($"embedding").as("s"))
      .select($"s.scale", $"s.q").collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == 0.0)
      assert(r.getSeq[Byte](1).forall(_ == 0))
    }
  }

  test("native sq8_cosine kernel is bit-identical to the HOF twin") {
    val q = Quantize.sq8Table(vecs)
    val pairs = q.as("a").join(q.as("b"), $"a.vec_id" < $"b.vec_id")
      .select(
        Quantize.sq8CosineHof($"a.q", $"b.q").as("hof"),
        Quantize.sq8CosineNative(spark, $"a.q", $"b.q").as("nat"))
      .collect()
    assert(pairs.length == 80 * 79 / 2)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"HOF ${r.getDouble(0)} != native ${r.getDouble(1)}")
    }
  }

  test("native kernel semantics: zero-norm → 0.0, length mismatch → null, null element → null") {
    val df = Seq(
      (Seq[java.lang.Byte](0.toByte, 0.toByte), Seq[java.lang.Byte](1.toByte, 2.toByte)),   // zero norm
      (Seq[java.lang.Byte](1.toByte, 2.toByte), Seq[java.lang.Byte](3.toByte)),             // length mismatch
      (Seq[java.lang.Byte](1.toByte, null), Seq[java.lang.Byte](3.toByte, 4.toByte))        // null element
    ).toDF("a", "b")
    val out = df.select(Quantize.sq8CosineNative(spark, $"a", $"b").as("c")).collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
    // HOF twin agrees on the zero-norm decision
    val hof = df.limit(1).select(Quantize.sq8CosineHof($"a", $"b").as("c")).collect()
    assert(hof(0).getDouble(0) == 0.0)
  }

  test("scale cancels: quantized cosine ≈ cosine of the dequantized vectors, ≈ true cosine") {
    val q = Quantize.sq8Table(vecs)
      .join(vecs, "vec_id")
      .select($"vec_id", $"scale", $"q", $"embedding")
    val pairs = q.as("a").join(q.as("b"), $"a.vec_id" + 40 === $"b.vec_id")
      .select(
        Quantize.sq8CosineNative(spark, $"a.q", $"b.q").as("qcos"),
        Similarity.cosine(
          Quantize.dequantize($"a.scale", $"a.q"),
          Quantize.dequantize($"b.scale", $"b.q")).as("dcos"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("fcos"))
      .collect()
    assert(pairs.length == 40)
    pairs.foreach { r =>
      // mathematically identical up to double rounding in the fold order
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"scale did not cancel: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      // within quantization error of the float cosine (≤ ~1/127 per element)
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 0.02,
        s"quantized cosine too far from true: ${r.getDouble(0)} vs ${r.getDouble(2)}")
    }
  }

  test("sq8TopK matches brute-force float top-k on well-separated clusters") {
    val q = vecs.filter($"vec_id" < 4)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val quant = Quantize.sq8TopK(q, vecs, k = 5).collect()
    assert(quant.length == 4 * 5)
    val qset = quant.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // within-cluster sims are nearly tied, so SQ8 may swap the rank-5/6
    // boundary — recall below 1.0 is the quantization trade, not a defect
    val recall = exact.intersect(qset).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ8 recall too low: $recall")
    quant.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") % 4 == r.getAs[Long]("query_id") % 4)
    }
  }
}
