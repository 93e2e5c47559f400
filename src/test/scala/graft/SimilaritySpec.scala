package graft

import org.apache.spark.sql.functions._
import graft.gen.DetRng
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic clustered vectors: 4 well-separated centers + small noise,
    * so true nearest neighbors are in-cluster. */
  private lazy val vecs = {
    val dim = 16
    val rows = (0 until 80).map { i =>
      val cluster = i % 4
      val rng = DetRng.forKey(s"vec$i", 7L)
      val v = Array.tabulate(dim) { d =>
        val center = if (d / 4 == cluster) 5.0f else 0.0f
        center + (rng.nextDouble().toFloat - 0.5f) * 0.5f
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("cosine: self-similarity 1, orthogonal ~0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    ).toDF("a", "b")
    val sims = df.select(round(Similarity.cosine($"a", $"b"), 6).as("s")).as[Double].collect()
    assert(sims(0) == 1.0 && sims(1) == 0.0)
  }

  test("brute-force top-k returns in-cluster neighbors, deterministic ranking") {
    val q = vecs.filter($"vec_id" < 4) // one query per cluster
    val top = Similarity.bruteForceTopK(q, vecs, k = 5).collect()
    assert(top.length == 4 * 5)
    top.foreach { r =>
      val qid = r.getAs[Long]("query_id")
      val nid = r.getAs[Long]("neighbor_id")
      assert(nid % 4 == qid % 4, s"neighbor $nid not in cluster of query $qid")
      assert(r.getAs[Double]("sim") > 0.9)
    }
    // determinism: two runs identical
    val again = Similarity.bruteForceTopK(q, vecs, k = 5).collect()
    assert(top.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("LSH top-k recall vs brute force is high on clustered data") {
    val q = vecs.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.lshTopK(q, vecs, k = 3, nBands = 8, bitsPerBand = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall too low: $recall")
  }

  test("IVF top-k: high recall vs brute force with few probes on clustered data") {
    val q = vecs.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.ivfTopK(q, vecs, k = 3, nCentroids = 8, nProbes = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall too low: $recall")
    // determinism across runs
    val again = Similarity.ivfTopK(q, vecs, k = 3, nCentroids = 8, nProbes = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(ivf == again)
  }

  test("persisted IVF index: probe reads only probed partitions and matches in-memory IVF") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    try {
      Similarity.ivfWrite(vecs, dir, nCentroids = 8, iterations = 1)
      val q = vecs.filter($"vec_id" < 4)
      val fromIndex = Similarity.ivfTopKFromIndex(q, dir, k = 3, nProbes = 2)
      // partition pruning is in the PLAN, not just the result: the corpus
      // scan must carry centroid_id INSIDE a PartitionFilters bracket (every
      // FileSourceScan prints an — possibly empty — 'PartitionFilters: [...]',
      // so contains-both would pass vacuously)
      val plan = fromIndex.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*centroid_id".r.findFirstIn(plan).isDefined,
        s"no partition pruning in plan:\n$plan")
      val got = fromIndex.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val mem = Similarity.ivfTopK(q, vecs, k = 3, nCentroids = 8, nProbes = 2).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      assert(got == mem, "persisted-index results diverge from in-memory IVF")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("persisted IVF index: incremental append is probed through the same pruning") {
    val dir = java.nio.file.Files.createTempDirectory("ivfapp").toString
    try {
      Similarity.ivfWrite(vecs, dir, nCentroids = 8, iterations = 1)
      // append clones of the first 4 vectors under new ids: identical
      // embeddings → assigned to the SAME centroid partitions as their
      // originals, so a probe for the original must surface the clone
      val batch = vecs.filter($"vec_id" < 4).withColumn("vec_id", $"vec_id" + 10000L)
      Similarity.ivfAppend(batch, dir)
      val q = vecs.filter($"vec_id" < 4)
      val fromIndex = Similarity.ivfTopKFromIndex(q, dir, k = 3, nProbes = 2)
      // pruning assertion unchanged after the append
      val plan = fromIndex.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*centroid_id".r.findFirstIn(plan).isDefined,
        s"no partition pruning in plan after append:\n$plan")
      val byQuery = fromIndex.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (0L until 4L).foreach { id =>
        assert(byQuery(id).contains(id + 10000L),
          s"appended clone of $id not found via the index probe: ${byQuery(id)}")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("IVF assignment is shuffle-free (no Exchange in the assigned plan)") {
    val (_, assigned) = Similarity.ivfIndex(vecs, nCentroids = 8, iterations = 1)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment plan shuffles:\n$plan")
    // every row got a live centroid id
    assert(assigned.filter($"centroid_id".isNull).count() == 0)
  }

  test("bounded-heap top-k ≡ window row_number ranking") {
    import org.apache.spark.sql.expressions.Window
    // deterministic scored rows with deliberate sim ties
    val scored = (0 until 400).map { i =>
      val q = i % 4
      (q.toLong, i.toLong, ((i * 37) % 11) / 10.0)
    }.toDF("query_id", "neighbor_id", "sim")
    val viaAgg = graft.similarity.TopKBySim.rank(scored, 7)
      .as[(Long, Int, Long, Double)].collect().toSet
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 7)
      .select($"query_id", $"rank", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("native lsh band keys ≡ Column form, incl. padded/mismatched/null-element vectors") {
    val r = new scala.util.Random(29)
    val rows: Seq[(Long, Seq[Option[Float]])] =
      (0 until 120).map(i => (i.toLong, Seq.fill(8)(Some((r.nextFloat() - 0.5f) * 2f)))) ++ Seq(
        (900L, Seq.fill(8)(Some(0.0f))),                                // all-zero → all proj 0 → '1' bits
        (901L, Seq.fill(5)(Some(1.0f))),                                // shorter than dim
        (902L, Seq.fill(11)(Some(1.0f))),                               // longer than dim
        (903L, Seq.tabulate(8)(i => if (i == 2) None else Some(1.0f))), // null element → 0 contribution
        (904L, Seq.empty[Option[Float]]))
    val df = rows.toDF("vec_id", "embedding")
    for ((nb, bpb) <- Seq((4, 2), (8, 4))) {
      val hof = df.select($"vec_id",
        Similarity.lshBandKeys($"embedding", nb, bpb, 8).as("k"))
        .as[(Long, Seq[String])].collect().toMap
      val nat = df.select($"vec_id",
        Similarity.lshBandKeysNative(spark, $"embedding", nb, bpb, 8).as("k"))
        .as[(Long, Seq[String])].collect().toMap
      assert(nat == hof, s"bands=$nb bits=$bpb")
    }
  }

  test("native cosine kernel ≡ HOF cosine: values bit-identical, nulls/zero-norms/mismatches agree") {
    val r = new scala.util.Random(23)
    def vec(n: Int): Seq[Option[Float]] = Seq.fill(n)(Some((r.nextFloat() - 0.5f) * 4f))
    val rows: Seq[(Seq[Option[Float]], Seq[Option[Float]])] =
      (0 until 150).map(_ => (vec(8), vec(8))) ++ Seq(
        (Seq.fill(8)(Some(0.0f)), vec(8)),                     // zero norm → 0.0
        (Seq.fill(8)(Some(0.0f)), Seq.fill(8)(Some(0.0f))),    // both zero → 0.0
        (vec(8), vec(5)),                                      // length mismatch → null
        (Seq.fill(5)(Some(0.0f)), vec(8)),                     // mismatch + zero norm → 0.0
        (vec(8).updated(3, None), vec(8)),                     // null element → null
        (Seq.empty[Option[Float]], Seq.empty[Option[Float]]))  // empty → 0.0
    val df = rows.toDF("a", "b")
    val hof = df.select(Similarity.cosine($"a", $"b")).as[Option[Double]].collect().toSeq
    val nat = df.select(Similarity.cosineNative(spark, $"a", $"b")).as[Option[Double]].collect().toSeq
    assert(nat.length == hof.length)
    nat.zip(hof).zipWithIndex.foreach { case ((n, h), i) =>
      assert(n == h, s"row $i: native $n != hof $h") // exact, incl. None
    }
  }

  test("top-k aggregator: NaN sims rank worst, never block candidates, merge-order independent") {
    import graft.similarity.{ScoredId, TopKBySim}
    val agg = new TopKBySim(3)
    // NaN arrives FIRST and fills the buffer tail — later real candidates
    // must still displace it (a naive `>` comparator rejects them all)
    val xs = Seq(ScoredId(Double.NaN, 9L), ScoredId(0.1, 5L), ScoredId(0.2, 4L),
      ScoredId(Double.NaN, 8L), ScoredId(0.3, 3L), ScoredId(0.15, 6L))
    val direct = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(direct) == Seq(ScoredId(0.3, 3L), ScoredId(0.2, 4L), ScoredId(0.15, 6L)))
    // every partition split + merge order yields the same result
    for (cut <- 1 until xs.length) {
      val (l, r) = xs.splitAt(cut)
      val lb = l.foldLeft(agg.zero)(agg.reduce)
      val rb = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(lb, rb)) == agg.finish(direct), s"cut $cut")
      assert(agg.finish(agg.merge(rb, lb)) == agg.finish(direct), s"cut $cut reversed")
    }
    // all-NaN input: deterministic id-ascending order, no crash
    val allNaN = Seq(ScoredId(Double.NaN, 3L), ScoredId(Double.NaN, 1L), ScoredId(Double.NaN, 2L))
    assert(agg.finish(allNaN.foldLeft(agg.zero)(agg.reduce)).map(_.id) == Seq(1L, 2L, 3L))
    // distributed path: a zero-norm vector's NaN must not suppress real rows
    val scored = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 0.9), (1L, 12L, 0.8),
      (1L, 13L, 0.7), (1L, 14L, 0.6)).toDF("query_id", "neighbor_id", "sim")
    val got = TopKBySim.rank(scored.repartition(4), 3)
      .orderBy($"rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1, 11L, 0.9), (1L, 2, 12L, 0.8), (1L, 3, 13L, 0.7)))
  }

  test("cosine near-dup pairs: in-cluster pairs pass the threshold, cross-cluster don't") {
    val pairs = Similarity.cosineNearDupPairs(vecs.filter($"vec_id" < 20), threshold = 0.9)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") % 4 == r.getAs[Long]("id_b") % 4)
    }
  }

  test("LSH near-dup pairs: subset of exact pairs with high recall") {
    val sub = vecs.filter($"vec_id" < 40)
    val exact = Similarity.cosineNearDupPairs(sub, threshold = 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val approx = Similarity.cosineNearDupPairsApprox(sub, threshold = 0.9,
      nBands = 8, bitsPerBand = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact), "verification must keep only true near-dups")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"approx near-dup recall too low: $recall")
  }

  test("SemDeDup: within-cluster transitive collapse; cross-cluster pairs are out of scope") {
    // two seed centroids (ids 1, 2 — the first two rows define the
    // clusters), duplicates around each, a transitive chain in cluster 0,
    // and one near-identical pair deliberately STRADDLING the boundary
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val rows = Seq(
      (1L, v(1, 0, 0, 0)),        // seed centroid 0
      (2L, v(0, 1, 0, 0)),        // seed centroid 1
      (3L, v(0.98, 0.17, 0, 0)),  // dup of 1 (cos ≈ 0.985)
      (4L, v(0.17, 0.98, 0, 0)),  // dup of 2
      (5L, v(0.90, 0.40, 0, 0)),  // near 3 (cos ≈ 0.95), farther from 1 (0.91)
      (6L, v(0, 0, 1, 0)),        // isolated — assigned somewhere, no dup
      (7L, v(0.713, 0.701, 0, 0)),  // straddle pair: cos(7, 8) ≈ 0.9998 but
      (8L, v(0.701, 0.713, 0, 0)))  //   argmax-dot splits them across clusters
                                    //   (7 also clears 5: cos(5, 7) ≈ 0.936 < τ)
      .toDF("vec_id", "embedding")
    val pairs = Similarity.semDedupPairs(rows, threshold = 0.94, nCentroids = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 4L)) && pairs.contains((3L, 5L)),
      pairs.toString)
    assert(!pairs.contains((7L, 8L)),
      s"a boundary-straddling pair is out of scope by design: $pairs")
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L), pairs.toString)
    // survivors: component minima — the 1≈3≈5 CHAIN collapses onto 1 even
    // though cos(1, 5) = 0.91 < τ (transitive closure, not pairwise-greedy)
    val survivors = Similarity.semDedup(rows, threshold = 0.94, nCentroids = 2)
      .as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 6L, 7L, 8L), survivors.toString)
  }

  test("SemDeDup √-rule sizing and a 50%-hot cluster stay correct and cluster-bounded") {
    // the sizing rule itself
    assert(Similarity.autoCentroids(0L) == 1)
    assert(Similarity.autoCentroids(2L) == 1)
    assert(Similarity.autoCentroids(200L) == 10)
    assert(Similarity.autoCentroids(20_000_000_000L) == 100000) // paper scale: ~1e5 clusters
    assert(Similarity.autoCentroids(Long.MaxValue) == (1 << 17)) // clamp

    // hot cluster: half the corpus is one repeated embedding (the web-scale
    // boilerplate case) and ties to ONE centroid; the other half is a ring
    // of well-separated directions that seeds the centroids. Pairs must be
    // exactly the within-cluster cosine hits — the hot cluster pays its own
    // square (absorbed by AQE skew splitting at scale), never wrong.
    val half = 128
    val ring = (0 until half).map { i =>
      val a = 2.0 * math.Pi * i / half // adjacent cos ≈ 0.9988 < τ
      (i.toLong, Seq(0.0f, 0.0f, math.cos(a).toFloat, math.sin(a).toFloat))
    }
    val hot = (0 until half).map(i => (1000L + i, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
    val rows = (ring ++ hot).toDF("vec_id", "embedding")
    // auto sizing: n = 256 -> ceil(sqrt(128)) = 12 centroids (ring seeds);
    // every hot row dots 0 with every ring centroid and ties to centroid 0
    val pairs = Similarity.semDedupPairs(rows, threshold = 0.999)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val hotIds = hot.map(_._1).toSet
    val hotPairs = pairs.filter(p => hotIds(p._1) && hotIds(p._2))
    assert(hotPairs.size == half * (half - 1) / 2,
      s"expected the full hot pair set, got ${hotPairs.size}")
    // the ring has no near-dups at this τ and never pairs with hot (cos 0)
    assert(pairs == hotPairs, s"unexpected non-hot pairs: ${pairs -- hotPairs}")
    // the action under auto sizing collapses the hot set to its min id
    val survivors = Similarity.semDedup(rows, threshold = 0.999)
      .as[Long].collect().toSet
    assert(survivors == ring.map(_._1).toSet + 1000L, survivors.toString)
  }
}
