package graft

import org.apache.spark.sql.functions._
import graft.dedup.{ConnectedComponents, Dedup}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  /** Independent reference: plain union-find with min-id roots. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to one component (the star-form counterexample)") {
    // star reduction would attach 3 to 2's group only via pair (2,3); CC must
    // label the whole chain with its global minimum
    val got = labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate min-id labels; self-pairs are isolated nodes") {
    val got = labelsOf(Seq((10L, 11L), (20L, 21L), (21L, 22L), (30L, 30L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L))
  }

  test("mega-clique and long path converge within the round budget") {
    val clique = for (i <- 0L until 50L; j <- (i + 1) until 50L) yield (i + 100L, j + 100L)
    val path = (0L until 60L).map(i => (1000L + i, 1000L + i + 1))
    val got = labelsOf(clique ++ path)
    assert((0L until 50L).forall(i => got(i + 100L) == 100L))
    assert((0L to 60L).forall(i => got(1000L + i) == 1000L))
  }

  test("random graphs match union-find (property)") {
    val rng = new scala.util.Random(42)
    for (round <- 0 until 5) {
      val n = 30 + round * 10
      val m = n + rng.nextInt(n)
      val pairs = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = labelsOf(pairs)
      val want = unionFind(pairs)
      assert(got == want, s"round $round: n=$n m=$m")
    }
  }

  test("dedupNearCC keeps one survivor per transitive near-dup cluster") {
    // a~b and b~c overlap heavily; a~c share fewer shingles — a transitive
    // chain. dedupNearCC must keep only the min-id doc of the whole chain,
    // plus the unrelated doc.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (2L, "mu beta gamma delta epsilon zeta eta theta iota lambda"),
      (9L, "completely unrelated text about distributed query engines today")
    ).toDF("doc_id", "text")
    val survivors = Dedup.dedupNearCC(docs, threshold = 0.5, shingleK = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // sanity: the pair graph actually chains 0-1-2 (verify via the building blocks)
    val verified = Dedup.jaccardVerify(docs,
        Dedup.lshCandidatePairs(docs, 3, 4, 2), 3)
      .filter($"jaccard" >= 0.5).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(verified.contains((0L, 1L)) && verified.contains((1L, 2L)))
    assert(survivors == Seq(0L, 9L))
  }

  test("empty pair table yields empty labels") {
    assert(labelsOf(Seq.empty).isEmpty)
  }

  test("dedupNearSimHash drops whole signature-space clusters to their min id") {
    // identical and near-identical (one-token-swap) docs share/neighbor
    // signatures; the unrelated doc must survive untouched
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),  // exact dup of 0
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near (1 token)
      (9L, "query engines shuffle partitions across many executors tonight")
    ).toDF("doc_id", "text")
    val survivors = Dedup.dedupNearSimHash(docs, maxHamming = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // exact collapse removes 1; the CC step may or may not merge 2 depending
    // on signature distance — assert via the actual pair graph
    val pairs = Dedup.simHashNearDupPairs(Dedup.dedupExact(docs), maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expect = if (pairs.contains((0L, 2L))) Seq(0L, 9L) else Seq(0L, 2L, 9L)
    assert(survivors == expect)
    assert(survivors.contains(9L) && survivors.contains(0L) && !survivors.contains(1L))
  }

  test("labels are deterministic across runs") {
    val pairs = Seq((5L, 3L), (3L, 8L), (12L, 7L), (8L, 1L))
    assert(labelsOf(pairs) == labelsOf(pairs))
  }

  test("driver union-find fast path ≡ relational rounds (both sides of the cap)") {
    val rng = new scala.util.Random(7)
    for (round <- 0 until 3) {
      val n = 40 + round * 25
      val pairs = Seq.fill(2 * n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val df = pairs.toDF("id_a", "id_b")
      val local = ConnectedComponents.run(df) // default cap: local path
        .as[(Long, Long)].collect().toMap
      val relational = ConnectedComponents.run(df, maxLocalEdges = 0L) // force rounds
        .as[(Long, Long)].collect().toMap
      assert(local == relational, s"round $round")
    }
  }
}
