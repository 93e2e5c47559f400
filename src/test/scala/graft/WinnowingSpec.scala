package graft

import org.apache.spark.sql.functions._
import graft.textanalysis.Winnowing

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def polyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 131 + c) % 2147483647L)

  /** Naive reference: per-position hashes + per-window rightmost argmin. */
  private def refWinnow(text: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val nt = text.toLowerCase.replaceAll("\\s+", " ").trim
    val cps = nt.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return Seq.empty
    val hs = (0 until n).map(i => polyHash(new String(cps, i, k)))
    def rightmostMin(j: Int, len: Int): Int =
      (j until j + len).foldLeft(j)((best, p) => if (hs(p) <= hs(best)) p else best)
    val sel =
      if (n < w) Seq(rightmostMin(0, n))
      else (0 to n - w).map(j => rightmostMin(j, w)).distinct
    sel.map(p => (p, hs(p)))
  }

  test("hand case: repeated text selects rightmost minima at density ~2/(w+1)") {
    val t = "abcab abcab abcab"
    val got = refWinnow(t, 3, 4)
    val df = Seq((0L, t)).toDF("doc_id", "text")
    val kernel = df.select(Winnowing.winnowNative(spark, $"text", 3, 4).as("fp"))
      .selectExpr("transform(fp, x -> struct(x.pos, x.h))")
      .as[Seq[(Int, Long)]].head()
    assert(kernel == got)
    assert(kernel.nonEmpty && kernel.map(_._1) == kernel.map(_._1).sorted)
  }

  test("kernel ≡ column form ≡ naive reference on random texts (ties, unicode, shorts)") {
    val rng = new scala.util.Random(11)
    val alpha = "ab日 ß"
    val texts = (0 until 200).map { i =>
      val n = rng.nextInt(40)
      (i.toLong, (0 until n).map(_ => alpha(rng.nextInt(alpha.length))).mkString)
    } :+ (200L, "") :+ (201L, "abc") :+ (202L, "aaaaaaaaaaaaaaaa") :+ (203L, "  x  ")
    val df = texts.toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 4), (1, 1), (4, 2), (8, 4))) {
      val kernel = df.select($"doc_id", Winnowing.winnowNative(spark, $"text", k, w).as("fp"))
        .selectExpr("doc_id", "transform(fp, x -> struct(x.pos, x.h)) AS fp")
        .as[(Long, Seq[(Int, Long)])].collect().toMap
      val column = df.select($"doc_id", Winnowing.winnowColumn($"text", k, w).as("fp"))
        .selectExpr("doc_id", "transform(fp, x -> struct(x.pos, x.h)) AS fp")
        .as[(Long, Seq[(Int, Long)])].collect().toMap
      texts.foreach { case (id, t) =>
        val want = refWinnow(t, k, w)
        assert(kernel(id) == want, s"kernel k=$k w=$w doc $id '$t'")
        assert(column(id) == want, s"column k=$k w=$w doc $id '$t'")
      }
    }
  }

  test("null text: null-in/null-out in both kernel and column forms") {
    val df = Seq((0L, Some("abcdefgh")), (1L, None: Option[String])).toDF("doc_id", "text")
    val kernel = df.select($"doc_id", Winnowing.winnowNative(spark, $"text", 3, 4).isNull.as("n"))
      .as[(Long, Boolean)].collect().toMap
    val column = df.select($"doc_id", Winnowing.winnowColumn($"text", 3, 4).isNull.as("n"))
      .as[(Long, Boolean)].collect().toMap
    assert(kernel == Map(0L -> false, 1L -> true))
    assert(column == kernel)
  }

  test("matchPairs: only doc pairs with >= minShared common fingerprints survive") {
    val k = 5; val w = 4
    val rng = new scala.util.Random(17)
    def rand(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val sharedA = rand(2 * (w + k)) // long shared region → several shared fps
    val docs = Seq(
      (0L, rand(20) + sharedA + rand(20)),
      (1L, rand(20) + sharedA + rand(20)),
      (2L, rand(60))) // unrelated
    val fps = Winnowing.fingerprintTable(spark, docs.toDF("doc_id", "text"), k, w)
    val pairs = Winnowing.matchPairs(fps, minShared = 2)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // reference check: shared-count from the collected fingerprint sets
    val sets = fps.select($"doc_id", $"h").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val wantShared = (sets(0L) intersect sets(1L)).size
    val got = Winnowing.matchPairs(fps, 2).as[(Long, Long, Long)].collect()
      .find(p => p._1 == 0L && p._2 == 1L).map(_._3)
    assert(got.contains(wantShared.toLong))
  }

  test("matchPairs stop-hash cap: boilerplate hashes dropped, join volume linear, real matches kept") {
    val k = 5; val w = 4; val cap = 16L
    val rng = new scala.util.Random(23)
    def rand(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    // 60 docs all opening with the same boilerplate run (df of its
    // fingerprints = 60 > cap) + two docs sharing a UNIQUE long region
    val boiler = rand(3 * (w + k))
    val sharedRare = rand(3 * (w + k))
    val docs = (0 until 60).map(i => (i.toLong, boiler + rand(25))) ++
      Seq((100L, rand(25) + sharedRare), (101L, rand(30) + sharedRare))
    val fps = Winnowing.fingerprintTable(spark, docs.toDF("doc_id", "text"), k, w)

    val capped = Winnowing.matchPairs(fps, minShared = 2, maxDocFreq = cap)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    // the unique-region pair survives; no pair exists on boilerplate alone
    assert(capped.contains((100L, 101L)))
    assert(!capped.exists(p => p._1 < 60L && p._2 < 60L),
      s"boilerplate-only pairs leaked through the cap: $capped")
    // without the cap the 60-doc boilerplate cluster explodes into ~60²/2 pairs
    val uncapped = Winnowing.matchPairs(fps, minShared = 2, maxDocFreq = 0)
      .as[(Long, Long, Long)].collect()
    assert(uncapped.count(p => p._1 < 60L && p._2 < 60L) > 1000)

    // volume bound: after the cap, join input per hash has df <= cap, so
    // Σ df² <= cap · Σ df — join output grows LINEARLY with corpus size
    // (the uncapped Σ df² is dominated by the df=60 boilerplate hashes)
    val df = fps.select($"h", $"doc_id").distinct()
      .groupBy($"h").count().as[(Long, Long)].collect()
    val cappedDf = df.filter(_._2 <= cap)
    val sumSqCapped = cappedDf.map(d => d._2 * d._2).sum
    assert(sumSqCapped <= cap * cappedDf.map(_._2).sum)
    assert(df.map(d => d._2 * d._2).sum > 10 * sumSqCapped,
      "fixture too tame: uncapped quadratic mass should dwarf the capped mass")
  }

  test("winnowing guarantee: docs sharing a substring of length w+k-1 share a fingerprint") {
    val k = 5; val w = 4
    val rng = new scala.util.Random(13)
    def rand(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val shared = rand(w + k - 1)
    val docs = (0 until 20).map(i => (i.toLong, rand(30) + shared + rand(30)))
    val df = docs.toDF("doc_id", "text")
    val fps = Winnowing.fingerprintTable(spark, df, k, w)
      .select($"doc_id", $"h").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val common = docs.map(d => fps(d._1)).reduce(_ intersect _)
    assert(common.nonEmpty, "guaranteed shared fingerprint missing")
  }
}
