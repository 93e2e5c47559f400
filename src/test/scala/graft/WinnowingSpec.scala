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
