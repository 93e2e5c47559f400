package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Bloom

class BloomSpec extends AnyFunSuite {
  val spark = SparkSpec.spark
  import spark.implicits._

  private val members = (0 until 200).map(i => s"key-$i")
  private val nonMembers = (0 until 2000).map(i => s"other-$i")

  test("no false negatives, FP rate near theory, repartition-proof build") {
    val (mBits, k) = (8192, 5)
    val words = Bloom.build(members.toDF("key"), "key", mBits, k)
    def probe(keys: Seq[String]): Map[String, Boolean] =
      keys.toDF("key")
        .select($"key", Bloom.mightContain($"key", words, mBits, k).as("hit"))
        .as[(String, Boolean)].collect().toMap
    // every member hits — false negatives are impossible by construction
    assert(probe(members).values.forall(identity))
    // FP rate ~ (1 - e^(-kn/m))^k ≈ 0.0043 at n=200, m=8192, k=5; allow 3×
    val fp = probe(nonMembers).count(_._2)
    assert(fp <= 2000 * 0.0043 * 3 + 3, s"$fp false positives of 2000")
    // the build is a pure function of the key set
    val words2 = Bloom.build(members.reverse.toDF("key").repartition(7), "key", mBits, k)
    assert(words.toSeq == words2.toSeq)
  }

  test("sparse table round-trips through parquet and merges by bit_or") {
    val (mBits, k) = (4096, 4)
    val ta = Bloom.buildTable(members.take(100).toDF("key"), "key", mBits, k)
    val tb = Bloom.buildTable(members.drop(100).toDF("key"), "key", mBits, k)
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    Bloom.save(spark, Bloom.merge(ta, tb), mBits, k, dir)
    val (words, mL, kL) = Bloom.load(spark, dir)
    assert((mL, kL) == (mBits, k))
    // the merged sketch equals the sketch of the union set
    val direct = Bloom.build(members.toDF("key"), "key", mBits, k)
    assert(words.toSeq == direct.toSeq)
  }

  test("join-table probe path == literal probe path, survivor for survivor") {
    val existing = (0 until 60).map(i => (i.toLong, s"existing doc $i"))
    val sketchKeys = existing.toDF("doc_id", "text")
      .select(graft.dedup.Dedup.fingerprint($"text").as("fp"))
    val (mBits, k) = (2048, 4) // small m: some genuine FPs make the check strict
    val table = Bloom.buildTable(sketchKeys, "fp", mBits, k)
    val words = Bloom.build(sketchKeys, "fp", mBits, k)
    val batch = ((0 until 30).map(i => (1000L + i, s"existing doc $i")) ++
      (0 until 300).map(i => (2000L + i, s"fresh doc $i"))).toDF("doc_id", "text")
    val viaLiteral = Bloom.dedupAgainstSketch(batch, words, mBits, k)
      .select($"doc_id").as[Long].collect().toSet
    val viaTable = Bloom.dedupAgainstSketchTable(batch, table, mBits, k)
      .select($"doc_id").as[Long].collect().toSet
    assert(viaTable == viaLiteral, s"paths diverge: ${viaTable -- viaLiteral} / ${viaLiteral -- viaTable}")
    // and both drop every true duplicate
    assert((1000L until 1030L).forall(id => !viaTable.contains(id)))
  }

  test("incremental dedup: true duplicates always dropped, fresh docs survive") {
    val existing = (0 until 50).map(i => (i.toLong, s"an existing corpus document number $i"))
    val sketchKeys = existing.toDF("doc_id", "text")
      .select(graft.dedup.Dedup.fingerprint($"text").as("fp"))
    val (mBits, k) = (8192, 5)
    val words = Bloom.build(sketchKeys, "fp", mBits, k)
    // new batch: 10 re-crawls of existing docs (one with different
    // whitespace/case — still a normalized duplicate) + 40 fresh docs
    val batch = ((0 until 9).map(i => (1000L + i, s"an existing corpus document number $i")) ++
      Seq((1009L, "  AN   EXISTING corpus Document number 9 ")) ++
      (0 until 40).map(i => (2000L + i, s"a genuinely new document $i"))).toDF("doc_id", "text")
    val kept = Bloom.dedupAgainstSketch(batch, words, mBits, k)
      .select($"doc_id").as[Long].collect().toSet
    // every true duplicate dropped (no false negatives)
    assert((1000L until 1010L).forall(id => !kept.contains(id)))
    // fresh docs survive up to the FP rate (~0.2% here — expect all 40)
    assert((2000L until 2040L).count(kept.contains) >= 39, s"kept ${kept.size}")
  }
}
