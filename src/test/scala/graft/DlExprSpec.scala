package graft

import org.apache.spark.sql.functions._
import graft.text.DamerauLevenshtein
import org.apache.spark.sql.graft.DamerauLevenshteinExpr

class DlExprSpec extends SparkSpec {
  import spark.implicits._

  test("native dl_distance expressions match the Scala kernels (codegen path)") {
    DamerauLevenshteinExpr.register(spark)
    val pairs = Seq(
      ("CA", "ABC"), ("ab", "ba"), ("", "abc"), ("abc", ""),
      ("kitten", "sitting"), ("xxabcdefghijklnmop", "abcdefghijklmnop"),
      ("привет", "пирвет") // non-ASCII: code-point semantics
    ).toDF("a", "b")
    val rows = pairs.select($"a", $"b",
      call_function("dl_distance", $"a", $"b").as("banded"),
      call_function("dl_distance_full", $"a", $"b").as("full"),
      call_function("dl_distance_true", $"a", $"b").as("tru"))
      .collect()
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getInt(2) == DamerauLevenshtein.distanceBanded(a, b), s"banded($a,$b)")
      assert(r.getInt(3) == DamerauLevenshtein.distance(a, b), s"full($a,$b)")
      assert(r.getInt(4) == DamerauLevenshtein.distanceUnrestricted(a, b), s"true($a,$b)")
    }
  }

  test("expression is SQL-callable and null-safe") {
    DamerauLevenshteinExpr.register(spark)
    val r = spark.sql(
      "SELECT dl_distance('ab', 'ba') AS d, dl_distance_true(NULL, 'x') AS n").head()
    assert(r.getInt(0) == 1)
    assert(r.isNullAt(1))
  }

  test("dl_distance_within native expression matches the bounded kernel") {
    org.apache.spark.sql.graft.DlWithinExpr.register(spark)
    val r = new scala.util.Random(77)
    def rs() = (0 until 1 + r.nextInt(12)).map(_ => ('a' + r.nextInt(5)).toChar).mkString
    val pairs = (0 until 200).map(_ => (rs(), rs(), r.nextInt(6))).toDF("a", "b", "k")
    val rows = pairs.select($"a", $"b", $"k",
      call_function("dl_distance_within", $"a", $"b", $"k").as("w")).collect()
    rows.foreach { row =>
      val (a, b, k) = (row.getString(0), row.getString(1), row.getInt(2))
      assert(row.getInt(3) == DamerauLevenshtein.distanceWithin(a, b, k))
    }
  }

  test("BandedDistanceRewrite: threshold comparisons swap in the bounded kernel") {
    import org.apache.spark.sql.graft.{BandedDistanceRewrite, DlWithinExpr}
    DamerauLevenshteinExpr.register(spark)
    org.apache.spark.sql.graft.DlWithinExpr.register(spark)
    BandedDistanceRewrite.install(spark)
    BandedDistanceRewrite.install(spark) // idempotent
    assert(spark.experimental.extraOptimizations.count(_ eq BandedDistanceRewrite) == 1)

    // RDD-backed, not Seq.toDF: a filter over a LocalRelation is evaluated
    // eagerly by ConvertToLocalRelation before user-provided rules run, so a
    // local frame would show neither expression in the optimized plan
    val rows = Seq(("kitten", "sitting"), ("ab", "ba"), ("abcdef", "abcdef"),
      ("pretty long string with drift", "short"))
    val df = spark.createDataset(spark.sparkContext.parallelize(rows, 2)).toDF("a", "b")

    def optimized(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.optimizedPlan
    def hasWithin(q: org.apache.spark.sql.DataFrame): Boolean = {
      var found = false
      optimized(q).foreach(_.expressions.foreach(_.foreach {
        case _: DlWithinExpr => found = true
        case _ =>
      }))
      found
    }
    def hasFull(q: org.apache.spark.sql.DataFrame): Boolean = {
      var found = false
      optimized(q).foreach(_.expressions.foreach(_.foreach {
        case d: DamerauLevenshteinExpr if d.variant == 1 => found = true
        case _ =>
      }))
      found
    }

    // full-DP variant under every comparison shape → rewritten
    for (pred <- Seq(
        "dl_distance_full(a, b) <= 2", "dl_distance_full(a, b) < 3",
        "dl_distance_full(a, b) = 2", "dl_distance_full(a, b) >= 2",
        "dl_distance_full(a, b) > 2", "2 >= dl_distance_full(a, b)",
        "3 > dl_distance_full(a, b)", "2 <= dl_distance_full(a, b)")) {
      val q = df.filter(expr(pred))
      assert(hasWithin(q) && !hasFull(q), s"not rewritten: $pred")
    }
    // reference banded-10 variant: rewritten only at k <= 10
    assert(hasWithin(df.filter(expr("dl_distance(a, b) <= 2"))))
    assert(!hasWithin(df.filter(expr("dl_distance(a, b) <= 11"))))
    // unrestricted variant and non-comparison uses: untouched
    assert(!hasWithin(df.filter(expr("dl_distance_true(a, b) <= 2"))))
    assert(!hasWithin(df.select(expr("dl_distance_full(a, b)").as("d"))))

    // decision equivalence, rewritten vs kernel ground truth, all shapes
    val withRule = df.filter(expr("dl_distance_full(a, b) <= 2"))
      .select($"a").as[String].collect().toSet
    val expect = rows
      .filter { case (a, b) => DamerauLevenshtein.distance(a, b) <= 2 }
      .map(_._1).toSet
    assert(withRule == expect)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq BandedDistanceRewrite)
  }
}
