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
}
