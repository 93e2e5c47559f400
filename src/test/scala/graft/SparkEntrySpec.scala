package graft

/** Smoke of the driver surface: the flagship entry returns rows, every
  * queries entry analyzes and executes on the smallest SF, and every query
  * with an oracle has matching column names on our side (the driver's
  * compare sorts columns by name before hashing). */
class SparkEntrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry: flagship pipeline returns corrected docs") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains("spans"))
    assert(df.count() > 0)
  }

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all queries run on sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      // every query except candidate-pair miners must be non-empty
      if (name != "q_lsh_pairs") assert(n > 0, s"$name returned 0 rows")
    }
  }
}
