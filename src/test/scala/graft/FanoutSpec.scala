package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Fanout

class FanoutSpec extends SparkSpec {
  import spark.implicits._

  private def df = (0L until 100L).map(i => (i, s"text $i")).toDF("id", "t")

  test("fanout repartitions a narrow input to exactly defaultParallelism") {
    val par = spark.sparkContext.defaultParallelism
    val few = df.coalesce(1)
    assert(few.rdd.getNumPartitions < par)
    val fanned = Fanout.fanout(few, col("id"))
    assert(fanned.rdd.getNumPartitions == par)
    // values untouched — only physical distribution changes
    assert(fanned.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      df.as[(Long, String)].collect().sortBy(_._1).toSeq)
    // keyless round-robin variant
    assert(Fanout.fanout(few).rdd.getNumPartitions == par)
  }

  test("fanout is a NO-OP (same plan, no exchange) on an already-parallel input") {
    val par = spark.sparkContext.defaultParallelism
    val wide = df.repartition(par + 2, col("id"))
    val out = Fanout.fanout(wide, col("id"))
    // must return the input frame itself: nothing at scale is ever shuffled
    assert(out eq wide)
  }

  test("fanout survives an idempotent double application (second call no-ops)") {
    val once = Fanout.fanout(df.coalesce(1), col("id"))
    val twice = Fanout.fanout(once, col("id"))
    assert(twice eq once)
  }
}
