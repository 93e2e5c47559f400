package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end check of the `spark.sql.extensions` packaging (fresh JVM via
  * sbt's forked runMain): a session built ONLY with the config — no
  * `register(...)`/`install(...)` calls — must expose every injected graft
  * function and fire the BandedDistanceRewrite optimizer rule. This is the
  * deployment shape of a shared cluster (`--conf spark.sql.extensions=...`
  * on spark-submit), where user code never touches the registry. */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val d = spark.sql("SELECT dl_distance('ab', 'ba') a, dl_distance_full('kitten', 'sitting') b, " +
      "dl_distance_true('CA', 'ABC') c, dl_distance_within('kitten', 'sitting', 2) w").head()
    require(d.getInt(0) == 1 && d.getInt(1) == 3 && d.getInt(2) == 2 && d.getInt(3) == 3,
      s"injected function results wrong: $d")

    // rule fires without any install(): RDD-backed frame (LocalRelation
    // would be folded before the optimizer batch runs)
    val df = spark.createDataset(spark.sparkContext.parallelize(
      Seq(("kitten", "sitting"), ("ab", "ba")), 2)).toDF("a", "b")
    val q = df.filter(org.apache.spark.sql.functions.expr("dl_distance_full(a, b) <= 2"))
    val optimized = q.queryExecution.optimizedPlan
    var rewritten = false
    optimized.foreach(_.expressions.foreach(_.foreach {
      case _: org.apache.spark.sql.graft.DlWithinExpr => rewritten = true
      case _ =>
    }))
    require(rewritten, s"BandedDistanceRewrite did not fire via extensions config:\n$optimized")
    require(q.count() == 1, "rewritten predicate returned wrong rows")
    println("""{"probe":"extensions","functions":"ok","optimizer_rule":"fired","rows":1}""")
    spark.stop()
  }
}
