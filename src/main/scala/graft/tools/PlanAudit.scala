package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan smell sweep over EVERY SparkEntry query: counts exchanges
  * and join strategies, and flags the shapes that do not survive a 100×
  * scale-up (CartesianProduct anywhere; BroadcastNestedLoop outside a
  * deliberate tiny-side pattern). One line per query, smells last.
  *
  * Round-6 sweep result (sf0.01, all 89 queries incl. q_containment_lsh):
  * ZERO CartesianProducts; the SAME twelve adjudicated BNLJ hits as round
  * 5, no new ones; the substring family now shows ShuffledHashJoin where
  * the decade probe caught AQE broadcasting a corpus-sized exploded side
  * (see SubstringDup.scala).
  *
  * Round-5 sweep result (sf0.01, all 87 queries): ZERO CartesianProducts;
  * twelve BroadcastNestedLoopJoin hits, all adjudicated deliberate —
  * q_tfidf / q_bm25 / q_bm25_doc / q_lm_score / q_dsir / q_source_mix /
  * q_lang_profile attach a ONE-ROW (or ≤ sources/langs-sized) broadcast
  * aggregate to every row, the correct broadcast-a-scalar pattern at any
  * scale; q_ann_topk / q_cosine_neardup / q_sq8_topk / q_pq_topk /
  * q_ivf_pq broadcast the tiny query/probe set under a non-equi
  * (self-exclusion) condition by design (the documented brute-force/ADC
  * scan shapes next to the IVF/LSH scale paths — the corpus side streams,
  * only the query side is nested). SortMergeJoins appear only
  * inside the iterative CC rounds and the LSH verify chain, where AQE picks
  * the strategy from runtime sizes. Note: codegen spans are not countable
  * here — under AQE the pre-execution plan string hides WholeStageCodegen
  * markers (they materialize per-stage at runtime).
  * Usage: runMain graft.tools.PlanAudit [sfDir] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var smells = List.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val plan = q(spark, sfDir).queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).size
        val cart = c("CartesianProduct")
        val bnl = c("BroadcastNestedLoopJoin")
        val smj = c("SortMergeJoin")
        val bhj = c("BroadcastHashJoin")
        val shj = c("ShuffledHashJoin")
        val ex = c("Exchange") - c("ReusedExchange") - c("BroadcastExchange")
        println(f"$name%-22s exchanges=$ex%-3d bhj=$bhj smj=$smj shj=$shj " +
          f"cartesian=$cart bnlj=$bnl")
        if (cart > 0) smells ::= s"$name: CartesianProduct"
        if (bnl > 0) smells ::= s"$name: BroadcastNestedLoopJoin"
      } catch {
        case e: Exception => println(f"$name%-22s ERROR ${e.getMessage.take(80)}")
      }
    }
    println(if (smells.isEmpty) "SMELLS: none"
            else "SMELLS:\n  " + smells.sorted.mkString("\n  "))
    spark.stop()
  }
}
