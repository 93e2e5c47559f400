package graft

import graft.textanalysis.Relevance

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark join window spark spark"),
    (1L, "join window filter sort"),
    (2L, "window window window scan"),
    (3L, "completely unrelated tokens here"),
    (4L, "  Spark   JOIN  ")              // case + whitespace normalization
  ).toDF("doc_id", "text")

  /** Reference: naive single-node computation with the same formulas. */
  private def refCorpus: (Map[(Long, String), Long], Map[String, Long], Long, Double) = {
    val toks = Map(
      0L -> Seq("spark", "join", "window", "spark", "spark"),
      1L -> Seq("join", "window", "filter", "sort"),
      2L -> Seq("window", "window", "window", "scan"),
      3L -> Seq("completely", "unrelated", "tokens", "here"),
      4L -> Seq("spark", "join"))
    val tf = toks.toSeq.flatMap { case (id, ts) => ts.groupBy(identity).map { case (t, g) => (id, t) -> g.size.toLong } }.toMap
    val df = tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val n = toks.size.toLong
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    (tf, df, n, avgdl)
  }

  test("tfIdf matches the naive reference on every (doc, token)") {
    val (tf, df, n, _) = refCorpus
    val got = Relevance.tfIdf(docs).as[(Long, String, Long, Double)].collect()
      .map { case (id, tok, f, v) => (id, tok) -> (f, v) }.toMap
    assert(got.keySet == tf.keySet)
    tf.foreach { case (k @ (_, tok), f) =>
      val (gf, gv) = got(k)
      assert(gf == f)
      val want = f * (math.log((1.0 + n) / (1.0 + df(tok))) + 1.0)
      assert(math.abs(gv - want) < 1e-12, s"$k: $gv vs $want")
    }
  }

  test("bm25 sums the per-term contributions and matches the reference") {
    val (tf, df, n, avgdl) = refCorpus
    val query = Seq("spark", "window")
    val k1 = Relevance.DefaultK1; val b = Relevance.DefaultB
    val dl = Map(0L -> 5L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 2L)
    def termScore(id: Long, t: String): Double = {
      val f = tf.getOrElse((id, t), 0L).toDouble
      if (f == 0) 0.0
      else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
        f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl(id) / avgdl))
    }
    val want = (0L to 4L).map(id => id -> query.map(termScore(id, _)).sum)
      .filter(_._2 > 0).toMap
    val got = Relevance.bm25(docs, query).as[(Long, Double)].collect().toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) => assert(math.abs(got(id) - w) < 1e-12, s"doc $id") }
    // rarer terms score higher at equal tf: doc 4 matches spark and join once
    // each in the same document, so only idf differs (spark df=2 < join df=3)
    val terms = Relevance.bm25Terms(docs, Seq("spark", "join")).as[(Long, String, Double)].collect()
      .map { case (id, t, sc) => (id, t) -> sc }.toMap
    assert(terms((4L, "spark")) > terms((4L, "join")))
  }

  test("docs without query terms get no rows; empty corpus yields empty result") {
    val got = Relevance.bm25(docs, Seq("spark")).as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(0L, 4L))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Relevance.bm25(empty, Seq("spark")).isEmpty)
    assert(Relevance.tfIdf(empty).isEmpty)
  }
}
