package graft.tools

import org.apache.spark.sql.SparkSession

import graft.correct.{DictionaryCorrector, NoisyChannelModel}

/** Path/cost profile of NoisyChannelModel.inferToken over the ACTUAL
  * distinct noisy tokens of the bench part-2 shape: how many tokens
  * resolve at width 1 / width 2 / split / wide / fallback, and the wall
  * time each bucket costs — the evidence for where the correction
  * kernel's cold seconds go. Driver-side, single-threaded (per-token
  * costs, not parallelism). */
object InferProfile {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 8000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val pages = graft.gen.HtmlGen.pages(spark, nDocs, pathological = true).cache()
    val clean = graft.extract.Extract.extractDocs(pages).toDF().cache()
    pages.count(); clean.count()
    val vocab = DictionaryCorrector.trainVocab(clean, "spans", splitFilter = None)
    val bcModel = NoisyChannelModel.fromVocabDf(spark, vocab.filter("freq >= 2"), 2)
    val model = bcModel.value

    val noisy = graft.gen.NoiseChannel.noiseDocs(graft.extract.Extract.extractDocs(pages))
    val toks = noisy.toDF().select(org.apache.spark.sql.functions.explode($"spans").as("s"))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim($"s.text"), "\\s+")).as("t"))
      .as[String].collect()
    val distinct = toks.distinct
    println(s"[infer] spans tokens total=${toks.length} distinct=${distinct.length}")

    val oov = distinct.filterNot(model.contains)
    println(s"[infer] oov distinct=${oov.length}")

    // bucket by resolution path using the model's own components
    var (nW1, nW2, nRest) = (0, 0, 0)
    var (tW1, tW2, tRest) = (0L, 0L, 0L)
    oov.foreach { t =>
      val t0 = System.nanoTime()
      val w1 = model.trie.searchWithin(t, 1)
      val t1 = System.nanoTime()
      if (w1.nonEmpty) { nW1 += 1; tW1 += t1 - t0 }
      else {
        val w2 = model.trie.searchWithin(t, 2)
        val t2 = System.nanoTime()
        if (w2.nonEmpty) { nW2 += 1; tW2 += (t2 - t0) }
        else { nRest += 1
          // the rest of inferToken: split + wide + fallback
          val t3 = System.nanoTime()
          model.inferToken(t)
          tRest += (t2 - t0) + (System.nanoTime() - t3)
        }
      }
    }
    def ms(n: Long) = f"${n / 1e6}%.0f ms"
    println(s"[infer] w1-resolved  n=$nW1  walkTime=${ms(tW1)}")
    println(s"[infer] w2-resolved  n=$nW2  walkTime=${ms(tW2)}")
    println(s"[infer] beyond-w2    n=$nRest  fullTime=${ms(tRest)}")

    // decompose the beyond-w2 bucket: w3 wide-walk time, and how many
    // resolve by split (output has a space) vs wide vs dictionary fallback
    var (nSplit, nWide, nFall) = (0, 0, 0)
    var (tW3walk, tW12) = (0L, 0L)
    oov.foreach { t =>
      val t0 = System.nanoTime()
      val e1 = model.trie.searchWithin(t, 1).isEmpty
      val e2 = e1 && model.trie.searchWithin(t, 2).isEmpty
      val t1 = System.nanoTime()
      if (e2) {
        tW12 += t1 - t0
        val w3 = model.trie.searchWithin(t, 3)
        tW3walk += System.nanoTime() - t1
        val out = model.inferToken(t)
        if (out.contains(' ')) nSplit += 1
        else if (w3.nonEmpty) nWide += 1
        else nFall += 1
      }
    }
    println(s"[infer] beyond-w2 decompose: split=$nSplit wide=$nWide fallback=$nFall")
    println(s"[infer] beyond-w2 w1+w2 walks: ${ms(tW12)}; w3 walk alone: ${ms(tW3walk)}")

    // remaining suspects: the split walk cost (forward prefix neighborhoods
    // ×2 as a both-sides estimate), the pair-scoring volume, and the
    // dictionary fallback scan
    var (tPfx, nPairs, tFallScan) = (0L, 0L, 0L)
    val dict = new graft.correct.DictionaryModel(
      vocab.filter("freq >= 2").collect().map(r => (r.getString(0), r.getLong(1))).toMap, 2L)
    oov.foreach { t =>
      if (model.trie.searchWithin(t, 1).isEmpty && model.trie.searchWithin(t, 2).isEmpty) {
        val t0 = System.nanoTime()
        val lefts = model.trie.prefixNeighborhoods(t, 1)
        tPfx += System.nanoTime() - t0
        val cpn = t.codePointCount(0, t.length)
        var i = 2
        while (i <= cpn - 2) {
          if (lefts(i).nonEmpty) {
            val right = new String(t.codePoints().toArray, i, cpn - i)
            nPairs += lefts(i).length.toLong * model.trie.searchWithin(right, 1).length
          }
          i += 1
        }
        if (model.trie.searchWithin(t, 3).isEmpty) {
          val t1 = System.nanoTime()
          dict.inferToken(t)
          tFallScan += System.nanoTime() - t1
        }
      }
    }
    println(s"[infer] split: fwd-prefix-walks=${ms(tPfx)} (x2 ~ both sides); scored pairs=$nPairs")
    println(s"[infer] fallback dictionary scans: ${ms(tFallScan)}")
    spark.stop()
  }
}
