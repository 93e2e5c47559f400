package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.correct.DictionaryCorrector
import graft.gen.DocGen
import graft.model.Doc
import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streaming correction ≡ batch correction, span order preserved") {
    implicit val sqlCtx = spark.sqlContext
    val noisy = DocGen.docs(spark, 50).collect()
      .map(d => Doc(d.doc_id, d.noisy_spans)).toSeq
    val clean = DocGen.docs(spark, 50).toDF()

    val vocab = DictionaryCorrector.trainVocab(clean, "spans", splitFilter = None)
    val model = DictionaryCorrector.buildModel(spark, vocab, 2)
    val corrector = DictionaryCorrector.corrector(model)

    // batch result through the same row-level operator
    val batchOut = StreamingOps.correctDocs(noisy.toDS(), corrector)
      .collect().map(d => d.doc_id -> d.spans).toMap

    val stream = MemoryStream[Doc]
    stream.addData(noisy)
    val q = StreamingOps.correctDocs(stream.toDS(), corrector)
      .writeStream.format("memory").queryName("corrected_docs")
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally q.stop()

    val streamOut = spark.table("corrected_docs").as[Doc]
      .collect().map(d => d.doc_id -> d.spans).toMap
    assert(streamOut == batchOut)
    // media spans untouched, order intact
    streamOut.values.foreach { spans =>
      assert(spans.map(_.offset) == spans.map(_.offset).sorted)
    }
    // and equivalent to the batch explode→reassemble pipeline
    val viaPipeline = graft.pipeline.CorrectionPipeline
      .run(noisy.toDF(), corrector)
      .as[Doc].collect().map(d => d.doc_id -> d.spans).toMap
    assert(streamOut == viaPipeline)
  }

  test("correctDocs routes span texts through the BATCHED corrector hook") {
    StreamingBatchProbe.calls.set(0)
    StreamingBatchProbe.texts.set(0)
    val noisy = DocGen.docs(spark, 40).collect()
      .map(d => Doc(d.doc_id, d.noisy_spans)).toSeq
    val out = StreamingOps.correctDocs(noisy.toDS().repartition(2),
      StreamingBatchProbe.ProbeCorrector).collect()
    // correctness: every text span uppercased, media untouched, order kept
    val want = noisy.map(d => d.doc_id -> d.spans.map(s =>
      if (s.kind == graft.model.Span.KindText) s.copy(text = s.text.toUpperCase) else s)).toMap
    assert(out.map(d => d.doc_id -> d.spans).toMap == want)
    // batching: far fewer correctTexts calls than texts (one per ≤256-doc
    // group, not one per span) — the per-span form would give calls == texts
    val (calls, texts) = (StreamingBatchProbe.calls.get, StreamingBatchProbe.texts.get)
    assert(texts > 40, s"expected many text spans, saw $texts")
    assert(calls <= 4, s"correctTexts called $calls times for $texts texts — not batched")
  }

  test("streaming dedup drops repeated fingerprints") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    stream.addData(Seq(
      (ts(0), "the quick brown fox", 1L),
      (ts(1), "THE  quick brown fox", 2L), // dup after normalization
      (ts(2), "something different", 3L)))
    val df = stream.toDF().toDF("ts", "text", "id")
    val q = StreamingOps.dedupStream(df, "ts", "text")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally q.stop()
    val ids = spark.table("deduped").select("id").as[Long].collect().sorted
    assert(ids.length == 2 && ids.contains(3L))
  }

  test("dedup state is evicted past the watermark: an old fingerprint recurs") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val df = stream.toDF().toDF("ts", "text", "id")
    val q = StreamingOps.dedupStream(df, "ts", "text", watermark = "10 minutes")
      .writeStream.format("memory").queryName("deduped_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: the fingerprint's first appearance
      stream.addData(Seq((ts(0), "same text", 1L)))
      q.processAllAvailable()
      // batch 2: advance event time far past the watermark horizon → the
      // fingerprint's state is evicted
      stream.addData(Seq((Timestamp.valueOf("2026-01-01 12:00:00"), "other", 2L)))
      q.processAllAvailable()
      // batch 3: the same text again, hours later — kept (state bounded by
      // the watermark, unlike plain dropDuplicates which remembers forever)
      stream.addData(Seq((Timestamp.valueOf("2026-01-01 12:01:00"), "same text", 3L)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("deduped_evict").select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L),
      s"expected the recurrence to survive eviction: ${ids.toSeq}")
  }

  test("custom-state dedup (flatMapGroupsWithState): survivor immediate, dup counts on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val df = stream.toDF().toDF("ts", "text", "id")
    val q = StreamingOps.dedupStreamWithCounts(df, "ts", "text", "id",
      watermark = "5 minutes", gapMs = 5 * 60 * 1000L)
      .writeStream.format("memory").queryName("dedup_counts")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      // batch 1: first appearance (survivor, emitted immediately) + one dup
      stream.addData(Seq(
        (ts(0), "the quick brown fox", 1L),
        (ts(1), "THE  quick brown fox", 2L), // dup after normalization
        (ts(1), "unrelated text here", 3L)))
      q.processAllAvailable()
      val afterB1 = spark.table("dedup_counts")
        .select("doc_id", "event", "n_dups").as[(String, String, Long)].collect().toSet
      assert(afterB1 == Set(("1", "keep", 0L), ("3", "keep", 0L)), s"got $afterB1")
      // batch 2: another dup, then advance the watermark far past the gap →
      // the fingerprint's state times out and emits its accounting row
      stream.addData(Seq((ts(3), "the quick  BROWN fox", 4L)))
      q.processAllAvailable()
      stream.addData(Seq((Timestamp.valueOf("2026-01-01 13:00:00"), "late mover", 9L)))
      q.processAllAvailable()
      stream.addData(Seq((Timestamp.valueOf("2026-01-01 13:30:00"), "even later", 10L)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("dedup_counts")
      .select("doc_id", "event", "n_dups").as[(String, String, Long)].collect().toSet
    // survivor 1 absorbed ids 2 and 4; survivor 3 absorbed none; both finals
    // emitted after their timeouts (the 13:30 batch advances the watermark
    // past the 13:00 batch's fingerprints too — not asserted for id 9/10
    // finals since their timeout needs yet another watermark advance)
    assert(rows.contains(("1", "final", 2L)), s"got $rows")
    assert(rows.contains(("3", "final", 0L)), s"got $rows")
    assert(!rows.exists(r => (r._1 == "2" || r._1 == "4") && r._2 == "keep"),
      "a duplicate was emitted as survivor")
  }

  test("streaming SimHash near-dup verdicts: greedy-transitive, batch survivors ⊆ streaming") {
    implicit val sqlCtx = spark.sqlContext
    val d = 3
    // case/whitespace variants share an exact signature (Hamming 0); the
    // one-word edits land wherever SimHash puts them — the EXPECTED dup set
    // is derived from the batch signatures with the operator's own greedy
    // rule, so the assertion pins semantics, not fixture luck
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "THE quick  brown fox jumps over the lazy dog tonight", // sig == 1
      3L -> "completely different content about winnowing fingerprints",
      4L -> "the quick brown fox jumps over the lazy cat tonight", // 1-word edit of 1
      5L -> "Completely DIFFERENT content about winnowing fingerprints", // sig == 3
      6L -> "unrelated third topic entirely about parquet partition pruning")
    val batchDf = texts.toDF("id", "text")
    val sigs = graft.dedup.Dedup.simHash32Relational(batchDf, "id", "text")
      .as[(Long, Long)].collect().toMap
    // reference greedy rule: doc is a dup iff within d of ANY earlier doc
    val order = texts.map(_._1)
    val expectedDups = order.zipWithIndex.collect {
      case (id, i) if order.take(i).exists(p =>
        java.lang.Long.bitCount(sigs(p) ^ sigs(id)) <= d) => id.toString
    }.toSet
    assert(expectedDups.contains("2") && expectedDups.contains("5"),
      s"fixture must contain sig-identical dups: $expectedDups")

    val stream = MemoryStream[(Timestamp, String, Long)]
    val df = stream.toDF().toDF("ts", "text", "id")
    val q = StreamingOps.simHashDupVerdicts(df, "ts", "text", "id", maxHamming = d)
      .writeStream.format("memory").queryName("simdup")
      .outputMode(OutputMode.Append()).start()
    try {
      // two batches: state must carry across micro-batches
      stream.addData(texts.take(3).zipWithIndex.map { case ((id, t), i) => (ts(i), t, id) })
      q.processAllAvailable()
      stream.addData(texts.drop(3).zipWithIndex.map { case ((id, t), i) => (ts(3 + i), t, id) })
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.table("simdup")
      .select("doc_id", "dup_of").as[(String, String)].collect()
    assert(verdicts.map(_._1).toSet == expectedDups, s"got ${verdicts.toSeq}")
    // dup_of must be an earlier, non-flagged-first arrival within d
    verdicts.foreach { case (dup, of) =>
      assert(java.lang.Long.bitCount(sigs(dup.toLong) ^ sigs(of.toLong)) <= d)
      assert(order.indexOf(of.toLong) < order.indexOf(dup.toLong))
    }
    // batch near-dup survivors are a subset of streaming survivors
    val batchSurvivors = graft.dedup.Dedup.dedupNearSimHash(batchDf, d, "id", "text")
      .select("id").as[Long].collect().map(_.toString).toSet
    val streamSurvivors = order.map(_.toString).toSet -- expectedDups
    assert(batchSurvivors.subsetOf(streamSurvivors),
      s"batch $batchSurvivors vs stream $streamSurvivors")
  }

  test("SimHash near-dup state is evicted past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val df = stream.toDF().toDF("ts", "text", "id")
    val q = StreamingOps.simHashDupVerdicts(df, "ts", "text", "id", maxHamming = 3,
      watermark = "10 minutes", gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("simdup_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Seq((ts(0), "same text appearing twice in this stream", 1L)))
      q.processAllAvailable()
      // advance event time far past the horizon → bucket states evict
      stream.addData(Seq((Timestamp.valueOf("2026-01-01 12:00:00"), "watermark mover", 2L)))
      q.processAllAvailable()
      // the same text hours later: its twin was evicted → NOT flagged
      stream.addData(Seq((Timestamp.valueOf("2026-01-01 12:01:00"),
        "same  TEXT appearing twice in this stream", 3L)))
      q.processAllAvailable()
      // but an in-horizon copy right after IS flagged, against doc 3
      stream.addData(Seq((Timestamp.valueOf("2026-01-01 12:02:00"),
        "same text appearing twice in this stream", 4L)))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.table("simdup_evict")
      .select("doc_id", "dup_of").as[(String, String)].collect().toSet
    assert(verdicts == Set(("4", "3")), s"got $verdicts")
  }

  test("watermarked session windows close after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)]
    // user 1: two bursts separated by > 30 min -> two sessions
    stream.addData(Seq(
      (1L, ts(0), 1.0), (1L, ts(5), 2.0),
      (1L, ts(50), 3.0),
      (2L, ts(10), 4.0)))
    // late watermark-advancing batch so sessions finalize
    stream.addData(Seq((9L, Timestamp.valueOf("2026-01-01 14:00:00"), 0.0)))
    val df = stream.toDF().toDF("user_id", "ts", "value")
    val q = StreamingOps.sessionize(df, gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally q.stop()
    val rows = spark.table("sessions")
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(rows.contains((1L, 2L, 3.0))) // first burst: 2 events
    assert(rows.contains((1L, 1L, 3.0))) // second burst
    assert(rows.contains((2L, 1L, 4.0)))
  }

  test("streaming quality gate filters low-quality/repetitive docs; batch-equivalent") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps running ahead"),
      (2L, "spam spam spam spam spam spam spam spam spam spam"), // dup_token_ratio ~0.9
      (3L, "@@@ ### !!! ;;; ::: %%% ^^^ &&&")                    // punctuation soup
    )
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs)
    val q = StreamingOps.qualityGate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gated")
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally q.stop()
    val kept = spark.table("gated").select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L), s"gate kept $kept")
    // stateless + narrow ⇒ identical rows on the batch frame
    val batch = StreamingOps.qualityGate(docs.toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSeq
    assert(batch == kept)
  }

  test("quality gate fails fast when input already carries an output column") {
    val e = intercept[IllegalArgumentException] {
      StreamingOps.qualityGateAnnotated(
        Seq((1L, "some text", 0.99)).toDF("doc_id", "text", "quality"))
    }
    assert(e.getMessage.contains("quality"), e.getMessage)
  }

  test("PII redaction and deterministic sampling are streaming-safe (batch ≡ stream)") {
    // both are stateless narrow Column expressions, so the SAME calls run
    // on a streaming frame with no state, watermark, or output-mode caveats
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 40L).map(i =>
      (i, s"doc $i mail doc$i@example.com at 10.0.0.$i end"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs)
    val scrubbedSampled = graft.pipeline.Sampling
      .deterministicSample(stream.toDF().toDF("doc_id", "text"), "doc_id", 0.5)
      .withColumn("redacted", graft.textanalysis.Pii.redact(org.apache.spark.sql.functions.col("text")))
    val q = scrubbedSampled.writeStream.format("memory").queryName("pii_stream")
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("pii_stream").select("doc_id", "redacted")
      .as[(Long, String)].collect().toMap
    val batch = graft.pipeline.Sampling
      .deterministicSample(docs.toDF("doc_id", "text"), "doc_id", 0.5)
      .withColumn("redacted", graft.textanalysis.Pii.redact(org.apache.spark.sql.functions.col("text")))
      .select("doc_id", "redacted").as[(Long, String)].collect().toMap
    assert(streamed == batch, "sample membership and redaction must be frame-kind-independent")
    assert(streamed.nonEmpty && streamed.values.forall(t =>
      t.contains("[EMAIL]") && t.contains("[IP]") && !t.contains("@example.com")))
  }

  test("streaming Bloom gate: shipped docs drop at the boundary, batch ≡ stream") {
    implicit val sqlCtx = spark.sqlContext
    val shipped = (0 until 20).map(i => s"previously shipped document $i")
    val words = graft.dedup.Bloom.build(
      shipped.toDF("t").select(graft.dedup.Dedup.fingerprint($"t").as("fp")),
      "fp", mBits = 8192, k = 5)
    val arriving = (0L until 10L).map(i => (i, s"previously shipped document $i")) ++
      (10L until 25L).map(i => (i, s"a fresh streaming document $i"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(arriving)
    val gated = StreamingOps.bloomGate(
      stream.toDF().toDF("doc_id", "text"), words, mBits = 8192, k = 5)
    val q = gated.writeStream.format("memory").queryName("bloom_stream")
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("bloom_stream").select("doc_id").as[Long].collect().toSet
    // every shipped re-arrival drops; fresh docs survive (FP rate ~0.1%)
    assert((0L until 10L).forall(!streamed.contains(_)))
    assert((10L until 25L).count(streamed.contains) >= 14)
    val batch = StreamingOps.bloomGate(
      arriving.toDF("doc_id", "text"), words, mBits = 8192, k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch, "gate membership must be frame-kind-independent")
  }

  test("accumulating Bloom sink: three re-crawl micro-batches, sketch grows, replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("bloom-acc").toString
    val (sketchDir, outDir) = (s"$base/sketch", s"$base/out")
    val (mBits, k) = (8192, 5)
    val sink = StreamingOps.bloomAccumulateSink(sketchDir, outDir, mBits, k)

    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink).outputMode(OutputMode.Append()).start()
    def ship(rows: Seq[(Long, String)]): Unit = { stream.addData(rows); q.processAllAvailable() }
    try {
      // batch 0: A, B fresh            batch 1: A re-crawled, C fresh
      // batch 2: B and C re-crawled (different ids, same text), D fresh
      ship(Seq((0L, "document alpha"), (1L, "document bravo")))
      ship(Seq((10L, "document alpha"), (11L, "document charlie")))
      ship(Seq((20L, "document bravo"), (21L, "document charlie"), (22L, "document delta")))
    } finally q.stop()

    val survived = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(survived == Set(0L, 1L, 11L, 22L), s"got $survived")

    // the accumulated sketch == the batch pipeline's sequential
    // build-merge over the same survivors (byte-for-byte)
    val (words, m2, k2) = graft.dedup.Bloom.load(spark, sketchDir)
    assert((m2, k2) == (mBits, k))
    val direct = graft.dedup.Bloom.build(
      Seq("document alpha", "document bravo", "document charlie", "document delta")
        .toDF("t").select(graft.dedup.Dedup.fingerprint($"t").as("fp")),
      "fp", mBits, k)
    assert(words.toSeq == direct.toSeq)

    // replaying an already-applied batch id is a no-op for rows AND sketch
    sink(Seq((99L, "document alpha")).toDF("doc_id", "text"), 0L)
    assert(spark.read.parquet(outDir).count() == 4)
    // a NEW batch id still dedups against everything accumulated so far
    sink(Seq((30L, "document delta"), (31L, "document echo")).toDF("doc_id", "text"), 3L)
    val after = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(after == Set(0L, 1L, 11L, 22L, 31L), s"got $after")
  }

  test("streaming unit dedup: repeated spans flagged, short spans immune, state evicted") {
    implicit val sqlCtx = spark.sqlContext
    import graft.model.Span
    val boiler = "subscribe to our newsletter for updates"
    val stream = MemoryStream[(Timestamp, String, Seq[Span])]
    val df = stream.toDF().toDF("ts", "doc_id", "spans")
    val q = StreamingOps.unitDupVerdicts(df, "ts", minTokens = 3,
      watermark = "5 minutes", gapMs = 5 * 60 * 1000L)
      .writeStream.format("memory").queryName("unit_dups")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: d1 carries the boiler first; d2 repeats it (and also
      // repeats it WITHIN itself); 'ok' is 1 token — immune everywhere
      stream.addData(Seq(
        (ts(0), "d1", Seq(Span("text", "unique body one", null, 0),
          Span("text", boiler, null, 1))),
        (ts(1), "d2", Seq(Span("text", boiler, null, 0),
          Span("media", null, "img_1", 1),
          Span("text", "SUBSCRIBE  to our newsletter for updates", null, 2),
          Span("text", "ok", null, 3)))))
      q.processAllAvailable()
      val afterB1 = spark.table("unit_dups")
        .as[(String, Int, String)].collect().toSet
      assert(afterB1 == Set(("d2", 0, "d1"), ("d2", 2, "d1")), s"got $afterB1")
      // the flagged set equals the batch --span-dedup losers on the same
      // docs (single arrival order: first-arrival == min (doc_id, offset))
      val batchLosers = graft.dedup.LineDedup.duplicateUnitLosers(
        Seq(("d1", 0, "unique body one", 3), ("d1", 1, boiler, 6),
          ("d2", 0, boiler, 6), ("d2", 2, boiler, 6), ("d2", 3, "ok", 1))
          .toDF("doc_id", "unit_no", "unit", "n_tokens"), minTokens = 3)
        .as[(String, Int)].collect().toSet
      assert(afterB1.map(v => (v._1, v._2)) == batchLosers, s"batch: $batchLosers")
      // batch 2: advance the watermark far past the gap → state evicted;
      // the boiler arriving again is a fresh first (no verdict)
      stream.addData(Seq((Timestamp.valueOf("2026-01-01 11:00:00"), "d8",
        Seq(Span("text", "advancing the watermark now", null, 0)))))
      q.processAllAvailable()
      stream.addData(Seq((Timestamp.valueOf("2026-01-01 11:30:00"), "d9",
        Seq(Span("text", boiler, null, 0)))))
      q.processAllAvailable()
    } finally q.stop()
    val all = spark.table("unit_dups").as[(String, Int, String)].collect().toSet
    assert(!all.exists(_._1 == "d9"),
      s"evicted unit must be a fresh first on recurrence: $all")
  }
}

/** Top-level (no spec outer reference → serializable) corrector that counts
  * batched-hook invocations; local[*] shares the JVM so statics observe
  * executor-side calls. */
object StreamingBatchProbe {
  val calls = new java.util.concurrent.atomic.AtomicInteger
  val texts = new java.util.concurrent.atomic.AtomicInteger
  object ProbeCorrector extends graft.correct.Corrector {
    override def correctText(t: String): String = t.toUpperCase
    override def correctTexts(ts: Iterator[String]): Iterator[String] = {
      calls.incrementAndGet()
      ts.map { t => texts.incrementAndGet(); t.toUpperCase }
    }
  }
}
