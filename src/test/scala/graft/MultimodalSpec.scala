package graft

import org.apache.spark.sql.functions._
import graft.gen.DocGen
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = DocGen.docs(spark, 60).toDF().cache()

  test("media table: one blob per distinct media_ref, deterministic payloads") {
    val media = Multimodal.mediaTable(docs)
    val refs = docs.select(explode($"spans").as("s"))
      .filter($"s.kind" === "media").select($"s.media_ref").distinct().count()
    assert(media.count() == refs)
    val twice = Multimodal.mediaTable(docs)
    val a = media.collect().map(b => (b.media_ref, b.bytes.toSeq)).sortBy(_._1)
    val b = twice.collect().map(b => (b.media_ref, b.bytes.toSeq)).sortBy(_._1)
    assert(a.sameElements(b), "blob synthesis must be deterministic")
    media.collect().foreach { blob =>
      assert(Set("image", "audio", "video").contains(blob.media_kind))
      assert(blob.bytes.length == blob.n_bytes)
    }
  }

  test("feature extraction: stable schema, full coverage, deterministic features") {
    val media = Multimodal.mediaTable(docs).cache()
    val feats = Multimodal.extractFeatures(media, batchSize = 7)
    assert(feats.columns.toSeq ==
      Seq("media_ref", "media_kind", "width", "height", "n_frames", "features"))
    val rows = feats.collect()
    assert(rows.length == media.count())
    rows.foreach { f =>
      assert(f.features.length == Multimodal.FeatureDim)
      if (f.media_kind == "image") assert(f.n_frames == 1 && f.width >= 64)
      if (f.media_kind == "video") assert(f.n_frames >= 1)
    }
    val again = Multimodal.extractFeatures(media, batchSize = 64).collect()
    assert(rows.map(f => (f.media_ref, f.features.toSeq)).sortBy(_._1)
      .sameElements(again.map(f => (f.media_ref, f.features.toSeq)).sortBy(_._1)),
      "decode must not depend on batch size or partitioning")
    media.unpersist()
  }

  test("frame sampling: stride and cap respected") {
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.extractFeatures(media)
    val sampled = Multimodal.sampleFrames(feats.toDF(), stride = 10, maxFrames = 8).collect()
    sampled.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      val idx = r.getSeq[Int](r.fieldIndex("frame_indices"))
      assert(idx.length <= 8)
      assert(idx == idx.sorted)
      idx.foreach(i => assert(i < n))
      if (idx.length >= 2) assert(idx(1) - idx(0) == 10)
    }
  }

  test("span enrichment joins features onto media spans only") {
    val spans = graft.pipeline.CorrectionPipeline.explodeSpans(docs).toDF()
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.extractFeatures(media)
    val enriched = Multimodal.enrichSpans(spans, feats)
    val mediaRows = enriched.filter($"kind" === "media")
    assert(mediaRows.filter($"features".isNull).count() == 0)
    val textRows = enriched.filter($"kind" === "text")
    assert(textRows.filter($"features".isNotNull).count() == 0)
  }
}
