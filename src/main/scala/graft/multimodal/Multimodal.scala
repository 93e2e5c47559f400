package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.DetRng

/**
 * Multimodal column handling: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, processed by batched `mapPartitions` kernels.
 *
 * Decode is REAL for container-free formats — [[MediaCodec]] sniffs the
 * payload's magic bytes and parses P6 PPM images and RIFF/PCM WAV audio from
 * scratch (dimensions, channel statistics, amplitude features; no external
 * libraries). Compressed formats (JPEG/MP4/...) fall back to the
 * deterministic [[StubCodec]] — this container has no codec libraries; a
 * real deployment adds cases to `MediaCodec.decode` and nothing in the
 * dataflow changes.
 *
 * Scale notes: blobs never pass through wide operators — kernels are narrow
 * mapPartitions; joining features back to documents happens on `media_ref`
 * (small string key), never on the bytes. Batch size bounds kernel memory the
 * same way the reference bounds decoder batches
 * (`/root/reference/src/model/eval.py:36`, batch_size → DataLoader).
 */
object Multimodal {

  /** Opaque media payload row: the `binary` column + envelope metadata. */
  final case class MediaBlob(media_ref: String, media_kind: String,
                             bytes: Array[Byte], n_bytes: Int)

  /** Decoded media metadata + feature vector (the mapInPandas-output analog). */
  final case class MediaFeatures(media_ref: String, media_kind: String,
                                 width: Int, height: Int, n_frames: Int,
                                 features: Array[Float])

  val FeatureDim = 16

  /**
   * STUB codec — deterministic fake decode. A real deployment replaces this
   * object with JNI/javacv bindings; everything else in this file stays.
   */
  object StubCodec extends Serializable {
    /** Fake synthesis: blob bytes are a pure function of the media_ref. */
    def fakeBytes(mediaRef: String, n: Int): Array[Byte] = {
      val rng = DetRng.forKey(mediaRef, 0x626C6F62L)
      Array.fill(n)(rng.nextInt(256).toByte)
    }

    /** Fake decode: dimensions/frames/features derived from the payload.
      * Deterministic in the bytes — re-runs and resumes agree. */
    def decode(blob: MediaBlob): MediaFeatures = {
      val rng = DetRng.forKey(blob.media_ref, 0x6465636FL)
      val (w, h, frames) = blob.media_kind match {
        case "image" => (64 + rng.nextInt(512), 64 + rng.nextInt(512), 1)
        case "video" => (320, 240, 1 + rng.nextInt(300))
        case _       => (0, 0, 1 + rng.nextInt(100)) // audio: frames = windows
      }
      val feats = new Array[Float](FeatureDim)
      var i = 0
      while (i < blob.bytes.length) {
        feats(i % FeatureDim) += (blob.bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      var k = 0
      while (k < FeatureDim) { feats(k) /= math.max(1, blob.bytes.length / FeatureDim); k += 1 }
      MediaFeatures(blob.media_ref, blob.media_kind, w, h, frames, feats)
    }
  }

  /** Deterministic media table for the `media_ref`s appearing in a docs
    * table: kind derived from the ref hash (images/audio/video mix). Image
    * and audio payloads are REAL encoded files (P6 PPM / PCM WAV — parsed
    * back by [[MediaCodec]]); video payloads are opaque bytes (stub path).
    * Narrow — one pass over exploded spans. */
  def mediaTable(docs: DataFrame, spansCol: String = "spans"): Dataset[MediaBlob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(col(spansCol)).as("span"))
      .filter(col("span.kind") === "media")
      .select(col("span.media_ref").as("media_ref"))
      .distinct()
      .as[String]
      .map { ref =>
        val rng = DetRng.forKey(ref, 0x6B696E64L)
        val kinds = Array("image", "audio", "video")
        val kind = kinds(rng.nextInt(3))
        val bytes = kind match {
          case "image" =>
            val w = 8 + rng.nextInt(24); val h = 8 + rng.nextInt(24)
            MediaCodec.encodePpm(w, h, Array.fill(w * h * 3)(rng.nextInt(256).toByte))
          case "audio" =>
            val n = 512 + rng.nextInt(4096)
            MediaCodec.encodeWav(16000,
              Array.fill(n)((rng.nextInt(65536) - 32768).toShort))
          case _ =>
            StubCodec.fakeBytes(ref, 256 + rng.nextInt(2048))
        }
        MediaBlob(ref, kind, bytes, bytes.length)
      }
  }

  /**
   * Batched decode/feature-extract kernel: the mapPartitions slot where a
   * real codec runs. `batchSize` bounds per-batch memory exactly like the
   * reference's DataLoader batches; grouped iteration keeps the partition
   * streaming (never materialized whole).
   */
  def extractFeatures(blobs: Dataset[MediaBlob], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // container-free formats decode for real; compressed kinds hit the
        // stub — a native codec would decode the whole batch in one call here
        batch.iterator.map(MediaCodec.decode)
      }
    }
  }

  /**
   * Image near-duplicate pairs via 64-bit perceptual dHash — dedup ACROSS
   * the media modality (the text-side D1–D6 operators cannot see a
   * re-encoded or resized copy of the same picture; the dHash grid can).
   * Pigeonhole banding exactly like the SimHash text path: two hashes
   * within Hamming distance d agree on at least one of d+1 bit-bands, so
   * candidate generation is a self-equi-join on (band, band_bits) and only
   * candidates pay the exact `bit_count(xor)` verification.
   *
   * Scale shape: blobs decode once to (media_ref, 8-byte hash) — the bytes
   * never shuffle; the join carries (band key, ref, hash) rows only.
   * Output: `(ref_a, ref_b, hamming)`, ref_a < ref_b.
   */
  def imageNearDupPairs(blobs: Dataset[MediaBlob], maxHamming: Int = 6): DataFrame =
    imageNearDupPairsFromHashes(imageHashTable(blobs), maxHamming)

  /** Decode-once dHash table `(media_ref, dhash)` — rows only for blobs
    * that decode as images. The narrow mapPartitions pass every perceptual
    * operator derives from; compute it once (localCheckpoint: 10 bytes/row)
    * when feeding several consumers so blobs decode exactly once. */
  def imageHashTable(blobs: Dataset[MediaBlob]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap(b =>
        MediaCodec.dHash64(b).map(h => (b.media_ref, h))))
      .toDF("media_ref", "dhash")
  }

  /** [[imageNearDupPairs]] over a precomputed [[imageHashTable]]. */
  def imageNearDupPairsFromHashes(hashes: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming out of range: $maxHamming")
    // EXACT-hash collapse before pair enumeration (the same discipline as
    // the text path's dedupExact pre-step): k byte-identical logos would
    // otherwise put k refs in every band bucket and emit k²/2 pairs. Each
    // distinct hash is represented by its min ref; `n_refs` carries the
    // collapsed duplicate mass.
    val groups = hashes.groupBy(col("dhash"))
      .agg(min(col("media_ref")).as("rep"), count(lit(1)).as("n_refs"))
    // balanced contiguous bit-bands (widths differ by ≤ 1), pigeonhole-
    // complete for Hamming ≤ nBands - 1 — the 64-bit sibling of
    // Dedup.bandRanges/simHashBands
    val nBands = maxHamming + 1
    val bandCols = (0 until nBands).map { i =>
      val lo = i * 64 / nBands
      val w = (i + 1) * 64 / nBands - lo
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      shiftrightunsigned(col("dhash"), lo).bitwiseAND(lit(mask))
    }
    val banded = groups.select(col("rep"), col("dhash"), col("n_refs"),
      posexplode(array(bandCols: _*)).as(Seq("band", "key")))
    val a = banded.select(col("band"), col("key"),
      col("rep").as("ref_a"), col("dhash").as("ha"), col("n_refs").as("n_refs_a"))
    val bb = banded.select(col("band"), col("key"),
      col("rep").as("ref_b"), col("dhash").as("hb"), col("n_refs").as("n_refs_b"))
    a.join(bb, Seq("band", "key"))
      .where(col("ref_a") < col("ref_b"))
      .select(col("ref_a"), col("ref_b"), col("n_refs_a"), col("n_refs_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact perceptual-duplicate groups — the collapse [[imageNearDupPairs]]
    * runs internally, exposed for direct use: one row per distinct dHash
    * with its representative (min ref), member count, and member list
    * (bounded by the group size; the common case is small — for corpora
    * with million-copy logos aggregate counts only). */
  def imageExactDupGroups(blobs: Dataset[MediaBlob]): DataFrame =
    imageExactDupGroupsFromHashes(imageHashTable(blobs))

  /** [[imageExactDupGroups]] over a precomputed [[imageHashTable]]. */
  def imageExactDupGroupsFromHashes(hashes: DataFrame): DataFrame =
    hashes
      .groupBy(col("dhash"))
      .agg(min(col("media_ref")).as("rep"), count(lit(1)).as("n_refs"),
        sort_array(collect_list(col("media_ref"))).as("refs"))

  /**
   * Per-ref canonical rewrite map for perceptual image dedup:
   * `(media_ref, canon_ref)` for every ref whose canonical representative
   * DIFFERS from itself — byte-identical and near-duplicate (Hamming ≤
   * `maxHamming`) images all map to the lexicographically smallest ref of
   * their duplicate CLUSTER (exact-hash collapse first, then connected
   * components over the banded near-dup rep graph, so transitivity holds:
   * A≈B≈C collapses to one canon even when A,C are farther than the
   * threshold — the `dedupNearCC` discipline on the media modality).
   * Refs that do not decode as images, or have no duplicate, are absent.
   * Scale shape: one decode pass to (ref, 8-byte hash); every later shuffle
   * carries refs/hashes only.
   */
  def imageCanonMap(blobs: Dataset[MediaBlob], maxHamming: Int = 6): DataFrame = {
    val hashes = imageHashTable(blobs).localCheckpoint()
    val groups = imageExactDupGroupsFromHashes(hashes)
    val nearPairs = imageNearDupPairsFromHashes(hashes, maxHamming)
      .select(col("ref_a"), col("ref_b"))
    // component roots are minima (CC roots at least(id)); rep = min of its
    // exact group, so coalesce(component, rep) is the global cluster min
    val comp = graft.dedup.ConnectedComponents.run(nearPairs, "ref_a", "ref_b")
      .select(col("id").as("rep"), col("component"))
    groups.select(explode(col("refs")).as("media_ref"), col("rep"))
      .join(comp, Seq("rep"), "left")
      .select(col("media_ref"), coalesce(col("component"), col("rep")).as("canon_ref"))
      .where(col("media_ref") =!= col("canon_ref"))
  }

  /** Deterministic frame sampling for video rows: every `stride`-th frame
    * index up to `maxFrames` — pure expression, oracle-expressible. */
  def sampleFrames(features: DataFrame, stride: Int = 10, maxFrames: Int = 8): DataFrame =
    features
      .filter(col("media_kind") === "video")
      .select(col("media_ref"), col("n_frames"),
        slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames)
          .as("frame_indices"))

  /** Join extracted media features back onto exploded spans (key = media_ref,
    * broadcast when the media dimension is small). */
  def enrichSpans(spanRows: DataFrame, features: Dataset[MediaFeatures]): DataFrame =
    spanRows.join(
      broadcast(features.toDF().select(col("media_ref"), col("media_kind"),
        col("width"), col("height"), col("n_frames"), col("features"))),
      Seq("media_ref"), "left")
}
