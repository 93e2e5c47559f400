package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.DetRng

/**
 * Multimodal column handling: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, processed by batched `mapPartitions` kernels.
 *
 * Decode is REAL for every format the JDK can parse — [[MediaCodec]] sniffs
 * the payload's magic bytes and parses P6 PPM images and RIFF/PCM WAV audio
 * from scratch, JPEG/PNG/BMP/GIF via `javax.imageio`, and ANIMATED GIF as a
 * frame-addressable video container (composited delta frames, disposal
 * methods). True video codecs (MP4/WebM/...) fall back to the deterministic
 * [[StubCodec]] — this container has no codec libraries; a real deployment
 * adds cases to `MediaCodec.decode` and nothing in the dataflow changes.
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
    * table: kind derived from the ref hash (images/audio/video mix). Image,
    * audio and 3-in-4 video payloads are REAL encoded files (P6 PPM / PCM
    * WAV / animated GIF — parsed back by [[MediaCodec]]); the remaining
    * videos are opaque bytes (the undecodable-container stub path).
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
            // 3-in-4 videos are REAL animated GIFs (deterministic moving
            // gray gradient — parsed back frame-by-frame by MediaCodec);
            // the rest stay opaque container bytes, keeping the documented
            // undecodable-codec stub path exercised
            if (rng.nextInt(4) == 0) StubCodec.fakeBytes(ref, 256 + rng.nextInt(2048))
            else {
              val w = 16 + rng.nextInt(17); val h = 16 + rng.nextInt(17)
              val nFrames = 3 + rng.nextInt(4)
              val seed = rng.nextInt(1 << 30)
              // per-ref random BLOCK pattern on the dHash cell grid: a
              // uniform gradient/brightness ramp would make every same-dim
              // video perceptually identical (dHash is invariant to exactly
              // those), silently welding all synthetic videos into one
              // near-dup cluster
              def cellVal(cx: Int, cy: Int, f: Int): Int = {
                var x = seed + cx * 31 + cy * 131 + f * 7919
                x = (x ^ (x >>> 16)) * 0x85EBCA6B
                x = (x ^ (x >>> 13)) * 0xC2B2AE35
                (x ^ (x >>> 16)) & 0xFF
              }
              val frames = (0 until nFrames).map { f =>
                val gray = Array.tabulate(w * h) { p =>
                  cellVal((p % w) * 9 / w, (p / w) * 8 / h, f).toByte
                }
                MediaCodec.GifFrame(0, 0, w, h, gray)
              }
              MediaCodec.encodeGifAnim(w, h, frames)
            }
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
  def imageNearDupPairsFromHashes(hashes: DataFrame, maxHamming: Int = 6): DataFrame =
    nearDupPairsFromHashes(hashes, maxHamming)

  /** Modality-generic core of the banded near-dup join: `hashes` is any
    * `(media_ref, <hashCol>: long)` table — perceptual dHash for images,
    * energy-envelope aHash for audio. One 64-bit hash family per call;
    * hashes from different modalities must never cross-match, so callers
    * run one modality at a time (refs are disjoint across modalities — a
    * ref is one payload of one kind). */
  def nearDupPairsFromHashes(hashes: DataFrame, maxHamming: Int = 6,
                             hashCol: String = "dhash"): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming out of range: $maxHamming")
    val h = if (hashCol == "dhash") hashes else hashes.withColumnRenamed(hashCol, "dhash")
    // EXACT-hash collapse before pair enumeration (the same discipline as
    // the text path's dedupExact pre-step): k byte-identical logos would
    // otherwise put k refs in every band bucket and emit k²/2 pairs. Each
    // distinct hash is represented by its min ref; `n_refs` carries the
    // collapsed duplicate mass.
    val groups = h.groupBy(col("dhash"))
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
  def imageCanonMap(blobs: Dataset[MediaBlob], maxHamming: Int = 6): DataFrame =
    canonMapFromHashes(imageHashTable(blobs).localCheckpoint(), maxHamming)

  /** Modality-generic canonical-rewrite core shared by [[imageCanonMap]] and
    * [[audioCanonMap]]: exact-hash collapse, banded near-dup graph,
    * component-min canon. Callers pass ONE modality's `(media_ref, dhash)`
    * table (checkpointed when the decode pass is worth running once). */
  def canonMapFromHashes(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val groups = imageExactDupGroupsFromHashes(hashes)
    val nearPairs = nearDupPairsFromHashes(hashes, maxHamming)
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

  // ---- audio modality (energy-envelope aHash over the real WAV decode) ----

  /** Decode-once aHash table `(media_ref, ahash)` — rows only for blobs
    * that decode as PCM WAV (the audio sibling of [[imageHashTable]]). */
  def audioHashTable(blobs: Dataset[MediaBlob]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap(b =>
        MediaCodec.aHash64(b).map(h => (b.media_ref, h))))
      .toDF("media_ref", "ahash")
  }

  /** Audio near-duplicate pairs: gain-scaled or resampled copies of the
    * same recording land within Hamming distance d of each other's 64-bit
    * energy-envelope hash; same banding/verify discipline as
    * [[imageNearDupPairs]]. Output `(ref_a, ref_b, n_refs_a, n_refs_b,
    * hamming)`, ref_a < ref_b. */
  def audioNearDupPairs(blobs: Dataset[MediaBlob], maxHamming: Int = 8): DataFrame =
    nearDupPairsFromHashes(audioHashTable(blobs), maxHamming, "ahash")

  /** [[imageCanonMap]] for the audio modality. */
  def audioCanonMap(blobs: Dataset[MediaBlob], maxHamming: Int = 8): DataFrame =
    canonMapFromHashes(
      audioHashTable(blobs).withColumnRenamed("ahash", "dhash").localCheckpoint(),
      maxHamming)

  // ---- video modality (composited per-frame dHash over animated GIF) ----

  /** Sampled composited frame hashes `(media_ref, n_frames_sampled,
    * frame_slot, fhash)` — rows only for blobs that decode as GIF (the one
    * video-like container the JDK decodes; MP4/WebM stay on the documented
    * stub path until a codec library is added — nothing downstream
    * changes). Each payload decodes ONCE into at most `maxFrames` hashes. */
  def videoFrameHashTable(blobs: Dataset[MediaBlob], maxFrames: Int = 8): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { b =>
        MediaCodec.gifFrameDHashes(b, maxFrames).iterator.flatMap(hs =>
          hs.iterator.zipWithIndex.map { case (h, slot) => (b.media_ref, hs.length, slot, h) })
      })
      .toDF("media_ref", "n_frames_sampled", "frame_slot", "fhash")
  }

  /**
   * Video near-duplicate pairs: two videos are near-dups when at least
   * `minMatchFrac` of the smaller one's DISTINCT sampled-frame hashes match
   * a frame of the other within Hamming `maxHamming` — re-encoded or
   * brightness-shifted copies of the same clip share (nearly) every frame
   * fingerprint, unrelated clips share none. Static scenes collapse to one
   * distinct hash per video BEFORE the banded join (a 1000-frame still
   * video is one row, not 1000), so candidate volume is bounded by visual
   * variety, not duration. Output `(ref_a, ref_b, matched_frames,
   * match_frac)`, ref_a < ref_b.
   *
   * Scale shape: payloads decode once to ≤ maxFrames (ref, 8-byte hash)
   * rows; the banded join carries (band, key, ref, hash); `match_frac`
   * joins the per-video distinct-hash counts onto the MATCHED pairs only —
   * the counts table is corpus-sized (one row per video), so the join is
   * left unhinted and AQE broadcasts whichever side is actually small.
   */
  def videoNearDupPairs(blobs: Dataset[MediaBlob], maxHamming: Int = 6,
                        minMatchFrac: Double = 0.8, maxFrames: Int = 8): DataFrame = {
    require(minMatchFrac > 0.0 && minMatchFrac <= 1.0,
      s"minMatchFrac out of range: $minMatchFrac")
    videoNearDupPairsFromFrames(videoFrameHashTable(blobs, maxFrames),
      maxHamming, minMatchFrac)
  }

  /** [[videoNearDupPairs]] over a precomputed [[videoFrameHashTable]]. */
  def videoNearDupPairsFromFrames(frames: DataFrame, maxHamming: Int,
                                  minMatchFrac: Double): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming out of range: $maxHamming")
    val distinctHashes = frames.select(col("media_ref"), col("fhash")).distinct()
    val counts = distinctHashes.groupBy(col("media_ref"))
      .agg(count(lit(1)).as("n_hashes"))
    val nBands = maxHamming + 1
    val bandCols = (0 until nBands).map { i =>
      val lo = i * 64 / nBands
      val w = (i + 1) * 64 / nBands - lo
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      shiftrightunsigned(col("fhash"), lo).bitwiseAND(lit(mask))
    }
    val banded = distinctHashes.select(col("media_ref"), col("fhash"),
      posexplode(array(bandCols: _*)).as(Seq("band", "key")))
    val a = banded.select(col("band"), col("key"),
      col("media_ref").as("ref_a"), col("fhash").as("ha"))
    val bb = banded.select(col("band"), col("key"),
      col("media_ref").as("ref_b"), col("fhash").as("hb"))
    val matched = a.join(bb, Seq("band", "key"))
      .where(col("ref_a") < col("ref_b"))
      .select(col("ref_a"), col("ref_b"), col("ha"), col("hb"))
      .distinct()
      .where(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxHamming)
      // one match credit per frame hash of the SMALLER set: count a's
      // matched hashes (a frame matching several partner frames is still
      // one shared frame)
      .groupBy(col("ref_a"), col("ref_b"))
      .agg(countDistinct(col("ha")).as("matched_a"), countDistinct(col("hb")).as("matched_b"))
    matched
      .join(counts.withColumnRenamed("media_ref", "ref_a")
        .withColumnRenamed("n_hashes", "n_a"), Seq("ref_a"))
      .join(counts.withColumnRenamed("media_ref", "ref_b")
        .withColumnRenamed("n_hashes", "n_b"), Seq("ref_b"))
      .select(col("ref_a"), col("ref_b"),
        // "fraction of the smaller set's distinct hashes that match": credit
        // the matched count of the side whose set IS smaller — several small-
        // side hashes may all match one big-side hash (least(matched_a,
        // matched_b) would read 2-of-2 matched as 0.5 and miss a true dup).
        when(col("n_a") <= col("n_b"), col("matched_a"))
          .otherwise(col("matched_b")).as("matched_frames"),
        (when(col("n_a") <= col("n_b"), col("matched_a"))
          .otherwise(col("matched_b")).cast("double") /
          least(col("n_a"), col("n_b"))).as("match_frac"))
      .where(col("match_frac") >= minMatchFrac)
  }

  /** [[imageCanonMap]] for the video modality: near-dup videos (frame-hash
    * overlap ≥ `minMatchFrac` at Hamming ≤ `maxHamming`) collapse to the
    * component-min ref; byte-identical re-uploads share every frame hash,
    * so they fall out of the same graph (match_frac 1.0). */
  def videoCanonMap(blobs: Dataset[MediaBlob], maxHamming: Int = 6,
                    minMatchFrac: Double = 0.8, maxFrames: Int = 8): DataFrame = {
    val frames = videoFrameHashTable(blobs, maxFrames).localCheckpoint()
    val pairs = videoNearDupPairsFromFrames(frames, maxHamming, minMatchFrac)
      .select(col("ref_a"), col("ref_b"))
    graft.dedup.ConnectedComponents.run(pairs, "ref_a", "ref_b")
      .select(col("id").as("media_ref"), col("component").as("canon_ref"))
      .where(col("media_ref") =!= col("canon_ref"))
  }

  /** Cross-modality canonical map: the union of the per-modality maps the
    * caller selects — refs are disjoint across modalities (one ref = one
    * payload of one kind), so the union is conflict-free. The production
    * entry behind `--media-dedup dhash:6+ahash:4+vhash:6`. */
  def mediaCanonMap(blobs: Dataset[MediaBlob],
                    imageHamming: Option[Int] = Some(6),
                    audioHamming: Option[Int] = None,
                    videoHamming: Option[Int] = None,
                    videoMinMatchFrac: Double = 0.8): DataFrame = {
    val parts = Seq(
      imageHamming.map(d => imageCanonMap(blobs, d)),
      audioHamming.map(d => audioCanonMap(blobs, d)),
      videoHamming.map(d => videoCanonMap(blobs, d, videoMinMatchFrac))).flatten
    require(parts.nonEmpty, "mediaCanonMap: select at least one modality")
    parts.reduce(_ unionByName _)
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
