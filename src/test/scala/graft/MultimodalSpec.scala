package graft

import org.apache.spark.sql.functions._
import graft.gen.DocGen
import graft.multimodal.{MediaCodec, Multimodal}

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
      if (f.media_kind == "image") assert(f.n_frames == 1 && f.width >= 8 && f.height >= 8)
      if (f.media_kind == "audio") assert(f.width == 16000 && f.height == 1) // sample rate / channels
      if (f.media_kind == "video") assert(f.n_frames >= 1)
    }
    val again = Multimodal.extractFeatures(media, batchSize = 64).collect()
    assert(rows.map(f => (f.media_ref, f.features.toSeq)).sortBy(_._1)
      .sameElements(again.map(f => (f.media_ref, f.features.toSeq)).sortBy(_._1)),
      "decode must not depend on batch size or partitioning")
    media.unpersist()
  }

  test("PPM codec: encode → decode round-trips dimensions and channel means") {
    import graft.multimodal.{MediaCodec, Multimodal => M}
    // solid red 10×4 image
    val rgb = Array.tabulate(10 * 4 * 3)(i => if (i % 3 == 0) 255.toByte else 0.toByte)
    val bytes = MediaCodec.encodePpm(10, 4, rgb)
    val f = MediaCodec.decode(M.MediaBlob("r1", "image", bytes, bytes.length))
    assert(f.width == 10 && f.height == 4 && f.n_frames == 1 && f.media_kind == "image")
    assert(f.features(0) == 1.0f && f.features(1) == 0.0f && f.features(2) == 0.0f)
    assert(math.abs(f.features(3) - 0.299f) < 1e-3) // luminance of pure red
    assert(math.abs(f.features(12) - 2.5f) < 1e-6)  // aspect ratio
    // header comments are skipped
    val withComment = ("P6\n# a comment\n10 4\n255\n".getBytes("US-ASCII") ++ rgb)
    val g = MediaCodec.decode(M.MediaBlob("r2", "image", withComment, withComment.length))
    assert(g.width == 10 && g.height == 4 && g.features(0) == 1.0f)
  }

  test("WAV codec: encode → decode round-trips rate, channels, duration, RMS") {
    import graft.multimodal.{MediaCodec, Multimodal => M}
    val samples = Array.fill(2048)(16384.toShort) // constant 0.5 amplitude
    val bytes = MediaCodec.encodeWav(16000, samples)
    val f = MediaCodec.decode(M.MediaBlob("a1", "audio", bytes, bytes.length))
    assert(f.media_kind == "audio" && f.width == 16000 && f.height == 1)
    assert(f.n_frames == 2) // 2048 samples / 1024-sample windows
    assert(math.abs(f.features(0) - 0.5f) < 1e-3) // RMS
    assert(math.abs(f.features(1) - 0.5f) < 1e-3) // mean
    assert(f.features(2) == 0.0f)                 // no zero crossings
    assert(math.abs(f.features(7) - 0.128f) < 1e-3) // duration sec
  }

  test("stereo WAV: duration, windows and ZCR are in frame time, not interleaved-sample time") {
    import graft.multimodal.{MediaCodec, Multimodal => M}
    val mono = Array.fill(2048)(16384.toShort)
    // hand-build a stereo file: same signal duplicated L/R (4096 interleaved samples)
    val stereoBytes = {
      val b = MediaCodec.encodeWav(16000, Array.fill(4096)(16384.toShort))
      b(22) = 2 // numChannels = 2
      b
    }
    val monoF = MediaCodec.decode(M.MediaBlob("m", "audio", MediaCodec.encodeWav(16000, mono), 0))
    val stF = MediaCodec.decode(M.MediaBlob("s", "audio", stereoBytes, 0))
    assert(stF.height == 2 && monoF.height == 1)
    assert(stF.n_frames == monoF.n_frames)               // 2048 frames each
    assert(stF.features(7) == monoF.features(7))         // same duration
    assert(math.abs(stF.features(0) - 0.5f) < 1e-3)      // channel-0 RMS
  }

  test("PNG/JPEG/BMP via javax.imageio: decode matches the PPM feature semantics") {
    import graft.multimodal.{MediaCodec, Multimodal => M}
    // deterministic 12×8 gradient image, built pixel-identically as PPM and PNG
    val (w, h) = (12, 8)
    val rgb = new Array[Byte](w * h * 3)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / (w - 1); val g = (y * 255) / (h - 1); val b = 128
      val o = (y * w + x) * 3
      rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    def pngBytes(fmt: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bo)
      bo.toByteArray
    }
    val fromPpm = {
      val b = MediaCodec.encodePpm(w, h, rgb)
      MediaCodec.decode(M.MediaBlob("ppm", "image", b, b.length))
    }
    // PNG and BMP are lossless: identical pixels → identical features
    for (fmt <- Seq("png", "bmp")) {
      val b = pngBytes(fmt)
      val f = MediaCodec.decode(M.MediaBlob(fmt, "image", b, b.length))
      assert(f.media_kind == "image" && f.width == w && f.height == h && f.n_frames == 1, fmt)
      (0 until 13).foreach(i =>
        assert(math.abs(f.features(i) - fromPpm.features(i)) < 1e-6f, s"$fmt feat $i"))
    }
    // JPEG is lossy: dims exact, channel means close
    val jb = pngBytes("jpg")
    val jf = MediaCodec.decode(M.MediaBlob("jpg", "image", jb, jb.length))
    assert(jf.width == w && jf.height == h)
    (0 until 4).foreach(i =>
      assert(math.abs(jf.features(i) - fromPpm.features(i)) < 0.05f, s"jpg feat $i"))
    // decode is deterministic in the payload bytes
    val again = MediaCodec.decode(M.MediaBlob("png", "image", pngBytes("png"), 0))
    val first = MediaCodec.decode(M.MediaBlob("png", "image", pngBytes("png"), 0))
    assert(again.features.toSeq == first.features.toSeq)
  }

  test("imageio hostile payloads: garbage after magic and oversized dims fall back") {
    import graft.multimodal.{MediaCodec, Multimodal => M}
    def key(f: M.MediaFeatures) =
      (f.media_ref, f.media_kind, f.width, f.height, f.n_frames, f.features.toSeq)
    // valid PNG magic, garbage body → ImageIO throws → stub fallback
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      Array.tabulate(64)(i => (i * 13).toByte)
    val b1 = M.MediaBlob("hp1", "image", fakePng, fakePng.length)
    assert(key(MediaCodec.decode(b1)) == key(M.StubCodec.decode(b1)))
    // JPEG magic, truncated body → fallback
    val fakeJpg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
    val b2 = M.MediaBlob("hp2", "image", fakeJpg, fakeJpg.length)
    assert(key(MediaCodec.decode(b2)) == key(M.StubCodec.decode(b2)))
    // a BMP header declaring a canvas past the 64 Mpx cap must be rejected
    // BEFORE pixel decode (tiny payload, multi-GB declared buffer)
    val bigBmp = {
      val bo = new java.io.ByteArrayOutputStream()
      val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      javax.imageio.ImageIO.write(img, "bmp", bo)
      val b = bo.toByteArray
      // BITMAPINFOHEADER width/height at offsets 18/22 (LE): declare 65536×65536
      b(18) = 0; b(19) = 0; b(20) = 1; b(21) = 0
      b(22) = 0; b(23) = 0; b(24) = 1; b(25) = 0
      b
    }
    val b3 = M.MediaBlob("hp3", "image", bigBmp, bigBmp.length)
    assert(key(MediaCodec.decode(b3)) == key(M.StubCodec.decode(b3)))
  }

  test("unknown/corrupt payloads fall back to the stub codec") {
    import graft.multimodal.{MediaCodec, Multimodal => M}
    def key(f: M.MediaFeatures) =
      (f.media_ref, f.media_kind, f.width, f.height, f.n_frames, f.features.toSeq)
    val junk = Array.tabulate(300)(i => (i * 7).toByte)
    val blob = M.MediaBlob("x1", "image", junk, junk.length)
    assert(key(MediaCodec.decode(blob)) == key(M.StubCodec.decode(blob)))
    // a PPM magic with a truncated body must not throw — stub fallback
    val truncated = "P6\n100 100\n255\n".getBytes("US-ASCII")
    val blob2 = M.MediaBlob("x2", "image", truncated, truncated.length)
    assert(key(MediaCodec.decode(blob2)) == key(M.StubCodec.decode(blob2)))
    // crafted dims whose w*h*3 overflows Int must not pass the length check
    val overflow = ("P6\n100000 100000\n255\n" + "x" * 64).getBytes("US-ASCII")
    val blob3 = M.MediaBlob("x3", "image", overflow, overflow.length)
    assert(key(MediaCodec.decode(blob3)) == key(M.StubCodec.decode(blob3)))
    // a negative RIFF chunk size must neither loop nor underflow
    val badWav = MediaCodec.encodeWav(16000, Array.fill(64)(1.toShort))
    badWav(16 + 0) = 0xFF.toByte; badWav(17) = 0xFF.toByte
    badWav(18) = 0xFF.toByte; badWav(19) = 0xFF.toByte // fmt size = -1
    val blob4 = M.MediaBlob("x4", "audio", badWav, badWav.length)
    assert(key(MediaCodec.decode(blob4)) == key(M.StubCodec.decode(blob4)))
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

  test("image near-dup: dHash survives resize and brightness shift, not reversal") {
    import graft.multimodal.Multimodal.MediaBlob
    def lumPpm(w: Int, h: Int)(lum: (Int, Int) => Int): Array[Byte] = {
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = math.min(255, lum(x, y)).toByte
        val o = (y * w + x) * 3
        rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
      }
      MediaCodec.encodePpm(w, h, rgb)
    }
    def gradient(w: Int, h: Int, reverse: Boolean, shift: Int) =
      lumPpm(w, h)((x, _) => (if (reverse) (w - 1 - x) else x) * 255 / (w - 1) + shift)
    // 9×8-grid-aligned checkerboard: NON-monotone content whose hash has
    // mixed bits — catches grid/axis regressions a monotone gradient (hash
    // 0L) cannot (defined in grid coordinates, so resize-invariant)
    def checker(w: Int, h: Int) =
      lumPpm(w, h)((x, y) => if ((x * 9 / w + y * 8 / h) % 2 == 0) 220 else 30)
    def blob(ref: String, bytes: Array[Byte]) = MediaBlob(ref, "image", bytes, bytes.length)

    val base = blob("img_base", gradient(36, 24, reverse = false, 0))
    val resized = blob("img_resized", gradient(18, 16, reverse = false, 0))
    val brighter = blob("img_bright", gradient(36, 24, reverse = false, 30))
    val reversed = blob("img_rev", gradient(36, 24, reverse = true, 0))
    // one bright patch confined to grid cell (0,0): flips exactly the bit
    // comparing cell(0,0) to cell(1,0) — hamming 1 from base
    val nearBase = blob("img_near", lumPpm(36, 24)((x, y) =>
      if (x < 4 && y < 3) 255 else x * 255 / 35))
    val wav = blob("aud_1", MediaCodec.encodeWav(8000, Array.fill(100)(0.toShort)))
    val corrupt = blob("img_bad", "P6\nxyz".getBytes("US-ASCII"))

    // kernel-level invariances
    val hBase = MediaCodec.dHash64(base).get
    assert(MediaCodec.dHash64(resized).get == hBase)
    assert(MediaCodec.dHash64(brighter).get == hBase)
    assert(java.lang.Long.bitCount(MediaCodec.dHash64(reversed).get ^ hBase) > 32)
    assert(java.lang.Long.bitCount(MediaCodec.dHash64(nearBase).get ^ hBase) == 1)
    val hCheck = MediaCodec.dHash64(blob("c1", checker(36, 24))).get
    assert(hCheck != 0L && hCheck != -1L, "checkerboard must have mixed bits")
    assert(MediaCodec.dHash64(blob("c2", checker(72, 48))).get == hCheck)
    assert(MediaCodec.dHash64(wav).isEmpty, "audio has no perceptual image hash")
    assert(MediaCodec.dHash64(corrupt).isEmpty, "a malformed PPM must not throw")

    // operator-level: identical hashes collapse to a representative group
    // (no quadratic pair expansion); near-but-distinct hashes pair up
    val blobs = spark.createDataset(Seq(base, resized, brighter, reversed, nearBase, wav, corrupt))
    val groups = graft.multimodal.Multimodal.imageExactDupGroups(blobs)
      .as[(Long, String, Long, Seq[String])].collect().map(g => g._2 -> g).toMap
    assert(groups("img_base")._3 == 3L &&
      groups("img_base")._4 == Seq("img_base", "img_bright", "img_resized"))
    val pairs = graft.multimodal.Multimodal.imageNearDupPairs(blobs, maxHamming = 6)
      .as[(String, String, Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set(("img_base", "img_near")), pairs.toSeq.toString)
    val p = pairs.head
    assert(p._3 == 3L && p._4 == 1L && p._5 == 1L,
      s"pair must carry collapsed duplicate mass and hamming: $p")
  }

  test("imageCanonMap: exact + transitive near-dup chain collapse to component min") {
    import graft.multimodal.Multimodal.MediaBlob
    // gradient with bright patches confined to grid cells (0, y) for y in s:
    // each patch flips exactly the bit comparing cell(0,y) to cell(1,y), so
    // dHash(imgP(s)) is at Hamming |s| from the plain gradient (rows are
    // independent — patches in different rows cannot interact)
    def imgP(s: Set[Int]): Array[Byte] = {
      val (w, h) = (36, 24) // 4px × 3px grid cells on the 9×8 dHash grid
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (if (x < 4 && s.contains(y / 3)) 255 else x * 255 / 35).toByte
        val o = (y * w + x) * 3
        rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
      }
      MediaCodec.encodePpm(w, h, rgb)
    }
    def blob(ref: String, bytes: Array[Byte]) = MediaBlob(ref, "image", bytes, bytes.length)
    // chain: a≈b (Hamming 4), b≈c (4), but a–c is 8 > maxHamming 6 — only
    // transitive clustering collapses all three; d is a byte-resized copy
    // of b (identical hash) joining through the exact-collapse step
    val blobs = spark.createDataset(Seq(
      blob("a_base", imgP(Set.empty)),
      blob("b_mid", imgP(Set(0, 1, 2, 3))),
      blob("c_far", imgP(Set(0, 1, 2, 3, 4, 5, 6, 7))),
      blob("d_copy_of_b", imgP(Set(0, 1, 2, 3))), {
        val wav = MediaCodec.encodeWav(8000, Array.fill(64)(0.toShort))
        MediaBlob("e_audio", "audio", wav, wav.length) // no image hash → absent
      }))
    val m = Multimodal.imageCanonMap(blobs, maxHamming = 6)
      .as[(String, String)].collect().toMap
    assert(m == Map("b_mid" -> "a_base", "c_far" -> "a_base", "d_copy_of_b" -> "a_base"),
      m.toString)
  }

  // deterministic amplitude-modulated tone with a WINDOW-CONSTANT pseudo-
  // random envelope: gradients between the hash's 65 windows are decisive
  // (envelope levels are well-separated 16-bit hashes, not near-ties), and
  // the envelope is asymmetric under time reversal (a |sin| envelope is
  // palindromic — reversal would barely move the hash)
  private def amTone(n: Int, phase: Int = 0): Array[Short] =
    Array.tabulate(n) { i =>
      val w = (i.toLong * 65 / n).toInt
      var x = w + phase + 0x9E3779B9 // murmur3 finalizer: decorrelate windows
      x = (x ^ (x >>> 16)) * 0x85EBCA6B
      x = (x ^ (x >>> 13)) * 0xC2B2AE35
      x = x ^ (x >>> 16)
      val env = 0.2 + 0.8 * ((x & 0xFFFF) / 65535.0)
      (env * 12000 * math.sin(i * 0.3)).toShort
    }

  test("audio near-dup: aHash survives gain and resampling, not reversal") {
    import graft.multimodal.Multimodal.MediaBlob
    def wavBlob(ref: String, samples: Array[Short], rate: Int = 16000) = {
      val b = MediaCodec.encodeWav(rate, samples)
      MediaBlob(ref, "audio", b, b.length)
    }
    val base = amTone(8000)
    val hBase = MediaCodec.aHash64(wavBlob("a", base)).get
    assert(hBase != 0L && hBase != -1L, "envelope hash must have mixed bits")
    // uniform gain: every window energy scales by the same factor
    val half = base.map(s => (s / 2).toShort)
    assert(MediaCodec.aHash64(wavBlob("b", half)).get == hBase, "gain invariance")
    // naive 2x downsample at half the rate: same duration, same envelope —
    // near-tie windows at envelope peaks may flip a bit or two, so the
    // contract is "within the near-dup threshold", not bit-identity
    val down = Array.tabulate(base.length / 2)(i => base(i * 2))
    val hDown = MediaCodec.aHash64(wavBlob("c", down, 8000)).get
    assert(java.lang.Long.bitCount(hDown ^ hBase) <= 8,
      s"resample near-invariance: hamming ${java.lang.Long.bitCount(hDown ^ hBase)}")
    // reversal flips the envelope: far in Hamming space
    val rev = base.reverse
    assert(java.lang.Long.bitCount(MediaCodec.aHash64(wavBlob("d", rev)).get ^ hBase) > 16)
    // out-of-scope payloads: images, sub-65-frame clips, corrupt WAVs
    val ppm = MediaCodec.encodePpm(4, 4, Array.fill(48)(7.toByte))
    assert(MediaCodec.aHash64(MediaBlob("e", "image", ppm, ppm.length)).isEmpty)
    assert(MediaCodec.aHash64(wavBlob("f", Array.fill(64)(100.toShort))).isEmpty)
    val corrupt = "RIFFxxxxWAVE".getBytes("US-ASCII")
    assert(MediaCodec.aHash64(MediaBlob("g", "audio", corrupt, corrupt.length)).isEmpty)

    // operator level: the gain-scaled copy is hash-IDENTICAL to base, so it
    // collapses in the exact-group step (no pair row — the image-path
    // discipline); the resampled copy is near-but-distinct and pairs up;
    // the unrelated tone (different envelope phase) matches nothing
    val other = wavBlob("z_other", amTone(8000, phase = 2700))
    val blobs = spark.createDataset(Seq(
      wavBlob("a", base), wavBlob("b", half), wavBlob("c", down, 8000), other))
    val pairs = Multimodal.audioNearDupPairs(blobs, maxHamming = 8)
      .select($"ref_a", $"ref_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "c")), pairs.toString)
    val canon = Multimodal.audioCanonMap(blobs, maxHamming = 8)
      .as[(String, String)].collect().toMap
    assert(canon == Map("b" -> "a", "c" -> "a"), canon.toString)
  }

  test("animated GIF: composited frame hashes, offsets, disposal, single-frame = dHash") {
    import graft.multimodal.Multimodal.MediaBlob
    val (w, h) = (36, 24)
    def gradient(shift: Int): Array[Byte] =
      Array.tabulate(w * h)(p => math.min(255, (p % w) * 255 / (w - 1) + shift).toByte)
    def gradWithPatch: Array[Byte] = {
      val g = gradient(0)
      for (y <- 0 until 3; x <- 0 until 4) g(y * w + x) = 255.toByte
      g
    }
    // single-frame GIF hash == the still-image dHash of the same pixels
    val still = MediaCodec.encodeGifAnim(w, h,
      Seq(MediaCodec.GifFrame(0, 0, w, h, gradient(0))))
    val stillBlob = MediaBlob("v0", "video", still, still.length)
    assert(MediaCodec.gifFrameDHashes(stillBlob).get.toSeq ==
      Seq(MediaCodec.dHash64(stillBlob).get))

    // delta frame: a 4x3 patch at (0,0) drawn over the gradient must hash
    // exactly like a full frame carrying the same composite (Hamming 1 from
    // the plain gradient — the img_near construction)
    val delta = MediaCodec.encodeGifAnim(w, h, Seq(
      MediaCodec.GifFrame(0, 0, w, h, gradient(0)),
      MediaCodec.GifFrame(0, 0, 4, 3, Array.fill(12)(255.toByte))))
    val deltaHashes = MediaCodec.gifFrameDHashes(
      MediaBlob("v1", "video", delta, delta.length)).get
    val fullComposite = MediaCodec.encodeGifAnim(w, h, Seq(
      MediaCodec.GifFrame(0, 0, w, h, gradient(0)),
      MediaCodec.GifFrame(0, 0, w, h, gradWithPatch)))
    val fullHashes = MediaCodec.gifFrameDHashes(
      MediaBlob("v2", "video", fullComposite, fullComposite.length)).get
    assert(deltaHashes.toSeq == fullHashes.toSeq, "delta patch must composite")
    assert(java.lang.Long.bitCount(deltaHashes(0) ^ deltaHashes(1)) == 1)

    // restoreToBackgroundColor: the patch rect is cleared after display, so
    // frame 2's composite shows the black rect, not the patch or gradient
    val disposed = MediaCodec.encodeGifAnim(w, h, Seq(
      MediaCodec.GifFrame(0, 0, w, h, gradient(0)),
      MediaCodec.GifFrame(0, 0, 4, 3, Array.fill(12)(255.toByte),
        disposal = "restoreToBackgroundColor"),
      MediaCodec.GifFrame(0, 0, 1, 1, Array(0.toByte)))) // no-op inside the cleared rect
    val dh = MediaCodec.gifFrameDHashes(
      MediaBlob("v3", "video", disposed, disposed.length)).get
    val blackRect = {
      val g = gradient(0)
      for (y <- 0 until 3; x <- 0 until 4) g(y * w + x) = 0.toByte
      val b = MediaCodec.encodeGifAnim(w, h, Seq(MediaCodec.GifFrame(0, 0, w, h, g)))
      MediaCodec.gifFrameDHashes(MediaBlob("v4", "video", b, b.length)).get.head
    }
    assert(dh(2) == blackRect, "disposal must clear the patch rect")

    // non-GIF and corrupt payloads return None, never throw
    val ppm = MediaCodec.encodePpm(4, 4, Array.fill(48)(7.toByte))
    assert(MediaCodec.gifFrameDHashes(MediaBlob("x", "image", ppm, ppm.length)).isEmpty)
    val junk = "GIF8junkjunkjunk".getBytes("US-ASCII")
    assert(MediaCodec.gifFrameDHashes(MediaBlob("y", "video", junk, junk.length)).isEmpty)
    // decode() classifies animated GIFs as video with the real frame count
    val f = MediaCodec.decode(MediaBlob("v1", "video", delta, delta.length))
    assert(f.media_kind == "video" && f.n_frames == 2, f.toString)
    val f1 = MediaCodec.decode(MediaBlob("v0", "image", still, still.length))
    assert(f1.media_kind == "image" && f1.n_frames == 1, f1.toString)
  }

  test("video near-dup: brightness-shifted copy collapses, unrelated clip does not") {
    import graft.multimodal.Multimodal.MediaBlob
    val (w, h) = (36, 24)
    def clip(ref: String, shift: Int, checker: Boolean): MediaBlob = {
      val frames = (0 until 4).map { f =>
        val gray = Array.tabulate(w * h) { p =>
          val (x, y) = (p % w, p / w)
          val v = if (checker) (if ((x * 9 / w + y * 8 / h + f) % 2 == 0) 220 else 30)
                  else ((x + f * 9) % w) * 255 / (w - 1) + shift
          math.min(255, v).toByte
        }
        MediaCodec.GifFrame(0, 0, w, h, gray)
      }
      val b = MediaCodec.encodeGifAnim(w, h, frames)
      MediaBlob(ref, "video", b, b.length)
    }
    val a = clip("vid_a", 0, checker = false)
    val b = clip("vid_b", 25, checker = false) // brightness-shifted copy
    val c = clip("vid_c", 0, checker = true)   // unrelated
    val blobs = spark.createDataset(Seq(a, b, c))
    val pairs = Multimodal.videoNearDupPairs(blobs, maxHamming = 6)
      .as[(String, String, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set(("vid_a", "vid_b")), pairs.toSeq.toString)
    assert(pairs.head._4 == 1.0, s"full frame-set overlap expected: ${pairs.head}")
    val canon = Multimodal.videoCanonMap(blobs, maxHamming = 6)
      .as[(String, String)].collect().toMap
    assert(canon == Map("vid_b" -> "vid_a"), canon.toString)
  }

  test("mediaCanonMap: per-modality maps union conflict-free") {
    import graft.multimodal.Multimodal.MediaBlob
    def gray(shift: Int) = {
      val rgb = Array.tabulate(36 * 24 * 3) { o =>
        math.min(255, ((o / 3) % 36) * 255 / 35 + shift).toByte
      }
      MediaCodec.encodePpm(36, 24, rgb)
    }
    val i1 = gray(0); val i2 = gray(30)
    val w1 = MediaCodec.encodeWav(16000, amTone(8000))
    val w2 = MediaCodec.encodeWav(16000, amTone(8000).map(s => (s / 2).toShort))
    val g = Array.tabulate(36 * 24)(p => ((p % 36) * 255 / 35).toByte)
    val v1 = MediaCodec.encodeGifAnim(36, 24,
      (0 until 3).map(f => MediaCodec.GifFrame(0, 0, 36, 24, g.map(b => (b + f).toByte))))
    val blobs = spark.createDataset(Seq(
      MediaBlob("img_1", "image", i1, i1.length), MediaBlob("img_2", "image", i2, i2.length),
      MediaBlob("aud_1", "audio", w1, w1.length), MediaBlob("aud_2", "audio", w2, w2.length),
      MediaBlob("vid_1", "video", v1, v1.length), MediaBlob("vid_2", "video", v1, v1.length)))
    val m = Multimodal.mediaCanonMap(blobs, imageHamming = Some(6),
      audioHamming = Some(4), videoHamming = Some(6))
      .as[(String, String)].collect().toMap
    assert(m == Map("img_2" -> "img_1", "aud_2" -> "aud_1", "vid_2" -> "vid_1"), m.toString)
  }
}
