package graft.multimodal

import graft.multimodal.Multimodal.{FeatureDim, MediaBlob, MediaFeatures}

/**
 * From-scratch decoders for container-free media formats — pure byte
 * parsing, no external libraries:
 *
 *  - **P6 PPM** (binary portable pixmap): header `P6 <w> <h> <maxval>` with
 *    `#` comments, then w·h·3 raw RGB bytes. Features: per-channel means,
 *    mean luminance, an 8-bin luminance histogram, aspect ratio.
 *  - **RIFF/PCM WAV**: chunk walk to `fmt ` (PCM, 16-bit) and `data`.
 *    Features: RMS amplitude, mean, zero-crossing rate, per-quarter energy.
 *    `width`/`height` carry sample rate / channel count; `n_frames` =
 *    1024-sample windows.
 *  - **JPEG / PNG / GIF / BMP** via JDK-built-in `javax.imageio` (no
 *    external libraries): magic-sniffed, decoded to the same image feature
 *    vector as PPM. Hostile-dims guard: the header's width×height is read
 *    BEFORE pixel decode and payloads past 64 Mpx are rejected (a 1-KB PNG
 *    can declare a 4-GB canvas; the cap bounds per-task memory). Pixels are
 *    sampled on a deterministic stride grid (≤ ~262k samples) so features
 *    cost O(1) regardless of image size.
 *
 * [[decode]] sniffs magic bytes and falls back to [[Multimodal.StubCodec]]
 * for anything else (video containers need real codec libraries). Every
 * path is deterministic in the payload bytes — re-runs and resumes agree.
 */
object MediaCodec extends Serializable {

  def isPpm(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'P' && b(1) == '6' && Character.isWhitespace(b(2))

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF

  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A

  def isGif(b: Array[Byte]): Boolean =
    b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  def isBmp(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'B' && b(1) == 'M'

  /** Magic-sniffing decode; unknown/corrupt payloads fall back to the stub.
    * ANY parse failure falls back — at web scale malformed payloads are
    * routine and must never kill a task. */
  def decode(blob: MediaBlob): MediaFeatures =
    try {
      val b = blob.bytes
      if (isPpm(b)) decodePpm(blob)
      else if (isWav(b)) decodeWav(blob)
      else if (isGif(b)) {
        // animated GIF = the one video-like container the JDK decodes:
        // frame-0 features, but the envelope reports the real frame count
        // and the video kind so frame sampling downstream sees it
        val f = decodeImageIo(blob)
        val n = gifFrameCount(blob).getOrElse(1)
        if (n > 1) f.copy(media_kind = "video", n_frames = n) else f
      }
      else if (isJpeg(b) || isPng(b) || isBmp(b)) decodeImageIo(blob)
      else Multimodal.StubCodec.decode(blob)
    } catch {
      case scala.util.control.NonFatal(_) => Multimodal.StubCodec.decode(blob)
    }

  // ---- P6 PPM ----

  private def parseHeaderInts(b: Array[Byte], from: Int, n: Int): (Array[Int], Int) = {
    val out = new Array[Int](n)
    var i = from
    var k = 0
    while (k < n) {
      // skip whitespace and '#' comments
      var go = true
      while (go) {
        while (i < b.length && Character.isWhitespace(b(i))) i += 1
        if (i < b.length && b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else go = false
      }
      require(i < b.length && b(i) >= '0' && b(i) <= '9', s"bad PPM header at byte $i")
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
      out(k) = v
      k += 1
    }
    (out, i)
  }

  def decodePpm(blob: MediaBlob): MediaFeatures = {
    val b = blob.bytes
    val (hdr, afterHdr) = parseHeaderInts(b, 2, 3)
    val (w, h, maxval) = (hdr(0), hdr(1), hdr(2))
    require(w > 0 && h > 0 && maxval > 0 && maxval < 256, "unsupported PPM")
    // long arithmetic: crafted dims like 100000×100000 overflow w*h*3 in Int
    require(w.toLong * h * 3 <= b.length.toLong, "truncated PPM payload")
    val start = afterHdr + 1 // single whitespace byte after maxval
    val nPx = w * h
    require(b.length >= start + nPx * 3, "truncated PPM payload")
    var (sr, sg, sb2, sl) = (0L, 0L, 0L, 0.0)
    val hist = new Array[Long](8)
    var p = 0
    while (p < nPx) {
      val o = start + p * 3
      val r = b(o) & 0xFF; val g = b(o + 1) & 0xFF; val bl = b(o + 2) & 0xFF
      sr += r; sg += g; sb2 += bl
      val lum = 0.299 * r + 0.587 * g + 0.114 * bl
      sl += lum
      hist(math.min(7, (lum * 8 / 256).toInt)) += 1
      p += 1
    }
    val m = maxval.toFloat
    val feats = new Array[Float](FeatureDim)
    feats(0) = sr.toFloat / nPx / m
    feats(1) = sg.toFloat / nPx / m
    feats(2) = sb2.toFloat / nPx / m
    feats(3) = (sl / nPx / m).toFloat
    var k = 0
    while (k < 8) { feats(4 + k) = hist(k).toFloat / nPx; k += 1 }
    feats(12) = w.toFloat / h
    MediaFeatures(blob.media_ref, "image", w, h, 1, feats)
  }

  /** Minimal deterministic P6 encoder (the synthesis side of the round-trip
    * tests and the generator). */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "pixel buffer size mismatch")
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + rgb.length)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(rgb, 0, out, hdr.length, rgb.length)
    out
  }

  // ---- JPEG/PNG/GIF/BMP via JDK javax.imageio ----

  /** Pixel-count decode cap: a crafted header can declare a multi-GB canvas
    * from a tiny payload; reading dims from the header BEFORE `reader.read`
    * and rejecting > 64 Mpx bounds the decoded buffer (≤ ~256 MB ARGB). */
  private val MaxImagePixels = 1L << 26

  /** Pixel sampling budget: features are computed on a deterministic stride
    * grid of at most ~262k pixels so cost is O(1) in image size. */
  private val SamplePixelBudget = 1 << 18

  // ImageIO's default scratch cache writes temp FILES per decode — per-row
  // disk churn in an executor task; in-memory cache instead.
  javax.imageio.ImageIO.setUseCache(false)

  def decodeImageIo(blob: MediaBlob): MediaFeatures = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob.bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      require(readers.hasNext, "no ImageIO reader for payload")
      val reader = readers.next()
      try {
        reader.setInput(in, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        require(w > 0 && h > 0 && w.toLong * h <= MaxImagePixels, "image dims out of bounds")
        val img = reader.read(0)
        val step = math.max(1, math.ceil(math.sqrt(w.toLong * h / SamplePixelBudget.toDouble)).toInt)
        var (sr, sg, sb2, sl) = (0L, 0L, 0L, 0.0)
        val hist = new Array[Long](8)
        var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val argb = img.getRGB(x, y)
            val r = (argb >> 16) & 0xFF; val g = (argb >> 8) & 0xFF; val bl = argb & 0xFF
            sr += r; sg += g; sb2 += bl
            val lum = 0.299 * r + 0.587 * g + 0.114 * bl
            sl += lum
            hist(math.min(7, (lum * 8 / 256).toInt)) += 1
            n += 1
            x += step
          }
          y += step
        }
        val feats = new Array[Float](FeatureDim)
        if (n > 0) {
          feats(0) = sr.toFloat / n / 255f
          feats(1) = sg.toFloat / n / 255f
          feats(2) = sb2.toFloat / n / 255f
          feats(3) = (sl / n / 255.0).toFloat
          var k = 0
          while (k < 8) { feats(4 + k) = hist(k).toFloat / n; k += 1 }
        }
        feats(12) = w.toFloat / h
        MediaFeatures(blob.media_ref, "image", w, h, 1, feats)
      } finally reader.dispose()
    } finally in.close()
  }

  // ---- RIFF/PCM WAV ----

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  def decodeWav(blob: MediaBlob): MediaFeatures = {
    val b = blob.bytes
    var i = 12 // after RIFF size + WAVE
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val sz = le32(b, i + 4)
      require(sz >= 0, "negative chunk size") // crafted sizes must not loop/underflow
      if (id == "fmt ") {
        require(i + 8 + 16 <= b.length, "truncated fmt chunk")
        require(le16(b, i + 8) == 1, "not PCM")
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (id == "data") { dataOff = i + 8; dataLen = math.min(sz, b.length - dataOff) }
      val next = i.toLong + 8L + sz.toLong + (sz & 1) // word-aligned; Long: no overflow
      if (next > b.length) i = b.length else i = next.toInt
    }
    require(sampleRate > 0 && channels > 0 && bits == 16 && dataOff >= 0, "unsupported WAV")
    // multi-channel PCM is interleaved: one FRAME per time step; statistics
    // run over channel 0 so duration, windows and zero crossings are in
    // frame time, not interleaved-sample time (2× off for stereo otherwise)
    val nSamples = dataLen / 2
    val nFrames = nSamples / channels
    var sum = 0.0; var sumSq = 0.0; var crossings = 0L
    val quarters = new Array[Double](4)
    var prevSign = 0
    var f0 = 0
    while (f0 < nFrames) {
      val v = le16(b, dataOff + f0 * channels * 2).toShort.toInt / 32768.0
      sum += v; sumSq += v * v
      val sign = java.lang.Integer.signum(java.lang.Double.compare(v, 0.0))
      if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
      if (sign != 0) prevSign = sign
      // Long arithmetic: f0*4 wraps negative past 2^29 interleaved samples
      quarters(math.min(3L, f0.toLong * 4 / math.max(1, nFrames)).toInt) += v * v
      f0 += 1
    }
    val feats = new Array[Float](FeatureDim)
    if (nFrames > 0) {
      feats(0) = math.sqrt(sumSq / nFrames).toFloat          // RMS (channel 0)
      feats(1) = (sum / nFrames).toFloat                     // DC offset
      feats(2) = crossings.toFloat / nFrames                 // zero-crossing rate
      var q = 0
      while (q < 4) { feats(3 + q) = (quarters(q) / math.max(1, nFrames / 4)).toFloat; q += 1 }
      feats(7) = nFrames.toFloat / sampleRate                // duration (sec)
    }
    MediaFeatures(blob.media_ref, "audio", sampleRate, channels,
      (nFrames + 1023) / 1024, feats)
  }

  // ---- perceptual hash (image near-dup) ----

  /** 64-bit difference hash (dHash): box-average the luminance onto a 9×8
    * grid, emit one bit per horizontal gradient (cell > right neighbor).
    * Robust to uniform brightness/contrast shifts and resizing (the grid
    * normalizes scale); NOT robust to crops/rotations by design — that is
    * embedding-ANN territory (N1–N3) — and BLIND to flat content (any
    * solid-color image hashes to 0; pre-filter near-zero-variance images
    * via the feature histogram if that matters). Decodable images only
    * (P6 PPM + ImageIO formats); `None` for audio/video/undecodable or
    * MALFORMED payloads — a corrupt blob must never kill a task (same
    * contract as [[decode]]). */
  def dHash64(blob: MediaBlob): Option[Long] = {
    if (isPpm(blob.bytes)) scala.util.Try(dHashPpm(blob)).toOption
    else if (isGif(blob.bytes))
      // single-frame GIFs are still images; ANIMATED GIFs are video
      // territory ([[gifFrameDHashes]]) — hashing their frame 0 here would
      // cross-match a clip against a still of its opening frame, welding
      // the image and video dedup graphs together
      scala.util.Try {
        require(gifFrameCount(blob).contains(1), "animated GIF is not a still image")
        dHashImageIo(blob)
      }.toOption
    else if (isJpeg(blob.bytes) || isPng(blob.bytes) || isBmp(blob.bytes))
      scala.util.Try(dHashImageIo(blob)).toOption
    else None
  }

  /** Grid fold shared by both decode paths: `lumAt(x, y)` returns the pixel
    * luminance; cells are box-averaged with the SAME deterministic stride
    * budget as [[decodeImageIo]] (O(1) work per image regardless of size —
    * a 60 Mpx photo must not cost 60M pixel reads in the hash kernel). */
  private def dHashFromLum(w: Int, h: Int, lumAt: (Int, Int) => Double): Long = {
    val step = math.max(1, math.ceil(math.sqrt(w.toLong * h / SamplePixelBudget.toDouble)).toInt)
    def cellMean(cx: Int, cy: Int): Double = {
      val x0 = cx * w / 9; val x1 = math.max(x0 + 1, (cx + 1) * w / 9)
      val y0 = cy * h / 8; val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
      var s = 0.0; var n = 0
      var y = y0
      while (y < y1 && y < h) {
        var x = x0
        while (x < x1 && x < w) { s += lumAt(x, y); n += 1; x += step }
        y += step
      }
      if (n == 0) 0.0 else s / n
    }
    val grid = Array.tabulate(8, 9)((cy, cx) => cellMean(cx, cy))
    var bits = 0L
    var i = 0
    while (i < 64) {
      val cy = i / 8; val cx = i % 8
      if (grid(cy)(cx) > grid(cy)(cx + 1)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  private def dHashPpm(blob: MediaBlob): Long = {
    val b = blob.bytes
    val (hdr, afterHdr) = parseHeaderInts(b, 2, 3)
    val (w, h, maxval) = (hdr(0), hdr(1), hdr(2))
    require(w > 0 && h > 0 && maxval > 0 && maxval < 256, "unsupported PPM")
    require(w.toLong * h * 3 <= b.length.toLong, "truncated PPM payload")
    val start = afterHdr + 1
    require(b.length.toLong >= start.toLong + w.toLong * h * 3, "truncated PPM payload")
    dHashFromLum(w, h, (x, y) => {
      val o = start + (y * w + x) * 3
      0.299 * (b(o) & 0xFF) + 0.587 * (b(o + 1) & 0xFF) + 0.114 * (b(o + 2) & 0xFF)
    })
  }

  private def dHashImageIo(blob: MediaBlob): Long = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob.bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      require(readers.hasNext, "no ImageIO reader for payload")
      val reader = readers.next()
      try {
        reader.setInput(in, true, true)
        val w = reader.getWidth(0); val h = reader.getHeight(0)
        require(w > 0 && h > 0 && w.toLong * h <= MaxImagePixels, "image dims out of bounds")
        val img = reader.read(0)
        dHashFromLum(w, h, (x, y) => {
          val argb = img.getRGB(x, y)
          0.299 * ((argb >> 16) & 0xFF) + 0.587 * ((argb >> 8) & 0xFF) + 0.114 * (argb & 0xFF)
        })
      } finally reader.dispose()
    } finally in.close()
  }

  // ---- perceptual hash (audio near-dup) ----

  /** 64-bit audio energy-envelope hash (the WAV sibling of [[dHash64]]):
    * split channel-0 frames into 65 equal time windows, emit one bit per
    * consecutive-window energy gradient (window > next window). Invariant
    * to uniform GAIN (scaling every sample scales every window energy by
    * the same factor — gradient signs survive exactly) and NEAR-invariant
    * to RESAMPLING (windows are fractions of total duration, so a
    * rate-converted copy lands the same envelope in the same windows; only
    * near-tie windows at envelope peaks can flip, keeping the copy within
    * the near-dup Hamming threshold rather than bit-identical); NOT
    * invariant to trims/offsets or
    * reversal — alignment-shifted copies are embedding-ANN territory, the
    * same scoping call as dHash vs crops. PCM WAV payloads only; `None`
    * for images/video/undecodable or malformed payloads (the [[decode]]
    * never-kill-a-task contract). */
  def aHash64(blob: MediaBlob): Option[Long] =
    if (isWav(blob.bytes)) scala.util.Try(aHashWav(blob)).toOption else None

  private def aHashWav(blob: MediaBlob): Long = {
    val b = blob.bytes
    var i = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val sz = le32(b, i + 4)
      require(sz >= 0, "negative chunk size")
      if (id == "fmt ") {
        require(i + 8 + 16 <= b.length, "truncated fmt chunk")
        require(le16(b, i + 8) == 1, "not PCM")
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (id == "data") { dataOff = i + 8; dataLen = math.min(sz, b.length - dataOff) }
      val next = i.toLong + 8L + sz.toLong + (sz & 1)
      if (next > b.length) i = b.length else i = next.toInt
    }
    require(sampleRate > 0 && channels > 0 && bits == 16 && dataOff >= 0, "unsupported WAV")
    val nFrames = dataLen / 2 / channels
    require(nFrames >= 65, "too short for a 65-window envelope")
    // deterministic frame stride budget — O(1) work per payload like the
    // image kernels (a 2-hour WAV must not cost 300M sample reads)
    val step = math.max(1, nFrames / SamplePixelBudget)
    val energy = new Array[Double](65)
    var f = 0
    while (f < nFrames) {
      val v = le16(b, dataOff + f * channels * 2).toShort.toInt / 32768.0
      energy((f.toLong * 65 / nFrames).toInt) += v * v
      f += step
    }
    var bitsOut = 0L
    var w = 0
    while (w < 64) {
      if (energy(w) > energy(w + 1)) bitsOut |= (1L << w)
      w += 1
    }
    bitsOut
  }

  // ---- animated GIF (the one VIDEO-like container the JDK decodes) ----

  /** Frame-count decode cap: compositing walks every frame up to the last
    * sampled index, so a crafted million-frame GIF must be rejected before
    * the walk (canvas pixels are already bounded by [[MaxImagePixels]]). */
  private val MaxGifFrames = 256

  /** Per-frame 64-bit dHashes of an animated GIF, COMPOSITED: each frame is
    * drawn onto a persistent canvas at its declared (left, top) offset —
    * animated GIFs routinely store delta patches, so hashing raw rasters
    * would fingerprint the patches, not the frames a viewer sees. Honors
    * the two common disposal methods (`none`/`doNotDispose` accumulate;
    * `restoreToBackgroundColor` clears the frame's rect after it is
    * sampled). At most `maxFrames` evenly-spaced frames are hashed (the
    * frame-sample step of a video pipeline), but every frame up to the last
    * sampled one is composited — delta correctness over sampling speed.
    * `None` for non-GIF/undecodable/oversized payloads. Single-frame GIFs
    * return one hash, equal to [[dHash64]]'s (same grid fold). */
  def gifFrameDHashes(blob: MediaBlob, maxFrames: Int = 8): Option[Array[Long]] =
    if (isGif(blob.bytes)) scala.util.Try(gifFrameDHashesImpl(blob, maxFrames)).toOption
    else None

  /** Declared frame count of an animated GIF (`None` for non-GIF/corrupt). */
  def gifFrameCount(blob: MediaBlob): Option[Int] =
    if (isGif(blob.bytes))
      scala.util.Try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(blob.bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          require(readers.hasNext, "no GIF reader")
          val reader = readers.next()
          try { reader.setInput(in, false, true); reader.getNumImages(true) }
          finally reader.dispose()
        } finally in.close()
      }.toOption
    else None

  private def gifFrameDHashesImpl(blob: MediaBlob, maxFrames: Int): Array[Long] = {
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob.bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      require(readers.hasNext, "no GIF reader")
      val reader = readers.next()
      try {
        reader.setInput(in, false, true) // seekable: metadata + indexed reads
        val n = reader.getNumImages(true)
        require(n >= 1 && n <= MaxGifFrames, s"GIF frame count out of bounds: $n")
        // canvas dims from the stream's logical screen descriptor; fall back
        // to frame 0's dims when the writer omitted them
        val sm = reader.getStreamMetadata
        var (cw, ch) = (0, 0)
        if (sm != null) {
          val tree = sm.getAsTree("javax_imageio_gif_stream_1.0")
          val kids = tree.getChildNodes
          var i = 0
          while (i < kids.getLength) {
            val node = kids.item(i)
            if (node.getNodeName == "LogicalScreenDescriptor") {
              val at = node.getAttributes
              cw = at.getNamedItem("logicalScreenWidth").getNodeValue.toInt
              ch = at.getNamedItem("logicalScreenHeight").getNodeValue.toInt
            }
            i += 1
          }
        }
        if (cw <= 0 || ch <= 0) { cw = reader.getWidth(0); ch = reader.getHeight(0) }
        require(cw > 0 && ch > 0 && cw.toLong * ch <= MaxImagePixels, "GIF dims out of bounds")
        val sampled = (0 until math.min(maxFrames, n))
          .map(i => if (n <= maxFrames) i else i * (n - 1) / (maxFrames - 1).max(1))
          .distinct
        val canvas = new java.awt.image.BufferedImage(
          cw, ch, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        try {
          val out = new Array[Long](sampled.length)
          var outIdx = 0
          var f = 0
          while (f <= sampled.last) {
            val frame = reader.read(f)
            var (left, top, disposal) = (0, 0, "none")
            val md = reader.getImageMetadata(f)
            if (md != null) {
              val tree = md.getAsTree("javax_imageio_gif_image_1.0")
              val kids = tree.getChildNodes
              var i = 0
              while (i < kids.getLength) {
                val node = kids.item(i)
                if (node.getNodeName == "ImageDescriptor") {
                  val at = node.getAttributes
                  left = at.getNamedItem("imageLeftPosition").getNodeValue.toInt
                  top = at.getNamedItem("imageTopPosition").getNodeValue.toInt
                } else if (node.getNodeName == "GraphicControlExtension") {
                  disposal = node.getAttributes.getNamedItem("disposalMethod").getNodeValue
                }
                i += 1
              }
            }
            g.drawImage(frame, left, top, null)
            if (f == sampled(outIdx)) {
              out(outIdx) = dHashFromLum(cw, ch, (x, y) => {
                val argb = canvas.getRGB(x, y)
                0.299 * ((argb >> 16) & 0xFF) + 0.587 * ((argb >> 8) & 0xFF) + 0.114 * (argb & 0xFF)
              })
              outIdx += 1
            }
            if (disposal == "restoreToBackgroundColor") {
              val old = g.getColor
              g.setColor(java.awt.Color.BLACK)
              g.fillRect(left, top, frame.getWidth, frame.getHeight)
              g.setColor(old)
            }
            f += 1
          }
          out
        } finally g.dispose()
      } finally reader.dispose()
    } finally in.close()
  }

  /** One frame of [[encodeGifAnim]]: a grayscale patch drawn at (left, top);
    * `disposal` is a GIF disposal method name (`doNotDispose` accumulates,
    * `restoreToBackgroundColor` clears the rect after display). */
  final case class GifFrame(left: Int, top: Int, w: Int, h: Int,
                            gray: Array[Byte], disposal: String = "doNotDispose")

  /** Minimal deterministic animated-GIF encoder (JDK ImageIO writer, 256-
    * gray palette — the synthesis side of the frame-hash round-trip tests
    * and the generator's video payloads). Frames may be delta patches with
    * offsets and disposal methods, exercising the compositing decode. */
  def encodeGifAnim(canvasW: Int, canvasH: Int, frames: Seq[GifFrame]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val grayPalette = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grayPalette, grayPalette, grayPalette)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no GIF writer")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(out)
      // explicit stream metadata: logical screen dims + a 256-gray GLOBAL
      // color table. With null stream metadata the JDK writer emits no
      // color table at all and readers substitute the web-safe default —
      // every gray value silently becomes a web-palette color (index 7
      // read back as 0x003333), corrupting round-trips
      val smd = writer.getDefaultStreamMetadata(null)
      val sfmt = "javax_imageio_gif_stream_1.0"
      val stree = new javax.imageio.metadata.IIOMetadataNode(sfmt)
      val ver = new javax.imageio.metadata.IIOMetadataNode("Version")
      ver.setAttribute("value", "89a")
      val lsd = new javax.imageio.metadata.IIOMetadataNode("LogicalScreenDescriptor")
      lsd.setAttribute("logicalScreenWidth", canvasW.toString)
      lsd.setAttribute("logicalScreenHeight", canvasH.toString)
      lsd.setAttribute("colorResolution", "8")
      lsd.setAttribute("pixelAspectRatio", "0")
      val gct = new javax.imageio.metadata.IIOMetadataNode("GlobalColorTable")
      gct.setAttribute("sizeOfGlobalColorTable", "256")
      gct.setAttribute("backgroundColorIndex", "0")
      gct.setAttribute("sortFlag", "FALSE")
      var ci = 0
      while (ci < 256) {
        val e = new javax.imageio.metadata.IIOMetadataNode("ColorTableEntry")
        e.setAttribute("index", ci.toString)
        e.setAttribute("red", ci.toString)
        e.setAttribute("green", ci.toString)
        e.setAttribute("blue", ci.toString)
        gct.appendChild(e)
        ci += 1
      }
      stree.appendChild(ver); stree.appendChild(lsd); stree.appendChild(gct)
      smd.setFromTree(sfmt, stree)
      writer.prepareWriteSequence(smd)
      frames.foreach { fr =>
        require(fr.gray.length == fr.w * fr.h, "pixel buffer size mismatch")
        val img = new java.awt.image.BufferedImage(
          fr.w, fr.h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        img.getRaster.setDataElements(0, 0, fr.w, fr.h, fr.gray)
        val spec = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
        val md = writer.getDefaultImageMetadata(spec, null)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val kids = tree.getChildNodes
        var gceNode: javax.imageio.metadata.IIOMetadataNode = null
        var afterGce: org.w3c.dom.Node = null // first node GCE must precede (DTD order)
        var lct: org.w3c.dom.Node = null
        var i = 0
        while (i < kids.getLength) {
          val node = kids.item(i).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          node.getNodeName match {
            case "ImageDescriptor" =>
              node.setAttribute("imageLeftPosition", fr.left.toString)
              node.setAttribute("imageTopPosition", fr.top.toString)
              node.setAttribute("interlaceFlag", "FALSE")
            case "LocalColorTable" => lct = node
            case "GraphicControlExtension" => gceNode = node
            case _ if afterGce == null => afterGce = node
            case _ =>
          }
          i += 1
        }
        // the writer's default image metadata smuggles in a WEB-SAFE local
        // color table (overriding the gray global one: index 7 would read
        // back 0x003333) — drop it so the stream's table applies
        if (lct != null) tree.removeChild(lct)
        // DTD child order is ImageDescriptor, LocalColorTable, GCE, ...: a
        // misplaced GraphicControlExtension is silently DROPPED by the
        // writer (disposal reads back "none"), so insert at the right slot
        if (gceNode == null) {
          gceNode = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
          if (afterGce == null) tree.appendChild(gceNode)
          else tree.insertBefore(gceNode, afterGce)
        }
        gceNode.setAttribute("disposalMethod", fr.disposal)
        gceNode.setAttribute("userInputFlag", "FALSE")
        gceNode.setAttribute("transparentColorFlag", "FALSE")
        gceNode.setAttribute("delayTime", "10")
        gceNode.setAttribute("transparentColorIndex", "0")
        md.setFromTree(fmt, tree)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      out.close()
    }
    bos.toByteArray
  }

  /** Minimal deterministic PCM16 mono WAV encoder. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put4(i: Int, s: String): Unit = { val x = s.getBytes("US-ASCII"); System.arraycopy(x, 0, out, i, 4) }
    def putLe32(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte; out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte }
    def putLe16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    put4(0, "RIFF"); putLe32(4, 36 + dataLen); put4(8, "WAVE")
    put4(12, "fmt "); putLe32(16, 16); putLe16(20, 1); putLe16(22, 1)
    putLe32(24, sampleRate); putLe32(28, sampleRate * 2); putLe16(32, 2); putLe16(34, 16)
    put4(36, "data"); putLe32(40, dataLen)
    var s = 0
    while (s < samples.length) { putLe16(44 + s * 2, samples(s).toInt); s += 1 }
    out
  }
}
