package graft.ext

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

/** REAL media codec kernels — plain JVM, no Spark types, no external
  * dependencies. Images go through `javax.imageio` (the JDK's built-in
  * PNG/JPEG codecs): encode produces genuine PNG/JPEG byte streams, decode
  * parses them back to pixels, resize is a true bilinear resample over the
  * decoded raster. Audio is RIFF/WAVE PCM: encode writes a spec-conformant
  * container (including a non-audio LIST chunk, so decoders must actually
  * walk the chunk list), decode parses the chunk structure and the PCM
  * samples. Video stand-in is an MJPEG-style concatenation of PNG frames,
  * parsed by scanning for the 8-byte PNG signature.
  *
  * These kernels replace the round-5 deterministic hash stubs (reference
  * has no multimodal ops at all — this is the north-star training-pipeline
  * surface): the fixtures are synthesized at dimensions derived from row
  * ids, so a DuckDB oracle can recompute every expected width/height/
  * duration/RMS from the id alone — if the codec path breaks, the hash
  * comparison fails.
  *
  * Thread-safety: all ImageIO entry points used here create their own
  * reader/writer instances per call; kernels hold no shared mutable state,
  * so concurrent Spark tasks are safe. Disk caching is disabled (in-memory
  * streams only) — executor tasks must not contend on a tmp dir.
  */
object MediaCodecs {

  ImageIO.setUseCache(false)

  // ---------------- images ----------------

  /** Encode a solid-color image. PNG is lossless (exact round-trip of every
    * pixel); JPEG is lossy but preserves dimensions exactly. */
  def encodeImage(width: Int, height: Int, rgb: Int, format: String): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb & 0xffffff))
    g.fillRect(0, 0, width, height)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(img, format, bos))
      throw new IllegalArgumentException(s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Encode an image split into 2×2 solid quadrants (colors given row-major:
    * top-left, top-right, bottom-left, bottom-right) — a non-constant raster
    * whose region colors are still exactly predictable, used to prove that
    * feature extraction reads REAL pixel positions, not just metadata. */
  def encodeQuadImage(width: Int, height: Int, quadRgb: Seq[Int]): Array[Byte] = {
    require(quadRgb.length == 4, "need 4 quadrant colors")
    require(width >= 2 && height >= 2, s"quad image needs dims >= 2, got ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    val (hw, hh) = (width / 2, height / 2)
    val rects = Seq((0, 0, hw, hh), (hw, 0, width - hw, hh),
      (0, hh, hw, height - hh), (hw, hh, width - hw, height - hh))
    rects.zip(quadRgb).foreach { case ((x, y, w, h), c) =>
      g.setColor(new java.awt.Color(c & 0xffffff)); g.fillRect(x, y, w, h)
    }
    g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded image metadata: (width, height, normalized format name).
    * Format comes from the registered reader that recognizes the byte
    * stream (a REAL container sniff, not an extension guess). */
  def decodeImageMeta(bytes: Array[Byte]): (Int, Int, String) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException("unrecognized image payload")
      val reader = readers.next()
      reader.setInput(iis)
      try {
        val fmt = reader.getFormatName.toLowerCase match {
          case "jpg" => "jpeg"
          case f => f
        }
        (reader.getWidth(0), reader.getHeight(0), fmt)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Decode to a raster. */
  def decodeImage(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException("undecodable image payload")
    img
  }

  /** Fit-within-box target dimensions, aspect-preserving, never upscaling —
    * floor semantics with a 1px floor, matching the SQL oracle formula. */
  def fitWithin(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val scale = math.min(1.0, math.min(maxSide.toDouble / w, maxSide.toDouble / h))
    (math.max(1, math.floor(w * scale).toInt), math.max(1, math.floor(h * scale).toInt))
  }

  /** REAL resize: decode, bilinear-resample onto the fit-within raster,
    * re-encode as PNG. Returns the resized payload. */
  def resizeFit(bytes: Array[Byte], maxSide: Int): Array[Byte] =
    resizeFitRaster(decodeImage(bytes), maxSide)

  /** Raster-input form of [[resizeFit]] — callers that already decoded the
    * source (for its dims, say) must not pay a second container decode. */
  def resizeFitRaster(src: BufferedImage, maxSide: Int): Array[Byte] = {
    val (tw, th) = fitWithin(src.getWidth, src.getHeight, maxSide)
    val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(src, 0, 0, tw, th, null)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** Mean R/G/B over the decoded raster (doubles). On a solid-color image
    * this equals the fill color exactly — including after bilinear resize,
    * since interpolating equal values returns that value. */
  def pixelMeans(bytes: Array[Byte]): (Double, Double, Double) = {
    val img = decodeImage(bytes)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = img.getWidth.toLong * img.getHeight
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** grid×grid pixel-sample embedding over the DECODED raster: luminance
    * (r+g+b)/765 at each cell center, row-major — a real (if minimal)
    * visual featurizer whose values on quadrant fixtures are exactly the
    * quadrant colors. A production vision encoder slots in here with the
    * same (bytes → fixed-dim doubles) signature. */
  def gridEmbedding(bytes: Array[Byte], grid: Int): Array[Double] = {
    val img = decodeImage(bytes)
    val out = new Array[Double](grid * grid)
    var gy = 0
    while (gy < grid) {
      var gx = 0
      while (gx < grid) {
        val x = ((gx + 0.5) * img.getWidth / grid).toInt.min(img.getWidth - 1)
        val y = ((gy + 0.5) * img.getHeight / grid).toInt.min(img.getHeight - 1)
        val p = img.getRGB(x, y)
        out(gy * grid + gx) =
          (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 765.0
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Deterministic 64-bit mix (LCG step + murmur-style finalizer) shared by
    * every noise/pattern fixture generator — one hashing scheme to fix if a
    * statistical artifact ever shows. */
  def mix64(seed: Long, idx: Long): Long = {
    var s = seed * 6364136223846793005L + idx * 1442695040888963407L
    s ^= (s >>> 33); s *= -7046029254386353131L; s ^= (s >>> 29)
    s
  }

  /** Deterministic noise image: per-pixel colors from [[mix64]] keyed by
    * (seed, x, y) — the fixture for perceptual-hash tests, where solid
    * fills would collide (a dHash of a constant raster is all zeros). */
  def encodeNoiseImage(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, (mix64(seed, y.toLong * width + x) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Difference-hash (dHash) perceptual fingerprint: decode → bilinear
    * resample to a 9×8 luminance grid → 64 horizontal-gradient sign bits.
    * Dimension-normalizing by construction (a resized copy keeps a nearly
    * identical hash), content-sensitive through the REAL decode path. The
    * standard cheap perceptual hash for image corpus dedup; pair it with
    * [[graft.ext.Dedup.hammingNearDuplicatesBySketch]]. */
  def dHash64(bytes: Array[Byte]): Long = {
    val src = decodeImage(bytes)
    val grid = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    val g = grid.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(src, 0, 0, 9, 8, null)
    g.dispose()
    def lum(x: Int, y: Int): Int = {
      val p = grid.getRGB(x, y)
      ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(x + 1, y) > lum(x, y)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  // ---------------- audio: RIFF/WAVE PCM ----------------

  /** Parsed WAV metadata plus PCM statistics computed over the samples. */
  final case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nSamples: Long, rms: Double, peak: Int)

  /** Encode 16-bit PCM mono/stereo WAV holding a ±amplitude square wave
    * (alternating sign per frame). Writes fmt, a LIST/INFO chunk (so naive
    * fixed-offset readers break — the decoder must walk chunks), then data. */
  def encodeWavPcm16(nSamples: Int, sampleRate: Int, amplitude: Short,
                     channels: Int = 1, extensible: Boolean = false): Array[Byte] = {
    require(nSamples >= 0 && sampleRate > 0 && channels > 0)
    val blockAlign = channels * 2
    val dataSize = nSamples * blockAlign
    val listBody = "INFO".getBytes("US-ASCII")
    val fmtSize = if (extensible) 40 else 16
    val riffSize = 4 + (8 + fmtSize) + (8 + listBody.length) + (8 + dataSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(fmtSize)
      .putShort(if (extensible) WaveFormatExtensible else 1.toShort)
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16.toShort)
    if (extensible) {
      buf.putShort(22.toShort) // cbSize
        .putShort(16.toShort) // valid bits per sample
        .putInt((1 << channels) - 1) // channel mask: the first n speakers
        .putShort(1.toShort) // SubFormat tag: PCM
        .put(KsDataFormatGuidTail)
    }
    buf.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      val v: Short = if (i % 2 == 0) amplitude else (-amplitude).toShort
      var c = 0
      while (c < channels) { buf.putShort(v); c += 1 }
      i += 1
    }
    buf.array()
  }

  /** WAVE_FORMAT_EXTENSIBLE format tag (0xFFFE as a signed short). */
  private val WaveFormatExtensible: Short = -2

  /** Fixed tail (bytes 2..15) of the KSDATAFORMAT_SUBTYPE_* GUIDs: the
    * first two bytes carry the real format tag, the rest is constant
    * `00 00 00 00 10 00 80 00 00 AA 00 38 9B 71`. */
  private val KsDataFormatGuidTail: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
    0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71).map(_.toByte)

  /** Parsed fmt header plus the (single) data chunk's location — the ONE
    * RIFF chunk walker behind every WAV reader here, so container fixes
    * land once. The walk is O(#chunks) with no sample scan, cheap enough
    * to run separately from the scan passes. */
  private final case class WavHeader(sampleRate: Int, channels: Int,
                                     bits: Int, blockAlign: Int,
                                     dataPos: Int, dataSize: Int)

  private def parseWavHeader(bytes: Array[Byte]): WavHeader = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF stream")
    buf.getInt // riff size (trust the chunk walk, not this)
    require(fourcc() == "WAVE", "not a WAVE stream")
    var sampleRate = 0; var channels = 0; var bits = 0; var blockAlign = 0
    var dataPos = -1; var dataSize = 0
    var sawFmt = false
    while (buf.remaining() >= 8) {
      val id = fourcc(); val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(), s"corrupt chunk $id size=$size")
      id match {
        case "fmt " =>
          val fmtEnd = buf.position() + size
          val audioFormat = buf.getShort
          require(audioFormat == 1 || audioFormat == WaveFormatExtensible,
            s"only PCM supported, got format $audioFormat")
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          blockAlign = buf.getShort
          bits = buf.getShort
          require(bits == 16, s"only PCM16 supported, got $bits bits")
          if (audioFormat == WaveFormatExtensible) {
            // WAVE_FORMAT_EXTENSIBLE: the REAL format tag lives in the
            // first two bytes of the 16-byte SubFormat GUID after
            // cbSize(22)/validBits/channelMask; the GUID tail is fixed
            require(size >= 40, s"extensible fmt chunk too short ($size)")
            val cbSize = buf.getShort
            require(cbSize >= 22, s"extensible cbSize $cbSize < 22")
            buf.getShort // valid bits per sample (container bits govern)
            buf.getInt // channel mask
            val subTag = buf.getShort
            require(subTag == 1, s"only PCM SubFormat supported, got $subTag")
            val tail = new Array[Byte](14); buf.get(tail)
            require(java.util.Arrays.equals(tail, KsDataFormatGuidTail),
              "SubFormat GUID tail is not the fixed KSDATAFORMAT tail")
          }
          buf.position(fmtEnd)
          sawFmt = true
        case "data" =>
          require(sawFmt, "data chunk before fmt chunk")
          // a second data chunk is rejected, not silently merged: mixed
          // overwrite/accumulate semantics would report wrong statistics
          require(dataPos < 0, "multiple data chunks")
          dataPos = buf.position(); dataSize = size
          buf.position(buf.position() + size)
        case _ =>
          buf.position(buf.position() + size) // skip unknown chunk
      }
      if (size % 2 == 1 && buf.remaining() > 0) buf.get // RIFF pad byte
    }
    require(dataPos >= 0, "no data chunk")
    WavHeader(sampleRate, channels, bits, blockAlign, dataPos, dataSize)
  }

  /** REAL WAV parse: header via the shared chunk walker, then every PCM16
    * sample scanned for RMS and peak. RMS over an exact ±a square wave is
    * exactly `a` (IEEE sqrt of a perfect square), which is what lets the
    * SQL oracle predict it. */
  def decodeWav(bytes: Array[Byte]): WavMeta = {
    val h = parseWavHeader(bytes)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(h.dataPos)
    val nSamples = h.dataSize.toLong / h.blockAlign
    var sumSq = 0.0; var peak = 0
    var i = 0L
    val frames = nSamples * h.channels
    while (i < frames) {
      val s = buf.getShort.toInt
      sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      i += 1
    }
    val rms = if (nSamples == 0) 0.0
      else math.sqrt(sumSq / (nSamples * h.channels))
    WavMeta(h.sampleRate, h.channels, h.bits, nSamples, rms, peak)
  }

  /** Fixed-size PCM windowing over a parsed WAV: per-window sample count,
    * RMS and peak — real DSP framing (the last window may be partial).
    * Returns one entry per window in stream order. */
  def wavWindows(bytes: Array[Byte], windowSamples: Int): Seq[(Int, Double, Int)] = {
    require(windowSamples >= 1, s"windowSamples must be >= 1, got $windowSamples")
    val h = parseWavHeader(bytes)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(h.dataPos)
    val nSamples = h.dataSize / h.blockAlign
    val out = Seq.newBuilder[(Int, Double, Int)]
    var i = 0
    while (i < nSamples) {
      val n = math.min(windowSamples, nSamples - i)
      var sumSq = 0.0; var peak = 0
      var j = 0
      while (j < n * h.channels) {
        val s = buf.getShort.toInt
        sumSq += s.toDouble * s
        if (math.abs(s) > peak) peak = math.abs(s)
        j += 1
      }
      out += ((n, math.sqrt(sumSq / (n.toLong * h.channels)), peak))
      i += n
    }
    out.result()
  }

  /** PCM16 WAV whose successive windows carry the given amplitudes
    * (square wave per window) — the energy-varying fixture for acoustic
    * fingerprints (a constant-amplitude stream has zero energy deltas,
    * hence a degenerate all-zero fingerprint). */
  def encodeWavPattern(windowAmps: Seq[Short], samplesPerWindow: Int,
                       sampleRate: Int): Array[Byte] = {
    require(samplesPerWindow >= 1 && sampleRate > 0)
    val n = windowAmps.length * samplesPerWindow
    val listBody = "INFO".getBytes("US-ASCII")
    val dataSize = n * 2
    val riffSize = 4 + (8 + 16) + (8 + listBody.length) + (8 + dataSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2.toShort).putShort(16.toShort)
    buf.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    windowAmps.foreach { amp =>
      var i = 0
      while (i < samplesPerWindow) {
        buf.putShort(if (i % 2 == 0) amp else (-amp).toShort)
        i += 1
      }
    }
    buf.array()
  }

  /** 64-bit acoustic fingerprint: per-window RMS energies over the REAL
    * PCM parse ([[wavWindows]]), then the sign of successive energy deltas
    * — the energy-contour shape of classic audio fingerprinting, scale-
    * invariant in amplitude ordering. Window size is derived from the
    * stream length so the fingerprint is duration-normalizing (a
    * resampled copy with the same energy contour keeps its hash). */
  def audioFingerprint64(bytes: Array[Byte]): Long = {
    // header-only walk sizes the window; the samples are scanned ONCE (the
    // full decodeWav here would scan them a second time for discarded stats)
    val h = parseWavHeader(bytes)
    val nSamples = h.dataSize.toLong / h.blockAlign
    if (nSamples == 0) return 0L
    val win = math.max(1L, nSamples / 65L).toInt // 65 windows → 64 deltas
    val energies = wavWindows(bytes, win).map(_._2)
    var hash = 0L
    var i = 0
    while (i < 64 && i + 1 < energies.length) {
      if (energies(i + 1) > energies(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  // ---------------- video stand-in: concatenated PNG frames ----------------

  private val PngSig: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** Concatenate solid-color PNG frames into one payload (an MJPEG-style
    * frame stream with PNG codec). */
  def encodeFrameStream(width: Int, height: Int, frameRgbs: Seq[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    frameRgbs.foreach(c => bos.write(encodeImage(width, height, c, "png")))
    bos.toByteArray
  }

  /** Byte offsets of every PNG frame in the stream — the frame index of a
    * concatenated-PNG payload. After a signature match the CHUNK LIST is
    * walked to IEND to find the true frame end, so signature bytes that
    * happen to occur inside IDAT compressed data can never start a phantom
    * frame. A frame whose chunk list is corrupt or truncated still counts
    * (it absorbs the garbage up to the next VALID frame), but while
    * recovering from a failed walk, a candidate signature is accepted only
    * if its OWN chunk walk validates — signature bytes embedded inside the
    * corrupt frame's chunk data cannot start a phantom frame either. The
    * one undetectable case left: a trailing truncated-but-real frame that
    * directly follows a corrupt frame is skipped (indistinguishable from
    * embedded garbage without a complete chunk list). */
  def frameOffsets(bytes: Array[Byte]): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var i = 0
    var recovering = false
    while (i <= bytes.length - PngSig.length) {
      var j = 0
      while (j < PngSig.length && bytes(i + j) == PngSig(j)) j += 1
      if (j == PngSig.length) {
        val end = pngFrameEnd(bytes, i)
        if (!recovering) {
          out += i
          end match {
            case Some(e) => i = e
            case None    => recovering = true; i += PngSig.length
          }
        } else end match {
          case Some(e) => out += i; i = e; recovering = false
          case None    => i += 1 // embedded signature bytes, keep scanning
        }
      } else i += 1
    }
    out.result()
  }

  /** End offset (exclusive) of the PNG frame starting at `start`, found by
    * walking the chunk list (len BE-u32, type, data, crc) to IEND. None if
    * the chunk list runs past the buffer or a length is corrupt. */
  private def pngFrameEnd(bytes: Array[Byte], start: Int): Option[Int] = {
    var p = start + PngSig.length
    while (p + 8 <= bytes.length) {
      val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      if (len < 0 || p + 12L + len > bytes.length) return None
      val isEnd = bytes(p + 4) == 'I' && bytes(p + 5) == 'E' &&
        bytes(p + 6) == 'N' && bytes(p + 7) == 'D'
      p += 12 + len
      if (isEnd) return Some(p)
    }
    None
  }

  /** Split a concatenated-PNG stream into its individual frame payloads. */
  def splitFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val offs = frameOffsets(bytes)
    require(offs.nonEmpty, "no PNG frames in payload")
    offs.zipAll(offs.drop(1).map(Some(_)), 0, None).map {
      case (start, end) => java.util.Arrays.copyOfRange(
        bytes, start, end.getOrElse(bytes.length))
    }
  }

  /** Parse a concatenated-PNG stream: count frames by scanning for the PNG
    * signature, decode the FIRST frame for its dimensions. (ImageIO.read
    * consumes exactly one image from the stream.) */
  def frameStreamStats(bytes: Array[Byte]): (Int, Int, Int) = {
    val count = frameOffsets(bytes).length
    require(count > 0, "no PNG frames in payload")
    val (w, h, _) = decodeImageMeta(bytes)
    (count, w, h)
  }

  /** Per-frame [[dHash64]] sequence of a frame stream — the video
    * fingerprint: temporal structure preserved (frame order matters),
    * each element dimension-normalizing like the image hash. */
  def videoDHashes(bytes: Array[Byte]): Seq[Long] =
    splitFrames(bytes).map(dHash64)

  /** Collapse a per-frame hash sequence into ONE 64-bit video sketch by
    * per-bit MAJORITY vote (strict majority → 1, tie → 0) — the simhash
    * construction applied to frame dHashes. An exact or re-encoded copy
    * keeps every frame hash and therefore the sketch; distinct noise
    * videos have ~iid sketch bits (the majority of iid fair bits is a fair
    * bit), so hamming banding over the sketch
    * ([[graft.ext.Dedup.hammingNearDuplicatesBySketch]]) has the same
    * falsifiable collision math as the image dHash path. */
  def videoSketch64(frameHashes: Seq[Long]): Long = {
    require(frameHashes.nonEmpty, "no frames to sketch")
    val n = frameHashes.length
    var sketch = 0L
    var bit = 0
    while (bit < 64) {
      var ones = 0
      frameHashes.foreach(h => if ((h >>> bit & 1L) == 1L) ones += 1)
      if (2 * ones > n) sketch |= 1L << bit
      bit += 1
    }
    sketch
  }
}
