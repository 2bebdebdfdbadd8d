package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the real media codec kernels (pure JVM — no Spark):
  * encode→decode round trips over the full parameter space, WAV statistics
  * exactness, fit-within geometry invariants, frame-stream splitting.
  */
object MediaCodecsProps extends Properties("graft.ext.MediaCodecs") {

  private val genDims = Gen.zip(Gen.choose(1, 200), Gen.choose(1, 200))
  private val genRgb = Gen.choose(0, 0xffffff)

  property("png round-trips dims, format, and the fill color") =
    forAll(genDims, genRgb) { case ((w, h), rgb) =>
      val bytes = MediaCodecs.encodeImage(w, h, rgb, "png")
      val (dw, dh, fmt) = MediaCodecs.decodeImageMeta(bytes)
      val px = MediaCodecs.decodeImage(bytes).getRGB(w - 1, h - 1) & 0xffffff
      dw == w && dh == h && fmt == "png" && px == rgb
    }

  property("jpeg round-trips dims and sniffs as jpeg") =
    forAll(genDims) { case (w, h) =>
      val (dw, dh, fmt) =
        MediaCodecs.decodeImageMeta(MediaCodecs.encodeImage(w, h, 0x777777, "jpeg"))
      dw == w && dh == h && fmt == "jpeg"
    }

  property("fitWithin: bounded by maxSide, never upscales, aspect within 1px, floor >= 1") =
    forAll(genDims, Gen.choose(1, 300)) { case ((w, h), maxSide) =>
      val (tw, th) = MediaCodecs.fitWithin(w, h, maxSide)
      val bounded = (tw <= math.max(1, maxSide)) && (th <= math.max(1, maxSide))
      val noUpscale = tw <= w && th <= h
      val positive = tw >= 1 && th >= 1
      // aspect preserved up to the floor: tw/th within 1px of the exact ratio
      val scale = math.min(1.0, math.min(maxSide.toDouble / w, maxSide.toDouble / h))
      val aspect = math.abs(tw - w * scale) <= 1.0 && math.abs(th - h * scale) <= 1.0
      bounded && noUpscale && positive && aspect
    }

  property("resizeFit output really decodes at the fit-within dims") =
    forAll(Gen.zip(Gen.choose(8, 150), Gen.choose(8, 150)), genRgb) {
      case ((w, h), rgb) =>
        val resized = MediaCodecs.resizeFit(
          MediaCodecs.encodeImage(w, h, rgb, "png"), 48)
        val (rw, rh, _) = MediaCodecs.decodeImageMeta(resized)
        (rw, rh) == MediaCodecs.fitWithin(w, h, 48)
    }

  private val genWav = for {
    n <- Gen.choose(0, 3000)
    rate <- Gen.oneOf(8000, 16000, 22050, 44100)
    amp <- Gen.choose(0, 32767)
    channels <- Gen.choose(1, 2)
  } yield (n, rate, amp.toShort, channels)

  property("wav round-trips header fields; RMS and peak are exactly the amplitude") =
    forAll(genWav) { case (n, rate, amp, channels) =>
      val m = MediaCodecs.decodeWav(MediaCodecs.encodeWavPcm16(n, rate, amp, channels))
      val stats = if (n == 0) m.rms == 0.0 && m.peak == 0
        else m.rms == amp.toDouble && m.peak == amp.toInt
      m.sampleRate == rate && m.channels == channels &&
        m.bitsPerSample == 16 && m.nSamples == n.toLong && stats
    }

  property("WAVE_FORMAT_EXTENSIBLE decodes identically to classic PCM") =
    forAll(genWav) { case (n, rate, amp, channels) =>
      val classic = MediaCodecs.decodeWav(
        MediaCodecs.encodeWavPcm16(n, rate, amp, channels))
      val ext = MediaCodecs.decodeWav(
        MediaCodecs.encodeWavPcm16(n, rate, amp, channels, extensible = true))
      classic == ext
    }

  property("wavWindows partitions samples exactly; every window keeps the amplitude") =
    forAll(genWav.suchThat(_._1 > 0), Gen.choose(1, 500)) {
      case ((n, rate, amp, channels), win) =>
        val ws = MediaCodecs.wavWindows(
          MediaCodecs.encodeWavPcm16(n, rate, amp, channels), win)
        val sizes = ws.map(_._1)
        sizes.sum == n &&
          sizes.dropRight(1).forall(_ == win) &&
          sizes.last <= win && sizes.last >= 1 &&
          ws.forall { case (_, rms, peak) =>
            rms == amp.toDouble && peak == amp.toInt }
    }

  property("frame streams split back into the frames that went in") =
    forAll(Gen.zip(Gen.choose(4, 40), Gen.choose(4, 40)),
           Gen.nonEmptyListOf(genRgb).map(_.take(6))) {
      case ((w, h), colors) =>
        val stream = MediaCodecs.encodeFrameStream(w, h, colors)
        val frames = MediaCodecs.splitFrames(stream)
        frames.length == colors.length &&
          frames.zip(colors).forall { case (f, c) =>
            MediaCodecs.decodeImageMeta(f) == ((w, h, "png")) &&
              (MediaCodecs.decodeImage(f).getRGB(0, 0) & 0xffffff) == c
          }
    }
}
