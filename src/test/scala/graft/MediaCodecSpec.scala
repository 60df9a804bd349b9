package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{MediaCodecs, Multimodal}
import graft.tools.MakeMediaFixtures

/** Real media decode (`javax.imageio` / `javax.sound.sampled`) through the
  * SAME mapPartitions kernels the stub-mode oracle queries use: committed
  * JPEG/PNG/BMP/WAV fixtures in `src/test/resources/graft/media/` are
  * loaded as binary payload columns and decoded with `codec = "auto"`. */
class MediaCodecSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/media/$name")
    assert(in != null, s"missing committed fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val refPx = MakeMediaFixtures.fixturePixels() // 16x12 gray
  private val refSamples = MakeMediaFixtures.fixtureSamples()

  test("sniff identifies each committed container; text is Unknown") {
    assert(MediaCodecs.sniff(fixture("fixture.png")) == MediaCodecs.Png)
    assert(MediaCodecs.sniff(fixture("fixture.jpg")) == MediaCodecs.Jpeg)
    assert(MediaCodecs.sniff(fixture("fixture.bmp")) == MediaCodecs.Bmp)
    assert(MediaCodecs.sniff(fixture("fixture16.wav")) == MediaCodecs.Wav)
    assert(MediaCodecs.sniff("plain text payload".getBytes("utf-8")) == MediaCodecs.Unknown)
  }

  test("PNG and BMP decode losslessly to the generator's exact pixels") {
    for (name <- Seq("fixture.png", "fixture.bmp")) {
      val Some((w, h, px)) = MediaCodecs.decodeImageGray(fixture(name))
      assert((w, h) == (16, 12), name)
      assert(px.toSeq == refPx.toSeq, name)
    }
  }

  test("JPEG decodes to the right dims with small lossy error") {
    val Some((w, h, px)) = MediaCodecs.decodeImageGray(fixture("fixture.jpg"))
    assert((w, h) == (16, 12))
    val mad = px.zip(refPx).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
      .sum.toDouble / px.length
    assert(mad < 12.0, s"JPEG mean abs error too high: $mad")
  }

  test("16-bit WAV round-trips PCM samples exactly; 8-bit within quantization") {
    assert(MediaCodecs.decodeAudioPcm(fixture("fixture16.wav")).get.toSeq == refSamples.toSeq)
    val s8 = MediaCodecs.decodeAudioPcm(fixture("fixture8.wav")).get
    val ref8 = refSamples.map(s => math.max(-128, math.min(127, s / 128)))
    assert(s8.toSeq == ref8.toSeq)
  }

  test("resizeImages codec=auto: real JPEG/PNG through the mapPartitions kernel") {
    val df = Seq(
      (1L, fixture("fixture.png")),
      (2L, fixture("fixture.jpg"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(df, "doc_id", srcWidth = 16,
      outW = 8, outH = 6, codec = "auto").collect().sortBy(_.doc_id)
    assert(out.forall(r => r.width == 8 && r.height == 6))
    // PNG row must equal hand nearest-neighbor of the true pixels
    val expected = Array.tabulate(6, 8) { (y, x) =>
      refPx(math.min(11, y * 12 / 6) * 16 + math.min(15, x * 16 / 8))
    }.flatten
    assert(out(0).pixels.toSeq == expected.toSeq)
    // JPEG row: same resample applied to ImageIO's decode of the jpeg bytes
    val Some((_, _, jpx)) = MediaCodecs.decodeImageGray(fixture("fixture.jpg"))
    val expectedJ = Array.tabulate(6, 8) { (y, x) =>
      jpx(math.min(11, y * 12 / 6) * 16 + math.min(15, x * 16 / 8))
    }.flatten
    assert(out(1).pixels.toSeq == expectedJ.toSeq)
  }

  test("thumbnails: decode -> resize -> PNG re-encode round-trips losslessly") {
    val df = Seq(
      (1L, fixture("fixture.png")),
      (2L, fixture("fixture.jpg"))
    ).toDF("doc_id", "payload")
    val thumbs = Multimodal.thumbnails(df, "doc_id", srcWidth = 16,
      outW = 8, outH = 6, codec = "auto", format = "png")
      .collect().sortBy(_.doc_id)
    val resized = Multimodal.resizeImages(df, "doc_id", srcWidth = 16,
      outW = 8, outH = 6, codec = "auto").collect().sortBy(_.doc_id)
    thumbs.zip(resized).foreach { case (th, rz) =>
      // emitted bytes are a REAL PNG container...
      assert(MediaCodecs.sniff(th.thumb) == MediaCodecs.Png)
      // ...that decodes back to exactly the resized pixel matrix
      val Some((w, h, px)) = MediaCodecs.decodeImageGray(th.thumb)
      assert(w == 8 && h == 6)
      assert(px.toSeq == rz.pixels.toSeq, s"doc ${th.doc_id} round-trip")
    }
    // the stub path re-encodes too: same contract without real media
    val stub = Multimodal.thumbnails(
      Multimodal.withPayload(Seq((3L, "plain text payload")).toDF("doc_id", "text"), "text"),
      "doc_id", srcWidth = 16, outW = 4, outH = 4).collect()
    assert(stub.length == 1 &&
      MediaCodecs.sniff(stub.head.thumb) == MediaCodecs.Png)
  }

  test("audioFeatures codec=auto: real WAV RMS/zero-crossings match direct PCM math") {
    val df = Seq((5L, fixture("fixture16.wav"))).toDF("doc_id", "payload")
    val ws = Multimodal.audioFeatures(df, "doc_id", windowSamples = 100, codec = "auto")
      .collect().sortBy(_.window_idx)
    assert(ws.map(_.n_samples).toSeq == Seq(100, 100, 100, 100, 41)) // 441 samples
    // direct computation over the known samples
    for (w <- ws) {
      val lo = w.window_idx * 100
      val seg = refSamples.slice(lo, math.min(441, lo + 100))
      val rms = math.sqrt(seg.map(s => s.toDouble * s).sum / seg.length)
      assert(math.abs(w.rms - rms) < 1e-9, s"window ${w.window_idx}")
      var zc = 0L; var prev = 0
      for (s <- seg; sign = Integer.signum(s) if sign != 0) {
        if (prev != 0 && sign != prev) zc += 1
        prev = sign
      }
      assert(w.zero_crossings == zc, s"window ${w.window_idx}")
    }
  }

  test("corrupt payloads: valid magic bytes + truncated/garbled body decode to None and auto falls back to the stub") {
    // magic bytes sniff as real containers, so the decoder is ENTERED —
    // ImageIO/AudioSystem then throw on the corrupt body; pre-guard code
    // (no try/catch around ImageIO.read) fails this test by killing the
    // task instead of degrading to the stub
    val corruptJpeg = fixture("fixture.jpg").take(24)
    val corruptPng = {
      val b = fixture("fixture.png").clone()
      // garble every body byte after the 8-byte signature + IHDR length
      for (i <- 16 until b.length) b(i) = (b(i) ^ 0x5a).toByte
      b
    }
    val corruptWav = fixture("fixture16.wav").take(16)
    assert(MediaCodecs.sniff(corruptJpeg) == MediaCodecs.Jpeg)
    assert(MediaCodecs.sniff(corruptPng) == MediaCodecs.Png)
    assert(MediaCodecs.sniff(corruptWav) == MediaCodecs.Wav)
    assert(MediaCodecs.decodeImageGray(corruptJpeg).isEmpty)
    assert(MediaCodecs.decodeImageGray(corruptPng).isEmpty)
    assert(MediaCodecs.decodeAudioPcm(corruptWav).isEmpty)

    val df = Seq((1L, corruptJpeg), (2L, corruptPng)).toDF("doc_id", "payload")
    val auto = Multimodal.resizeImages(df, "doc_id", 4, 2, 2, codec = "auto")
      .collect().sortBy(_.doc_id)
    val stub = Multimodal.resizeImages(df, "doc_id", 4, 2, 2, codec = "stub")
      .collect().sortBy(_.doc_id)
    assert(auto.length == 2)
    auto.zip(stub).foreach { case (a, s) =>
      assert(a.pixels.toSeq == s.pixels.toSeq, s"doc ${a.doc_id}")
    }
    val dfw = Seq((3L, corruptWav)).toDF("doc_id", "payload")
    val autoA = Multimodal.audioFeatures(dfw, "doc_id", 8, codec = "auto").collect().toSeq
    val stubA = Multimodal.audioFeatures(dfw, "doc_id", 8, codec = "stub").collect().toSeq
    assert(autoA == stubA)
  }

  test("mixed corpus: non-media payloads fall back to the stub inside auto mode") {
    val text = "not an image, just text bytes".getBytes("utf-8")
    val df = Seq((9L, text)).toDF("doc_id", "payload")
    val auto = Multimodal.resizeImages(df, "doc_id", 4, 2, 2, codec = "auto").collect().head
    val stub = Multimodal.resizeImages(df, "doc_id", 4, 2, 2, codec = "stub").collect().head
    assert(auto.pixels.toSeq == stub.pixels.toSeq)
    val autoA = Multimodal.audioFeatures(df, "doc_id", 8, codec = "auto").collect().toSeq
    val stubA = Multimodal.audioFeatures(df, "doc_id", 8, codec = "stub").collect().toSeq
    assert(autoA == stubA)
  }

  test("averageHash codec=auto is stable across lossless encodings of one image") {
    val df = Seq(
      (1L, fixture("fixture.png")),
      (2L, fixture("fixture.bmp"))
    ).toDF("doc_id", "payload")
    val hs = Multimodal.averageHash(df, "doc_id", srcWidth = 16, codec = "auto")
      .collect().sortBy(_.doc_id)
    assert((hs(0).hi, hs(0).lo) == (hs(1).hi, hs(1).lo))
  }

  test("extractFeatures codec=auto runs stats over decoded pixels, not container bytes") {
    val df = Seq((3L, fixture("fixture.png"))).toDF("doc_id", "payload")
    val f = Multimodal.extractFeatures(df, "doc_id", codec = "auto").collect().head
    val mean = refPx.map(_ & 0xff).sum.toDouble / refPx.length
    assert(math.abs(f.mean_byte - mean) < 1e-9)
    assert(f.n_bytes == fixture("fixture.png").length) // metadata stays container-level
  }
}
