package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("resizeImages: nearest-neighbor math over the stub decode") {
    // 16 bytes @ srcWidth 4 → 4x4 image; resize to 2x2 picks (0,0) (0,2) (2,0) (2,2)
    val df = Seq((1L, (0 until 16).map(_.toByte).toArray)).toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(df, "doc_id", srcWidth = 4, outW = 2, outH = 2)
      .collect().head
    assert(out.width == 2 && out.height == 2)
    assert(out.pixels.toSeq == Seq[Byte](0, 2, 8, 10))
    // zero-padding: 5 bytes @ width 4 → 4x2 with 3 pad zeros in row 1
    val padded = Multimodal.resizeImages(
      Seq((2L, Array[Byte](9, 9, 9, 9, 9))).toDF("doc_id", "payload"),
      "doc_id", srcWidth = 4, outW = 2, outH = 2).collect().head
    assert(padded.pixels.toSeq == Seq[Byte](9, 9, 9, 0))
  }

  test("audioFeatures: windowed RMS + zero crossings, trailing partial kept") {
    // samples after centering (b - 64): window0 = [-32, 32, -32, 32]
    // (3 sign changes), window1 = [0, -64] (zeros skipped, one nonzero:
    // 0 crossings) — trailing 2-sample partial window KEPT
    val payload = Array[Byte](32, 96, 32, 96, 64, 0)
    val df = Seq((3L, payload)).toDF("doc_id", "payload")
    val ws = Multimodal.audioFeatures(df, "doc_id", windowSamples = 4)
      .collect().sortBy(_.window_idx)
    assert(ws.map(w => (w.window_idx, w.n_samples)).toSeq == Seq((0, 4), (1, 2)))
    assert(ws(0).rms == 32.0 && ws(0).zero_crossings == 3)
    assert(math.abs(ws(1).rms - math.sqrt((0.0 + 64.0 * 64) / 2)) < 1e-12)
    assert(ws(1).zero_crossings == 0)
  }

  test("sampleFrames: stride sampling with timestamps, partial frame dropped") {
    val payload = (0 until 10).map(_.toByte).toArray // 3 full 3-byte frames + 1 left over
    val df = Seq((7L, payload)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(df, "doc_id", frameBytes = 3, fps = 2.0, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2)) // frames 0 and 2; frame 1 skipped
    assert(frames.map(_.ts_ms).toSeq == Seq(0L, 1000L)) // 2 fps → 500ms/frame
    assert(frames(0).frame.toSeq == Seq[Byte](0, 1, 2))
    assert(frames(1).frame.toSeq == Seq[Byte](6, 7, 8))
  }
}
