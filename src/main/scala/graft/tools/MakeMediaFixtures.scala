package graft.tools

import java.nio.file.{Files, Paths}
import graft.ops.MediaCodecs

/** One-off generator for the committed media fixtures under
  * `src/test/resources/graft/media/` — REAL containers written by the
  * JVM's own encoders (`javax.imageio`, `javax.sound.sampled`), with
  * deterministic synthetic content (gradient+checker image, two-tone
  * sine audio) so the fixtures are reproducible from this source.
  * `MediaCodecSpec` decodes them through the same mapPartitions kernels
  * the oracle queries use.
  */
object MakeMediaFixtures {

  /** 16x12 gray gradient with an overlaid 4-px checkerboard. */
  def fixturePixels(w: Int = 16, h: Int = 12): Array[Byte] = {
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val grad = (x * 255) / (w - 1)
      val check = if (((x / 4) + (y / 4)) % 2 == 0) 32 else -32
      px(y * w + x) = math.max(0, math.min(255, grad + check)).toByte
    }
    px
  }

  /** 441 samples of a 440.9-ish Hz two-tone at 8 kHz, 16-bit range. */
  def fixtureSamples(n: Int = 441): Array[Int] =
    Array.tabulate(n) { i =>
      val t = i / 8000.0
      val v = 0.6 * math.sin(2 * math.Pi * 440 * t) +
        0.3 * math.sin(2 * math.Pi * 1330 * t)
      math.round(v * 12000).toInt
    }

  def main(args: Array[String]): Unit = {
    val dir = Paths.get(
      if (args.nonEmpty) args(0) else "src/test/resources/graft/media")
    Files.createDirectories(dir)
    val px = fixturePixels()
    Files.write(dir.resolve("fixture.png"), MediaCodecs.encodeImageGray(16, 12, px, "png"))
    Files.write(dir.resolve("fixture.jpg"), MediaCodecs.encodeImageGray(16, 12, px, "jpg"))
    Files.write(dir.resolve("fixture.bmp"), MediaCodecs.encodeImageGray(16, 12, px, "bmp"))
    Files.write(dir.resolve("fixture16.wav"), MediaCodecs.encodeWav(fixtureSamples(), 8000f, 16))
    Files.write(dir.resolve("fixture8.wav"),
      MediaCodecs.encodeWav(fixtureSamples().map(s => math.max(-128, math.min(127, s / 128))), 8000f, 8))
    println(s"wrote fixtures to $dir")
  }
}
