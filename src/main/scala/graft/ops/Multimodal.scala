package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE north star): media as opaque
  * `BINARY` payloads + typed metadata, with decode/feature-extraction as
  * per-partition batch functions.
  *
  * Two decode modes share every kernel:
  *  - `codec = "stub"` (default): the deterministic byte-level fake —
  *    replayable in any engine, so it is what the DuckDB oracle fixtures
  *    exercise (text bytes stand in for media bytes).
  *  - `codec = "auto"`: REAL decode via [[MediaCodecs]] — magic-byte
  *    sniffing, then `javax.imageio` for JPEG/PNG/BMP/GIF and
  *    `javax.sound.sampled` for WAV/PCM; payloads that are not decodable
  *    media fall back to the stub, so mixed corpora (some rows media,
  *    some text) run in one pass.
  * Everything around the decode call — binary schema, mapPartitions batch
  * shape, partition sizing, output schema — is identical in both modes;
  * `MediaCodecSpec` drives real JPEG/PNG/WAV fixtures through the same
  * kernels the oracle queries use.
  */
object Multimodal {

  final case class MediaFeature(
      doc_id: Long, n_bytes: Long, mean_byte: Double, feature: Array[Float])

  /** STUB decoder: byte stats + a fake fixed-width "feature vector" from
    * byte-range means. Deterministic in the payload. */
  def decodeStub(payload: Array[Byte]): (Double, Array[Float]) = {
    val n = payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += payload(i) & 0xff; i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    val dim = 4
    val feat = new Array[Float](dim)
    if (n == 0) return (mean, feat) // zero-length payload: all-zero features
    var d2 = 0
    while (d2 < dim) {
      val lo = d2 * n / dim; val hi = math.max(lo + 1, (d2 + 1) * n / dim)
      var s = 0L; var j = lo
      while (j < hi) { s += payload(j) & 0xff; j += 1 }
      feat(d2) = (s.toDouble / (hi - lo)).toFloat
      d2 += 1
    }
    (mean, feat)
  }

  /** Attach a binary payload column (here: utf-8 of a text column — the
    * stand-in for image/audio bytes read from object storage). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "utf-8"))

  /** Batch feature extraction over binary payloads: mapPartitions so a real
    * decoder initializes once per partition (codec context, GPU handle …)
    * and streams the batch — the Scala-side shape of a pandas-UDF batch.
    * With `codec = "auto"`, image payloads are first decoded to gray pixels
    * by [[MediaCodecs]] and the stats run over the decoded raster. */
  def extractFeatures(df: DataFrame, id: String,
                      codec: String = "stub"): Dataset[MediaFeature] = {
    requireCodec(codec)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(id)
    val payloadIdx = df.schema.fieldIndex("payload")
    val real = codec == "auto"
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (once, not per row)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val decoded =
          if (real) MediaCodecs.decodeImageGray(payload).map(_._3).getOrElse(payload)
          else payload
        val (mean, feat) = decodeStub(decoded)
        MediaFeature(r.getLong(idIdx), payload.length.toLong, mean, feat)
      }
    }
  }

  private def requireCodec(codec: String): Unit =
    require(codec == "stub" || codec == "auto", s"codec must be stub|auto, got $codec")

  final case class ResizedImage(
      doc_id: Long, width: Int, height: Int, pixels: Array[Byte])

  /** STUB image decode: payload bytes row-major as a `width`-wide gray
    * image (height = ceil(n / width)), zero-padded — deterministic fake in
    * place of a JPEG/PNG codec; the resize math below is real. */
  private[graft] def decodeImageStub(payload: Array[Byte], width: Int): (Int, Int, Array[Byte]) = {
    val h = math.max(1, (payload.length + width - 1) / width)
    val px = java.util.Arrays.copyOf(payload, width * h)
    (width, h, px)
  }

  /** Image resize over binary payloads: nearest-neighbor to (outW, outH),
    * one decoder per partition, output = typed (width, height, pixels)
    * rows. `codec = "auto"` decodes real JPEG/PNG/BMP/GIF payloads via
    * [[MediaCodecs.decodeImageGray]] (non-media payloads fall back to the
    * stub); `codec = "stub"` is the deterministic oracle-replayable fake. */
  def resizeImages(df: DataFrame, id: String, srcWidth: Int,
                   outW: Int, outH: Int,
                   codec: String = "stub"): Dataset[ResizedImage] = {
    requireCodec(codec)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(id)
    val payloadIdx = df.schema.fieldIndex("payload")
    val real = codec == "auto"
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val (w, h, px) =
          if (real)
            MediaCodecs.decodeImageGray(payload)
              .getOrElse(decodeImageStub(payload, srcWidth))
          else decodeImageStub(payload, srcWidth)
        val out = new Array[Byte](outW * outH)
        var y = 0
        while (y < outH) {
          val sy = math.min(h - 1, y * h / outH)
          var x = 0
          while (x < outW) {
            val sx = math.min(w - 1, x * w / outW)
            out(y * outW + x) = px(sy * w + sx)
            x += 1
          }
          y += 1
        }
        ResizedImage(r.getLong(idIdx), outW, outH, out)
      }
    }
  }

  final case class Thumbnail(doc_id: Long, thumb: Array[Byte])

  /** Decode → resize → RE-ENCODE (the thumbnail sink): the full
    * image-transform loop a multimodal corpus pays per row, emitted as
    * real PNG (or BMP) bytes ready for a binary-column write. Same
    * mapPartitions batch shape and codec dispatch as [[resizeImages]];
    * the stub decode path still re-encodes, so the op is exercisable
    * without real media. MediaCodecSpec round-trips: decoding the
    * emitted bytes reproduces resizeImages' pixel matrix exactly
    * (PNG/BMP are lossless for 8-bit gray). */
  def thumbnails(df: DataFrame, id: String, srcWidth: Int,
                 outW: Int, outH: Int, codec: String = "stub",
                 format: String = "png"): Dataset[Thumbnail] = {
    val spark = df.sparkSession
    import spark.implicits._
    resizeImages(df, id, srcWidth, outW, outH, codec)
      .map(r => Thumbnail(r.doc_id,
        MediaCodecs.encodeImageGray(outW, outH, r.pixels, format)))
  }

  final case class VideoFrame(
      doc_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** Video frame sampling (decode stubbed, sampling real): treat the
    * payload as `frameBytes`-sized frames at `fps`; emit every `stride`-th
    * frame as its own row with its timestamp — the explode-shaped op a
    * training pipeline runs before per-frame feature extraction. Truncated
    * trailing bytes (a partial frame) are dropped, like a real demuxer. */
  def sampleFrames(df: DataFrame, id: String, frameBytes: Int, fps: Double,
                   stride: Int): Dataset[VideoFrame] = {
    require(frameBytes > 0 && stride > 0 && fps > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(id)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val docId = r.getLong(idIdx)
        val nFrames = payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          VideoFrame(docId, f, math.round(f * 1000.0 / fps),
            java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }
  }

  final case class AudioWindow(
      doc_id: Long, window_idx: Int, n_samples: Int, rms: Double, zero_crossings: Long)

  /** Audio feature extraction: decode to mono PCM samples, then emit
    * per-window RMS energy + zero-crossing count — the two classic
    * frame-level audio features. `codec = "auto"` runs real WAV/PCM decode
    * via [[MediaCodecs.decodeAudioPcm]] (any JVM-supported bit depth,
    * multi-channel averaged to mono; non-audio payloads fall back to the
    * stub); `codec = "stub"` is the deterministic byte-level fake the
    * oracle replays. Same production shape as the image/video paths:
    * mapPartitions with per-partition decoder init as the codec slot,
    * one output row per analysis window, trailing partial window kept. */
  def audioFeatures(df: DataFrame, id: String,
                    windowSamples: Int,
                    codec: String = "stub"): Dataset[AudioWindow] = {
    require(windowSamples > 0)
    requireCodec(codec)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(id)
    val payloadIdx = df.schema.fieldIndex("payload")
    val real = codec == "auto"
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val docId = r.getLong(idIdx)
        val samples =
          if (real) MediaCodecs.decodeAudioPcm(payload).getOrElse(stubSamples(payload))
          else stubSamples(payload)
        val nWin = (samples.length + windowSamples - 1) / windowSamples
        (0 until nWin).iterator.map { w =>
          val lo = w * windowSamples
          val hi = math.min(samples.length, lo + windowSamples)
          var sumSq = 0.0
          var zc = 0L
          var prevSign = 0
          var i = lo
          while (i < hi) {
            val s = samples(i)
            sumSq += s.toDouble * s
            val sign = if (s > 0) 1 else if (s < 0) -1 else 0
            if (sign != 0) {
              if (prevSign != 0 && sign != prevSign) zc += 1
              prevSign = sign
            }
            i += 1
          }
          AudioWindow(docId, w, hi - lo, math.sqrt(sumSq / (hi - lo)), zc)
        }
      }
    }
  }

  /** Stub "PCM decode": each payload byte as an amplitude centered at 64
    * (ASCII text swings around the letter/space boundary, giving
    * non-degenerate sign changes) — the oracle-replayable fake. */
  private[graft] def stubSamples(payload: Array[Byte]): Array[Int] = {
    val out = new Array[Int](payload.length)
    var i = 0
    while (i < payload.length) { out(i) = (payload(i) & 0xFF) - 64; i += 1 }
    out
  }

  final case class ImageHash(doc_id: Long, hi: Long, lo: Long)

  /** Average-hash (aHash) perceptual fingerprint: resize to 8×8, then one
    * bit per pixel — is it brighter than the image mean. All-integer
    * threshold (`px·64 > Σpx`, no division) so the bit pattern is exactly
    * reproducible in any engine. The 64 bits are returned as two 32-bit
    * halves in BIGINTs: a single i64 hash would need signed-overflow
    * agreement across engines for bit 63, and the split halves also hand
    * the Hamming banding its natural 16-bit band boundaries. */
  def averageHash(df: DataFrame, id: String, srcWidth: Int,
                  codec: String = "stub"): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    resizeImages(df, id, srcWidth, outW = 8, outH = 8, codec = codec).map { r =>
      val px = r.pixels.map(_ & 0xff)
      val total = px.sum
      var hi = 0L
      var lo = 0L
      var i = 0
      while (i < 32) {
        if (px(i) * 64 > total) hi |= 1L << (31 - i)
        if (px(i + 32) * 64 > total) lo |= 1L << (63 - (i + 32))
        i += 1
      }
      ImageHash(r.doc_id, hi, lo)
    }
  }
}
