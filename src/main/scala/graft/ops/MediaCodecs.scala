package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real media codecs over the JVM's built-in imaging/audio stacks
  * (`javax.imageio` for JPEG/PNG/BMP/GIF, `javax.sound.sampled` for
  * WAV/PCM) — no external native libraries, nothing beyond the JDK.
  *
  * These are the production decoders behind [[Multimodal]]'s `codec = "auto"`
  * mode: payloads are sniffed by magic bytes, containers the JVM can decode
  * are decoded for real, and anything else falls back to the deterministic
  * stub so oracle fixtures (raw text bytes) keep their replayable semantics.
  * Mirrors the reference's use of a real codec stack for media ingest
  * (flytemosaic/datasets/utils.py:99-151 pulls real imagery bytes through
  * rasterio/GDAL); here the Spark-side kernel is identical for stub and
  * real bytes — only the per-partition decode call changes.
  */
object MediaCodecs {

  /** Sniffed container kind of a binary payload. */
  sealed trait MediaKind
  case object Jpeg extends MediaKind
  case object Png extends MediaKind
  case object Gif extends MediaKind
  case object Bmp extends MediaKind
  case object Wav extends MediaKind
  case object Unknown extends MediaKind

  /** Magic-byte sniff — cheap, branch-only, safe on arbitrary bytes. */
  def sniff(payload: Array[Byte]): MediaKind = {
    if (payload.length < 12) return Unknown
    def u(i: Int): Int = payload(i) & 0xff
    if (u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff) Jpeg
    else if (u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G') Png
    else if (u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8') Gif
    else if (u(0) == 'B' && u(1) == 'M') Bmp
    else if (u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F' &&
             u(8) == 'W' && u(9) == 'A' && u(10) == 'V' && u(11) == 'E') Wav
    else Unknown
  }

  /** Decode an image payload to 8-bit grayscale `(width, height, pixels)`.
    * Returns None when the payload is not a decodable image (caller falls
    * back to the stub). Gray conversion renders into a TYPE_BYTE_GRAY
    * buffer — the JDK's standard colorimetric path, deterministic for a
    * given JVM imaging stack. */
  def decodeImageGray(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    sniff(payload) match {
      case Jpeg | Png | Gif | Bmp =>
        // Guarded like decodeAudioPcm: a payload whose magic bytes sniff
        // as an image but whose body is truncated/corrupt makes
        // ImageIO.read throw (IIOException) — that must surface as the
        // documented "None, caller falls back to stub" contract, not as
        // a failed executor task taking the whole job down.
        try {
          val img = ImageIO.read(new ByteArrayInputStream(payload))
          if (img == null) None
          else {
            val w = img.getWidth; val h = img.getHeight
            val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
            val g = gray.createGraphics()
            try g.drawImage(img, 0, 0, null) finally g.dispose()
            val px = new Array[Byte](w * h)
            gray.getRaster.getDataElements(0, 0, w, h, px)
            Some((w, h, px))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }

  /** Decode an audio payload to mono PCM samples (centered ints). WAV
    * containers go through `javax.sound.sampled` (any PCM bit depth the
    * JVM supports; multi-channel is averaged to mono). None for
    * non-audio payloads. */
  def decodeAudioPcm(payload: Array[Byte]): Option[Array[Int]] =
    sniff(payload) match {
      case Wav =>
        var in: AudioInputStream = null
        try {
          in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
          val fmt = in.getFormat
          val bytesPerSample = (fmt.getSampleSizeInBits + 7) / 8
          val channels = fmt.getChannels
          val frameBytes = bytesPerSample * channels
          val raw = readAll(in)
          val nFrames = raw.length / frameBytes
          val out = new Array[Int](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0L
            var c = 0
            while (c < channels) {
              acc += pcmSample(raw, (f * channels + c) * bytesPerSample, fmt)
              c += 1
            }
            out(f) = (acc / channels).toInt
            f += 1
          }
          Some(out)
        } catch { case scala.util.control.NonFatal(_) => None }
        finally if (in != null) in.close()
      case _ => None
    }

  private def readAll(in: AudioInputStream): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  /** One PCM sample at byte offset `off`, centered at 0. 8-bit WAV is
    * unsigned by spec; ≥9-bit is signed, little- or big-endian per fmt. */
  private def pcmSample(raw: Array[Byte], off: Int, fmt: AudioFormat): Int = {
    val bits = fmt.getSampleSizeInBits
    val nBytes = (bits + 7) / 8
    if (bits <= 8) (raw(off) & 0xff) - 128
    else {
      var v = 0
      if (fmt.isBigEndian) {
        var i = 0
        while (i < nBytes) { v = (v << 8) | (raw(off + i) & 0xff); i += 1 }
      } else {
        var i = nBytes - 1
        while (i >= 0) { v = (v << 8) | (raw(off + i) & 0xff); i -= 1 }
      }
      // sign-extend from `bits`
      val shift = 32 - bits
      (v << shift) >> shift
    }
  }

  // ---- encoders (fixture generation + spec round-trips) ----

  /** Encode an 8-bit gray image as PNG/JPEG/BMP bytes via ImageIO. */
  def encodeImageGray(w: Int, h: Int, px: Array[Byte], format: String): Array[Byte] = {
    require(px.length == w * h, s"pixel buffer ${px.length} != ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Encode mono PCM samples as a WAV container (8- or 16-bit). */
  def encodeWav(samples: Array[Int], sampleRate: Float, bits: Int): Array[Byte] = {
    require(bits == 8 || bits == 16, "8- or 16-bit PCM only")
    val bytesPer = bits / 8
    val raw = new Array[Byte](samples.length * bytesPer)
    var i = 0
    while (i < samples.length) {
      if (bits == 8) raw(i) = ((samples(i) + 128) & 0xff).toByte
      else {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, bits, 1, bits > 8, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
