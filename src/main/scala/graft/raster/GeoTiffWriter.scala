package graft.raster

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/** Minimal tiled-GeoTIFF writer — the COG-shaped scene/feature sink
  * (SURVEY §2.1 S6; reference: rio.to_raster(driver="COG", BLOCKSIZE=512),
  * flytemosaic/datasets/utils.py:143-150).
  *
  * Emits a classic little-endian TIFF: single IFD, tiled float32 samples
  * (interleaved when bands > 1), zlib-deflate per tile, GeoTIFF
  * ModelPixelScale + ModelTiepoint, GDAL ASCII nodata. This is the COG
  * layout minus overviews (a COG is a tiled TIFF whose IFD precedes data;
  * readers that demand overview levels treat a single-level file as level
  * 0) — honest scope: enough for GeoTiff.readBand, GDAL, and the tests to
  * reopen; not a full pyramid builder.
  */
object GeoTiffWriter {

  /** Encode `bands` (each width×height row-major floats, interleaved on
    * write) as tiled deflate float32 GeoTIFF bytes. */
  def write(width: Int, height: Int, bands: Seq[Array[Float]],
            tileSize: Int = 256,
            pixelScale: (Double, Double) = (1.0, 1.0),
            tiepoint: (Double, Double) = (0.0, 0.0),
            nodata: Option[Double] = None): Array[Byte] = {
    require(bands.nonEmpty && bands.forall(_.length == width * height))
    val nb = bands.length
    val tw = math.min(tileSize, ((width + 15) / 16) * 16)
    val th = math.min(tileSize, ((height + 15) / 16) * 16)
    val across = (width + tw - 1) / tw
    val down = (height + th - 1) / th
    // encode tiles (interleaved samples, edge tiles zero-padded per spec)
    val tiles = (0 until across * down).map { t =>
      val ty = t / across; val tx = t % across
      val buf = ByteBuffer.allocate(tw * th * nb * 4).order(ByteOrder.LITTLE_ENDIAN)
      val fb = buf.asFloatBuffer()
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) {
          val gy = ty * th + y; val gx = tx * tw + x
          var b = 0
          while (b < nb) {
            fb.put((y * tw + x) * nb + b,
              if (gy < height && gx < width) bands(b)(gy * width + gx) else 0f)
            b += 1
          }
          x += 1
        }
        y += 1
      }
      deflate(buf.array())
    }

    // IFD assembly: header(8) | IFD | external arrays | tile data
    final case class Tag(tag: Int, typ: Int, values: Seq[Long], dbl: Seq[Double] = Nil,
                         asciiV: String = null)
    val nodataAscii = nodata.map(v => (if (v.isNaN) "nan" else v.toString) + "\u0000") // TIFF ASCII: NUL-terminated, NUL in count
    var tags = Seq(
      Tag(256, 4, Seq(width)), Tag(257, 4, Seq(height)),
      Tag(258, 3, Seq.fill(nb)(32L)), Tag(259, 3, Seq(8L)),
      Tag(262, 3, Seq(1L)), Tag(277, 3, Seq(nb.toLong)),
      Tag(284, 3, Seq(1L)),
      Tag(322, 3, Seq(tw.toLong)), Tag(323, 3, Seq(th.toLong)),
      Tag(324, 4, Seq.fill(tiles.length)(0L)), // patched below
      Tag(325, 4, tiles.map(_.length.toLong)),
      Tag(339, 3, Seq.fill(nb)(3L)),
      Tag(33550, 12, Nil, Seq(pixelScale._1, pixelScale._2, 0.0)),
      Tag(33922, 12, Nil, Seq(0.0, 0.0, 0.0, tiepoint._1, tiepoint._2, 0.0)))
    nodataAscii.foreach(s => tags :+= Tag(42113, 2, Nil, Nil, s))
    tags = tags.sortBy(_.tag)

    def tagByteLen(t: Tag): Int = t.typ match {
      case 2 => t.asciiV.length
      case 3 => 2 * t.values.length
      case 4 => 4 * t.values.length
      case 12 => 8 * t.dbl.length
    }
    val ifdOff = 8
    val ifdLen = 2 + tags.length * 12 + 4
    var extOff = ifdOff + ifdLen
    val extOffsets = tags.map { t =>
      val len = tagByteLen(t)
      val o = if (len > 4) { val r = extOff; extOff += (len + 1) & ~1; r } else -1
      o
    }
    var dataOff = extOff
    val tileOffsets = tiles.map { td => val o = dataOff; dataOff += (td.length + 1) & ~1; o }
    val patched = tags.map(t => if (t.tag == 324) t.copy(values = tileOffsets.map(_.toLong)) else t)

    val out = ByteBuffer.allocate(dataOff).order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    out.position(ifdOff)
    out.putShort(patched.length.toShort)
    patched.zip(extOffsets).foreach { case (t, ext) =>
      out.putShort(t.tag.toShort).putShort(t.typ.toShort)
      val count = t.typ match {
        case 2 => t.asciiV.length; case 12 => t.dbl.length; case _ => t.values.length
      }
      out.putInt(count)
      val here = out.position()
      if (ext < 0) { writeTagValues(out, here, t.typ, t.values, t.dbl, t.asciiV); out.position(here + 4) }
      else out.putInt(ext)
    }
    out.putInt(0) // next IFD
    patched.zip(extOffsets).foreach { case (t, ext) =>
      if (ext >= 0) writeTagValues(out, ext, t.typ, t.values, t.dbl, t.asciiV)
    }
    tiles.zip(tileOffsets).foreach { case (td, o) => out.position(o); out.put(td) }
    out.array()
  }

  private def writeTagValues(out: ByteBuffer, at: Int, typ: Int,
                             values: Seq[Long], dbl: Seq[Double], asciiV: String): Unit = {
    out.position(at)
    typ match {
      case 2 => out.put(asciiV.getBytes("US-ASCII"))
      case 3 => values.foreach(v => out.putShort(v.toShort))
      case 4 => values.foreach(v => out.putInt(v.toInt))
      case 12 => dbl.foreach(out.putDouble)
    }
    ()
  }

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater(1)
    d.setInput(bytes); d.finish()
    val outS = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) outS.write(buf, 0, d.deflate(buf))
    d.end()
    outS.toByteArray
  }
}
