package graft.raster

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/** Minimal tiled-GeoTIFF writer — the COG-shaped scene/feature sink
  * (SURVEY §2.1 S6; reference: rio.to_raster(driver="COG", BLOCKSIZE=512),
  * flytemosaic/datasets/utils.py:143-150).
  *
  * Emits a little-endian TIFF: tiled float32 samples (interleaved when
  * bands > 1), zlib-deflate per tile, GeoTIFF ModelPixelScale +
  * ModelTiepoint, GDAL ASCII nodata. With `overviews = true` it appends
  * reduced-resolution IFDs (NewSubfileType = 1, nearest decimation, halving
  * until the level fits one tile) — the COG pyramid the reference's COG
  * driver builds. With `forceBigTiff` (or an estimated size beyond the
  * classic 4 GiB offset range — the `BIGTIFF=IF_SAFER` rule of
  * datasets/utils.py:149) the container is BigTIFF (version 43, 8-byte
  * offsets). Note the in-memory writer itself returns one byte array, so
  * its practical ceiling is 2 GiB — the BigTIFF path is format parity for
  * interop, not a streaming jumbo writer.
  */
object GeoTiffWriter {

  private final case class Page(w: Int, h: Int, bands: Seq[Array[Float]], reduced: Boolean)

  /** Encode `bands` (each width×height row-major floats, interleaved on
    * write) as tiled deflate float32 GeoTIFF bytes. */
  def write(width: Int, height: Int, bands: Seq[Array[Float]],
            tileSize: Int = 256,
            pixelScale: (Double, Double) = (1.0, 1.0),
            tiepoint: (Double, Double) = (0.0, 0.0),
            nodata: Option[Double] = None,
            overviews: Boolean = false,
            forceBigTiff: Boolean = false): Array[Byte] = {
    require(bands.nonEmpty && bands.forall(_.length == width * height))
    val nb = bands.length

    // page list: full resolution + (optionally) nearest-decimated halvings
    // until a level fits in one tile. Level ℓ samples the FULL-RES grid at
    // stride 2^ℓ (exact nearest; no error accumulation across levels).
    var pages = Vector(Page(width, height, bands, reduced = false))
    if (overviews) {
      var w = width; var h = height; var stride = 1
      while (math.max(w, h) > tileSize) {
        w = (w + 1) / 2; h = (h + 1) / 2; stride *= 2
        val st = stride
        val (lw, lh) = (w, h)
        val dec = bands.map { src =>
          Array.tabulate(lw * lh) { i =>
            val y = math.min((i / lw) * st, height - 1)
            val x = math.min((i % lw) * st, width - 1)
            src(y * width + x)
          }
        }
        pages :+= Page(lw, lh, dec, reduced = true)
      }
    }

    // encode every page's tiles (interleaved samples, edge tiles zero-padded)
    final case class Enc(tw: Int, th: Int, tiles: IndexedSeq[Array[Byte]])
    val encoded = pages.map { p =>
      val tw = math.min(tileSize, ((p.w + 15) / 16) * 16)
      val th = math.min(tileSize, ((p.h + 15) / 16) * 16)
      val across = (p.w + tw - 1) / tw
      val down = (p.h + th - 1) / th
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
                if (gy < p.h && gx < p.w) p.bands(b)(gy * p.w + gx) else 0f)
              b += 1
            }
            x += 1
          }
          y += 1
        }
        deflate(buf.array())
      }
      Enc(tw, th, tiles)
    }

    val tileBytesTotal = encoded.iterator.flatMap(_.tiles).map(_.length.toLong + 1).sum
    val big = forceBigTiff || tileBytesTotal > 3800000000L // BIGTIFF=IF_SAFER

    final case class Tag(tag: Int, typ: Int, values: Seq[Long], dbl: Seq[Double] = Nil,
                         asciiV: String = null)
    val offTyp = if (big) 16 else 4 // tile offsets: LONG8 in BigTIFF
    val nodataAscii = nodata.map(v => (if (v.isNaN) "nan" else v.toString) + "\u0000") // TIFF ASCII: NUL-terminated, NUL in count

    def pageTags(p: Page, e: Enc): Seq[Tag] = {
      var tags = Seq(
        Tag(256, 4, Seq(p.w)), Tag(257, 4, Seq(p.h)),
        Tag(258, 3, Seq.fill(nb)(32L)), Tag(259, 3, Seq(8L)),
        Tag(262, 3, Seq(1L)), Tag(277, 3, Seq(nb.toLong)),
        Tag(284, 3, Seq(1L)),
        Tag(322, 3, Seq(e.tw.toLong)), Tag(323, 3, Seq(e.th.toLong)),
        Tag(324, offTyp, Seq.fill(e.tiles.length)(0L)), // patched below
        Tag(325, 4, e.tiles.map(_.length.toLong)),
        Tag(339, 3, Seq.fill(nb)(3L)))
      if (p.reduced) tags :+= Tag(254, 4, Seq(1L)) // reduced-resolution page
      else {
        tags ++= Seq(
          Tag(33550, 12, Nil, Seq(pixelScale._1, pixelScale._2, 0.0)),
          Tag(33922, 12, Nil, Seq(0.0, 0.0, 0.0, tiepoint._1, tiepoint._2, 0.0)))
        nodataAscii.foreach(s => tags :+= Tag(42113, 2, Nil, Nil, s))
      }
      tags.sortBy(_.tag)
    }
    val allTags = pages.zip(encoded).map { case (p, e) => pageTags(p, e) }

    def tagByteLen(t: Tag): Long = t.typ match {
      case 2 => t.asciiV.length
      case 3 => 2L * t.values.length
      case 4 => 4L * t.values.length
      case 12 => 8L * t.dbl.length
      case 16 => 8L * t.values.length
    }
    val headerLen = if (big) 16 else 8
    val entryLen = if (big) 20 else 12
    val inlineMax = if (big) 8 else 4
    def ifdLen(n: Int): Long =
      if (big) 8L + n.toLong * entryLen + 8 else 2L + n.toLong * entryLen + 4

    // layout: header | per page [IFD | ext arrays] | all tile data
    var cursor = headerLen.toLong
    val ifdOffsets = new Array[Long](pages.length)
    val extOffsets = allTags.zipWithIndex.map { case (tags, pi) =>
      ifdOffsets(pi) = cursor
      cursor += ifdLen(tags.length)
      tags.map { t =>
        val len = tagByteLen(t)
        if (len > inlineMax) { val r = cursor; cursor += (len + 1) & ~1L; r } else -1L
      }
    }
    val tileOffsets = encoded.map { e =>
      e.tiles.map { td => val o = cursor; cursor += (td.length + 1) & ~1L; o }
    }
    require(cursor <= Int.MaxValue,
      s"in-memory writer caps at 2 GiB (need $cursor); stream pages instead")
    val patched = allTags.zipWithIndex.map { case (tags, pi) =>
      tags.map(t => if (t.tag == 324) t.copy(values = tileOffsets(pi).map(identity)) else t)
    }

    val out = ByteBuffer.allocate(cursor.toInt).order(ByteOrder.LITTLE_ENDIAN)
    if (big) {
      out.put('I'.toByte).put('I'.toByte).putShort(43)
      out.putShort(8).putShort(0).putLong(ifdOffsets(0))
    } else
      out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffsets(0).toInt)

    def putOffset(v: Long): Unit = { if (big) out.putLong(v) else out.putInt(v.toInt); () }

    for (pi <- pages.indices) {
      out.position(ifdOffsets(pi).toInt)
      val tags = patched(pi)
      if (big) out.putLong(tags.length.toLong) else out.putShort(tags.length.toShort)
      tags.zip(extOffsets(pi)).foreach { case (t, ext) =>
        out.putShort(t.tag.toShort).putShort(t.typ.toShort)
        val count = t.typ match {
          case 2 => t.asciiV.length; case 12 => t.dbl.length; case _ => t.values.length
        }
        if (big) out.putLong(count.toLong) else out.putInt(count)
        val here = out.position()
        if (ext < 0) { writeTagValues(out, here, t.typ, t.values, t.dbl, t.asciiV); out.position(here + inlineMax) }
        else putOffset(ext)
      }
      putOffset(if (pi + 1 < pages.length) ifdOffsets(pi + 1) else 0L) // next IFD
      tags.zip(extOffsets(pi)).foreach { case (t, ext) =>
        if (ext >= 0) writeTagValues(out, ext.toInt, t.typ, t.values, t.dbl, t.asciiV)
      }
    }
    encoded.zip(tileOffsets).foreach { case (e, offs) =>
      e.tiles.zip(offs).foreach { case (td, o) => out.position(o.toInt); out.put(td) }
    }
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
      case 16 => values.foreach(out.putLong)
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
