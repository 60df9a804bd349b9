package graft

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import java.nio.{ByteBuffer, ByteOrder}
import graft.raster.GeoTiff

/** Compression 7 (new-style JPEG, TIFF/EP) decode: self-contained tile
  * streams and the GDAL-style shared-JPEGTables abbreviated form.
  */
class GeoTiffJpegSpec extends AnyFunSuite {

  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  /** Split an interchange JPEG into (abbreviated table stream SOI..EOI,
    * abbreviated image stream) — the TIFF/EP JPEGTables layout. */
  private def splitTables(jpeg: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val tables = new java.io.ByteArrayOutputStream()
    val image = new java.io.ByteArrayOutputStream()
    tables.write(0xFF); tables.write(0xD8)
    image.write(0xFF); image.write(0xD8)
    var p = 2
    var done = false
    while (!done) {
      require((jpeg(p) & 0xff) == 0xFF, s"marker expected at $p")
      val marker = jpeg(p + 1) & 0xff
      if (marker == 0xDA) { // SOS: entropy data + EOI all go to the image
        image.write(jpeg, p, jpeg.length - p)
        done = true
      } else {
        val len = ((jpeg(p + 2) & 0xff) << 8) | (jpeg(p + 3) & 0xff)
        val seg = 2 + len
        if (marker == 0xDB || marker == 0xC4) tables.write(jpeg, p, seg)
        else image.write(jpeg, p, seg)
        p += seg
      }
    }
    tables.write(0xFF); tables.write(0xD9)
    (tables.toByteArray, image.toByteArray)
  }

  /** Hand-build a classic little-endian TIFF with JPEG strips. */
  private def makeJpegTiff(w: Int, h: Int, bands: Int, rps: Int,
      strips: Seq[Array[Byte]], tables: Option[Array[Byte]]): Array[Byte] = {
    var off = 8L
    def place(len: Int): Long = { val o = off; off += len + (len & 1); o }
    val stripOffs = strips.map(s => place(s.length))
    val tablesOff = tables.map(t => place(t.length))
    val entries = (Seq(
      (256, 3, Array(w.toLong)), (257, 3, Array(h.toLong)),
      (258, 3, Array.fill(bands)(8L)), (259, 3, Array(7L)),
      (262, 3, Array(if (bands == 1) 1L else 6L)),
      (273, 4, stripOffs.toArray), (277, 3, Array(bands.toLong)),
      (278, 3, Array(rps.toLong)),
      (279, 4, strips.map(_.length.toLong).toArray),
      (284, 3, Array(1L)), (339, 3, Array.fill(bands)(1L))) ++
      tables.map(t => (347, 7, Array(t.length.toLong))).toSeq
      ).sortBy(_._1)
    def typeSize(t: Int) = t match { case 3 => 2; case 7 => 1; case _ => 4 }
    val extOff = scala.collection.mutable.Map[Int, Long]()
    for ((tag, typ, vs) <- entries if tag != 347) {
      val bl = typeSize(typ) * vs.length
      if (bl > 4) extOff(tag) = place(bl)
    }
    val ifdOff = off
    val bb = ByteBuffer.allocate((ifdOff + 2 + entries.size * 12 + 4).toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff.toInt)
    strips.zip(stripOffs).foreach { case (s, o) =>
      bb.position(o.toInt); bb.put(s)
    }
    tables.zip(tablesOff).foreach { case (t, o) =>
      bb.position(o.toInt); bb.put(t)
    }
    for ((tag, typ, vs) <- entries if extOff.contains(tag)) {
      bb.position(extOff(tag).toInt)
      if (typ == 3) vs.foreach(v => bb.putShort(v.toShort))
      else vs.foreach(v => bb.putInt(v.toInt))
    }
    bb.position(ifdOff.toInt); bb.putShort(entries.size.toShort)
    for ((tag, typ, vs) <- entries) {
      bb.putShort(tag.toShort).putShort(typ.toShort)
      val count = if (tag == 347) vs(0) else vs.length.toLong
      bb.putInt(count.toInt)
      val vpos = bb.position()
      if (tag == 347) bb.putInt(tablesOff.get.toInt)
      else if (extOff.contains(tag)) bb.putInt(extOff(tag).toInt)
      else if (typ == 3) vs.foreach(v => bb.putShort(v.toShort))
      else vs.foreach(v => bb.putInt(v.toInt))
      bb.position(vpos + 4)
    }
    bb.putInt(0)
    bb.array()
  }

  /** Smooth gradient (JPEG-friendly: round-trip error stays small). */
  private def grayImage(w: Int, h: Int, y0: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 5 + (y0 + y) * 3) % 200 + 20)
    img
  }

  test("JPEG strips (self-contained interchange streams) decode") {
    val w = 16; val h = 12; val rps = 8
    val s0 = encodeJpeg(grayImage(w, 8, 0), 0.98f)
    val s1 = encodeJpeg(grayImage(w, 4, 8), 0.98f) // short final strip
    val tif = makeJpegTiff(w, h, 1, rps, Seq(s0, s1), None)
    val fi = GeoTiff.info(tif)
    assert(fi.compression == 7 && fi.bands == 1 && fi.bits == 8)
    val got = GeoTiff.readBand(tif, 0)
    assert(got.length == w * h)
    var maxErr = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val want = (x * 5 + y * 3) % 200 + 20
      maxErr = math.max(maxErr, math.abs(got(y * w + x) - want))
    }
    assert(maxErr <= 6.0, s"max JPEG round-trip error $maxErr")
  }

  test("JPEGTables (tag 347) abbreviated streams decode identically") {
    val w = 16; val h = 12; val rps = 8
    val j0 = encodeJpeg(grayImage(w, 8, 0), 0.98f)
    val j1 = encodeJpeg(grayImage(w, 4, 8), 0.98f)
    val (t0, a0) = splitTables(j0)
    val (_, a1) = splitTables(j1) // same encoder settings => same tables
    val full = makeJpegTiff(w, h, 1, rps, Seq(j0, j1), None)
    val abbr = makeJpegTiff(w, h, 1, rps, Seq(a0, a1), Some(t0))
    assert(GeoTiff.info(abbr).jpegTables.exists(_.length == t0.length))
    val want = GeoTiff.readBand(full, 0)
    val got = GeoTiff.readBand(abbr, 0)
    assert(got.toSeq == want.toSeq,
      "abbreviated+merged stream must decode bit-identically to interchange")
  }

  test("3-band JPEG (YCbCr-coded) decodes to interleaved RGB samples") {
    val w = 24; val h = 16
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      img.getRaster.setSample(x, y, 0, 30 + x * 4) // R
      img.getRaster.setSample(x, y, 1, 40 + y * 5) // G
      img.getRaster.setSample(x, y, 2, 120)        // B (flat)
    }
    val tif = makeJpegTiff(w, h, 3, h, Seq(encodeJpeg(img, 0.98f)), None)
    val fi = GeoTiff.info(tif)
    assert(fi.compression == 7 && fi.bands == 3)
    val bandErr = (0 until 3).map { b =>
      val got = GeoTiff.readBand(tif, b)
      var m = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        val want = b match {
          case 0 => 30 + x * 4
          case 1 => 40 + y * 5
          case 2 => 120
        }
        m = math.max(m, math.abs(got(y * w + x) - want))
      }
      m
    }
    assert(bandErr.forall(_ <= 12.0), s"per-band max errors $bandErr")
  }
}
