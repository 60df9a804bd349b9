package graft.raster

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Minimal tiled-GeoTIFF reader — the real-raster ingest path (SURVEY §2.1
  * S2; reference: rioxarray.open_rasterio over downloaded scene COGs,
  * flytemosaic/datasets/utils.py:123-126).
  *
  * Implements the public TIFF 6.0 + GeoTIFF structures directly (classic
  * TIFF, either byte order): tiled or striped layout, PlanarConfiguration
  * 1 (interleaved) or 2 (planar), Compression 1 (none) / 8 / 32946
  * (zlib-deflate, what the COG driver emits for DEFLATE), samples of
  * uint8/16/32 or float32 promoted to Float, plus the GeoTIFF
  * ModelPixelScale / ModelTiepoint tags and GDAL's ASCII nodata tag.
  * Deliberately NOT a full TIFF stack: no BigTIFF, predictors, JPEG/LZW —
  * a reader for the scene files this engine's sink family writes and the
  * subset of COGs the reference pipeline produces
  * (driver=COG, BLOCKSIZE=512, default DEFLATE-or-none).
  *
  * Byte-array based by design: scenes are fetched to local disk first
  * (Fetch, S5) exactly like the reference's download-then-open, and one
  * scene tile payload is executor-memory sized (512² × bands × 4 B).
  */
object GeoTiff {

  final case class Info(
      width: Int, height: Int, bands: Int, bits: Int, sampleFormat: Int,
      compression: Int, planar: Int, tileW: Int, tileH: Int,
      offsets: Array[Long], byteCounts: Array[Long],
      pixelScale: Option[(Double, Double)],
      tiepoint: Option[(Double, Double)],
      nodata: Option[Double]) {
    def tilesAcross: Int = (width + tileW - 1) / tileW
    def tilesDown: Int = (height + tileH - 1) / tileH
    def tilesPerPlane: Int = tilesAcross * tilesDown
  }

  private final case class Entry(tag: Int, typ: Int, count: Long, raw: Array[Byte],
                                 order: ByteOrder, valueOffset: Long)

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1; case 3 => 2; case 4 | 11 => 4; case 5 | 12 => 8
    case other => throw new IllegalArgumentException(s"TIFF type $other unsupported")
  }

  private def parseEntries(bytes: Array[Byte]): Map[Int, Entry] = {
    val head = ByteBuffer.wrap(bytes, 0, 8)
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("not a TIFF (bad byte-order mark)")
    }
    head.order(order)
    require(head.getShort(2) == 42, "not a classic TIFF (magic != 42)")
    val ifdOff = java.lang.Integer.toUnsignedLong(head.getInt(4))
    val bb = ByteBuffer.wrap(bytes).order(order)
    val n = java.lang.Short.toUnsignedInt(bb.getShort(ifdOff.toInt))
    (0 until n).map { i =>
      val e = ifdOff.toInt + 2 + i * 12
      val tag = java.lang.Short.toUnsignedInt(bb.getShort(e))
      val typ = java.lang.Short.toUnsignedInt(bb.getShort(e + 2))
      val count = java.lang.Integer.toUnsignedLong(bb.getInt(e + 4))
      val byteLen = typeSize(typ) * count.toInt
      val valueOffset =
        if (byteLen <= 4) e + 8L
        else java.lang.Integer.toUnsignedLong(bb.getInt(e + 8))
      tag -> Entry(tag, typ, count, bytes, order, valueOffset)
    }.toMap
  }

  private def longs(e: Entry): Array[Long] = {
    val bb = ByteBuffer.wrap(e.raw).order(e.order)
    Array.tabulate(e.count.toInt) { i =>
      val off = (e.valueOffset + i.toLong * typeSize(e.typ)).toInt
      e.typ match {
        case 3 => java.lang.Short.toUnsignedInt(bb.getShort(off)).toLong
        case 4 => java.lang.Integer.toUnsignedLong(bb.getInt(off))
        case 1 => java.lang.Byte.toUnsignedInt(bb.get(off)).toLong
        case t => throw new IllegalArgumentException(s"tag ${e.tag}: integer TIFF type expected, got $t")
      }
    }
  }

  private def doubles(e: Entry): Array[Double] = {
    val bb = ByteBuffer.wrap(e.raw).order(e.order)
    Array.tabulate(e.count.toInt) { i =>
      val off = (e.valueOffset + i.toLong * typeSize(e.typ)).toInt
      e.typ match {
        case 12 => bb.getDouble(off)
        case 11 => bb.getFloat(off).toDouble
        case _ => longs(e)(i).toDouble
      }
    }
  }

  private def ascii(e: Entry): String =
    new String(e.raw, e.valueOffset.toInt, e.count.toInt - 1, "US-ASCII") // NUL-terminated

  def info(bytes: Array[Byte]): Info = {
    val es = parseEntries(bytes)
    def one(tag: Int, dflt: => Long): Long = es.get(tag).map(longs(_)(0)).getOrElse(dflt)
    val width = one(256, sys.error("no ImageWidth")).toInt
    val height = one(257, sys.error("no ImageLength")).toInt
    val bands = one(277, 1).toInt
    val bits = one(258, 1).toInt // first sample's bit depth (uniform here)
    val sampleFormat = one(339, 1).toInt
    val compression = one(259, 1).toInt
    val planar = one(284, 1).toInt
    require(compression == 1 || compression == 8 || compression == 32946,
      s"compression $compression unsupported (none/deflate only)")
    require(!es.contains(317) || longs(es(317))(0) == 1,
      "TIFF predictor unsupported")
    val (tw, th, offE, cntE) =
      if (es.contains(322)) // tiled
        (one(322, 0).toInt, one(323, 0).toInt, es(324), es(325))
      else { // striped: strip = full-width tile
        val rps = math.min(one(278, height), height).toInt
        (width, rps, es(273), es(279))
      }
    Info(width, height, bands, bits, sampleFormat, compression, planar, tw, th,
      longs(offE), longs(cntE),
      es.get(33550).map(doubles).map(a => (a(0), a(1))),
      es.get(33922).map(doubles).map(a => (a(3), a(4))), // model X,Y of raster (0,0)
      es.get(42113).map(ascii).flatMap { s => // GDAL writes lowercase "nan"
        val t = s.trim
        if (t.equalsIgnoreCase("nan")) Some(Double.NaN) else t.toDoubleOption
      })
  }

  private def inflate(src: Array[Byte], off: Long, len: Long, expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(src, off.toInt, len.toInt)
    val out = new Array[Byte](expected)
    var o = 0
    while (!inf.finished() && o < expected) o += inf.inflate(out, o, expected - o)
    inf.end()
    out
  }

  /** Decoded samples of one tile/strip index as floats (tile-local C-order,
    * interleaved samples if planar=1). */
  private def tileSamples(bytes: Array[Byte], fi: Info, idx: Int, order: ByteOrder): Array[Float] = {
    val samplesPerTile =
      fi.tileW * fi.tileH * (if (fi.planar == 1) fi.bands else 1)
    val raw =
      if (fi.compression == 1) {
        val out = new Array[Byte](samplesPerTile * (fi.bits / 8))
        System.arraycopy(bytes, fi.offsets(idx).toInt, out, 0,
          math.min(out.length, fi.byteCounts(idx).toInt))
        out
      } else inflate(bytes, fi.offsets(idx), fi.byteCounts(idx),
        samplesPerTile * (fi.bits / 8))
    val bb = ByteBuffer.wrap(raw).order(order)
    (fi.bits, fi.sampleFormat) match {
      case (32, 3) => val a = new Array[Float](samplesPerTile); bb.asFloatBuffer().get(a); a
      case (8, _)  => Array.tabulate(samplesPerTile)(i => java.lang.Byte.toUnsignedInt(bb.get(i)).toFloat)
      case (16, _) => Array.tabulate(samplesPerTile)(i => java.lang.Short.toUnsignedInt(bb.getShort(i * 2)).toFloat)
      case (32, _) => Array.tabulate(samplesPerTile)(i => bb.getInt(i * 4).toFloat)
      case (b, f) => throw new IllegalArgumentException(s"sample type bits=$b fmt=$f unsupported")
    }
  }

  /** Full-resolution band plane (row-major width×height floats). */
  def readBand(bytes: Array[Byte], band: Int): Array[Float] = {
    val fi = info(bytes)
    require(band < fi.bands, s"band $band of ${fi.bands}")
    val order = if (bytes(0) == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val out = new Array[Float](fi.width * fi.height)
    val perPlane = fi.tilesPerPlane
    var t = 0
    while (t < perPlane) {
      val idx = if (fi.planar == 2) band * perPlane + t else t
      val samples = tileSamples(bytes, fi, idx, order)
      val ty = t / fi.tilesAcross; val tx = t % fi.tilesAcross
      val y0 = ty * fi.tileH; val x0 = tx * fi.tileW
      var y = 0
      while (y < fi.tileH && y0 + y < fi.height) {
        var x = 0
        while (x < fi.tileW && x0 + x < fi.width) {
          val s =
            if (fi.planar == 1) (y * fi.tileW + x) * fi.bands + band
            else y * fi.tileW + x
          out((y0 + y) * fi.width + (x0 + x)) = samples(s)
          x += 1
        }
        y += 1
      }
      t += 1
    }
    out
  }
}
