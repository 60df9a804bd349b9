package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{GeoTiff, GeoTiffWriter}

class GeoTiffSpec extends AnyFunSuite {

  private def band(w: Int, h: Int, seed: Int): Array[Float] =
    Array.tabulate(w * h)(i => (seed * 1000 + i).toFloat / 7f)

  test("writer->reader round-trip: single band, single tile") {
    val (w, h) = (16, 16)
    val b0 = band(w, h, 1)
    val bytes = GeoTiffWriter.write(w, h, Seq(b0),
      pixelScale = (0.25, 0.25), tiepoint = (-3.5, 43.8), nodata = Some(Double.NaN))
    val fi = GeoTiff.info(bytes)
    assert(fi.width == w && fi.height == h && fi.bands == 1)
    assert(fi.bits == 32 && fi.sampleFormat == 3 && fi.compression == 8)
    assert(fi.pixelScale.contains((0.25, 0.25)))
    assert(fi.tiepoint.contains((-3.5, 43.8)))
    assert(fi.nodata.exists(_.isNaN))
    assert(GeoTiff.readBand(bytes, 0).toSeq == b0.toSeq)
  }

  test("round-trip: multi-band interleaved, multiple tiles, edge padding") {
    val (w, h) = (40, 24) // 256-cap -> tile 48x32? no: min(256, ceil16) = 48/32 -> single tile
    val bands = Seq(band(w, h, 1), band(w, h, 2), band(w, h, 3))
    val bytes = GeoTiffWriter.write(w, h, bands, tileSize = 16) // 3x2 tile grid, edge pads
    val fi = GeoTiff.info(bytes)
    assert(fi.bands == 3 && fi.tileW == 16 && fi.tileH == 16)
    assert(fi.tilesAcross == 3 && fi.tilesDown == 2)
    for (b <- 0 until 3)
      assert(GeoTiff.readBand(bytes, b).toSeq == bands(b).toSeq, s"band $b")
  }

  test("round-trip property: random sizes, band counts, tile sizes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val w = 1 + rnd.nextInt(70)
      val h = 1 + rnd.nextInt(70)
      val nb = 1 + rnd.nextInt(4)
      val ts = Seq(16, 32, 48)(rnd.nextInt(3))
      val bands = (0 until nb).map(b =>
        Array.fill(w * h)(rnd.nextFloat() * 1000f - 500f))
      val ovr = rnd.nextBoolean()
      val big = rnd.nextBoolean()
      val bytes = GeoTiffWriter.write(w, h, bands, tileSize = ts,
        overviews = ovr, forceBigTiff = big)
      val fi = GeoTiff.info(bytes)
      val tag = s"$w x $h x $nb @ $ts ovr=$ovr big=$big"
      assert(fi.width == w && fi.height == h && fi.bands == nb, tag)
      for (b <- 0 until nb)
        assert(GeoTiff.readBand(bytes, b).toSeq == bands(b).toSeq, s"band $b of $tag")
      if (ovr) { // every level: right dims, decodable, exact decimation
        val pages = GeoTiff.infos(bytes)
        var stride = 1
        for ((p, lvl) <- pages.zipWithIndex.drop(1)) {
          stride *= 2
          assert(p.width == (pages(lvl - 1).width + 1) / 2 &&
            p.height == (pages(lvl - 1).height + 1) / 2, s"level $lvl of $tag")
          val st = stride
          val want = Array.tabulate(p.width * p.height) { i =>
            bands(0)(math.min((i / p.width) * st, h - 1) * w +
              math.min((i % p.width) * st, w - 1))
          }
          assert(GeoTiff.readBand(bytes, 0, lvl).toSeq == want.toSeq,
            s"level $lvl decim of $tag")
        }
      }
    }
  }

  test("reader handles big-endian and striped layouts") {
    // hand-build a tiny big-endian striped uncompressed uint8 TIFF:
    // 4x2, strips of 1 row — exercises the non-tiled + MM + int paths
    val bb = java.nio.ByteBuffer.allocate(256).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    bb.position(8); bb.putShort(8)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3) { bb.putShort(value.toShort); bb.putShort(0) } else bb.putInt(value)
    }
    entry(256, 4, 1, 4); entry(257, 4, 1, 2)   // 4x2
    entry(258, 3, 1, 8); entry(259, 3, 1, 1)   // uint8, uncompressed
    entry(273, 4, 2, 0)                        // strip offsets -> ext at 120
    entry(277, 3, 1, 1); entry(278, 4, 1, 1)   // 1 band, 1 row/strip
    entry(279, 4, 2, 0)                        // strip byte counts -> ext at 128
    bb.putInt(0) // next IFD
    // patch the two external arrays
    val so = bb.position()
    bb.putInt(140).putInt(144) // strip offsets
    val sc = bb.position()
    bb.putInt(4).putInt(4)
    // rewrite entries 273/279 value slots to the ext offsets
    bb.putInt(10 + 4 * 12 + 8, so) // 5th entry (273) value slot
    bb.putInt(10 + 7 * 12 + 8, sc) // 8th entry (279) value slot
    bb.position(140); bb.put(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    val fi = GeoTiff.info(bb.array())
    assert(fi.width == 4 && fi.height == 2 && fi.tileW == 4 && fi.tileH == 1)
    assert(GeoTiff.readBand(bb.array(), 0).toSeq ==
      Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f))
  }

  test("signed int16 samples decode with their sign (SampleFormat=2)") {
    // hand-build a little-endian striped int16 TIFF, 2x2, one strip, with
    // negative DNs — the unsigned path would read -5 as 65531
    val bb = java.nio.ByteBuffer.allocate(256).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    bb.position(8); bb.putShort(9)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3) { bb.putShort(value.toShort); bb.putShort(0) } else bb.putInt(value)
    }
    entry(256, 4, 1, 2); entry(257, 4, 1, 2)   // 2x2
    entry(258, 3, 1, 16); entry(259, 3, 1, 1)  // 16-bit, uncompressed
    entry(273, 4, 1, 180)                      // one strip at 180
    entry(277, 3, 1, 1); entry(278, 4, 1, 2)   // 1 band, 2 rows/strip
    entry(279, 4, 1, 8)                        // 8 bytes
    entry(339, 3, 1, 2)                        // SampleFormat = signed int
    bb.putInt(0) // next IFD
    bb.position(180)
    Seq[Short](-5, 7, -32768, 32767).foreach(bb.putShort)
    val got = GeoTiff.readBand(bb.array(), 0).toSeq
    assert(got == Seq(-5f, 7f, -32768f, 32767f), got)
  }

  test("COG overviews: IFD chain of nearest-decimated levels, full res intact") {
    val (w, h) = (64, 48)
    val b0 = band(w, h, 5)
    val bytes = GeoTiffWriter.write(w, h, Seq(b0), tileSize = 16,
      pixelScale = (0.5, 0.5), tiepoint = (10.0, 20.0), nodata = Some(Double.NaN),
      overviews = true)
    val pages = GeoTiff.infos(bytes)
    // 64x48 -> 32x24 -> 16x12 (stops once max dim <= tile)
    assert(pages.map(p => (p.width, p.height)) == Seq((64, 48), (32, 24), (16, 12)))
    // geo tags only on the full-res page
    assert(pages.head.pixelScale.contains((0.5, 0.5)))
    // level 0 is bit-identical to the non-overview write
    assert(GeoTiff.readBand(bytes, 0).toSeq == b0.toSeq)
    // level 2 = full-res sampled at stride 4 (exact nearest decimation)
    val l2 = GeoTiff.readBand(bytes, 0, 2)
    val want = Array.tabulate(16 * 12) { i =>
      b0(math.min((i / 16) * 4, h - 1) * w + math.min((i % 16) * 4, w - 1))
    }
    assert(l2.toSeq == want.toSeq)
  }

  test("BigTIFF container round-trips (8-byte offsets, LONG8 tile offsets)") {
    val (w, h) = (40, 24)
    val bands = Seq(band(w, h, 1), band(w, h, 2))
    val bytes = GeoTiffWriter.write(w, h, bands, tileSize = 16,
      pixelScale = (1.5, 1.5), tiepoint = (7.0, 9.0), nodata = Some(-42.0),
      forceBigTiff = true)
    assert(bytes(2) == 43 && bytes(3) == 0) // version 43 = BigTIFF
    val fi = GeoTiff.info(bytes)
    assert(fi.width == w && fi.height == h && fi.bands == 2)
    assert(fi.pixelScale.contains((1.5, 1.5)) && fi.nodata.contains(-42.0))
    for (b <- 0 until 2)
      assert(GeoTiff.readBand(bytes, b).toSeq == bands(b).toSeq)
    // and BigTIFF + overviews compose
    val big2 = GeoTiffWriter.write(w, h, bands, tileSize = 16,
      overviews = true, forceBigTiff = true)
    assert(GeoTiff.infos(big2).length == 3) // 40x24 -> 20x12 -> 10x6
    assert(GeoTiff.readBand(big2, 1, 1).length == 20 * 12)
  }

  test("LZW codec round-trips adversarial payloads") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      Array.empty[Byte],
      Array[Byte](0),
      Array.fill(17)(42.toByte),                       // runs → KwKwK codes
      "abababababababababab".getBytes,                 // classic KwKwK
      Array.tabulate(300)(i => (i % 251).toByte),      // forces 10-bit codes
      Array.tabulate(70000)(_ => rnd.nextInt(256).toByte), // table reset path
      Array.tabulate(8192)(i => (i / 32).toByte))      // long runs, width growth
    for (c <- cases) {
      val enc = GeoTiff.lzwEncode(c)
      val dec = GeoTiff.lzwDecode(enc, 0, enc.length, c.length)
      assert(dec.toSeq == c.toSeq, s"len=${c.length}")
    }
  }

  test("LZW + horizontal predictor TIFF decodes (hand-built container)") {
    // 4x4 single-band uint16, strip layout, II order, compression=5,
    // predictor=2 — the GDAL-common integer-COG combination
    val w = 4; val h = 4
    val samples = Array[Int](
      1000, 1005, 1003, 1010,
      2000, 1990, 1991, 2005,
      0, 65535, 1, 65534, // wrap-around deltas exercise mod-2^16 math
      500, 500, 500, 500)
    // horizontal differencing per row (mod 2^16), then LZW
    val diffed = new Array[Byte](w * h * 2)
    val bb = java.nio.ByteBuffer.wrap(diffed)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (r <- 0 until h; c <- 0 until w) {
      val v = if (c == 0) samples(r * w) else samples(r * w + c) - samples(r * w + c - 1)
      bb.putShort((r * w + c) * 2, (v & 0xffff).toShort)
    }
    val payload = GeoTiff.lzwEncode(diffed)
    // classic TIFF, IFD after the payload at offset 8 + len (word-aligned)
    val dataOff = 8
    val ifdOff = dataOff + payload.length + (payload.length & 1)
    val entries = Seq( // tag, type, count, value
      (256, 3, 1L, w.toLong), (257, 3, 1L, h.toLong), (258, 3, 1L, 16L),
      (259, 3, 1L, 5L), (273, 4, 1L, dataOff.toLong), (277, 3, 1L, 1L),
      (278, 3, 1L, h.toLong), (279, 4, 1L, payload.length.toLong),
      (284, 3, 1L, 1L), (317, 3, 1L, 2L), (339, 3, 1L, 1L))
    val out = java.nio.ByteBuffer.allocate(ifdOff + 2 + entries.size * 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    out.position(dataOff); out.put(payload)
    out.position(ifdOff); out.putShort(entries.size.toShort)
    for ((tag, typ, cnt, v) <- entries) {
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt.toInt)
      if (typ == 3) out.putShort(v.toShort).putShort(0) else out.putInt(v.toInt)
    }
    out.putInt(0) // no next IFD
    val tif = out.array()
    val fi = GeoTiff.info(tif)
    assert(fi.compression == 5 && fi.predictor == 2 && fi.bits == 16)
    val got = GeoTiff.readBand(tif, 0)
    assert(got.toSeq == samples.map(_.toFloat).toSeq)
  }

  test("DEFLATE + floating-point predictor (3) decodes (TTN3 hand-build)") {
    // 4x3 single-band float32, strip layout, II container — the GDAL
    // PREDICTOR=3 float-COG combination. Values exercise sign, subnormal
    // neighborhood, NaN and large magnitudes (byte planes differ wildly).
    val w = 4; val h = 3
    val samples = Array[Float](
      1.5f, -2.25f, 0.0f, 3.14159f,
      1e-38f, -1e38f, 42.0f, Float.NaN,
      -0.5f, 0.5f, 123456.78f, -1e-20f)
    val bps = 4
    val enc = new Array[Byte](w * h * bps)
    for (r <- 0 until h) {
      val base = r * w * bps
      // split the row's floats into byte planes, MSB first
      for (c <- 0 until w) {
        val bits = java.lang.Float.floatToRawIntBits(samples(r * w + c))
        for (b <- 0 until bps)
          enc(base + b * w + c) = ((bits >>> (8 * (3 - b))) & 0xff).toByte
      }
      // horizontal byte differencing at stride spp=1, high index first
      var i = base + w * bps - 1
      while (i > base) { enc(i) = (enc(i) - enc(i - 1)).toByte; i -= 1 }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(enc); d.finish()
    val obuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) obuf.write(tmp, 0, d.deflate(tmp))
    val payload = obuf.toByteArray
    val dataOff = 8
    val ifdOff = dataOff + payload.length + (payload.length & 1)
    val entries = Seq( // tag, type, count, value
      (256, 3, 1L, w.toLong), (257, 3, 1L, h.toLong), (258, 3, 1L, 32L),
      (259, 3, 1L, 8L), (273, 4, 1L, dataOff.toLong), (277, 3, 1L, 1L),
      (278, 4, 1L, h.toLong), (279, 4, 1L, payload.length.toLong),
      (284, 3, 1L, 1L), (317, 3, 1L, 3L), (339, 3, 1L, 3L))
    val out = java.nio.ByteBuffer.allocate(ifdOff + 2 + entries.size * 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    out.position(dataOff); out.put(payload)
    out.position(ifdOff); out.putShort(entries.size.toShort)
    for ((tag, typ, cnt, v) <- entries) {
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt.toInt)
      if (typ == 3) out.putShort(v.toShort).putShort(0) else out.putInt(v.toInt)
    }
    out.putInt(0)
    val tif = out.array()
    val fi = GeoTiff.info(tif)
    assert(fi.compression == 8 && fi.predictor == 3 && fi.bits == 32 &&
      fi.sampleFormat == 3)
    val got = GeoTiff.readBand(tif, 0)
    // bit-exact compare (NaN-safe)
    assert(got.length == samples.length)
    for (i <- samples.indices)
      assert(java.lang.Float.floatToRawIntBits(got(i)) ==
        java.lang.Float.floatToRawIntBits(samples(i)), s"sample $i")
  }
}
