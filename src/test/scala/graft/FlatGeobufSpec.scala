package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{FbBuilder, FbReader, FlatGeobuf, GtiMosaic}

/** FlatBuffers wire-format machinery + the FlatGeobuf GTI index twin.
  * The reader here is written against the PUBLIC spec independently of the
  * builder's internals (vtable walk, not remembered positions), so a
  * round-trip failure localizes layout bugs. */
class FlatGeobufSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("FbBuilder: table with scalars, strings, and vectors round-trips") {
    val b = new FbBuilder()
    val s = b.createString("héllo wörld") // multi-byte UTF-8
    val dv = b.createDoubleVector(Array(1.5, -2.25, 3.125))
    val iv = b.createIntVector(Array(7, 11, 13))
    b.startTable(6)
    b.addOffsetField(0, s)
    b.addIntField(1, 42, 0)
    b.addLongField(2, 0x1122334455667788L, 0L)
    b.addOffsetField(3, dv)
    b.addOffsetField(4, iv)
    b.addByteField(5, 9, 0)
    val bytes = b.finish(b.endTable())
    assert(bytes.length % 8 == 0, "finished buffer padded to max alignment")
    val r = new FbReader(bytes)
    val t = r.rootTable
    assert(r.stringAt(r.refField(t, 0)) == "héllo wörld")
    assert(r.intField(t, 1, 0) == 42)
    assert(r.longField(t, 2, 0L) == 0x1122334455667788L)
    assert(r.doubleVector(r.refField(t, 3)).toSeq == Seq(1.5, -2.25, 3.125))
    val ivp = r.refField(t, 4)
    assert((0 until r.vectorLen(ivp)).map(i =>
      java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .getInt(r.vectorElems(ivp) + i * 4)) == Seq(7, 11, 13))
    assert(r.byteField(t, 5, 0) == 9)
    // absent fields fall back to defaults
    assert(r.fieldPos(t, 6 - 1) >= 0 && r.fieldPos(t, 42) == -1)
    // doubles land 8-aligned in the finished buffer (spec requirement)
    assert(r.refField(t, 3) % 8 == 4, "length prefix directly below elems")
    assert((r.refField(t, 3) + 4) % 8 == 0)
  }

  test("FbBuilder: absent optional fields read as defaults") {
    val b = new FbBuilder()
    b.startTable(5)
    b.addIntField(2, 5, 0) // only field 2 present
    val bytes = b.finish(b.endTable())
    val r = new FbReader(bytes)
    val t = r.rootTable
    assert(r.intField(t, 0, -7) == -7)
    assert(r.intField(t, 2, 0) == 5)
    assert(r.shortField(t, 4, 16) == 16)
  }

  test("FlatGeobuf file: magic, header fields, features round-trip") {
    val cols = Seq(
      FlatGeobuf.Col("location", FlatGeobuf.ColType.String),
      FlatGeobuf.Col("seq", FlatGeobuf.ColType.Long),
      FlatGeobuf.Col("score", FlatGeobuf.ColType.Double))
    val feats = Seq(
      FlatGeobuf.Feature(0.0, 4.0, 6.0, 10.0, Seq[Any]("/vsis3/b/a.tif", 0L, 1.25)),
      FlatGeobuf.Feature(4.0, 6.0, 10.0, 10.0, Seq[Any]("/vsis3/b/b.tif", 1L, null)))
    val p = Files.createTempDirectory("graft-fgb").resolve("t.fgb").toString
    val n = FlatGeobuf.write(p, "tiles", (0.0, 4.0, 10.0, 10.0), cols,
      feats.iterator, epsg = 4326)
    assert(n == 2)
    val bytes = Files.readAllBytes(Paths.get(p))
    assert(bytes.take(8).sameElements(FlatGeobuf.Magic))
    val (h, back) = FlatGeobuf.readFeatures(bytes)
    assert(h.name == "tiles" && h.geometryType == 3) // Polygon
    assert(h.envelope.toSeq == Seq(0.0, 4.0, 10.0, 10.0))
    assert(h.cols == cols && h.indexNodeSize == 0 && h.epsg == 4326)
    assert(back.length == 2)
    assert(back(0) == feats(0))
    assert(back(1).props == Seq("/vsis3/b/b.tif", 1L, null)) // null prop skipped
    assert((back(1).minx, back(1).maxy) == ((4.0, 10.0)))
  }

  test("readFeatures skips the packed R-tree of an INDEXED file") {
    // build a normal unindexed file with a known features_count, then
    // simulate a GDAL-style indexed file: patch index_node_size 0 -> 16 in
    // the header flatbuffer and splice the R-tree's byte span (zeros are
    // fine -- the reader must skip, not parse) between header and features
    val cols = Seq(FlatGeobuf.Col("location", FlatGeobuf.ColType.String))
    val allFeats = Seq(
      FlatGeobuf.Feature(0, 0, 1, 1, Seq[Any]("a")),
      FlatGeobuf.Feature(1, 1, 2, 2, Seq[Any]("b")))
    // rtree nodes: 1 item -> leaf+root = 2 (the do-while case), 2 -> 3
    for ((n, rtreeNodes) <- Seq(1 -> 2, 2 -> 3)) {
      val feats = allFeats.take(n)
      val p = Files.createTempDirectory("graft-fgb-idx").resolve("t.fgb").toString
      FlatGeobuf.write(p, "t", (0, 0, 2, 2), cols, feats.iterator,
        epsg = 4326, count = n)
      val bytes = Files.readAllBytes(Paths.get(p))
      val headerSize = java.nio.ByteBuffer.wrap(bytes, 8, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      val r = new FbReader(bytes, 12)
      val nodeSizePos = r.fieldPos(r.rootTable, 9) // index_node_size field
      assert(nodeSizePos > 0, "writer stores node size 0 explicitly")
      java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putShort(nodeSizePos, 16)
      val spliced = bytes.take(12 + headerSize) ++
        new Array[Byte](rtreeNodes * 40) ++ bytes.drop(12 + headerSize)
      val (h, back) = FlatGeobuf.readFeatures(spliced)
      assert(h.indexNodeSize == 16 && h.count == n)
      assert(back == feats, s"n=$n")
    }
  }

  test("GtiMosaic.write emits an index.fgb twin matching the parquet index") {
    val dst = Files.createTempDirectory("graft-gti-fgb").toString
    val meta = GtiMosaic.Meta("Float32", Double.NaN,
      0.0, 0.0, 10.0, 10.0, 1.0, 1.0, 1, "nearest", "EPSG:4326")
    val index = Seq(
      ("s3://mosaic.fixtures/a.tif", 0.0, 4.0, 6.0, 10.0),
      ("s3://mosaic.fixtures/b.tif", 4.0, 6.0, 10.0, 10.0))
      .toDF("location", "minx", "miny", "maxx", "maxy")
    GtiMosaic.write(index.coalesce(1), dst, meta)
    val (h, feats) = FlatGeobuf.readFile(dst + "/index.fgb")
    assert(h.epsg == 4326 && h.cols.map(_.name) == Seq("location", "seq"))
    assert(h.count == 2) // pre-counted features_count, not 0=unknown
    val parquet = GtiMosaic.readIndex(spark, dst).orderBy("seq")
      .select("location", "seq", "minx", "miny", "maxx", "maxy")
      .collect().map(r => (r.getString(0), r.getLong(1),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    assert(feats.length == parquet.length)
    feats.zip(parquet).foreach { case (f, (loc, seq, env)) =>
      assert(f.props(0) == loc && f.props(1) == seq)
      assert((f.minx, f.miny, f.maxx, f.maxy) == env)
    }
    // mosaic metadata is embedded in the fgb header itself (GDAL GTI layer
    // metadata contract) — readMeta must work with NO sidecar present
    assert(h.metadata.exists(_.contains("\"RESX\":1.0")))
    Files.delete(Paths.get(dst, "gti.json"))
    val m2 = GtiMosaic.readMeta(dst)
    assert(m2.resx == 1.0 && m2.bandCount == 1 && m2.srs == "EPSG:4326"
      && m2.nodata.isNaN)
    // no partial/temp fgb left behind by the temp+rename export
    assert(!Files.exists(Paths.get(dst, "index.fgb.tmp")))
  }

  test("header metadata string round-trips; absent metadata reads None") {
    val cols = Seq(FlatGeobuf.Col("location", FlatGeobuf.ColType.String))
    val p = Files.createTempDirectory("graft-fgb-meta").resolve("t.fgb").toString
    val metaJson = """{"DATA_TYPE":"Float32","RESX":1e-05}"""
    FlatGeobuf.write(p, "t", (0, 0, 1, 1), cols,
      Iterator(FlatGeobuf.Feature(0, 0, 1, 1, Seq[Any]("a"))),
      epsg = 4326, metadata = Some(metaJson))
    val (h, _) = FlatGeobuf.readFile(p)
    assert(h.metadata.contains(metaJson))
    val p2 = Files.createTempDirectory("graft-fgb-meta").resolve("u.fgb").toString
    FlatGeobuf.write(p2, "t", (0, 0, 1, 1), cols,
      Iterator(FlatGeobuf.Feature(0, 0, 1, 1, Seq[Any]("a"))), epsg = 4326)
    assert(FlatGeobuf.readFile(p2)._1.metadata.isEmpty)
  }

  test("a feature without geometry fails with a parse error, not garbage") {
    // hand-build a feature table with ONLY properties (field 0 absent)
    val cols = Seq(FlatGeobuf.Col("location", FlatGeobuf.ColType.String))
    val fb = new FbBuilder()
    val props = fb.createByteVector(Array[Byte]())
    fb.startTable(2)
    fb.addOffsetField(1, props)
    val featBytes = fb.finish(fb.endTable())
    val p = Files.createTempDirectory("graft-fgb-bad").resolve("t.fgb").toString
    FlatGeobuf.write(p, "t", (0, 0, 1, 1), cols, Iterator.empty, epsg = 0)
    val base = Files.readAllBytes(Paths.get(p))
    val size = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(featBytes.length).array()
    val bad = base ++ size ++ featBytes
    val e = intercept[IllegalArgumentException](FlatGeobuf.readFeatures(bad))
    assert(e.getMessage.contains("no geometry"))
    assert(e.getMessage.contains(base.length.toString)) // names the offset
  }
}
