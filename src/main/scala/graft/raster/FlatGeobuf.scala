package graft.raster

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** FlatGeobuf 3.x encoder/decoder for the GTI tile index — the format
  * GDAL's GTI driver actually reads (reference `build_recommended_gti`
  * writes the index as FlatGeobuf, flytemosaic/mosaics.py:77-113; format
  * spec: flatgeobuf.org, BSD-licensed schema). Scope: unindexed
  * (index_node_size = 0) Polygon features with Long/Double/String
  * properties — exactly what a tile manifest needs; readers that require
  * the optional packed R-tree section still parse the file (the section is
  * declared absent in the header).
  *
  * Layout: magic `fgb\x03fgb\x00`, a size-prefixed Header flatbuffer
  * (name, envelope, geometry_type, columns, features_count,
  * index_node_size, crs), then one size-prefixed Feature flatbuffer per
  * tile (Geometry table with the envelope ring + packed properties).
  */
object FlatGeobuf {

  val Magic: Array[Byte] =
    Array('f'.toByte, 'g'.toByte, 'b'.toByte, 3.toByte,
          'f'.toByte, 'g'.toByte, 'b'.toByte, 0.toByte)

  /** ColumnType enum (schema ids from the public .fbs). */
  object ColType {
    val Long: Byte = 7
    val Double: Byte = 10
    val String: Byte = 11
  }
  private val GeomPolygon: Byte = 3

  final case class Col(name: String, colType: Byte)
  /** One tile: envelope rectangle + property values aligned with the
    * column list (Long / Double / String per ColType). */
  final case class Feature(minx: Double, miny: Double, maxx: Double,
                           maxy: Double, props: Seq[Any])

  // ---- encode ----------------------------------------------------------

  /** Header schema field ids: 0 name, 1 envelope, 2 geometry_type,
    * 7 columns, 8 features_count, 9 index_node_size (default 16!), 10 crs,
    * 13 metadata (free-form JSON string — where GDAL's GTI driver reads
    * layer metadata like DATA_TYPE/NODATA/RESX from). */
  private def headerBytes(name: String, env: (Double, Double, Double, Double),
                          cols: Seq[Col], count: Long, epsg: Int,
                          metadata: Option[String]): Array[Byte] = {
    val b = new FbBuilder(512)
    val metaOff = metadata.map(b.createString)
    val nameOff = b.createString(name)
    val envOff = b.createDoubleVector(Array(env._1, env._2, env._3, env._4))
    val colOffs = cols.map { c =>
      val n = b.createString(c.name)
      b.startTable(2) // Column: 0 name, 1 type
      b.addOffsetField(0, n)
      b.addByteField(1, c.colType, -1) // always write (Byte=0 is a valid type)
      b.endTable()
    }.toArray
    val colsOff = b.createOffsetVector(colOffs)
    val crsOff = {
      val org = b.createString("EPSG")
      b.startTable(2) // Crs: 0 org, 1 code
      b.addOffsetField(0, org)
      b.addIntField(1, epsg, 0)
      b.endTable()
    }
    b.startTable(14)
    b.addOffsetField(0, nameOff)
    b.addOffsetField(1, envOff)
    b.addByteField(2, GeomPolygon, 0)
    b.addOffsetField(7, colsOff)
    b.addLongField(8, count, 0L)
    b.addShortField(9, 0, 16) // no packed R-tree: node size 0 (default 16)
    b.addOffsetField(10, crsOff)
    metaOff.foreach(b.addOffsetField(13, _))
    b.finish(b.endTable())
  }

  private def packProps(cols: Seq[Col], props: Seq[Any]): Array[Byte] = {
    require(props.length == cols.length, "props must align with columns")
    val bos = new java.io.ByteArrayOutputStream()
    def le(n: Int)(fill: ByteBuffer => Unit): Unit = {
      val bb = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
      fill(bb); bos.write(bb.array())
    }
    cols.zip(props).zipWithIndex.foreach { case ((c, v), i) =>
      if (v != null) {
        le(2)(_.putShort(i.toShort))
        c.colType match {
          case ColType.Long   => le(8)(_.putLong(v.asInstanceOf[Long]))
          case ColType.Double => le(8)(_.putDouble(v.asInstanceOf[Double]))
          case ColType.String =>
            val bytes = v.toString.getBytes("UTF-8")
            le(4)(_.putInt(bytes.length)); bos.write(bytes)
          case t => throw new IllegalArgumentException(s"column type $t")
        }
      }
    }
    bos.toByteArray
  }

  /** Feature schema: 0 geometry, 1 properties;
    * Geometry schema: 1 xy, 6 type. The ring closes the envelope CCW. */
  private def featureBytes(cols: Seq[Col], f: Feature): Array[Byte] = {
    val b = new FbBuilder(512)
    val xy = b.createDoubleVector(Array(
      f.minx, f.miny, f.maxx, f.miny, f.maxx, f.maxy, f.minx, f.maxy,
      f.minx, f.miny))
    b.startTable(7)
    b.addOffsetField(1, xy)
    b.addByteField(6, GeomPolygon, 0)
    val geom = b.endTable()
    val props = b.createByteVector(packProps(cols, f.props))
    b.startTable(2)
    b.addOffsetField(0, geom)
    b.addOffsetField(1, props)
    b.finish(b.endTable())
  }

  /** Stream features to `path` (size-prefixed, spec layout). The iterator
    * is consumed once — callers stream a manifest through
    * `toLocalIterator`, so the index never materializes in driver memory. */
  def write(path: String, name: String, env: (Double, Double, Double, Double),
            cols: Seq[Col], feats: Iterator[Feature], epsg: Int,
            count: Long = 0L, metadata: Option[String] = None): Long = {
    val out = new BufferedOutputStream(new FileOutputStream(path))
    def sizePrefixed(bytes: Array[Byte]): Unit = {
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(bytes.length)
      out.write(bb.array()); out.write(bytes)
    }
    try {
      out.write(Magic)
      // `count` = features_count when the caller pre-counted (cheap for a
      // manifest already on disk); 0 = unknown, which the spec permits
      sizePrefixed(headerBytes(name, env, cols, count, epsg, metadata))
      var n = 0L
      feats.foreach { f => sizePrefixed(featureBytes(cols, f)); n += 1 }
      require(count == 0L || count == n,
        s"declared features_count $count != streamed $n")
      n
    } finally out.close()
  }

  // ---- decode ----------------------------------------------------------

  final case class Header(name: String, envelope: Array[Double],
                          geometryType: Byte, cols: Seq[Col], count: Long,
                          indexNodeSize: Int, epsg: Int,
                          metadata: Option[String] = None)

  def readHeader(bytes: Array[Byte]): (Header, Int) = {
    require(bytes.take(8).sameElements(Magic), "not a FlatGeobuf file")
    val size = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    val r = new FbReader(bytes, 12)
    val h = r.rootTable
    val nameP = r.refField(h, 0)
    val envP = r.refField(h, 1)
    val colsP = r.refField(h, 7)
    val cols = if (colsP < 0) Seq.empty else
      (0 until r.vectorLen(colsP)).map { i =>
        val c = r.refElem(colsP, i)
        Col(r.stringAt(r.refField(c, 0)), r.byteField(c, 1, 0))
      }
    val crsP = r.refField(h, 10)
    val metaP = r.refField(h, 13)
    val header = Header(
      if (nameP < 0) "" else r.stringAt(nameP),
      if (envP < 0) Array.empty else r.doubleVector(envP),
      r.byteField(h, 2, 0), cols, r.longField(h, 8, 0L),
      r.shortField(h, 9, 16) & 0xFFFF,
      if (crsP < 0) 0 else r.intField(crsP, 1, 0),
      if (metaP < 0) None else Some(r.stringAt(metaP)))
    (header, 12 + size)
  }

  /** Byte size of the packed Hilbert R-tree section (spec: 40-byte nodes —
    * 4 doubles + uint64 offset — over all levels built bottom-up). The
    * level loop is a do-while, matching the reference generateLevelBounds:
    * even a single item gets a root level above it (2 nodes, 80 bytes). */
  private def rtreeSize(numItems: Long, nodeSize: Int): Long = {
    require(numItems > 0, "R-tree size undefined for zero items")
    require(nodeSize >= 2, s"index_node_size $nodeSize below the spec minimum 2")
    var n = numItems
    var numNodes = n
    var done = false
    while (!done) {
      n = (n + nodeSize - 1) / nodeSize
      numNodes += n
      done = n == 1
    }
    numNodes * 40L
  }

  def readFeatures(bytes: Array[Byte]): (Header, Seq[Feature]) = {
    val (header, afterHeader) = readHeader(bytes)
    val feats = Seq.newBuilder[Feature]
    var pos = afterHeader
    // an INDEXED file (GDAL's default) carries the packed R-tree between
    // header and features — skip it, or the first index bytes would parse
    // as a feature size prefix and the walk would follow garbage offsets
    if (header.indexNodeSize > 0 && header.count > 0)
      pos += rtreeSize(header.count, header.indexNodeSize).toInt
    else require(header.indexNodeSize == 0,
      "indexed FlatGeobuf with unknown features_count is not supported")
    while (pos < bytes.length) {
      val size = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      val r = new FbReader(bytes, pos + 4)
      val f = r.rootTable
      val geom = r.refField(f, 0)
      // an externally-produced feature may omit the geometry — fail with a
      // parse error naming the offset, not a garbage-offset dereference
      if (geom < 0) throw new IllegalArgumentException(
        s"FlatGeobuf feature at byte offset $pos has no geometry")
      val xyP = r.refField(geom, 1)
      if (xyP < 0) throw new IllegalArgumentException(
        s"FlatGeobuf feature at byte offset $pos has no xy vector")
      val xy = r.doubleVector(xyP)
      val xs = xy.indices.collect { case i if i % 2 == 0 => xy(i) }
      val ys = xy.indices.collect { case i if i % 2 == 1 => xy(i) }
      val propsP = r.refField(f, 1)
      val props = if (propsP < 0) Seq.empty[Any]
                  else unpackProps(header.cols, r.byteVector(propsP))
      feats += Feature(xs.min, ys.min, xs.max, ys.max, props)
      pos += 4 + size
    }
    (header, feats.result())
  }

  private def unpackProps(cols: Seq[Col], packed: Array[Byte]): Seq[Any] = {
    val out = Array.fill[Any](cols.length)(null)
    val bb = ByteBuffer.wrap(packed).order(ByteOrder.LITTLE_ENDIAN)
    while (bb.remaining() >= 2) {
      val i = bb.getShort() & 0xFFFF
      cols(i).colType match {
        case ColType.Long   => out(i) = bb.getLong()
        case ColType.Double => out(i) = bb.getDouble()
        case ColType.String =>
          val len = bb.getInt()
          val s = new Array[Byte](len); bb.get(s); out(i) = new String(s, "UTF-8")
        case t => throw new IllegalArgumentException(s"column type $t")
      }
    }
    out.toSeq
  }

  def readFile(path: String): (Header, Seq[Feature]) =
    readFeatures(Files.readAllBytes(Paths.get(path)))
}
