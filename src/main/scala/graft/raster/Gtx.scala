package graft.raster

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** NOAA/VDatum `.gtx` vertical-grid reader — the geoid-undulation model
  * behind `+geoidgrids=` (reference: `flytemosaic/mosaics.py:44-50`
  * accepts arbitrary per-file CRSs and delegates vertical datums to
  * GDAL/PROJ; this is the engine-native half of that contract).
  *
  * The format is public (PROJ `gtx_grid` docs / NOAA VDatum): a 40-byte
  * header — `double` lat of the south-west node, `double` lon of the
  * south-west node (conventionally 0..360 east), `double` row step,
  * `double` column step, `int32` row count, `int32` column count — then
  * `rows × cols` `float32` undulation values in meters, row-major from
  * the SOUTH row, west→east. Canonically big-endian; some producers
  * write little-endian, so the header is sanity-probed in both orders
  * (lat ∈ [-90,90], positive steps, plausible counts, payload length
  * matches) exactly like [[Ntv2]]'s NUM_OREC probe. `-88.8888` is the
  * published NODATA sentinel.
  */
object Gtx {

  private val NoData = -88.8888f

  /** One loaded grid. `undulation` is bilinear between the four
    * surrounding nodes, `None` outside coverage or when any corner node
    * is NODATA (the caller decides pass-through vs fail). Query
    * longitudes normalize into the grid's own wrap (a 0..360-origin
    * grid answers -170° at 190°). */
  final case class Grid(lat0: Double, lon0: Double, dLat: Double,
                        dLon: Double, nRows: Int, nCols: Int,
                        values: Array[Float]) {

    def undulation(lonDeg: Double, latDeg: Double): Option[Double] = {
      var lon = lonDeg
      // normalize into [lon0, lon0 + span) modulo 360
      val span = (nCols - 1) * dLon
      while (lon < lon0 && lon + 360.0 <= lon0 + span + 1e-9) lon += 360.0
      while (lon > lon0 + span && lon - 360.0 >= lon0 - 1e-9) lon -= 360.0
      val fr = (latDeg - lat0) / dLat
      val fc = (lon - lon0) / dLon
      if (fr < 0 || fc < 0 || fr > nRows - 1 || fc > nCols - 1) return None
      val r0 = math.min(fr.toInt, nRows - 2).max(0)
      val c0 = math.min(fc.toInt, nCols - 2).max(0)
      val tr = fr - r0
      val tc = fc - c0
      def at(r: Int, c: Int): Float = values(r * nCols + c)
      val v00 = at(r0, c0); val v01 = at(r0, c0 + 1)
      val v10 = at(r0 + 1, c0); val v11 = at(r0 + 1, c0 + 1)
      if (v00 == NoData || v01 == NoData || v10 == NoData || v11 == NoData)
        return None
      Some((v00 * (1 - tr) * (1 - tc)) + (v01 * (1 - tr) * tc) +
        (v10 * tr * (1 - tc)) + (v11 * tr * tc))
    }
  }

  def read(path: String): Option[Grid] = {
    val p = Paths.get(path)
    if (!Files.isReadable(p)) return None
    val bytes = Files.readAllBytes(p)
    if (bytes.length < 44) return None // header + at least one value
    // modern PROJ ships grids as GeoTIFF (us_nga_egm96_15.tif etc.) —
    // dispatch on the TIFF magic and convert through the engine's own
    // reader; everything downstream (bilinear, nodata, wrap) is shared
    if ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
        (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42))
      return fromGeoTiff(bytes)

    def tryOrder(order: ByteOrder): Option[Grid] = {
      val bb = ByteBuffer.wrap(bytes).order(order)
      val lat0 = bb.getDouble(0)
      val lon0 = bb.getDouble(8)
      val dLat = bb.getDouble(16)
      val dLon = bb.getDouble(24)
      val nRows = bb.getInt(32)
      val nCols = bb.getInt(36)
      val ok = lat0 >= -90 && lat0 <= 90 &&
        lon0 >= -360 && lon0 <= 360 &&
        dLat > 0 && dLat <= 90 && dLon > 0 && dLon <= 90 &&
        nRows > 1 && nCols > 1 && nRows.toLong * nCols <= 500000000L &&
        bytes.length.toLong == 40L + 4L * nRows * nCols
      if (!ok) return None
      val values = new Array[Float](nRows * nCols)
      var i = 0
      while (i < values.length) { values(i) = bb.getFloat(40 + 4 * i); i += 1 }
      Some(Grid(lat0, lon0, dLat, dLon, nRows, nCols, values))
    }

    tryOrder(ByteOrder.BIG_ENDIAN).orElse(tryOrder(ByteOrder.LITTLE_ENDIAN))
  }

  /** A geoid grid in GeoTIFF form (the PROJ GTG layout a
    * `gdal_translate`d .gtx produces): band 1 float undulations,
    * north-up (row 0 = north), geotransform from ModelPixelScale +
    * ModelTiepoint. Values are POINT samples at pixel centers — a
    * node-registered .gtx converts with its tiepoint at the node minus
    * half a pixel, so center sampling recovers the original nodes
    * exactly. Converts into the same [[Grid]] (south-up, node-origin)
    * the .gtx path builds: file nodata (GDAL ASCII tag) maps onto the
    * GTX sentinel so interpolation suppression is shared. */
  private def fromGeoTiff(bytes: Array[Byte]): Option[Grid] =
    try {
      val fi = GeoTiff.info(bytes)
      for {
        (dx, dy) <- fi.pixelScale
        (ox, oy) <- fi.tiepoint
        if dx > 0 && dy > 0 && fi.width > 1 && fi.height > 1
      } yield {
        val plane = GeoTiff.readBand(bytes, 0)
        val values = new Array[Float](plane.length)
        val (w, h) = (fi.width, fi.height)
        var r = 0
        while (r < h) { // flip north-up rows into the south-origin layout
          System.arraycopy(plane, (h - 1 - r) * w, values, r * w, w)
          r += 1
        }
        // declared nodata AND bare NaNs both map to the sentinel — a NaN
        // that reached bilinear would poison the interpolation silently
        val nd = fi.nodata
        var i = 0
        while (i < values.length) {
          val v = values(i)
          if (v.isNaN || nd.exists(n => v == n.toFloat)) values(i) = NoData
          i += 1
        }
        Grid(oy - h * dy + dy / 2, ox + dx / 2, dy, dx, h, w, values)
      }
    } catch { case _: Exception => None } // fail-fast: unreadable ⇒ None
}
