package graft.raster

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** NTv2 grid-shift files (`+nadgrids=<file>.gsb`) — the documented public
  * binary format behind NAD27→NAD83-class datum transformations that a
  * Helmert can't express (the shift varies point-to-point; PROJ consumes
  * the same files, which is how the reference absorbs them via GDAL).
  *
  * Format (public NTv2 spec): an 11-record overview header, then per
  * sub-grid an 11-record header + `GS_COUNT` nodes of 4 float32s
  * (lat shift, lon shift, lat accuracy, lon accuracy), shifts in
  * ARCSECONDS, **longitudes positive WEST**, nodes ordered south→north,
  * each row east→west. Each 16-byte header record is an 8-char name +
  * 8-byte value (int32+pad, float64, or 8 chars). Endianness is detected
  * from the NUM_OREC value.
  *
  * Semantics: the grid maps SOURCE-datum coordinates to TARGET-datum
  * (for `+nadgrids` the target is the pivot, WGS84-equivalent):
  * `target = source + bilinear(shift at source)`. The inverse iterates
  * the forward (standard fixpoint, converges in 2-4 rounds at real grid
  * magnitudes). Points outside every sub-grid get a ZERO shift (PROJ's
  * permissive default for optional grids).
  */
object Ntv2 {

  final case class SubGrid(sLat: Double, nLat: Double, eLonW: Double,
                           wLonW: Double, latInc: Double, lonInc: Double,
                           nRows: Int, nCols: Int,
                           latShift: Array[Float], lonShift: Array[Float]) {
    /** Bilinear shift (arcseconds) at (lonWestDeg, latDeg) in SOURCE
      * coordinates; None if outside this grid. */
    def shiftAt(lonWestDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      val latSec = latDeg * 3600.0
      val lonSec = lonWestDeg * 3600.0
      if (latSec < sLat - 1e-9 || latSec > nLat + 1e-9 ||
          lonSec < eLonW - 1e-9 || lonSec > wLonW + 1e-9) return None
      val fy = math.max(0.0, math.min(nRows - 1.0, (latSec - sLat) / latInc))
      val fx = math.max(0.0, math.min(nCols - 1.0, (lonSec - eLonW) / lonInc))
      val y0 = math.min(nRows - 2, fy.toInt.max(0))
      val x0 = math.min(nCols - 2, fx.toInt.max(0))
      val dy = fy - y0
      val dx = fx - x0
      def at(a: Array[Float], r: Int, c: Int): Double = a(r * nCols + c)
      def bil(a: Array[Float]): Double =
        at(a, y0, x0) * (1 - dx) * (1 - dy) + at(a, y0, x0 + 1) * dx * (1 - dy) +
          at(a, y0 + 1, x0) * (1 - dx) * dy + at(a, y0 + 1, x0 + 1) * dx * dy
      Some((bil(latShift), bil(lonShift)))
    }
  }

  final case class Grid(subs: Seq[SubGrid]) {
    /** source lon/lat (east-positive degrees) → target lon/lat. Outside
      * all sub-grids: identity (zero shift). Sub-grid pick: smallest cell
      * (densest) containing the point — the NTv2 parent/child convention
      * without needing the PARENT linkage. */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lonW = -lonDeg
      val hit = subs.filter(_.shiftAt(lonW, latDeg).isDefined)
        .sortBy(s => s.latInc * s.lonInc).headOption
      hit.flatMap(_.shiftAt(lonW, latDeg)) match {
        case Some((dLatSec, dLonSecW)) =>
          // lon shift is positive-WEST arcseconds: adding to a west-
          // positive lon = SUBTRACTING from the east-positive lon
          (lonDeg - dLonSecW / 3600.0, latDeg + dLatSec / 3600.0)
        case None => (lonDeg, latDeg)
      }
    }

    /** target lon/lat → source lon/lat by fixpoint on `forward`. */
    def inverse(lonDeg: Double, latDeg: Double): (Double, Double) = {
      var sLon = lonDeg; var sLat = latDeg
      var i = 0
      while (i < 6) {
        val (tLon, tLat) = forward(sLon, sLat)
        sLon += lonDeg - tLon
        sLat += latDeg - tLat
        i += 1
      }
      (sLon, sLat)
    }
  }

  /** Read a .gsb file; None on structural problems (fail fast upstream). */
  def read(path: String): Option[Grid] = {
    val p = Paths.get(path)
    if (!Files.isReadable(p)) return None
    val bytes = Files.readAllBytes(p)
    if (bytes.length < 11 * 16) return None
    // endianness probe: NUM_OREC's int value must be 11
    def buf(order: ByteOrder) = ByteBuffer.wrap(bytes).order(order)
    val order =
      if (buf(ByteOrder.LITTLE_ENDIAN).getInt(8) == 11) ByteOrder.LITTLE_ENDIAN
      else if (buf(ByteOrder.BIG_ENDIAN).getInt(8) == 11) ByteOrder.BIG_ENDIAN
      else return None
    val bb = buf(order)
    def name(off: Int): String =
      new String(bytes, off, 8, "US-ASCII").trim
    try {
      var off = 0
      var nSubs = 0
      // overview header: 11 records; we need NUM_FILE
      for (_ <- 0 until 11) {
        if (name(off) == "NUM_FILE") nSubs = bb.getInt(off + 8)
        off += 16
      }
      if (nSubs <= 0 || nSubs > 1024) return None
      val subs = (0 until nSubs).map { _ =>
        var sLat, nLat, eLon, wLon, latInc, lonInc = 0.0
        var count = 0
        for (_ <- 0 until 11) {
          name(off) match {
            case "S_LAT"    => sLat = bb.getDouble(off + 8)
            case "N_LAT"    => nLat = bb.getDouble(off + 8)
            case "E_LONG"   => eLon = bb.getDouble(off + 8)
            case "W_LONG"   => wLon = bb.getDouble(off + 8)
            case "LAT_INC"  => latInc = bb.getDouble(off + 8)
            case "LONG_INC" => lonInc = bb.getDouble(off + 8)
            case "GS_COUNT" => count = bb.getInt(off + 8)
            case _ =>
          }
          off += 16
        }
        val nRows = math.round((nLat - sLat) / latInc).toInt + 1
        val nCols = math.round((wLon - eLon) / lonInc).toInt + 1
        if (nRows * nCols != count || count <= 0) return None
        val latShift = new Array[Float](count)
        val lonShift = new Array[Float](count)
        var i = 0
        while (i < count) {
          latShift(i) = bb.getFloat(off)
          lonShift(i) = bb.getFloat(off + 4)
          off += 16 // + lat/lon accuracy floats, skipped
          i += 1
        }
        SubGrid(sLat, nLat, eLon, wLon, latInc, lonInc, nRows, nCols,
          latShift, lonShift)
      }
      Some(Grid(subs))
    } catch { case _: Exception => None }
  }

  /** Write a single-subgrid little-endian .gsb (fixture generation and
    * round-trip specs; same layout `read` consumes). Shifts in
    * arcseconds, grid extents in arcseconds, longitudes positive west. */
  def write(path: String, sLat: Double, nLat: Double, eLonW: Double,
            wLonW: Double, latInc: Double, lonInc: Double,
            latShift: Array[Float], lonShift: Array[Float]): Unit = {
    val nRows = math.round((nLat - sLat) / latInc).toInt + 1
    val nCols = math.round((wLonW - eLonW) / lonInc).toInt + 1
    require(latShift.length == nRows * nCols && lonShift.length == nRows * nCols)
    val out = new DataOutputStream(new FileOutputStream(path))
    def rec(n: String, w: ByteBuffer => Unit): Unit = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put(String.format("%-8s", n).getBytes("US-ASCII"), 0, 8)
      w(b)
      out.write(b.array())
    }
    def recI(n: String, v: Int): Unit = rec(n, _.putInt(8, v))
    def recD(n: String, v: Double): Unit = rec(n, _.putDouble(8, v))
    def recS(n: String, v: String): Unit =
      rec(n, _.put(String.format("%-8s", v).getBytes("US-ASCII"), 0, 8))
    recI("NUM_OREC", 11); recI("NUM_SREC", 11); recI("NUM_FILE", 1)
    recS("GS_TYPE", "SECONDS"); recS("VERSION", "NTv2.0")
    recS("SYSTEM_F", "LOCAL"); recS("SYSTEM_T", "WGS84")
    recD("MAJOR_F", 6378137.0); recD("MINOR_F", 6356752.314)
    recD("MAJOR_T", 6378137.0); recD("MINOR_T", 6356752.314)
    recS("SUB_NAME", "SUB1"); recS("PARENT", "NONE")
    recS("CREATED", "20260814"); recS("UPDATED", "20260814")
    recD("S_LAT", sLat); recD("N_LAT", nLat)
    recD("E_LONG", eLonW); recD("W_LONG", wLonW)
    recD("LAT_INC", latInc); recD("LONG_INC", lonInc)
    recI("GS_COUNT", nRows * nCols)
    val b = ByteBuffer.allocate(16 * nRows * nCols)
      .order(ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until nRows * nCols) {
      b.putFloat(latShift(i)); b.putFloat(lonShift(i))
      b.putFloat(0f); b.putFloat(0f)
    }
    out.write(b.array())
    out.close()
  }
}
