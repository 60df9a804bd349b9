package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{Gtx, Proj4}

/** Vertical data model: GTX geoid grids, `+vunits`/`+vto_meter`,
  * `+geoidgrids`, and pipeline `vgridshift`/z-`unitconvert` steps — the
  * reference absorbs these via GDAL/PROJ (flytemosaic/mosaics.py:44-50
  * accepts arbitrary per-file CRSs); here they compile into
  * [[Proj4.CompiledVertical]]. The fixture grid is a PLANE
  * (N = 30 + 2·Δlat + 0.5·Δlon) so bilinear interpolation must be EXACT
  * at every query point, and the lon/lat slopes differ so axis-order
  * bugs cannot cancel. */
class VerticalSpec extends AnyFunSuite with SparkSpecBase {

  private def writeGtx(lat0: Double, lon0: Double, dLat: Double,
                       dLon: Double, rows: Int, cols: Int,
                       f: (Int, Int) => Float,
                       order: ByteOrder = ByteOrder.BIG_ENDIAN): Path = {
    val bb = ByteBuffer.allocate(40 + 4 * rows * cols).order(order)
    bb.putDouble(lat0).putDouble(lon0).putDouble(dLat).putDouble(dLon)
    bb.putInt(rows).putInt(cols)
    for (r <- 0 until rows; c <- 0 until cols) bb.putFloat(f(r, c))
    val p = Files.createTempFile("graft-gtx", ".gtx")
    Files.write(p, bb.array())
    p
  }

  // south-west node at (lat 40, lon 350 = -10°E), 3 rows × 4 cols, 1° step
  private def plane(r: Int, c: Int): Float = (30.0 + 2.0 * r + 0.5 * c).toFloat
  private lazy val gridPath = writeGtx(40, 350, 1, 1, 3, 4, plane)
  private def planeAt(lonDeg: Double, latDeg: Double): Double = {
    val lon360 = if (lonDeg < 0) lonDeg + 360 else lonDeg
    30.0 + 2.0 * (latDeg - 40.0) + 0.5 * (lon360 - 350.0)
  }

  test("gtx read + bilinear is exact on a plane, with 0..360 wrap") {
    val g = Gtx.read(gridPath.toString).getOrElse(fail("gtx must read"))
    assert(g.nRows == 3 && g.nCols == 4 && g.lat0 == 40 && g.lon0 == 350)
    // nodes, then strictly interior fractional points; query in ±180 form
    for (lon <- Seq(-10.0, -9.5, -8.25, -7.0); lat <- Seq(40.0, 40.75, 41.5, 42.0)) {
      val n = g.undulation(lon, lat).getOrElse(fail(s"covered ($lon,$lat)"))
      assert(math.abs(n - planeAt(lon, lat)) < 1e-6, s"($lon,$lat)")
    }
    // the grid's own 0..360 longitudes work too
    assert(g.undulation(350.5, 41.0).isDefined)
    // outside coverage: None, never an extrapolated number
    assert(g.undulation(-6.5, 41.0).isEmpty)
    assert(g.undulation(-10.0, 43.5).isEmpty)
  }

  test("little-endian gtx reads identically (endianness probe)") {
    val p = writeGtx(40, 350, 1, 1, 3, 4, plane, ByteOrder.LITTLE_ENDIAN)
    val g = Gtx.read(p.toString).getOrElse(fail("LE gtx must read"))
    assert(g.undulation(-9.5, 41.25).exists(n => math.abs(n - 32.75) < 1e-6))
  }

  test("nodata corner suppresses interpolation; truncated file fails read") {
    val p = writeGtx(40, 350, 1, 1, 3, 4,
      (r, c) => if (r == 0 && c == 0) -88.8888f else plane(r, c))
    val g = Gtx.read(p.toString).getOrElse(fail("gtx must read"))
    assert(g.undulation(-9.5, 40.5).isEmpty) // cell touching the bad node
    assert(g.undulation(-8.5, 41.5).isDefined) // cells away from it still work
    val bytes = Files.readAllBytes(gridPath)
    val trunc = Files.createTempFile("graft-gtx-trunc", ".gtx")
    Files.write(trunc, bytes.take(bytes.length - 8))
    assert(Gtx.read(trunc.toString).isEmpty)
  }

  test("GeoTIFF geoid grids convert to the same Grid the gtx path builds") {
    import graft.raster.GeoTiffWriter
    // same plane as the gtx fixture, written as a north-up float GeoTIFF
    // with the tiepoint at node-minus-half-pixel (the gdal_translate'd
    // .gtx layout) — center sampling must recover the nodes exactly
    val (rows, cols) = (3, 4)
    val plane = new Array[Float](rows * cols)
    for (r <- 0 until rows; c <- 0 until cols) // row 0 = NORTH (lat 42)
      plane(r * cols + c) = (30.0 + 2.0 * (rows - 1 - r) + 0.5 * c).toFloat
    plane(0 * cols + 3) = -9999f // north-east corner: declared nodata
    val tifBytes = GeoTiffWriter.write(cols, rows, Seq(plane),
      pixelScale = (1.0, 1.0), tiepoint = (349.5, 42.5),
      nodata = Some(-9999.0))
    val p = Files.createTempFile("graft-geoid", ".tif")
    Files.write(p, tifBytes)
    val g = Gtx.read(p.toString).getOrElse(fail("geoid tif must read"))
    assert(g.nRows == 3 && g.nCols == 4)
    assert(math.abs(g.lat0 - 40.0) < 1e-9 && math.abs(g.lon0 - 350.0) < 1e-9)
    for (lon <- Seq(-10.0, -9.5, -8.25); lat <- Seq(40.0, 40.75, 41.5)) {
      val n = g.undulation(lon, lat).getOrElse(fail(s"covered ($lon,$lat)"))
      assert(math.abs(n - planeAt(lon, lat)) < 1e-6, s"($lon,$lat)")
    }
    // the nodata node suppresses its cell, like the gtx sentinel
    assert(g.undulation(-7.2, 41.8).isEmpty)
    // and the whole thing plugs into +geoidgrids / vgridshift unchanged
    val v = Proj4.parse3(
      s"+proj=longlat +datum=WGS84 +geoidgrids=$p").flatMap(_._2).get
    assert(math.abs(v.toMeters(-9.5, 41.25, 100) - 132.75) < 1e-6)
  }

  test("graft_vertical_m: the vertical model runs IN-PLAN, codegen'd") {
    import spark.implicits._
    import graft.functions.VerticalFunctions._
    val crs = s"+proj=longlat +datum=WGS84 +vunits=ft +geoidgrids=$gridPath"
    val v = Proj4.parse3(crs).flatMap(_._2).get
    // covered points plus an out-of-coverage point (pass-through)
    val rows = Seq((-9.5, 41.25, 100.0), (-8.25, 41.5, 0.0),
      (120.0, 10.0, 50.0))
    val df = rows.toDF("lon", "lat", "z")
    val got = df.select($"lon", $"lat",
        toEllipsoidalMeters(crs, $"lon", $"lat", $"z").as("h"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    for (((lon, lat, z), (_, _, h)) <- rows.zip(got))
      assert(math.abs(h - v.toMeters(lon, lat, z)) < 1e-9, s"($lon,$lat)")
    // inverse round-trips through the plan too
    val rt = df.select(fromEllipsoidalMeters(crs, $"lon", $"lat",
        toEllipsoidalMeters(crs, $"lon", $"lat", $"z")).as("z2"),
        $"z")
      .collect()
    rt.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
    // a 2-D CRS (no vertical model) fails at PLAN time, not at runtime
    intercept[IllegalArgumentException] {
      toEllipsoidalMeters("+proj=longlat +datum=WGS84", $"lon", $"lat", $"z")
    }
    intercept[IllegalArgumentException] {
      toEllipsoidalMeters("+proj=longlat +vunits=cubits", $"lon", $"lat", $"z")
    }
  }

  test("+vunits / +vto_meter compile to the exact unit scale") {
    val ft = Proj4.parse3("+proj=longlat +datum=WGS84 +vunits=ft +no_defs")
      .flatMap(_._2).getOrElse(fail("vunits=ft must compile"))
    assert(ft.toMeters(0, 0, 10) == 3.048)
    assert(ft.fromMeters(0, 0, 3.048) == 10.0)
    // US survey foot is the exact legal ratio, not 0.3048
    val usft = Proj4.parse3("+proj=longlat +datum=WGS84 +vunits=us-ft")
      .flatMap(_._2).getOrElse(fail("us-ft must compile"))
    assert(usft.toMeters(0, 0, 3937) == 1200.0)
    val num = Proj4.parse3("+proj=longlat +datum=WGS84 +vto_meter=2.5")
      .flatMap(_._2).getOrElse(fail("vto_meter must compile"))
    assert(num.toMeters(0, 0, 4) == 10.0)
    // malformed vertical specs fail the WHOLE parse (never silently drop)
    assert(Proj4.parse3("+proj=longlat +datum=WGS84 +vunits=cubits").isEmpty)
    assert(Proj4.parse3("+proj=longlat +datum=WGS84 +vto_meter=0").isEmpty)
    assert(Proj4.parse3(
      "+proj=longlat +datum=WGS84 +vunits=ft +vto_meter=2").isEmpty)
    // ... but agreeing restatements are allowed
    assert(Proj4.parse3(
      "+proj=longlat +datum=WGS84 +vunits=ft +vto_meter=0.3048").nonEmpty)
  }

  test("+geoidgrids: orthometric → ellipsoidal is H·vto_meter + N") {
    val s = s"+proj=longlat +datum=WGS84 +geoidgrids=$gridPath +no_defs"
    val v = Proj4.parse3(s).flatMap(_._2).getOrElse(fail("geoidgrids"))
    val (lon, lat) = (-9.5, 41.25) // N = 32.75 on the plane
    assert(math.abs(v.toMeters(lon, lat, 100) - 132.75) < 1e-6)
    assert(math.abs(v.fromMeters(lon, lat, 132.75) - 100) < 1e-6)
    // outside the (regional) grid: pass-through, PROJ-style
    assert(v.toMeters(120.0, 10.0, 100) == 100.0)
    // vunits compose BEFORE the undulation (PROJ legacy 3-D flow)
    val vf = Proj4.parse3(s + " +vunits=ft").flatMap(_._2).get
    assert(math.abs(vf.toMeters(lon, lat, 100) - (30.48 + 32.75)) < 1e-6)
    assert(math.abs(vf.fromMeters(lon, lat, 30.48 + 32.75) - 100) < 1e-6)
    // a listed-but-missing grid fails parse3; parse stays vertical-blind
    val bad = "+proj=longlat +datum=WGS84 +geoidgrids=/nonexistent.gtx"
    assert(Proj4.parse3(bad).isEmpty)
    assert(Proj4.parse(bad).nonEmpty)
  }

  test("vertical keys never move the horizontal result") {
    val base = "+proj=utm +zone=32 +datum=WGS84 +units=m"
    val c2 = Proj4.parse(base).get
    val (c3, v3) = Proj4.parse3(s"$base +vunits=ft +geoidgrids=$gridPath").get
    assert(v3.nonEmpty)
    val (e2, n2) = c2.forward(9.1, 48.7)
    val (e3, n3) = c3.forward(9.1, 48.7)
    assert(e2 == e3 && n2 == n3)
    val plain = Proj4.parse3(base).get
    assert(plain._2.isEmpty) // 2-D CRS: no fabricated vertical
  }

  test("pipeline vgridshift: forward adds multiplier·N, +inv subtracts") {
    val (lon, lat) = (-9.5, 41.25)
    val p = Proj4.parse3(
      s"+proj=pipeline +step +proj=vgridshift +grids=$gridPath").get
    val v = p._2.getOrElse(fail("vgridshift must yield a vertical"))
    assert(math.abs(v.toMeters(lon, lat, 100) - 132.75) < 1e-6)
    assert(math.abs(v.fromMeters(lon, lat, 132.75) - 100) < 1e-6)
    // horizontal side of a z-only pipeline is the identity
    assert(p._1.forward(lon, lat) == ((lon, lat)))
    val half = Proj4.parse3("+proj=pipeline +step +proj=vgridshift " +
      s"+grids=$gridPath +multiplier=0.5").get._2.get
    assert(math.abs(half.toMeters(lon, lat, 100) - (100 + 16.375)) < 1e-6)
    val inv = Proj4.parse3("+proj=pipeline +step +proj=vgridshift " +
      s"+grids=$gridPath +inv").get._2.get
    assert(math.abs(inv.toMeters(lon, lat, 132.75) - 100) < 1e-6)
    // missing grid file: whole pipeline fails
    assert(Proj4.parse3(
      "+proj=pipeline +step +proj=vgridshift +grids=/nope.gtx").isEmpty)
  }

  test("vgridshift looks up at the RIGHT coords through rad state and axisswap") {
    val (lon, lat) = (-8.25, 41.5) // N = 33.875; asymmetric slopes
    val n = planeAt(lon, lat)
    val rad = Proj4.parse3("+proj=pipeline " +
      "+step +proj=unitconvert +xy_in=deg +xy_out=rad " +
      s"+step +proj=vgridshift +grids=$gridPath " +
      "+step +proj=unitconvert +xy_in=rad +xy_out=deg").get._2.get
    assert(math.abs(rad.toMeters(lon, lat, 0) - n) < 1e-6)
    val swap = Proj4.parse3("+proj=pipeline " +
      "+step +proj=axisswap +order=2,1 " +
      s"+step +proj=vgridshift +grids=$gridPath " +
      "+step +proj=axisswap +order=2,1").get._2.get
    assert(math.abs(swap.toMeters(lon, lat, 0) - n) < 1e-6)
    // a vgridshift in PROJECTED state cannot look up the grid: fail fast
    assert(Proj4.parse3("+proj=pipeline " +
      "+step +proj=utm +zone=32 +ellps=WGS84 " +
      s"+step +proj=vgridshift +grids=$gridPath").isEmpty)
  }

  test("pipeline z-unitconvert scales z and composes in step order") {
    val v = Proj4.parse3("+proj=pipeline " +
      "+step +proj=unitconvert +z_in=ft +z_out=m").get._2.get
    assert(v.toMeters(0, 0, 10) == 3.048)
    assert(v.fromMeters(0, 0, 3.048) == 10.0)
    // vgridshift (meters) THEN m→ft: forward is (z + N) / 0.3048
    val (lon, lat) = (-9.5, 41.25)
    val seq = Proj4.parse3("+proj=pipeline " +
      s"+step +proj=vgridshift +grids=$gridPath " +
      "+step +proj=unitconvert +z_in=m +z_out=ft").get._2.get
    assert(math.abs(seq.toMeters(lon, lat, 100) - 132.75 / 0.3048) < 1e-6)
    assert(math.abs(seq.fromMeters(lon, lat, 132.75 / 0.3048) - 100) < 1e-6)
    // combined xy+z unitconvert in ONE step stays one step
    val both = Proj4.parse3("+proj=pipeline " +
      "+step +proj=unitconvert +xy_in=deg +xy_out=rad +z_in=ft +z_out=m " +
      "+step +proj=unitconvert +xy_in=rad +xy_out=deg").get
    assert(both._2.get.toMeters(0, 0, 10) == 3.048)
    val (bx, by) = both._1.forward(12.0, 47.0) // deg→rad→deg: ULP-level only
    assert(math.abs(bx - 12.0) < 1e-12 && math.abs(by - 47.0) < 1e-12)
    // unknown z unit fails the parse
    assert(Proj4.parse3("+proj=pipeline " +
      "+step +proj=unitconvert +z_in=cubits +z_out=m").isEmpty)
  }
}
