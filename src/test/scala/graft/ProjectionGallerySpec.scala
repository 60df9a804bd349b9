package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.GtiMosaic.{AlbersEqualArea, GridWarp, PolarStereographic, Sinusoidal, SinusoidalEllipsoidal}

/** Property tests for the Albers / polar-stereographic warp gallery.
  * Strategy (same as the UTM/LCC suites): a projection is pinned by its
  * defining properties — round-trip identity, the metric property
  * (equal-area Jacobian for Albers, conformal + true-scale-at-parallel
  * for polar stereo), and axis orientation — rather than by literals
  * copied from an external tool.
  */
class ProjectionGallerySpec extends AnyFunSuite {

  private def drange(from: Double, to: Double, by: Double): Seq[Double] =
    Iterator.iterate(from)(_ + by).takeWhile(_ <= to).toSeq

  private val a = 6378137.0
  private val e2 = 1.0 / 298.257223563 * (2 - 1.0 / 298.257223563)

  test("Albers: forward/inverse round-trip on CONUS and Australian grids") {
    val conus = AlbersEqualArea(29.5, 45.5, 23.0, -96.0)
    val aus = AlbersEqualArea(-18.0, -36.0, 0.0, 132.0)
    for (lon <- drange(-120.0, -70.0, 7.3); lat <- drange(25.0, 48.0, 3.7)) {
      val (x, y) = conus.forward(lon, lat)
      val (lon2, lat2) = conus.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"conus round-trip at ($lon,$lat)")
    }
    for (lon <- drange(115.0, 150.0, 5.9); lat <- drange(-40.0, -12.0, 4.3)) {
      val (x, y) = aus.forward(lon, lat)
      val (lon2, lat2) = aus.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"aus round-trip at ($lon,$lat)")
    }
  }

  test("Albers: |Jacobian| equals the ellipsoidal area element (equal-area)") {
    val conus = AlbersEqualArea(29.5, 45.5, 23.0, -96.0)
    val d = 1e-6 // degrees
    for (lon <- Seq(-110.0, -96.0, -80.0); lat <- Seq(26.0, 37.5, 45.0)) {
      val (xe, ye) = conus.forward(lon + d, lat)
      val (xw, yw) = conus.forward(lon - d, lat)
      val (xn, yn) = conus.forward(lon, lat + d)
      val (xs, ys) = conus.forward(lon, lat - d)
      val rad = math.toRadians(2 * d)
      val dxdl = (xe - xw) / rad; val dydl = (ye - yw) / rad
      val dxdp = (xn - xs) / rad; val dydp = (yn - ys) / rad
      val jac = math.abs(dxdl * dydp - dxdp * dydl)
      val s = math.sin(math.toRadians(lat))
      val areaElem = a * a * (1 - e2) * math.cos(math.toRadians(lat)) /
        math.pow(1 - e2 * s * s, 2)
      assert(math.abs(jac / areaElem - 1) < 1e-5,
        s"area distortion ${jac / areaElem} at ($lon,$lat)")
    }
  }

  test("Albers: origin maps to false origin; axes oriented east/north") {
    val conus = AlbersEqualArea(29.5, 45.5, 23.0, -96.0)
    val (x0, y0) = conus.forward(-96.0, 23.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
    assert(conus.forward(-90.0, 23.0)._1 > 0) // east of CM → +x
    assert(conus.forward(-96.0, 30.0)._2 > 0) // north of origin → +y
    // California Albers false northing
    val cal = AlbersEqualArea(34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0)
    val (_, yc) = cal.forward(-120.0, 0.0)
    assert(math.abs(yc - -4000000.0) < 1e-6)
  }

  test("polar stereo: round-trip both aspects") {
    val north = PolarStereographic(70.0, -45.0) // EPSG:3413
    val southP = PolarStereographic(-71.0, 0.0) // EPSG:3031
    for (lon <- drange(-180.0, 180.0, 37.0); lat <- Seq(60.0, 70.0, 80.0, 89.0)) {
      val (x, y) = north.forward(lon, lat)
      val (lon2, lat2) = north.inverse(x, y)
      val dLon = math.abs(((lon2 - lon) % 360 + 540) % 360 - 180)
      assert(dLon < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"north round-trip at ($lon,$lat)")
    }
    for (lon <- drange(-180.0, 180.0, 41.0); lat <- Seq(-60.0, -71.0, -85.0)) {
      val (x, y) = southP.forward(lon, lat)
      val (lon2, lat2) = southP.inverse(x, y)
      val dLon = math.abs(((lon2 - lon) % 360 + 540) % 360 - 180)
      assert(dLon < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"south round-trip at ($lon,$lat)")
    }
  }

  test("polar stereo: conformal, true scale at the standard parallel") {
    val north = PolarStereographic(70.0, -45.0)
    val d = 1e-6
    for (lon <- Seq(-135.0, -45.0, 30.0); lat <- Seq(62.0, 70.0, 82.0)) {
      val s = math.sin(math.toRadians(lat))
      // true ground distances per radian along parallel/meridian
      val rPar = a * math.cos(math.toRadians(lat)) / math.sqrt(1 - e2 * s * s)
      val rMer = a * (1 - e2) / math.pow(1 - e2 * s * s, 1.5)
      val (xe, ye) = north.forward(lon + d, lat)
      val (xw, yw) = north.forward(lon - d, lat)
      val (xn, yn) = north.forward(lon, lat + d)
      val (xs, ys) = north.forward(lon, lat - d)
      val rad = math.toRadians(2 * d)
      val kPar = math.hypot(xe - xw, ye - yw) / (rad * rPar)
      val kMer = math.hypot(xn - xs, yn - ys) / (rad * rMer)
      assert(math.abs(kPar / kMer - 1) < 1e-5, s"not conformal at ($lon,$lat)")
      if (lat == 70.0)
        assert(math.abs(kPar - 1) < 1e-6, s"scale $kPar != 1 at lat_ts")
    }
  }

  test("polar stereo: proj axis conventions, pole at false origin") {
    val north = PolarStereographic(70.0, -45.0) // EPSG:3413
    val (xp, yp) = north.forward(0.0, 90.0)
    assert(math.hypot(xp, yp) < 1e-6)
    // at lon0 the point lies on the −y axis (north aspect)
    val (x1, y1) = north.forward(-45.0, 70.0)
    assert(math.abs(x1) < 1e-6 && y1 < 0)
    // 90° east of lon0 → +x axis
    val (x2, y2) = north.forward(45.0, 70.0)
    assert(x2 > 0 && math.abs(y2) < 1e-6)
    val southP = PolarStereographic(-71.0, 0.0) // EPSG:3031
    val (xs0, ys0) = southP.forward(0.0, -90.0)
    assert(math.hypot(xs0, ys0) < 1e-6)
    // south aspect: lon0 lies on the +y axis, 90°E on +x
    val (x3, y3) = southP.forward(0.0, -71.0)
    assert(math.abs(x3) < 1e-6 && y3 > 0)
    val (x4, y4) = southP.forward(90.0, -71.0)
    assert(x4 > 0 && math.abs(y4) < 1e-6)
    // true scale at φc ⟹ the projected parallel circle has the true
    // circumference 2π·a·m(φc), i.e. ρ(φc) = a·cosφc/√(1−e²sin²φc)
    val s71 = math.sin(math.toRadians(71))
    val rhoTrue = a * math.cos(math.toRadians(71)) / math.sqrt(1 - e2 * s71 * s71)
    assert(math.abs(y3 - rhoTrue) < 1e-6)
  }

  test("Sinusoidal: round-trip, equal-area Jacobian, MODIS tile anchors") {
    val sin = Sinusoidal() // MODIS sphere
    for (lon <- drange(-170.0, 170.0, 23.7); lat <- drange(-80.0, 80.0, 9.1)) {
      val (x, y) = sin.forward(lon, lat)
      val (lon2, lat2) = sin.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"round-trip at ($lon,$lat)")
    }
    // equal-area: |J| = R² cos φ on the sphere
    val d = 1e-6
    for (lon <- Seq(-120.0, 0.0, 77.0); lat <- Seq(-45.0, 10.0, 60.0)) {
      val (xe, ye) = sin.forward(lon + d, lat)
      val (xw, yw) = sin.forward(lon - d, lat)
      val (xn, yn) = sin.forward(lon, lat + d)
      val (xs, ys) = sin.forward(lon, lat - d)
      val rad = math.toRadians(2 * d)
      val jac = math.abs(
        ((xe - xw) / rad) * ((yn - ys) / rad) -
        ((xn - xs) / rad) * ((ye - yw) / rad))
      val want = Sinusoidal.ModisRadius * Sinusoidal.ModisRadius *
        math.cos(math.toRadians(lat))
      assert(math.abs(jac / want - 1) < 1e-6, s"area at ($lon,$lat)")
    }
    // MODIS grid anchors: the grid spans 36 horizontal tiles of
    // 1111950.5196666666 m (2π·R/36 at the equator ⟹ x(180°,0°) = 18 tiles)
    val tile = 1111950.5196666666
    val (x180, _) = sin.forward(180.0, 0.0)
    assert(math.abs(x180 - 18 * tile) < 0.5, s"x(180,0)=$x180")
    // y spans ±9 tiles at the poles
    val (_, yN) = sin.forward(0.0, 90.0)
    assert(math.abs(yN - 9 * tile) < 0.5, s"y(0,90)=$yN")
  }

  test("SinusoidalEllipsoidal: round-trip, ellipsoidal equal-area, y = M(lat)") {
    val sin = SinusoidalEllipsoidal()
    for (lon <- drange(-170.0, 170.0, 23.7); lat <- drange(-80.0, 80.0, 9.1)) {
      val (x, y) = sin.forward(lon, lat)
      val (lon2, lat2) = sin.inverse(x, y)
      // 1e-6 deg ≈ 10 cm: the rectifying series (eq. 3-26) truncates at
      // e1^4, leaving ~1 cm residual at high latitude
      assert(math.abs(lon2 - lon) < 1e-6 && math.abs(lat2 - lat) < 1e-6,
        s"round-trip at ($lon,$lat)")
    }
    // equal-area: |J| equals the ELLIPSOIDAL area element (same check as
    // Albers — the two independent codebases agreeing pins both)
    val d = 1e-6
    for (lon <- Seq(-120.0, 0.0, 77.0); lat <- Seq(-45.0, 10.0, 60.0)) {
      val (xe, ye) = sin.forward(lon + d, lat)
      val (xw, yw) = sin.forward(lon - d, lat)
      val (xn, yn) = sin.forward(lon, lat + d)
      val (xs, ys) = sin.forward(lon, lat - d)
      val rad = math.toRadians(2 * d)
      val jac = math.abs(
        ((xe - xw) / rad) * ((yn - ys) / rad) -
        ((xn - xs) / rad) * ((ye - yw) / rad))
      val s = math.sin(math.toRadians(lat))
      val want = a * a * (1 - e2) * math.cos(math.toRadians(lat)) /
        math.pow(1 - e2 * s * s, 2)
      assert(math.abs(jac / want - 1) < 1e-5, s"area at ($lon,$lat)")
    }
    // northing is the meridian distance: the equator maps to 0 and one
    // degree of latitude at the equator is ~110.574 km (WGS84)
    assert(sin.forward(30.0, 0.0)._2 == 0.0)
    val (_, y1) = sin.forward(0.0, 1.0)
    assert(math.abs(y1 - 110574.4) < 100, s"M(1 deg)=$y1")
    // divergence from the spherical form is the ~25 km the ellipsoid owes
    val ySph = Sinusoidal(radius = 6378137.0).forward(0.0, 45.0)._2
    val yEll = sin.forward(0.0, 45.0)._2
    assert(ySph - yEll > 20000 && ySph - yEll < 30000)
  }

  test("gallery EPSG codes resolve in GridWarp.standard, composed via lon/lat") {
    for (code <- Seq("EPSG:5070", "EPSG:3577", "EPSG:3310",
        "EPSG:3413", "EPSG:3031", "EPSG:3976",
        "SR-ORG:6974", "ESRI:54008")) {
      assert(GridWarp.standard(code, "EPSG:4326").isDefined, s"$code from 4326")
      assert(GridWarp.standard("EPSG:4326", code).isDefined, s"$code to 4326")
      assert(GridWarp.standard(code, "EPSG:3857").isDefined, s"$code from 3857")
    }
    // CONUS Albers file in a 4326 mosaic: warp a mosaic point into file
    // meters and back through the registered inverse
    val w = GridWarp.standard("EPSG:5070", "EPSG:4326").get
    val (fx, fy) = w.toFile(-100.0, 40.0)
    val inv = GridWarp.standard("EPSG:4326", "EPSG:5070").get
    val (lon, lat) = inv.toFile(fx, fy)
    assert(math.abs(lon - -100.0) < 1e-9 && math.abs(lat - 40.0) < 1e-9)
  }
}
