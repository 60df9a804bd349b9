package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{Datum, Proj4}

/** Datum shift + oblique stereographic (EPSG 9809) — the round-7 CRS
  * closers: legacy-datum national grids (RD New class) resolve from their
  * proj string including a nonzero +towgs84.
  */
class DatumSpec extends AnyFunSuite {

  // EPSG Guidance Note 7-2, method 9809 worked example: RD New (Amersfoort
  // datum, Bessel 1841). φ0 52°09'22.178"N λ0 5°23'15.500"E k0 0.9999079,
  // FE 155000 FN 463000; input φ 53°N λ 6°E → E 196105.283 N 557057.739.
  private val lat0 = 52.0 + 9.0 / 60 + 22.178 / 3600
  private val lon0 = 5.0 + 23.0 / 60 + 15.5 / 3600
  private val rd = Datum.ObliqueStereographic(
    lat0, lon0, 0.9999079, 155000.0, 463000.0, Datum.byName("bessel"))

  test("oblique stereographic reproduces the EPSG 9809 worked example") {
    val (e, n) = rd.forward(6.0, 53.0)
    assert(math.abs(e - 196105.283) < 0.01, s"easting $e")
    assert(math.abs(n - 557057.739) < 0.01, s"northing $n")
    val (lon, lat) = rd.inverse(196105.283, 557057.739)
    assert(math.abs(lon - 6.0) < 1e-7 && math.abs(lat - 53.0) < 1e-7,
      s"inverse ($lon, $lat)")
  }

  test("oblique stereographic round-trips across the projection domain") {
    for (lon <- Seq(3.4, 5.39, 7.1); lat <- Seq(50.8, 52.2, 53.5)) {
      val (e, n) = rd.forward(lon, lat)
      val (lon2, lat2) = rd.inverse(e, n)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($e,$n) -> ($lon2,$lat2)")
    }
  }

  test("helmert: translation-only forward adds T; 7-param round-trip is exact") {
    val t = Datum.Helmert(100.0, -50.0, 25.0)
    assert(t.forward(1000.0, 2000.0, 3000.0) == ((1100.0, 1950.0, 3025.0)))
    val h = Datum.Helmert(565.417, 50.3319, 465.552,
      -0.398957, 0.343988, -1.8774, 4.0725) // Amersfoort -> WGS84 (public)
    val (x, y, z) = (3924689.0, 300123.0, 5002024.0)
    val (fx, fy, fz) = h.forward(x, y, z)
    val (bx, by, bz) = h.inverse(fx, fy, fz)
    assert(math.abs(bx - x) < 1e-6 && math.abs(by - y) < 1e-6 &&
      math.abs(bz - z) < 1e-6, s"round-trip ($bx,$by,$bz)")
    // the shift itself is O(100 m), not a no-op
    assert(math.hypot(math.hypot(fx - x, fy - y), fz - z) > 50.0)
  }

  test("geodetic<->geocentric round-trips on WGS84 and Bessel") {
    for (ell <- Seq(Datum.WGS84, Datum.byName("bessel"), Datum.byName("intl"));
         lon <- Seq(-170.0, 0.0, 5.4, 120.0);
         lat <- Seq(-80.0, -10.0, 0.0, 52.2, 89.0)) {
      val (x, y, z) = Datum.geodeticToGeocentric(ell, lon, lat)
      val (lon2, lat2) = Datum.geocentricToGeodetic(ell, x, y, z)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"$ell ($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  private val rdProj = "+proj=sterea +lat_0=52.15616055555555 " +
    "+lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 +y_0=463000 " +
    "+ellps=bessel +towgs84=565.417,50.3319,465.552,-0.398957,0.343988," +
    "-1.8774,4.0725 +units=m +no_defs"

  test("proj4 sterea + towgs84 parses, round-trips, and actually shifts the datum") {
    val c = Proj4.parse(rdProj).getOrElse(fail("RD New proj string rejected"))
    // round-trip through the full WGS84<->RD chain
    for (lon <- Seq(4.9, 5.39, 6.6); lat <- Seq(51.4, 52.16, 53.2)) {
      val (e, n) = c.forward(lon, lat)
      val (lon2, lat2) = c.inverse(e, n)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
    // the projected origin maps back to WGS84 coordinates that differ
    // from the Amersfoort-datum origin by the expected O(100 m) shift
    val (olon, olat) = c.inverse(155000.0, 463000.0)
    val dMeters = math.hypot(
      (olon - 5.38763888888889) * 111320.0 * math.cos(math.toRadians(52.16)),
      (olat - 52.15616055555555) * 111132.0)
    assert(dMeters > 20.0 && dMeters < 300.0,
      s"datum shift magnitude $dMeters m")
  }

  test("ellipsoidal tmerc reproduces the EPSG worked example (OSGB36 on Airy)") {
    // EPSG Guidance Note 7-2, method 9807: British National Grid —
    // lat_0 49°N, lon_0 2°W, k0 0.9996012717, FE 400000, FN -100000,
    // Airy 1830; input 50°30'N 00°30'E -> E 577274.99, N 69740.50.
    val bng = Datum.EllipsoidalTransverseMercator(
      49.0, -2.0, 0.9996012717, 400000.0, -100000.0, Datum.byName("airy"))
    val (e, n) = bng.forward(0.5, 50.5)
    assert(math.abs(e - 577274.99) < 0.03, s"easting $e")
    assert(math.abs(n - 69740.50) < 0.03, s"northing $n")
    val (lon, lat) = bng.inverse(577274.99, 69740.50)
    assert(math.abs(lon - 0.5) < 1e-6 && math.abs(lat - 50.5) < 1e-6,
      s"inverse ($lon, $lat)")
  }

  test("ellipsoidal tmerc at WGS84 parameters equals the gallery kernel bit-for-bit") {
    val p = Datum.EllipsoidalTransverseMercator(
      0.0, 9.0, 0.9996, 500000.0, 0.0, Datum.WGS84)
    for (lon <- Seq(7.2, 9.0, 11.4); lat <- Seq(-33.0, 0.0, 48.1, 71.5)) {
      val (e1, n1) = p.forward(lon, lat)
      val (e2, n2) = graft.raster.GtiMosaic.TransverseMercator
        .forwardGeneral(0.0, 9.0, 0.9996, 500000.0, 0.0, lon, lat)
      assert(e1 == e2 && n1 == n2, s"($lon,$lat): ($e1,$n1) vs ($e2,$n2)")
    }
  }

  test("parametrized gallery kernels default to the exact WGS84 constants") {
    import graft.raster.GtiMosaic.{AlbersEqualArea, LambertConformal, PolarStereographic}
    val l1 = LambertConformal(44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0)
    val l2 = LambertConformal(44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0, Datum.WGS84)
    assert(l1.forward(2.35, 48.85) == l2.forward(2.35, 48.85))
    val a1 = AlbersEqualArea(29.5, 45.5, 23.0, -96.0)
    val a2 = AlbersEqualArea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0, Datum.WGS84)
    assert(a1.forward(-100.0, 40.0) == a2.forward(-100.0, 40.0))
    val s1 = PolarStereographic(70.0, -45.0)
    val s2 = PolarStereographic(70.0, -45.0, 0.0, 0.0, Datum.WGS84)
    assert(s1.forward(-40.0, 75.0) == s2.forward(-40.0, 75.0))
  }

  private val dhdnProj = "+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 " +
    "+y_0=0 +ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 " +
    "+units=m +no_defs"

  test("proj4 Gauss-Krüger on Bessel + 7-param shift (DHDN) compiles and shifts") {
    val c = Proj4.parse(dhdnProj).getOrElse(fail("DHDN proj string rejected"))
    // round-trip tolerance 1e-7 deg (~1 cm): the 2-D datum-shift
    // convention discards ellipsoidal height on the local side, so a
    // shifted round-trip is exact only to ~h·e² — inherent, same as PROJ
    for (lon <- Seq(7.5, 9.0, 10.7); lat <- Seq(48.1, 50.9, 53.6)) {
      val (e, n) = c.forward(lon, lat)
      val (lon2, lat2) = c.inverse(e, n)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
    // vs the same grid WITHOUT the datum shift: the Helmert moves the
    // projected point by the expected O(100 m)
    val noShift = Proj4.parse("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 " +
      "+x_0=3500000 +y_0=0 +ellps=bessel").getOrElse(fail("rejected"))
    val (e1, n1) = c.forward(9.5, 50.0)
    val (e0, n0) = noShift.forward(9.5, 50.0)
    val d = math.hypot(e1 - e0, n1 - n0)
    assert(d > 30.0 && d < 500.0, s"datum shift moved $d m")
  }

  test("proj4 ED50 UTM (intl + 3-param shift) compiles; shift points the right way") {
    val c = Proj4.parse("+proj=utm +zone=31 +ellps=intl " +
      "+towgs84=-87,-98,-121 +units=m +no_defs").getOrElse(fail("rejected"))
    val wgs = Proj4.parse("+proj=utm +zone=31 +ellps=WGS84")
      .getOrElse(fail("rejected"))
    // ED50 grid coordinates of a WGS84 point sit ~100-250 m away from the
    // WGS84-grid coordinates (the classic European offset)
    val (e1, n1) = c.forward(2.2945, 48.8584)
    val (e2, n2) = wgs.forward(2.2945, 48.8584)
    val d = math.hypot(e1 - e2, n1 - n2)
    assert(d > 80.0 && d < 300.0, s"ED50 offset $d m")
    val (lon, lat) = c.inverse(e1, n1)
    assert(math.abs(lon - 2.2945) < 1e-8 && math.abs(lat - 48.8584) < 1e-8)
  }

  test("proj4 legacy longlat (bessel + shift) is the pure datum shift") {
    val c = Proj4.parse("+proj=longlat +ellps=bessel " +
      "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,4.0725")
      .getOrElse(fail("rejected"))
    val (lon, lat) = c.forward(5.38763888888889, 52.15616055555555)
    val dMeters = math.hypot(
      (lon - 5.38763888888889) * 111320.0 * math.cos(math.toRadians(52.16)),
      (lat - 52.15616055555555) * 111132.0)
    assert(dMeters > 20.0 && dMeters < 300.0, s"shift $dMeters m")
    val (lon2, lat2) = c.inverse(lon, lat)
    // 1e-7 deg: height-discard residual (see the DHDN round-trip note)
    assert(math.abs(lon2 - 5.38763888888889) < 1e-7 &&
      math.abs(lat2 - 52.15616055555555) < 1e-7)
  }

  test("proj4 still refuses what it cannot compile safely") {
    // real shift with an unknown ellipsoid name
    assert(Proj4.parse("+proj=tmerc +lat_0=0 +lon_0=9 +ellps=weird " +
      "+towgs84=598.1,73.7,418.2").isEmpty)
    // real shift on a projection family with no datum-composable kernel
    assert(Proj4.parse("+proj=merc +towgs84=598.1,73.7,418.2").isEmpty)
    assert(Proj4.parse("+proj=sinu +R=6371007.181 +towgs84=1,2,3").isEmpty)
    // known +datum= shorthands now expand (Proj4Spec pins them); an
    // UNKNOWN shorthand still fails fast
    assert(Proj4.parse("+proj=tmerc +lat_0=0 +lon_0=9 +datum=ch1903").isEmpty)
    assert(Proj4.parse("+proj=tmerc +lat_0=0 +lon_0=9 +datum=potsdam").isDefined)
    // identity towgs84 stays accepted on the plain path
    assert(Proj4.parse("+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 " +
      "+x_0=500000 +y_0=0 +ellps=WGS84 +towgs84=0,0,0").isDefined)
  }

  test("proj4 sterea on WGS84 without shift is the plain kernel") {
    val c = Proj4.parse("+proj=sterea +lat_0=52.1 +lon_0=5.4 +k=0.9999 " +
      "+x_0=155000 +y_0=463000 +ellps=WGS84").getOrElse(fail("rejected"))
    val p = Datum.ObliqueStereographic(52.1, 5.4, 0.9999, 155000, 463000,
      Datum.WGS84)
    val (e1, n1) = c.forward(5.7, 52.5)
    val (e2, n2) = p.forward(5.7, 52.5)
    assert(e1 == e2 && n1 == n2)
  }
}
