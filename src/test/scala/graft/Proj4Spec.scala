package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{GeoTiffWriter, GtiMosaic, Proj4}

/** Proj4-string CRS interpreter: compiled projections must agree with the
  * hand-registered kernels, round-trip, reject what the engine cannot do
  * honestly (datum shifts, unknown projections), and drive `assemble` for
  * tiles whose grid is an unregistered-but-parseable national grid — the
  * reference's `CRS.from_string` path (flyte/build.py:56-75). */
class Proj4Spec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val L93 = "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 " +
    "+x_0=700000 +y_0=6600000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 " +
    "+units=m +no_defs"

  test("proj lcc string equals the gallery kernel (Lambert-93)") {
    val c = Proj4.parse(L93).getOrElse(fail("L93 proj string must parse"))
    val gallery = GtiMosaic.GridWarp.standard("EPSG:2154", "EPSG:4326").get
    for (lon <- Seq(-4.0, 0.0, 3.0, 7.5); lat <- Seq(41.5, 44.0, 46.5, 49.0)) {
      val (e1, n1) = c.forward(lon, lat)
      val (e2, n2) = gallery.toFile(lon, lat)
      assert(math.abs(e1 - e2) < 1e-9 && math.abs(n1 - n2) < 1e-9, s"($lon,$lat)")
      val (lon2, lat2) = c.inverse(e1, n1)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("proj utm/tmerc strings equal the transverse Mercator kernel") {
    val utm = Proj4.parse("+proj=utm +zone=31 +datum=WGS84 +units=m +no_defs")
      .getOrElse(fail("utm must parse"))
    val (e, n) = utm.forward(2.35, 48.86)
    val (e2, n2) = GtiMosaic.TransverseMercator.forward(31, south = false, 2.35, 48.86)
    assert(e == e2 && n == n2)
    // the same zone written as an explicit tmerc is identical math
    val tm = Proj4.parse("+proj=tmerc +lat_0=0 +lon_0=3 +k=0.9996 " +
      "+x_0=500000 +y_0=0 +ellps=WGS84 +units=m +no_defs")
      .getOrElse(fail("tmerc must parse"))
    val (e3, n3) = tm.forward(2.35, 48.86)
    assert(math.abs(e3 - e) < 1e-9 && math.abs(n3 - n) < 1e-9)
    // NZTM2000-shaped grid (nonzero lat-origin false northing) round-trips
    val nz = Proj4.parse("+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 " +
      "+x_0=1600000 +y_0=10000000 +ellps=GRS80 +units=m +no_defs").get
    // ±5° from the central meridian: the 6-term Snyder series round-trips
    // to ~1e-7 deg (≈1 cm) — series truncation, not a kernel bug
    for (lon <- Seq(168.0, 173.0, 178.0); lat <- Seq(-46.0, -41.0, -35.0)) {
      val (x, y) = nz.forward(lon, lat)
      val (lon2, lat2) = nz.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-6 && math.abs(lat2 - lat) < 1e-6)
    }
  }

  test("proj aea / stere / sinu / merc strings hit their kernels and round-trip") {
    val conus = Proj4.parse("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 " +
      "+lon_0=-96 +x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs").get
    val gallery = GtiMosaic.GridWarp.standard("EPSG:5070", "EPSG:4326").get
    val (e1, n1) = conus.forward(-100.0, 40.0)
    val (e2, n2) = gallery.toFile(-100.0, 40.0)
    assert(math.abs(e1 - e2) < 1e-9 && math.abs(n1 - n2) < 1e-9)

    val npolar = Proj4.parse("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 " +
      "+x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs").get
    val g3413 = GtiMosaic.GridWarp.standard("EPSG:3413", "EPSG:4326").get
    val (p1, p2) = npolar.forward(-30.0, 75.0)
    val (q1, q2) = g3413.toFile(-30.0, 75.0)
    assert(math.abs(p1 - q1) < 1e-9 && math.abs(p2 - q2) < 1e-9)
    // south aspect: lat_0=-90 resolves the southern kernel
    val spolar = Proj4.parse("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 " +
      "+datum=WGS84").get
    val (s1, s2) = spolar.forward(45.0, -75.0)
    val g3031 = GtiMosaic.GridWarp.standard("EPSG:3031", "EPSG:4326").get
    val (t1, t2) = g3031.toFile(45.0, -75.0)
    assert(math.abs(s1 - t1) < 1e-9 && math.abs(s2 - t2) < 1e-9)

    // MODIS sinusoidal sphere via +R; false offsets applied and inverted
    val sinu = Proj4.parse("+proj=sinu +lon_0=0 +x_0=100 +y_0=-200 " +
      "+R=6371007.181 +units=m +no_defs").get
    val (x, y) = sinu.forward(10.0, 50.0)
    val ref = GtiMosaic.Sinusoidal().forward(10.0, 50.0)
    assert(math.abs(x - (ref._1 + 100)) < 1e-9 && math.abs(y - (ref._2 - 200)) < 1e-9)
    val (lon2, lat2) = sinu.inverse(x, y)
    assert(math.abs(lon2 - 10.0) < 1e-9 && math.abs(lat2 - 50.0) < 1e-9)
    // ellipsoidal sinu (world sinusoidal) without +R
    val sinuE = Proj4.parse("+proj=sinu +lon_0=0 +ellps=WGS84").get
    val refE = GtiMosaic.SinusoidalEllipsoidal().forward(10.0, 50.0)
    assert(sinuE.forward(10.0, 50.0) == refE)

    // spherical Web-Mercator string equals the 3857 GridWarp
    val merc = Proj4.parse("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 " +
      "+lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m +no_defs").get
    val (mx, my) = merc.forward(2.35, 48.86)
    assert(math.abs(mx - GtiMosaic.GridWarp.GeoToWebMercator.invX(2.35)) < 1e-9 &&
      math.abs(my - GtiMosaic.GridWarp.GeoToWebMercator.invY(48.86)) < 1e-9)
    // ...and so does PROJ 6+'s modern form (+proj=webmerc +datum=WGS84):
    // spherical formulas on the WGS84 semi-major, NOT ellipsoidal merc
    val wm = Proj4.parse("+proj=webmerc +datum=WGS84").get
    assert(wm.forward(2.35, 48.86) == ((mx, my)))
    val (wlon, wlat) = wm.inverse(mx, my)
    assert(math.abs(wlon - 2.35) < 1e-12 && math.abs(wlat - 48.86) < 1e-12)

    val ll = Proj4.parse("+proj=longlat +datum=WGS84 +no_defs").get
    assert(ll.forward(12.5, -33.0) == ((12.5, -33.0)))
  }

  test("proj cea (EASE-Grid 2.0) pins to the published global extent; eqc round-trips") {
    // EPSG:6933 (ellipsoidal cylindrical equal-area, lat_ts=30, WGS84):
    // NSIDC publishes the EASE-Grid 2.0 global extent as
    // x = +-17367530.445161 m (lon +-180), y = +-7314540.830638 m (poles)
    val ease = Proj4.parse("+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 " +
      "+datum=WGS84 +units=m +no_defs").getOrElse(fail("cea must parse"))
    val (xe, _) = ease.forward(180.0, 0.0)
    assert(math.abs(xe - 17367530.445161) < 1e-3, s"x(180)=$xe")
    // independent mathematical pin — equal-area closure: the full map
    // rectangle (2x_max * 2y_pole) must equal the ellipsoid's authalic
    // sphere area 4*pi*Rq^2 (Rq = 6371007.181 m for WGS84, the published
    // authalic radius), which fixes y_pole = Rq^2 / (a*k0)
    val (_, yn) = ease.forward(0.0, 90.0)
    val rq = 6371007.1809
    val expectedPole = rq * rq / (xe / math.Pi)
    assert(math.abs(yn - expectedPole) < 1e-2, s"y(90)=$yn vs $expectedPole")
    // inverse at the pole hits the explicit special case
    val (_, latP) = ease.inverse(0.0, yn)
    assert(math.abs(latP - 90.0) < 1e-9)
    // round-trip grid over the globe (sub-mm)
    for (lon <- Seq(-179.0, -60.0, 0.0, 45.5, 179.0);
         lat <- Seq(-80.0, -30.0, 0.0, 30.0, 66.5, 89.0)) {
      val (x, y) = ease.forward(lon, lat)
      val (lon2, lat2) = ease.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-7,
        s"cea roundtrip ($lon,$lat) -> ($lon2,$lat2)")
    }
    // spherical cea on an explicit +R: equal-area property y = R sinφ/cosφs
    val sph = Proj4.parse("+proj=cea +lat_ts=0 +lon_0=0 +R=6371007").get
    val (_, ys) = sph.forward(0.0, 30.0)
    assert(math.abs(ys - 6371007 * 0.5) < 1e-6)

    // eqc / plate carrée: x(180) = pi*R at lat_ts=0 (EPSG:32662 shape)
    val eqc = Proj4.parse("+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 " +
      "+x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs").get
    val (xq, yq) = eqc.forward(180.0, 45.0)
    assert(math.abs(xq - math.Pi * 6378137.0) < 1e-6)
    assert(math.abs(yq - math.toRadians(45.0) * 6378137.0) < 1e-6)
    for (lon <- Seq(-170.0, 13.25); lat <- Seq(-89.0, 0.0, 52.5)) {
      val (x, y) = eqc.forward(lon, lat)
      val (lon2, lat2) = eqc.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
    // scaled variant: lat_ts=60 halves the x scale (cos 60 = 1/2)
    val eqc60 = Proj4.parse("+proj=eqc +lat_ts=60 +lon_0=0 +R=6371000").get
    val (x60, _) = eqc60.forward(100.0, 10.0)
    assert(math.abs(x60 - 6371000 * math.toRadians(100.0) * 0.5) < 1e-6)
  }

  test("proj laea: authalic pins, equal-area closure, EPSG:3035/6931 shapes") {
    val rq = 6371007.1809 // published WGS84 authalic radius (shared pin)
    // POLAR aspect (EASE-Grid 2.0 North, EPSG:6931 string): the map
    // radius at the equator is √2·Rq — a closed-form authalic pin
    val north = Proj4.parse("+proj=laea +lat_0=90 +lon_0=0 +x_0=0 +y_0=0 " +
      "+datum=WGS84 +units=m +no_defs").getOrElse(fail("polar laea"))
    val (xe, ye) = north.forward(90.0, 0.0) // due east of the pole
    assert(math.abs(math.hypot(xe, ye) - math.sqrt(2) * rq) < 1e-2,
      s"polar equator radius ${math.hypot(xe, ye)} vs ${math.sqrt(2) * rq}")
    // y-axis orientation: lon=0 maps to -y (south on the map)
    val (x0n, y0n) = north.forward(0.0, 80.0)
    assert(math.abs(x0n) < 1e-6 && y0n < 0)
    // OBLIQUE aspect — the ETRS89-LAEA Europe string (EPSG:3035):
    val eu = Proj4.parse("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 " +
      "+y_0=3210000 +datum=WGS84 +units=m +no_defs")
      .getOrElse(fail("oblique laea"))
    // natural origin lands exactly on the false origin
    val (ox, oy) = eu.forward(10.0, 52.0)
    assert(math.abs(ox - 4321000) < 1e-6 && math.abs(oy - 3210000) < 1e-6)
    // EQUAL-AREA closure (the property that defines the method): a small
    // quad's map area equals its ellipsoidal area within 1e-6 relative,
    // at several latitudes incl. south of the origin
    val a = 6378137.0; val e2 = 0.00669437999014
    for ((lon, lat) <- Seq((5.0, 50.0), (20.0, 40.0), (10.0, 70.0),
                           (-8.0, 36.0), (10.0, 52.0))) {
      // small enough that finite-difference truncation sits well under
      // the 1e-6 gate even 20° from the projection center
      val h = 1e-4 // degrees
      val p00 = eu.forward(lon, lat); val p10 = eu.forward(lon + h, lat)
      val p01 = eu.forward(lon, lat + h)
      val mapArea = math.abs(
        (p10._1 - p00._1) * (p01._2 - p00._2) -
          (p01._1 - p00._1) * (p10._2 - p00._2))
      val phi = math.toRadians(lat)
      val den = 1 - e2 * math.sin(phi) * math.sin(phi)
      val ellArea = a * a * (1 - e2) * math.cos(phi) / (den * den) *
        math.toRadians(h) * math.toRadians(h)
      assert(math.abs(mapArea / ellArea - 1) < 1e-6,
        s"area ratio at ($lon,$lat): ${mapArea / ellArea}")
    }
    // sub-mm round-trips across the map, incl. polar store points
    for ((lon, lat) <- Seq((10.0, 52.0), (-10.3, 34.7), (31.0, 71.2),
                           (10.0, 90.0), (179.0, 55.0))) {
      val (x, y) = eu.forward(lon, lat)
      val (lon2, lat2) = eu.inverse(x, y)
      assert((math.abs(lat - 90) < 1e-9 || math.abs(lon2 - lon) < 1e-7) &&
        math.abs(lat2 - lat) < 1e-7, s"laea roundtrip ($lon,$lat)->($lon2,$lat2)")
    }
    for ((lon, lat) <- Seq((0.0, 89.0), (120.0, 45.0), (-60.0, 10.0))) {
      val (x, y) = north.forward(lon, lat)
      val (lon2, lat2) = north.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7)
    }
    // spherical laea on +R: k' at the origin is 1 (Snyder 24-2)
    val sph = Proj4.parse("+proj=laea +lat_0=40 +lon_0=-100 +R=6371000")
      .getOrElse(fail("spherical laea"))
    val (sx, sy) = sph.forward(-100.0, 40.0)
    assert(math.abs(sx) < 1e-9 && math.abs(sy) < 1e-9)
    val (l2, p2) = sph.inverse(sph.forward(-95.0, 35.0)._1,
      sph.forward(-95.0, 35.0)._2)
    assert(math.abs(l2 + 95) < 1e-7 && math.abs(p2 - 35) < 1e-7)
  }

  test("proj moll + aeqd: closed-form pins and honest aeqd rejection") {
    // Mollweide: x(±180, 0) = ±2√2·R, y(poles) = ±√2·R; PROJ treats any
    // datum as the a-radius sphere — mirror with +datum=WGS84
    val m = Proj4.parse("+proj=moll +lon_0=0 +datum=WGS84 +units=m +no_defs")
      .getOrElse(fail("moll"))
    val rA = 6378137.0
    val (xm, _) = m.forward(180.0, 0.0)
    assert(math.abs(xm - 2 * math.sqrt(2) * rA) < 1e-6, s"x(180,0)=$xm")
    val (_, yp) = m.forward(0.0, 90.0)
    assert(math.abs(yp - math.sqrt(2) * rA) < 1e-6, s"y(pole)=$yp")
    // total map area (ellipse π·ab) equals the sphere area 4πR² — the
    // equal-area identity that fixes both axes
    assert(math.abs(math.Pi * (2 * math.sqrt(2) * rA) * (math.sqrt(2) * rA) /
      (4 * math.Pi * rA * rA) - 1) < 1e-12)
    for ((lon, lat) <- Seq((0.0, 0.0), (-179.0, -60.0), (45.0, 52.5),
                           (13.0, 89.5))) {
      val (x, y) = m.forward(lon, lat)
      val (lon2, lat2) = m.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"moll roundtrip ($lon,$lat)->($lon2,$lat2)")
    }
    // aeqd spherical: map distance from center == great-circle distance
    // (the defining property), azimuthal directions preserved
    val r = 6371000.0
    val ae = Proj4.parse(s"+proj=aeqd +lat_0=48.0 +lon_0=2.0 +R=$r")
      .getOrElse(fail("aeqd"))
    for ((lon, lat) <- Seq((2.0, 49.0), (-70.0, 40.0), (140.0, -35.0))) {
      val (x, y) = ae.forward(lon, lat)
      val (p1, l1) = (math.toRadians(48.0), math.toRadians(2.0))
      val (p2r, l2r) = (math.toRadians(lat), math.toRadians(lon))
      val gc = r * math.acos(math.min(1.0, math.sin(p1) * math.sin(p2r) +
        math.cos(p1) * math.cos(p2r) * math.cos(l2r - l1)))
      assert(math.abs(math.hypot(x, y) - gc) < 1e-6,
        s"aeqd dist ${math.hypot(x, y)} vs great-circle $gc")
      val (lon2, lat2) = ae.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7)
    }
    // ellipsoidal aeqd compiles via geodesics (GeodesicSpec pins the
    // kernel; here: the defining property — map distance from the center
    // equals the VINCENTY geodesic distance, not the spherical one)
    val aeE = Proj4.parse("+proj=aeqd +lat_0=48 +lon_0=2 +datum=WGS84")
      .getOrElse(fail("ellipsoidal aeqd"))
    for ((lon, lat) <- Seq((2.0, 49.0), (-70.0, 40.0), (140.0, -35.0))) {
      val (x, y) = aeE.forward(lon, lat)
      val Some(geod) = graft.raster.Geodesic.distance(
        graft.raster.Datum.WGS84, 2.0, 48.0, lon, lat)
      assert(math.abs(math.hypot(x, y) - geod) < 1e-6,
        s"ell-aeqd dist ${math.hypot(x, y)} vs geodesic $geod")
      val (lon2, lat2) = aeE.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7)
    }
    assert(Proj4.parse("+proj=aeqd +lat_0=48 +lon_0=2 +ellps=GRS80").isDefined)
  }

  test("+pm non-Greenwich meridians and +proj=pipeline step interpreter") {
    // pm folds into the longitude origin: lcc referenced to Ferro equals
    // the same lcc with a Greenwich lon_0 shifted by Ferro's offset
    val ferro = -17.666666666667
    val a = Proj4.parse("+proj=lcc +lat_1=49 +lat_2=46 +lat_0=47.5 " +
      "+lon_0=31.2 +ellps=WGS84 +pm=ferro").getOrElse(fail("pm lcc"))
    val b = Proj4.parse("+proj=lcc +lat_1=49 +lat_2=46 +lat_0=47.5 " +
      s"+lon_0=${31.2 + ferro} +ellps=WGS84").getOrElse(fail("plain lcc"))
    for ((lon, lat) <- Seq((14.0, 48.0), (17.5, 49.3))) {
      val (xa, ya) = a.forward(lon, lat); val (xb, yb) = b.forward(lon, lat)
      assert(math.abs(xa - xb) < 1e-6 && math.abs(ya - yb) < 1e-6)
      val (lo, la) = a.inverse(xa, ya)
      // lcc's latitude fixpoint converges to ~3e-9 deg (sub-mm)
      assert(math.abs(lo - lon) < 1e-7 && math.abs(la - lat) < 1e-7)
    }
    // longlat + pm: file longitudes are pm-referenced
    val pl = Proj4.parse("+proj=longlat +datum=WGS84 +pm=paris")
      .getOrElse(fail("pm longlat"))
    val paris = 2.337229166667
    val (px, _) = pl.forward(10.0, 45.0)
    assert(math.abs(px - (10.0 - paris)) < 1e-12)
    assert(math.abs(pl.inverse(10.0 - paris, 45.0)._1 - 10.0) < 1e-12)
    // unknown meridian name / pm'd utm: fail fast
    assert(Proj4.parse("+proj=longlat +datum=WGS84 +pm=atlantis").isEmpty)
    assert(Proj4.parse("+proj=utm +zone=33 +datum=WGS84 +pm=paris").isEmpty)
    // kernel DEFAULT lon_0 is pm-referenced (PROJ semantics): bare
    // `+proj=krovak +pm=ferro` means Greenwich lon_0 = 24°50' + Ferro
    // (≈7.1667E), NOT lon_0 = Ferro — the default must fold, not clobber
    val kF = Proj4.parse("+proj=krovak +pm=ferro +ellps=bessel")
      .getOrElse(fail("pm krovak"))
    val kG = Proj4.parse(
      s"+proj=krovak +lon_0=${24.833333333333332 + ferro} +ellps=bessel")
      .getOrElse(fail("plain krovak"))
    for ((lon, lat) <- Seq((16.85, 50.21), (14.42, 50.09))) {
      val (xf, yf) = kF.forward(lon, lat); val (xg, yg) = kG.forward(lon, lat)
      assert(math.abs(xf - xg) < 1e-6 && math.abs(yf - yg) < 1e-6,
        s"krovak pm-default fold ($xf,$yf) vs ($xg,$yg)")
    }
    // omerc: +lon_0 aliases +lonc under pm, and a pm'd omerc with NO
    // origin fails fast instead of fabricating one
    val omA = Proj4.parse("+proj=omerc +lat_0=4 +lon_0=115 +alpha=53.316 " +
      "+gamma=53.13 +k_0=0.99984 +ellps=WGS84 +pm=paris")
      .getOrElse(fail("pm omerc lon_0 alias"))
    val omB = Proj4.parse(s"+proj=omerc +lat_0=4 +lonc=${115 + paris} " +
      "+alpha=53.316 +gamma=53.13 +k_0=0.99984 +ellps=WGS84")
      .getOrElse(fail("plain omerc"))
    locally {
      val (xa2, ya2) = omA.forward(116.0, 5.0)
      val (xb2, yb2) = omB.forward(116.0, 5.0)
      assert(math.abs(xa2 - xb2) < 1e-6 && math.abs(ya2 - yb2) < 1e-6)
    }
    assert(Proj4.parse("+proj=omerc +lat_0=4 +alpha=53.316 " +
      "+ellps=WGS84 +pm=paris").isEmpty)

    // canonical projected pipeline == its non-pipeline twin
    val pipe = Proj4.parse("+proj=pipeline " +
      "+step +proj=unitconvert +xy_in=deg +xy_out=rad " +
      "+step +proj=utm +zone=33 +ellps=WGS84").getOrElse(fail("pipeline"))
    val utm = Proj4.parse("+proj=utm +zone=33 +datum=WGS84")
      .getOrElse(fail("utm"))
    for ((lon, lat) <- Seq((15.0, 52.0), (12.3, 48.7))) {
      val (xp, yp) = pipe.forward(lon, lat); val (xu, yu) = utm.forward(lon, lat)
      assert(math.abs(xp - xu) < 1e-6 && math.abs(yp - yu) < 1e-6)
      val (lo, la) = pipe.inverse(xp, yp)
      assert(math.abs(lo - lon) < 1e-7 && math.abs(la - lat) < 1e-7)
    }
    // trailing axisswap swaps easting/northing both ways
    val swapped = Proj4.parse("+proj=pipeline " +
      "+step +proj=unitconvert +xy_in=deg +xy_out=rad " +
      "+step +proj=utm +zone=33 +ellps=WGS84 " +
      "+step +proj=axisswap +order=2,1").getOrElse(fail("axisswap"))
    val (n1, e1) = swapped.forward(15.0, 52.0)
    val (e0, n0) = utm.forward(15.0, 52.0)
    assert(math.abs(n1 - n0) < 1e-9 && math.abs(e1 - e0) < 1e-9)
    val (lo2, la2) = swapped.inverse(n1, e1)
    assert(math.abs(lo2 - 15.0) < 1e-7 && math.abs(la2 - 52.0) < 1e-7)
    // globals inherit into steps (ellps at pipeline level)
    val inh = Proj4.parse("+proj=pipeline +ellps=WGS84 " +
      "+step +proj=unitconvert +xy_in=deg +xy_out=rad " +
      "+step +proj=utm +zone=33").getOrElse(fail("inherit"))
    val (xi, yi) = inh.forward(15.0, 52.0)
    val (xu2, yu2) = utm.forward(15.0, 52.0)
    assert(math.abs(xi - xu2) < 1e-6 && math.abs(yi - yu2) < 1e-6)
    // out-of-vocabulary steps fail fast, not partially transform
    assert(Proj4.parse("+proj=pipeline +step +proj=vgridshift " +
      "+grids=egm96_15.gtx").isEmpty)
    assert(Proj4.parse("+proj=pipeline +step +proj=push +v_3").isEmpty)
  }

  test("+datum= shorthands expand to their PROJ pj_datums definitions") {
    // shorthand ≡ manual expansion, point-for-point: the expansion path
    // carries the worked-example pins (DatumSpec / assemble DHDN), so
    // equality here inherits them
    def eq2(a: (Double, Double), b: (Double, Double)): Unit = {
      assert(math.abs(a._1 - b._1) < 1e-9, s"$a vs $b")
      assert(math.abs(a._2 - b._2) < 1e-9, s"$a vs $b")
    }
    val cases = Seq(
      // OSGB36 / EPSG:27700
      ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 " +
        "+y_0=-100000 +datum=OSGB36 +units=m",
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 " +
          "+y_0=-100000 +ellps=airy " +
          "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894 +units=m",
        Seq((-0.1276, 51.5074), (-5.0, 50.1), (1.5, 52.9))),
      // DHDN Gauss-Krüger zone 3 via +datum=potsdam
      ("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 " +
        "+datum=potsdam +units=m",
        "+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 " +
          "+ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 " +
          "+units=m",
        Seq((9.2, 50.7), (7.9, 48.9))),
      // Irish grid on Modified Airy via +datum=ire65
      ("+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=1.000035 +x_0=200000 " +
        "+y_0=250000 +datum=ire65 +units=m",
        "+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=1.000035 +x_0=200000 " +
          "+y_0=250000 +ellps=mod_airy " +
          "+towgs84=482.530,-130.596,564.557,-1.042,-0.214,-0.631,8.15 +units=m",
        Seq((-6.26, 53.35), (-9.05, 51.9))),
      // Carthage 2SP LCC (Nord Tunisie belts) on Clarke 1880 (IGN)
      ("+proj=lcc +lat_1=34.65 +lat_2=38.1 +lat_0=36 +lon_0=9.9 " +
        "+x_0=500000 +y_0=300000 +datum=carthage +units=m",
        "+proj=lcc +lat_1=34.65 +lat_2=38.1 +lat_0=36 +lon_0=9.9 " +
          "+x_0=500000 +y_0=300000 +ellps=clrk80ign " +
          "+towgs84=-263.0,6.0,431.0 +units=m",
        Seq((10.18, 36.8))),
      // NAD83 is a zero-shift GRS80 — the plain fast path
      ("+proj=utm +zone=15 +datum=NAD83 +units=m",
        "+proj=utm +zone=15 +ellps=GRS80 +towgs84=0,0,0 +units=m",
        Seq((-93.2, 44.9))),
      // GGRS87 geographic
      ("+proj=longlat +datum=GGRS87",
        "+proj=longlat +ellps=GRS80 +towgs84=-199.87,74.79,246.62",
        Seq((23.72, 37.98))))
    for ((s, f, pts) <- cases) {
      val sc = Proj4.parse(s).getOrElse(fail(s"shorthand rejected: $s"))
      val fc = Proj4.parse(f).getOrElse(fail(s"expansion rejected: $f"))
      for ((lon, lat) <- pts) {
        eq2(sc.forward(lon, lat), fc.forward(lon, lat))
        val (e, n) = sc.forward(lon, lat)
        eq2(sc.inverse(e, n), fc.inverse(e, n))
        // and the shift is real: OSGB36-family datums are ~100 m off WGS84
        val (lon2, lat2) = sc.inverse(e, n)
        assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7)
      }
    }
    // NAD27 expands to optional-@ NTv2 grids that are absent here — the
    // nadgrids contract (all grids must load) keeps the failure LOUD
    assert(Proj4.parse("+proj=longlat +datum=NAD27").isEmpty)
    // unknown shorthand still fails fast
    assert(Proj4.parse("+proj=longlat +datum=ch1903").isEmpty)
    // conflicting explicit key is ambiguous → fail fast
    assert(Proj4.parse("+proj=longlat +datum=potsdam +ellps=airy").isEmpty)
    assert(Proj4.parse(
      "+proj=longlat +datum=osgb36 +towgs84=1,2,3").isEmpty)
    // byte-equal restatement is fine
    assert(Proj4.parse(
      "+proj=longlat +datum=potsdam +ellps=bessel").isDefined)
  }

  test("honest rejection: unknown projections/ellipsoids, oblique stere") {
    // OSGB36 (EPSG:27700) carries a real datum shift — round-7 Datum
    // machinery now compiles it (DatumSpec pins the worked example);
    // here just assert it parses and round-trips
    val osgb = Proj4.parse("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 " +
      "+x_0=400000 +y_0=-100000 +ellps=airy " +
      "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489")
    assert(osgb.isDefined)
    locally {
      val c = osgb.get
      val (e, n) = c.forward(-0.1276, 51.5074)
      val (lon, lat) = c.inverse(e, n)
      assert(math.abs(lon + 0.1276) < 1e-7 && math.abs(lat - 51.5074) < 1e-7)
    }
    // omerc compiles since round 8 (ProjExtSpec pins it) — here just
    // round-trip the RSO Malaysia West string that round 7 rejected
    locally {
      val rso = Proj4.parse("+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.13 " +
        "+ellps=WGS84").getOrElse(fail("omerc rejected"))
      val (e, n) = rso.forward(101.7, 3.15)
      val (lon, lat) = rso.inverse(e, n)
      assert(math.abs(lon - 101.7) < 1e-7 && math.abs(lat - 3.15) < 1e-7)
    }
    // a genuinely unknown projection family still fails fast
    assert(Proj4.parse("+proj=robin +lon_0=0 +ellps=WGS84").isEmpty)
    // oblique stereographic is not the polar kernel (sterea covers it)
    assert(Proj4.parse("+proj=stere +lat_0=52.15 +lon_0=5.39 +ellps=WGS84").isEmpty)
    // unknown ellipsoid name with a shift
    assert(Proj4.parse("+proj=lcc +lat_1=46 +lat_2=49 +lat_0=47 +lon_0=13 " +
      "+ellps=unknown1880 +towgs84=1,2,3").isEmpty)
    // malformed numeric fails the parse rather than defaulting
    assert(Proj4.parse("+proj=lcc +lat_1=abc +lat_0=47 +lon_0=13 +ellps=WGS84").isEmpty)
    // and GridWarp.standard stays fail-fast for them
    assert(GtiMosaic.GridWarp.standard(
      "+proj=omerc +lat_0=4 +ellps=WGS84", "EPSG:4326").isEmpty)
  }

  test("assemble: tiles in an unregistered-but-parseable proj-string grid") {
    // a made-up national LCC grid that is NOT in the gallery
    val projStr = "+proj=lcc +lat_1=40 +lat_2=44 +lat_0=42 +lon_0=12 " +
      "+x_0=1500000 +y_0=2000000 +ellps=GRS80 +units=m +no_defs"
    val kernel = GtiMosaic.LambertConformal(40.0, 44.0, 42.0, 12.0,
      1500000.0, 2000000.0)
    val (w, h) = (10, 10)
    val cs = for (lon <- Seq(10.8, 13.2); lat <- Seq(40.8, 43.2))
      yield kernel.forward(lon, lat)
    val (eMin, eMax) = (cs.map(_._1).min - 500, cs.map(_._1).max + 500)
    val (nMin, nMax) = (cs.map(_._2).min - 500, cs.map(_._2).max + 500)
    val (fresx, fresy) = ((eMax - eMin) / w, (nMax - nMin) / h)
    val fix = Files.createTempDirectory("graft-gti-proj").toString
    Files.write(Paths.get(fix, "p.tif"), GeoTiffWriter.write(w, h,
      Seq(Array.tabulate(w * h)(_.toFloat)),
      pixelScale = (fresx, fresy), tiepoint = (eMin, nMax),
      nodata = Some(Double.NaN)))
    val dst = Files.createTempDirectory("graft-gti-proj-dst").toString
    val mMeta = GtiMosaic.Meta("Float32", Double.NaN,
      11.0, 41.0, 13.0, 43.0, 0.5, 0.5, 1, "nearest", "EPSG:4326")
    val index = Seq(("s3://mosaic.fixtures/p.tif", 10.8, 40.8, 13.2, 43.2, projStr))
      .toDF("location", "minx", "miny", "maxx", "maxy", "srs")
    GtiMosaic.write(index.coalesce(1), dst, mMeta)
    val localize = (loc: String) => Paths.get(fix, loc.split('/').last).toString
    // auto-resolved from the proj string — no warp registration
    val auto = GtiMosaic.assemble(spark, dst, 0, 4)(localize)
      .collect().map(r => (r.cy, r.cx) -> r.data).toMap
    // must equal the explicit kernel registration
    val explicit = GtiMosaic.assemble(spark, dst, 0, 4,
        warps = Map((projStr, "EPSG:4326") -> kernel.fromGeo))(localize)
      .collect().map(r => (r.cy, r.cx) -> r.data).toMap
    assert(auto.nonEmpty && auto.keySet == explicit.keySet &&
      auto.forall { case (k, v) => java.util.Arrays.equals(v, explicit(k)) })
    // spot-check pixel provenance against the kernel directly
    for (py <- 0 until 4; px <- 0 until 4) {
      val (lon, lat) = (11.0 + (px + 0.5) * 0.5, 43.0 - (py + 0.5) * 0.5)
      val (e, n) = kernel.forward(lon, lat)
      val fc = math.floor((e - eMin) / fresx).toInt
      val fr = math.floor((nMax - n) / fresy).toInt
      val got = auto((py / 4, px / 4))((py % 4) * 4 + (px % 4))
      assert(got == (fr * w + fc).toFloat, s"($px,$py)")
    }
  }

  test("assemble: tiles in a legacy-datum grid (DHDN Gauss-Krüger zone 3)") {
    // EPSG:31467-style string: Bessel ellipsoid + 7-param Helmert shift —
    // the datum-composed warp resolves straight from the proj string
    val projStr = "+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 " +
      "+y_0=0 +ellps=bessel " +
      "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 +units=m +no_defs"
    val c = Proj4.parse(projStr).getOrElse(fail("DHDN string rejected"))
    val (w, h) = (10, 10)
    val cs = for (lon <- Seq(7.8, 10.2); lat <- Seq(48.8, 51.2))
      yield c.forward(lon, lat)
    val (eMin, eMax) = (cs.map(_._1).min - 500, cs.map(_._1).max + 500)
    val (nMin, nMax) = (cs.map(_._2).min - 500, cs.map(_._2).max + 500)
    val (fresx, fresy) = ((eMax - eMin) / w, (nMax - nMin) / h)
    val fix = Files.createTempDirectory("graft-gti-dhdn").toString
    Files.write(Paths.get(fix, "d.tif"), GeoTiffWriter.write(w, h,
      Seq(Array.tabulate(w * h)(_.toFloat)),
      pixelScale = (fresx, fresy), tiepoint = (eMin, nMax),
      nodata = Some(Double.NaN)))
    val dst = Files.createTempDirectory("graft-gti-dhdn-dst").toString
    val mMeta = GtiMosaic.Meta("Float32", Double.NaN,
      8.0, 49.0, 10.0, 51.0, 0.5, 0.5, 1, "nearest", "EPSG:4326")
    val index = Seq(("s3://mosaic.fixtures/d.tif", 7.8, 48.8, 10.2, 51.2, projStr))
      .toDF("location", "minx", "miny", "maxx", "maxy", "srs")
    GtiMosaic.write(index.coalesce(1), dst, mMeta)
    val localize = (loc: String) => Paths.get(fix, loc.split('/').last).toString
    val auto = GtiMosaic.assemble(spark, dst, 0, 4)(localize)
      .collect().map(r => (r.cy, r.cx) -> r.data).toMap
    assert(auto.nonEmpty)
    // pixel provenance against the datum-composed kernel directly
    for (py <- 0 until 4; px <- 0 until 4) {
      val (lon, lat) = (8.0 + (px + 0.5) * 0.5, 51.0 - (py + 0.5) * 0.5)
      val (e, n) = c.forward(lon, lat)
      val fc = math.floor((e - eMin) / fresx).toInt
      val fr = math.floor((nMax - n) / fresy).toInt
      val got = auto((py / 4, px / 4))((py % 4) * 4 + (px % 4))
      assert(got == (fr * w + fc).toFloat, s"($px,$py)")
    }
  }

  test("ellipsoidal Mercator: Snyder pin, closed-form cross-check, sphere split") {
    // Snyder USGS PP 1395 numerical example (Mercator, ellipsoid):
    // Clarke 1866, φ=35°N λ=−75° λ₀=−180° → x=11688673.7 y=4139145.6
    val clrk66 = graft.raster.Datum.byName("clrk66")
    val k = GtiMosaic.MercatorEllipsoidal(-180.0, 1.0, 0, 0, clrk66)
    val (sx, sy) = k.forward(-75.0, 35.0)
    assert(math.abs(sx - 11688673.7) < 0.5 && math.abs(sy - 4139145.6) < 0.5,
      s"snyder: ($sx,$sy)")
    // independent closed form: y = a·(atanh(sinφ) − e·atanh(e·sinφ))
    for (lat <- Seq(-79.5, -35.0, 0.0, 12.25, 60.0, 84.9)) {
      val phi = math.toRadians(lat)
      val e = clrk66.e
      def atanh(z: Double) = 0.5 * math.log((1 + z) / (1 - z))
      val want = clrk66.a * (atanh(math.sin(phi)) - e * atanh(e * math.sin(phi)))
      val (_, got) = k.forward(-180.0, lat)
      assert(math.abs(got - want) < 1e-6, s"lat=$lat got=$got want=$want")
      val (lon2, lat2) = k.inverse(k.forward(-100.0, lat)._1, got)
      assert(math.abs(lon2 - -100.0) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
    // +ellps=WGS84 takes the ELLIPSOIDAL kernel (EPSG:3395 class): far
    // from the spherical y — the silent mis-warp this split prevents
    val ell = Proj4.parse("+proj=merc +ellps=WGS84").get
    val wgs = GtiMosaic.MercatorEllipsoidal(0.0, 1.0)
    assert(ell.forward(7.0, 60.0) == wgs.forward(7.0, 60.0))
    val sph = Proj4.parse("+proj=merc +a=6378137 +b=6378137").get
    assert(math.abs(ell.forward(7.0, 60.0)._2 - sph.forward(7.0, 60.0)._2) > 10000,
      "ellipsoidal and spherical Mercator must differ by ~20 km at 60N")
    // +lat_ts: k₀ = cos φts / sqrt(1 − e² sin² φts); exclusive with +k
    val ts = Proj4.parse("+proj=merc +ellps=WGS84 +lat_ts=45").get
    val pts = math.toRadians(45.0)
    val k0 = math.cos(pts) /
      math.sqrt(1 - graft.raster.Datum.WGS84.e2 * math.sin(pts) * math.sin(pts))
    val tsk = GtiMosaic.MercatorEllipsoidal(0.0, k0)
    assert(ts.forward(7.0, 48.0) == tsk.forward(7.0, 48.0))
    assert(Proj4.parse("+proj=merc +ellps=WGS84 +lat_ts=45 +k=0.9").isEmpty)
    // spherical +lat_ts scales by cos φts (the EPSG:3857 string keeps lat_ts=0)
    val sphTs = Proj4.parse("+proj=merc +R=6371000 +lat_ts=60").get
    assert(math.abs(sphTs.forward(10.0, 0.0)._1 -
      6371000.0 * 0.5 * math.toRadians(10.0)) < 1e-6)
  }

  test("+units=/+to_meter scale the projected output, PROJ-style (fr_meter)") {
    // EPSG:2229-class US state plane: x_0/y_0 are METERS in the string,
    // output surfaces in survey feet — exactly meters / (1200/3937)
    val base = "+proj=lcc +lat_1=35.466666666666667 +lat_2=34.033333333333333 " +
      "+lat_0=33.5 +lon_0=-118 +x_0=2000000.0001016 +y_0=500000.0001016 " +
      "+ellps=GRS80 +towgs84=0,0,0 +no_defs"
    val m = Proj4.parse(base + " +units=m").getOrElse(fail("m must parse"))
    val ft = Proj4.parse(base + " +units=us-ft").getOrElse(fail("us-ft must parse"))
    val k = 1200.0 / 3937.0
    for (lon <- Seq(-118.24, -117.5); lat <- Seq(33.9, 34.8)) {
      val (xm, ym) = m.forward(lon, lat)
      val (xf, yf) = ft.forward(lon, lat)
      assert(math.abs(xf - xm / k) < 1e-6 && math.abs(yf - ym / k) < 1e-6)
      val (lon2, lat2) = ft.inverse(xf, yf)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
    // numeric +to_meter equals its named unit; disagreeing pair fails
    val tm = Proj4.parse(base + " +to_meter=0.3048").get
    val intl = Proj4.parse(base + " +units=ft").get
    assert(tm.forward(-117.9, 34.2) == intl.forward(-117.9, 34.2))
    assert(Proj4.parse(base + " +units=ft +to_meter=0.5").isEmpty)
    // unknown unit names fail fast — silent meters would mis-warp 3.28x
    assert(Proj4.parse(base + " +units=cubits").isEmpty)
    // geographic CRSs surface degrees and ignore linear units, PROJ-style
    val ll = Proj4.parse("+proj=longlat +datum=WGS84 +units=us-ft").get
    assert(ll.forward(12.5, 47.25) == ((12.5, 47.25)))
    // a pm'd projected CRS keeps its unit scale through the rewrite
    val pmFt = Proj4.parse("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 " +
      "+lon_0=2 +pm=paris +ellps=GRS80 +towgs84=0,0,0 +units=ft").get
    val pmM = Proj4.parse("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 " +
      "+lon_0=2 +pm=paris +ellps=GRS80 +towgs84=0,0,0").get
    val (fx, fy) = pmFt.forward(3.1, 45.6)
    val (mx, my) = pmM.forward(3.1, 45.6)
    assert(math.abs(fx - mx / 0.3048) < 1e-6 && math.abs(fy - my / 0.3048) < 1e-6)
  }
}
