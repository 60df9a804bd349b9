package graft.raster

/** Datum machinery for the proj4 interpreter: named ellipsoids, the
  * 7-parameter Helmert (position-vector) transformation behind `+towgs84`,
  * geodetic↔geocentric conversion, and the EPSG-9809 oblique (double)
  * stereographic kernel (`+proj=sterea`, the Dutch RD New family).
  *
  * Closes the reference's arbitrary-CRS gap one step further than the
  * WGS84-only interpreter: `flyte/build.py:56-75` accepts any `crs: str`
  * and `flytemosaic/mosaics.py:44-50` allows per-file CRSs via GDAL/PROJ —
  * national grids on legacy datums (Bessel/International/Clarke) carry a
  * `+towgs84` shift that PROJ absorbs and the round-6 interpreter refused.
  *
  * All formulas are from public sources: EPSG Guidance Note 7-2
  * (coordinate conversions & transformations, methods 9606/9602/9809) and
  * Snyder, Map Projections — A Working Manual (USGS PP 1395).
  */
object Datum {

  /** Reference ellipsoid (semi-major a meters, inverse flattening rf;
    * rf = 0 encodes a sphere). */
  final case class Ellipsoid(a: Double, rf: Double) {
    val f: Double = if (rf == 0.0) 0.0 else 1.0 / rf
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
    def b: Double = a * (1 - f)
  }

  val WGS84 = Ellipsoid(6378137.0, 298.257223563)
  val GRS80 = Ellipsoid(6378137.0, 298.257222101)

  /** Named ellipsoids of the proj `+ellps=` registry (public constants;
    * the short list that covers the widely-used legacy national grids). */
  val byName: Map[String, Ellipsoid] = Map(
    "wgs84"  -> WGS84,
    "grs80"  -> GRS80,
    "bessel" -> Ellipsoid(6377397.155, 299.1528128),
    "intl"   -> Ellipsoid(6378388.0, 297.0),
    "clrk66" -> Ellipsoid(6378206.4, 294.9786982),
    "clrk80" -> Ellipsoid(6378249.145, 293.465),
    // Clarke 1880 (IGN): defined by a/b in PROJ; rf = a/(a−b)
    "clrk80ign" -> Ellipsoid(6378249.2,
      6378249.2 / (6378249.2 - 6356515.0)),
    // Modified Airy (Ireland 65/Ireland 1975): PROJ defines a/b
    "mod_airy" -> Ellipsoid(6377340.189,
      6377340.189 / (6377340.189 - 6356034.446)),
    "airy"   -> Ellipsoid(6377563.396, 299.3249646),
    "krass"  -> Ellipsoid(6378245.0, 298.3),
    "evrst69" -> Ellipsoid(6377295.664, 300.8017),
    "evrstss" -> Ellipsoid(6377298.556, 300.8017),
    "aust_sa" -> Ellipsoid(6378160.0, 298.25),
    "sphere" -> Ellipsoid(6370997.0, 0.0))

  /** 7-parameter Helmert transformation, PROJ `+towgs84` position-vector
    * convention: translations meters, rotations ARCSECONDS, scale PPM;
    * `forward` maps LOCAL geocentric → WGS84 geocentric
    * (X' = (1 + s·10⁻⁶)·R·X + T, small-angle R). The inverse solves the
    * same linear system exactly (closed-form 3×3 inversion), so
    * round-trips are machine-precision — not the negate-the-params
    * approximation. */
  final case class Helmert(dx: Double, dy: Double, dz: Double,
                           rxAs: Double = 0, ryAs: Double = 0, rzAs: Double = 0,
                           sPpm: Double = 0) {
    def isIdentity: Boolean =
      dx == 0 && dy == 0 && dz == 0 && rxAs == 0 && ryAs == 0 && rzAs == 0 &&
        sPpm == 0

    private val as2rad = math.Pi / (180.0 * 3600.0)
    private val rx = rxAs * as2rad
    private val ry = ryAs * as2rad
    private val rz = rzAs * as2rad
    private val m = 1.0 + sPpm * 1e-6
    // position-vector rotation matrix rows (small-angle), scaled by m
    private val m00 = m; private val m01 = -m * rz; private val m02 = m * ry
    private val m10 = m * rz; private val m11 = m; private val m12 = -m * rx
    private val m20 = -m * ry; private val m21 = m * rx; private val m22 = m
    // exact inverse of the 3x3 (cofactor form)
    private val det =
      m00 * (m11 * m22 - m12 * m21) -
        m01 * (m10 * m22 - m12 * m20) +
        m02 * (m10 * m21 - m11 * m20)
    private val i00 = (m11 * m22 - m12 * m21) / det
    private val i01 = (m02 * m21 - m01 * m22) / det
    private val i02 = (m01 * m12 - m02 * m11) / det
    private val i10 = (m12 * m20 - m10 * m22) / det
    private val i11 = (m00 * m22 - m02 * m20) / det
    private val i12 = (m02 * m10 - m00 * m12) / det
    private val i20 = (m10 * m21 - m11 * m20) / det
    private val i21 = (m01 * m20 - m00 * m21) / det
    private val i22 = (m00 * m11 - m01 * m10) / det

    def forward(x: Double, y: Double, z: Double): (Double, Double, Double) =
      (m00 * x + m01 * y + m02 * z + dx,
        m10 * x + m11 * y + m12 * z + dy,
        m20 * x + m21 * y + m22 * z + dz)

    def inverse(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val ux = x - dx; val uy = y - dy; val uz = z - dz
      (i00 * ux + i01 * uy + i02 * uz,
        i10 * ux + i11 * uy + i12 * uz,
        i20 * ux + i21 * uy + i22 * uz)
    }
  }

  /** Geodetic (degrees, h meters) → geocentric XYZ on `ell`
    * (EPSG method 9602). */
  def geodeticToGeocentric(ell: Ellipsoid, lonDeg: Double, latDeg: Double,
                           h: Double = 0.0): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val sinP = math.sin(lat); val cosP = math.cos(lat)
    val nu = ell.a / math.sqrt(1 - ell.e2 * sinP * sinP)
    ((nu + h) * cosP * math.cos(lon),
      (nu + h) * cosP * math.sin(lon),
      (nu * (1 - ell.e2) + h) * sinP)
  }

  /** Geocentric XYZ → geodetic lon/lat degrees on `ell` (height
    * discarded). Bowring's first approximation + fixpoint iteration —
    * sub-nanometer after the bounded loop for earth-surface points. */
  def geocentricToGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double)
      : (Double, Double) = {
    val lon = math.atan2(y, x)
    val p = math.sqrt(x * x + y * y)
    if (p < 1e-9) return (math.toDegrees(lon), if (z >= 0) 90.0 else -90.0)
    // Bowring seed
    val ep2 = ell.e2 / (1 - ell.e2)
    val theta = math.atan2(z * ell.a, p * ell.b)
    var lat = math.atan2(
      z + ep2 * ell.b * math.pow(math.sin(theta), 3),
      p - ell.e2 * ell.a * math.pow(math.cos(theta), 3))
    var i = 0
    var delta = 1.0
    while (i < 20 && delta > 1e-15) { // fixpoint: φ = atan2(z + e²·ν·sinφ, p)
      val sinP = math.sin(lat)
      val nu = ell.a / math.sqrt(1 - ell.e2 * sinP * sinP)
      val next = math.atan2(z + ell.e2 * nu * sinP, p)
      delta = math.abs(next - lat)
      lat = next
      i += 1
    }
    (math.toDegrees(lon), math.toDegrees(lat))
  }

  /** WGS84 lon/lat → local-datum lon/lat (degrees) through the Helmert
    * shift (h = 0 on the WGS84 side; ellipsoidal height discarded on
    * return, the standard 2-D datum-shift convention). */
  def wgs84ToLocal(ell: Ellipsoid, hm: Helmert, lonDeg: Double, latDeg: Double)
      : (Double, Double) = {
    val (x, y, z) = geodeticToGeocentric(WGS84, lonDeg, latDeg)
    val (lx, ly, lz) = hm.inverse(x, y, z)
    geocentricToGeodetic(ell, lx, ly, lz)
  }

  /** Local-datum lon/lat → WGS84 lon/lat (degrees). */
  def localToWgs84(ell: Ellipsoid, hm: Helmert, lonDeg: Double, latDeg: Double)
      : (Double, Double) = {
    val (x, y, z) = geodeticToGeocentric(ell, lonDeg, latDeg)
    val (wx, wy, wz) = hm.forward(x, y, z)
    geocentricToGeodetic(WGS84, wx, wy, wz)
  }

  /** Transverse Mercator on an ARBITRARY ellipsoid (Snyder USGS PP 1395
    * eqs. 8-9…8-25, the same series as the WGS84 gallery kernel but with
    * the ellipsoid as a parameter) — the legacy-datum Gauss-Krüger /
    * national-grid family (DHDN on Bessel, Pulkovo on Krassowsky, ED50
    * UTM on International). Spec-pinned to the EPSG Guidance Note 7-2
    * worked example (OSGB36 / British National Grid on Airy 1830) and to
    * bit-equality with the WGS84 gallery kernel at WGS84 parameters. */
  final case class EllipsoidalTransverseMercator(
      lat0Deg: Double, lon0Deg: Double, k0: Double,
      x0: Double, y0: Double, ell: Ellipsoid) {
    private val A = ell.a
    private val E2 = ell.e2
    private val Ep2 = E2 / (1 - E2)

    /** Meridian arc from the equator (Snyder 3-21). */
    private def meridianArc(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      A * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * phi -
        (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * math.sin(2 * phi) +
        (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * math.sin(4 * phi) -
        (35 * E2 * E2 * E2 / 3072) * math.sin(6 * phi))
    }

    /** lon/lat degrees (on `ell`) → easting/northing meters. */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dLam = math.toRadians(lonDeg - lon0Deg)
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val n = A / math.sqrt(1 - E2 * sinP * sinP)
      val t = tanP * tanP
      val c = Ep2 * cosP * cosP
      val a1 = dLam * cosP
      val m = meridianArc(latDeg) - meridianArc(lat0Deg)
      val e = x0 + k0 * n * (a1 +
        (1 - t + c) * a1 * a1 * a1 / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * math.pow(a1, 5) / 120)
      val n0 = y0 + k0 * (m + n * tanP * (a1 * a1 / 2 +
        (5 - t + 9 * c + 4 * c * c) * math.pow(a1, 4) / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * math.pow(a1, 6) / 720))
      (e, n0)
    }

    /** easting/northing meters → lon/lat degrees (on `ell`). */
    def inverse(easting: Double, northing: Double): (Double, Double) = {
      val x = easting - x0
      val y = northing - y0
      val m = y / k0 + meridianArc(lat0Deg)
      val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
      val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
      val phi1 = mu +
        (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
      val c1 = Ep2 * cosP * cosP
      val t1 = tanP * tanP
      val n1 = A / math.sqrt(1 - E2 * sinP * sinP)
      val r1 = A * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
      val d = x / (n1 * k0)
      val phi = phi1 - (n1 * tanP / r1) * (d * d / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * Ep2) * math.pow(d, 4) / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * Ep2 - 3 * c1 * c1) *
          math.pow(d, 6) / 720)
      val lam = (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * Ep2 + 24 * t1 * t1) *
          math.pow(d, 5) / 120) / cosP
      (lon0Deg + math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Oblique (double) stereographic projection, EPSG method 9809 — the
    * `+proj=sterea` kernel (Dutch RD New, and the oblique aspect the
    * polar-only `stere` kernel refuses). Conformal sphere construction +
    * spherical stereographic, per EPSG Guidance Note 7-2; lon/lat here
    * are GEODETIC ON `ell` (datum shift happens outside). */
  final case class ObliqueStereographic(lat0Deg: Double, lon0Deg: Double,
                                        k0: Double, x0: Double, y0: Double,
                                        ell: Ellipsoid) {
    private val e = ell.e
    private val e2 = ell.e2
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val sin0 = math.sin(phi0); private val cos0 = math.cos(phi0)
    private val rho0 = ell.a * (1 - e2) / math.pow(1 - e2 * sin0 * sin0, 1.5)
    private val nu0 = ell.a / math.sqrt(1 - e2 * sin0 * sin0)
    private val bigR = math.sqrt(rho0 * nu0)
    private val n = math.sqrt(1 + e2 * math.pow(cos0, 4) / (1 - e2))
    private val s1 = (1 + sin0) / (1 - sin0)
    private val s2 = (1 - e * sin0) / (1 + e * sin0)
    private val w1 = math.pow(s1 * math.pow(s2, e), n)
    private val sinChi00 = (w1 - 1) / (w1 + 1)
    private val c =
      (n + sin0) * (1 - sinChi00) / ((n - sin0) * (1 + sinChi00))
    private val w2 = c * w1
    private val chi0 = math.asin((w2 - 1) / (w2 + 1))
    private val sinChi0 = math.sin(chi0); private val cosChi0 = math.cos(chi0)
    private val lamC0 = lam0 // Λ0 = λ0 in the EPSG formulation

    /** lon/lat degrees (on `ell`) → easting/northing meters. */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      val bigLam = n * (lam - lamC0) + lamC0
      val sa = (1 + math.sin(phi)) / (1 - math.sin(phi))
      val sb = (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
      val w = c * math.pow(sa * math.pow(sb, e), n)
      val chi = math.asin((w - 1) / (w + 1))
      val sinChi = math.sin(chi); val cosChi = math.cos(chi)
      val dLam = bigLam - lamC0
      val bigB = 1 + sinChi * sinChi0 + cosChi * cosChi0 * math.cos(dLam)
      val east = x0 + 2 * bigR * k0 * cosChi * math.sin(dLam) / bigB
      val north = y0 + 2 * bigR * k0 *
        (sinChi * cosChi0 - cosChi * sinChi0 * math.cos(dLam)) / bigB
      (east, north)
    }

    /** easting/northing meters → lon/lat degrees (on `ell`). */
    def inverse(east: Double, north: Double): (Double, Double) = {
      val ep = east - x0
      val np = north - y0
      val g = 2 * bigR * k0 * math.tan(math.Pi / 4 - chi0 / 2)
      val h = 4 * bigR * k0 * math.tan(chi0) + g
      val i = math.atan2(ep, h + np)
      val j = math.atan2(ep, g - np) - i
      val chi = chi0 + 2 * math.atan2(np - ep * math.tan(j / 2), 2 * bigR * k0)
      val bigLam = j + 2 * i + lamC0
      val lam = (bigLam - lamC0) / n + lamC0
      // isometric latitude on the conformal sphere → geodetic by fixpoint
      val psi = 0.5 *
        math.log((1 + math.sin(chi)) / (c * (1 - math.sin(chi)))) / n
      var phi = 2 * math.atan(math.exp(psi)) - math.Pi / 2
      var k = 0
      while (k < 8) {
        val esin = e * math.sin(phi)
        val psiI = math.log(
          math.tan(phi / 2 + math.Pi / 4) *
            math.pow((1 - esin) / (1 + esin), e / 2))
        phi = phi + (psi - psiI) * math.cos(phi) *
          (1 - esin * esin) / (1 - e2)
        k += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }
}
