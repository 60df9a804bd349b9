package graft.raster

/** Extended projection kernels for the proj4 interpreter: Swiss oblique
  * Mercator (`+proj=somerc`, EPSG:2056/21781 class), Hotine oblique
  * Mercator variants A/B (`+proj=omerc`, EPSG 9812/9815 — the
  * Malaysian/Borneo RSO class), Krovak (`+proj=krovak`, EPSG 9819 —
  * S-JTSK Czech/Slovak), and the geostationary satellite view
  * (`+proj=geos` — GOES/Meteosat fixed grids, a live CRS class for this
  * engine's satellite-imagery domain: the reference absorbs all of these
  * through GDAL/PROJ, flytemosaic/mosaics.py:44-50).
  *
  * Formulas from public sources: EPSG Guidance Note 7-2 (methods 9812,
  * 9815, 9819), the swisstopo projection formulary for the Swiss
  * cylindrical projection, and the CGMS LRIT/HRIT normalized geostationary
  * projection as documented for PROJ's `geos`. All kernels take geodetic
  * lon/lat ON THE LOCAL ELLIPSOID (degrees); datum shifts compose outside
  * (see [[Proj4]] / [[Datum]]).
  *
  * Validation strategy (ProjExtSpec): worked-example pins where EPSG
  * publishes one (omerc: Timbalai RSO), mutual agreement of two
  * INDEPENDENT formulations for the Swiss case (swisstopo somerc vs EPSG
  * HOM-variant-B at azimuth 90°), machine-precision round-trips, and
  * numeric conformality checks.
  */
object ProjExt {

  /** Swiss oblique Mercator (swisstopo formulary): Gauss conformal sphere
    * through `lat0`, then an oblique spherical Mercator whose pseudo-
    * equator passes through the projection center. */
  final case class SwissObliqueMercator(lat0Deg: Double, lon0Deg: Double,
                                        k0: Double, x0: Double, y0: Double,
                                        ell: Datum.Ellipsoid) {
    private val e = ell.e
    private val e2 = ell.e2
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val sin0 = math.sin(phi0)
    private val cos0 = math.cos(phi0)
    private val alpha = math.sqrt(1 + (e2 / (1 - e2)) * math.pow(cos0, 4))
    private val r0 = k0 * ell.a * math.sqrt(1 - e2) / (1 - e2 * sin0 * sin0)
    private val b0 = math.asin(sin0 / alpha)
    private val sinB0 = math.sin(b0)
    private val cosB0 = math.cos(b0)
    private val bigK = math.log(math.tan(math.Pi / 4 + b0 / 2)) -
      alpha * math.log(math.tan(math.Pi / 4 + phi0 / 2)) +
      (alpha * e / 2) * math.log((1 + e * sin0) / (1 - e * sin0))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sinP = math.sin(phi)
      val s = alpha * math.log(math.tan(math.Pi / 4 + phi / 2)) -
        (alpha * e / 2) * math.log((1 + e * sinP) / (1 - e * sinP)) + bigK
      val b = 2 * math.atan(math.exp(s)) - math.Pi / 2
      val l = alpha * (math.toRadians(lonDeg) - lam0)
      val sinB = math.sin(b); val cosB = math.cos(b)
      val sinBb = cosB0 * sinB - sinB0 * cosB * math.cos(l)
      val lb = math.atan2(cosB * math.sin(l),
        cosB0 * cosB * math.cos(l) + sinB0 * sinB)
      val east = r0 * lb + x0
      val north = (r0 / 2) * math.log((1 + sinBb) / (1 - sinBb)) + y0
      (east, north)
    }

    def inverse(east: Double, north: Double): (Double, Double) = {
      val xx = (north - y0) / r0
      val bb = 2 * math.atan(math.exp(xx)) - math.Pi / 2
      val lb = (east - x0) / r0
      val sinBb = math.sin(bb); val cosBb = math.cos(bb)
      val sinB = cosB0 * sinBb + sinB0 * cosBb * math.cos(lb)
      val b = math.asin(math.max(-1.0, math.min(1.0, sinB)))
      val l = math.atan2(cosBb * math.sin(lb),
        cosB0 * cosBb * math.cos(lb) - sinB0 * sinBb)
      val lam = lam0 + l / alpha
      // fixpoint: solve S(φ) = ln tan(π/4 + b/2)
      val target = math.log(math.tan(math.Pi / 4 + b / 2))
      var phi = b
      var i = 0
      while (i < 12) {
        val sinP = math.sin(phi)
        phi = 2 * math.atan(math.exp(
          (target - bigK) / alpha +
            (e / 2) * math.log((1 + e * sinP) / (1 - e * sinP)))) - math.Pi / 2
        i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Hotine oblique Mercator, EPSG methods 9812 (variant A, false origin
    * at the natural origin / aposphere intersection) and 9815 (variant B,
    * false origin at the projection CENTER). `gammaDeg` is the rectified-
    * to-skew angle (defaults to the azimuth in published CRSs). */
  final case class HotineObliqueMercator(latCDeg: Double, lonCDeg: Double,
                                         alphaDeg: Double, gammaDeg: Double,
                                         kc: Double, fe: Double, fn: Double,
                                         ell: Datum.Ellipsoid,
                                         variantB: Boolean) {
    private val e = ell.e
    private val e2 = ell.e2
    private val phiC = math.toRadians(latCDeg)
    private val lamC = math.toRadians(lonCDeg)
    private val alphaC = math.toRadians(alphaDeg)
    private val gammaC = math.toRadians(gammaDeg)
    private val sinC = math.sin(phiC); private val cosC = math.cos(phiC)
    private val bigB = math.sqrt(1 + e2 * math.pow(cosC, 4) / (1 - e2))
    private val bigA = ell.a * bigB * kc * math.sqrt(1 - e2) /
      (1 - e2 * sinC * sinC)
    private val t0 = math.tan(math.Pi / 4 - phiC / 2) /
      math.pow((1 - e * sinC) / (1 + e * sinC), e / 2)
    private val bigD = bigB * math.sqrt(1 - e2) /
      (cosC * math.sqrt(1 - e2 * sinC * sinC))
    private val d2 = math.max(bigD * bigD, 1.0)
    private val sign = if (phiC >= 0) 1.0 else -1.0
    private val bigF = bigD + math.sqrt(d2 - 1) * sign
    private val bigH = bigF * math.pow(t0, bigB)
    private val bigG = (bigF - 1 / bigF) / 2
    private val gamma0 = math.asin(math.sin(alphaC) / bigD)
    private val lam0 = lamC - math.asin(bigG * math.tan(gamma0)) / bigB
    private val sinG0 = math.sin(gamma0); private val cosG0 = math.cos(gamma0)
    // variant-B center offset u_c (EPSG 9815); special-cased at α = 90°
    private val uc =
      if (!variantB) 0.0
      else if (math.abs(math.cos(alphaC)) < 1e-12) bigA * (lamC - lam0)
      else (bigA / bigB) * math.atan2(math.sqrt(d2 - 1), math.cos(alphaC)) * sign

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      val sinP = math.sin(phi)
      val t = math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * sinP) / (1 + e * sinP), e / 2)
      val bigQ = bigH / math.pow(t, bigB)
      val bigS = (bigQ - 1 / bigQ) / 2
      val bigT = (bigQ + 1 / bigQ) / 2
      val bigV = math.sin(bigB * (lam - lam0))
      val bigU = (-bigV * cosG0 + bigS * sinG0) / bigT
      val v = bigA * math.log((1 - bigU) / (1 + bigU)) / (2 * bigB)
      val u0 = bigA *
        math.atan2(bigS * cosG0 + bigV * sinG0, math.cos(bigB * (lam - lam0))) /
        bigB
      val u = if (variantB) u0 - math.abs(uc) * sign else u0
      (v * math.cos(gammaC) + u * math.sin(gammaC) + fe,
        u * math.cos(gammaC) - v * math.sin(gammaC) + fn)
    }

    def inverse(east: Double, north: Double): (Double, Double) = {
      val dv = (east - fe) * math.cos(gammaC) - (north - fn) * math.sin(gammaC)
      val du0 = (north - fn) * math.cos(gammaC) + (east - fe) * math.sin(gammaC)
      val du = if (variantB) du0 + math.abs(uc) * sign else du0
      val bigQ = math.exp(-bigB * dv / bigA)
      val bigS = (bigQ - 1 / bigQ) / 2
      val bigT = (bigQ + 1 / bigQ) / 2
      val bigV = math.sin(bigB * du / bigA)
      val bigU = (bigV * cosG0 + bigS * sinG0) / bigT
      val t = math.pow(
        bigH / math.sqrt((1 + bigU) / (1 - bigU)), 1 / bigB)
      // geodetic latitude from the isometric parameter t by fixpoint
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 12) {
        val esin = e * math.sin(phi)
        phi = math.Pi / 2 -
          2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
        i += 1
      }
      val lam = lam0 -
        math.atan2(bigS * cosG0 - bigV * sinG0, math.cos(bigB * du / bigA)) /
          bigB
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Krovak (EPSG method 9819) — S-JTSK. `lon0Deg` is the longitude of
    * origin in GREENWICH degrees: EPSG registers it as 42°30' East of
    * Ferro, which with Ferro = 17°40' W is exactly the 24°50' E Greenwich
    * every published `+proj=krovak +lon_0=24.8333…` string carries — no
    * internal Ferro arithmetic. Output follows the proj / EPSG:5514
    * "Krovak East North" convention: x = −westing, y = −southing
    * (negative over Czechia/Slovakia). */
  final case class Krovak(latCDeg: Double, lon0Deg: Double,
                          alphaDeg: Double, kp: Double,
                          x0: Double, y0: Double, ell: Datum.Ellipsoid,
                          latPseudoDeg: Double = 78.5) {
    private val e = ell.e
    private val e2 = ell.e2
    private val phiC = math.toRadians(latCDeg)
    private val alphaC = math.toRadians(alphaDeg)
    private val phiP = math.toRadians(latPseudoDeg)
    private val sinC = math.sin(phiC); private val cosC = math.cos(phiC)
    private val bigA = ell.a * math.sqrt(1 - e2) / (1 - e2 * sinC * sinC)
    private val bigB = math.sqrt(1 + e2 * math.pow(cosC, 4) / (1 - e2))
    private val gamma0 = math.asin(sinC / bigB)
    private val t0 = math.tan(math.Pi / 4 + gamma0 / 2) *
      math.pow((1 + e * sinC) / (1 - e * sinC), e * bigB / 2) /
      math.pow(math.tan(math.Pi / 4 + phiC / 2), bigB)
    private val n = math.sin(phiP)
    private val r0 = kp * bigA / math.tan(phiP)
    private val tanPow0 = math.pow(math.tan(math.Pi / 4 + phiP / 2), n)

    /** Geodetic on `ell`, Greenwich lon → (x east, y north), proj signs. */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sinP = math.sin(phi)
      val u = 2 * (math.atan(
        t0 * math.pow(math.tan(phi / 2 + math.Pi / 4), bigB) /
          math.pow((1 + e * sinP) / (1 - e * sinP), e * bigB / 2)) - math.Pi / 4)
      val v = bigB * math.toRadians(lon0Deg - lonDeg)
      val sinU = math.sin(u); val cosU = math.cos(u)
      val t = math.asin(math.cos(alphaC) * sinU +
        math.sin(alphaC) * cosU * math.cos(v))
      val d = math.asin(cosU * math.sin(v) / math.cos(t))
      val theta = n * d
      val r = r0 * tanPow0 / math.pow(math.tan(t / 2 + math.Pi / 4), n)
      val southing = r * math.cos(theta)
      val westing = r * math.sin(theta)
      (-westing + x0, -southing + y0)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val westing = -(x - x0)
      val southing = -(y - y0)
      val r = math.hypot(southing, westing)
      val theta = math.atan2(westing, southing)
      val d = theta / n
      val t = 2 * (math.atan(
        math.pow(r0 / r, 1 / n) * math.tan(math.Pi / 4 + phiP / 2)) - math.Pi / 4)
      val u = math.asin(math.cos(alphaC) * math.sin(t) -
        math.sin(alphaC) * math.cos(t) * math.cos(d))
      val v = math.asin(math.cos(t) * math.sin(d) / math.cos(u))
      val lam = lon0Deg - math.toDegrees(v / bigB)
      // fixpoint for geodetic latitude from the conformal parameter u
      var phi = u
      var i = 0
      while (i < 12) {
        val esin = e * math.sin(phi)
        phi = 2 * (math.atan(
          math.pow(t0, -1 / bigB) *
            math.pow(math.tan(u / 2 + math.Pi / 4), 1 / bigB) *
            math.pow((1 + esin) / (1 - esin), e / 2)) - math.Pi / 4)
        i += 1
      }
      (lam, math.toDegrees(phi))
    }
  }

  /** Geostationary satellite view (`+proj=geos`) — the normalized
    * geostationary projection of the CGMS LRIT/HRIT spec: coordinates are
    * satellite scan angles × orbit height. `sweepX = true` is the
    * GOES-R/ABI convention, `false` (sweep y) Meteosat/SEVIRI. `h` =
    * satellite height above the ellipsoid surface (e.g. 35786023 m for
    * GOES-R). Points beyond the visible disk return NaN (forward) /
    * throw nothing but NaN (inverse) — callers treat NaN as
    * out-of-domain. */
  final case class Geos(lon0Deg: Double, h: Double, sweepX: Boolean,
                        x0: Double, y0: Double, ell: Datum.Ellipsoid) {
    private val lam0 = math.toRadians(lon0Deg)
    private val radiusG1 = h / ell.a
    private val radiusG = 1.0 + radiusG1
    private val c = radiusG * radiusG - 1.0
    private val radiusP = ell.b / ell.a
    private val radiusP2 = radiusP * radiusP
    private val radiusPInv2 = 1.0 / radiusP2

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lam = math.toRadians(lonDeg) - lam0
      val phi = math.toRadians(latDeg)
      val phiC = math.atan(radiusP2 * math.tan(phi)) // geocentric latitude
      val rr = radiusP /
        math.hypot(radiusP * math.cos(phiC), math.sin(phiC))
      val vx = rr * math.cos(lam) * math.cos(phiC)
      val vy = rr * math.sin(lam) * math.cos(phiC)
      val vz = rr * math.sin(phiC)
      val tmp = radiusG - vx
      if (((tmp) * vx - vy * vy - vz * vz * radiusPInv2) < 0)
        return (Double.NaN, Double.NaN) // beyond the visible disk
      val (sx, sy) =
        if (sweepX)
          (radiusG1 * math.atan(vy / math.hypot(vz, tmp)),
            radiusG1 * math.atan(vz / tmp))
        else
          (radiusG1 * math.atan(vy / tmp),
            radiusG1 * math.atan(vz / math.hypot(vy, tmp)))
      (sx * ell.a + x0, sy * ell.a + y0)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xn = (x - x0) / ell.a
      val yn = (y - y0) / ell.a
      var vx = -1.0
      var vy = 0.0
      var vz = 0.0
      if (sweepX) {
        vz = math.tan(yn / radiusG1)
        vy = math.tan(xn / radiusG1) * math.hypot(1.0, vz)
      } else {
        vy = math.tan(xn / radiusG1)
        vz = math.tan(yn / radiusG1) * math.hypot(1.0, vy)
      }
      val a2 = vy * vy + radiusPInv2 * vz * vz + vx * vx
      val b2 = 2 * radiusG * vx
      val det = b2 * b2 - 4 * a2 * c
      if (det < 0) return (Double.NaN, Double.NaN)
      val k = (-b2 - math.sqrt(det)) / (2 * a2)
      vx = radiusG + k * vx
      vy *= k
      vz *= k
      val lam = math.atan2(vy, vx)
      val phiC = math.atan(vz * math.cos(lam) / vx)
      val phi = math.atan(radiusPInv2 * math.tan(phiC))
      (math.toDegrees(lam + lam0), math.toDegrees(phi))
    }
  }
}
