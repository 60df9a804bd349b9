package graft.raster

/** Ellipsoidal geodesics (Vincenty 1975, "Direct and inverse solutions of
  * geodesics on the ellipsoid with application of nested equations",
  * Survey Review XXIII/176) — the primitive behind ellipsoidal
  * azimuthal-equidistant projection and great-circle (geodesic) distance.
  * The reference absorbs datum'd aeqd CRSs through PROJ, which runs
  * geodesics for this projection (flytemosaic/mosaics.py:44-50).
  *
  * Accuracy: Vincenty's nested series are good to ~0.5 mm on Earth-sized
  * ellipsoids. The DIRECT problem converges everywhere. The INVERSE
  * problem's fixed-point iteration famously fails to converge for NEARLY
  * ANTIPODAL pairs (within ~0.55° of the exact antipode); `inverse`
  * returns None there — callers map it to an out-of-domain NaN (the
  * aeqd antipodal cap is degenerate cartography anyway: the whole
  * antipodal neighbourhood maps to the chart's outer rim). This is the
  * same honest fail-soft contract as the geos off-disk NaN, never a
  * silent approximation.
  *
  * Validation (GeodesicSpec): closed-form pins that need no external
  * vectors — the WGS84 quarter meridian (10 001 965.729 m, the
  * metre's historical definition makes it ~10⁷ m), equatorial arcs
  * (s = a·Δλ exactly, the equator IS the geodesic for |Δλ| < π(1−f)),
  * the f = 0 sphere limit against the closed-form great circle, and
  * direct∘inverse round-trips over randomized pairs. */
object Geodesic {

  /** Inverse solution: distance s12 (m) and forward azimuths α1, α2
    * (radians, clockwise from north) between two geodetic points
    * (degrees) on `ell`. None for nearly-antipodal pairs (no
    * convergence) and for coincident points the result is (0, 0, 0). */
  def inverse(ell: Datum.Ellipsoid,
              lon1: Double, lat1: Double,
              lon2: Double, lat2: Double): Option[(Double, Double, Double)] = {
    val a = ell.a
    val f = ell.f
    val b = a * (1 - f)
    val phi1 = math.toRadians(lat1)
    val phi2 = math.toRadians(lat2)
    // normalize the longitude difference into (−180°, 180°] — Vincenty's
    // λ iteration is posed for the short way round; an un-normalized L
    // beyond ±π reads as (and is guarded like) the antipodal regime
    val bigL = math.toRadians(((lon2 - lon1) % 360.0 + 540.0) % 360.0 - 180.0)
    val u1 = math.atan((1 - f) * math.tan(phi1))
    val u2 = math.atan((1 - f) * math.tan(phi2))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)

    var lam = bigL
    var lamPrev = 0.0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var sinAlpha = 0.0; var cos2Alpha = 0.0; var cos2Sm = 0.0
    var iter = 0
    var converged = false
    while (iter < 100 && !converged) {
      val sinLam = math.sin(lam); val cosLam = math.cos(lam)
      val t1 = cosU2 * sinLam
      val t2 = cosU1 * sinU2 - sinU1 * cosU2 * cosLam
      sinSigma = math.hypot(t1, t2)
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
      if (sinSigma == 0.0) return Some((0.0, 0.0, 0.0)) // coincident
      sigma = math.atan2(sinSigma, cosSigma)
      sinAlpha = cosU1 * cosU2 * sinLam / sinSigma
      cos2Alpha = 1 - sinAlpha * sinAlpha
      cos2Sm =
        if (cos2Alpha == 0.0) 0.0 // equatorial line
        else cosSigma - 2 * sinU1 * sinU2 / cos2Alpha
      val c = f / 16 * cos2Alpha * (4 + f * (4 - 3 * cos2Alpha))
      lamPrev = lam
      lam = bigL + (1 - c) * f * sinAlpha *
        (sigma + c * sinSigma *
          (cos2Sm + c * cosSigma * (-1 + 2 * cos2Sm * cos2Sm)))
      // divergence signal for near-antipodal pairs
      if (math.abs(lam) > math.Pi) return None
      converged = math.abs(lam - lamPrev) < 1e-13
      iter += 1
    }
    if (!converged) return None

    val u2p = cos2Alpha * (a * a - b * b) / (b * b)
    val bigA = 1 + u2p / 16384 * (4096 + u2p * (-768 + u2p * (320 - 175 * u2p)))
    val bigB = u2p / 1024 * (256 + u2p * (-128 + u2p * (74 - 47 * u2p)))
    val dSigma = bigB * sinSigma * (cos2Sm + bigB / 4 *
      (cosSigma * (-1 + 2 * cos2Sm * cos2Sm) -
        bigB / 6 * cos2Sm * (-3 + 4 * sinSigma * sinSigma) *
          (-3 + 4 * cos2Sm * cos2Sm)))
    val s = b * bigA * (sigma - dSigma)
    val sinLam = math.sin(lam); val cosLam = math.cos(lam)
    val alpha1 = math.atan2(cosU2 * sinLam,
      cosU1 * sinU2 - sinU1 * cosU2 * cosLam)
    val alpha2 = math.atan2(cosU1 * sinLam,
      -sinU1 * cosU2 + cosU1 * sinU2 * cosLam)
    Some((s, alpha1, alpha2))
  }

  /** Direct solution: from a geodetic point (degrees), initial azimuth α1
    * (radians, clockwise from north) and distance s12 (m), the end point
    * (lonDeg, latDeg) and arrival azimuth α2. Converges for any input. */
  def direct(ell: Datum.Ellipsoid,
             lon1: Double, lat1: Double,
             alpha1: Double, s12: Double): (Double, Double, Double) = {
    val a = ell.a
    val f = ell.f
    val b = a * (1 - f)
    val phi1 = math.toRadians(lat1)
    val tanU1 = (1 - f) * math.tan(phi1)
    val cosU1 = 1 / math.hypot(1, tanU1)
    val sinU1 = tanU1 * cosU1
    val sinA1 = math.sin(alpha1); val cosA1 = math.cos(alpha1)
    val sigma1 = math.atan2(tanU1, cosA1)
    val sinAlpha = cosU1 * sinA1
    val cos2Alpha = 1 - sinAlpha * sinAlpha
    val u2p = cos2Alpha * (a * a - b * b) / (b * b)
    val bigA = 1 + u2p / 16384 * (4096 + u2p * (-768 + u2p * (320 - 175 * u2p)))
    val bigB = u2p / 1024 * (256 + u2p * (-128 + u2p * (74 - 47 * u2p)))

    var sigma = s12 / (b * bigA)
    var sigmaPrev = Double.NaN
    var cos2Sm = 0.0
    var iter = 0
    while (iter < 100 && sigma != sigmaPrev) {
      cos2Sm = math.cos(2 * sigma1 + sigma)
      val sinS = math.sin(sigma); val cosS = math.cos(sigma)
      val dSigma = bigB * sinS * (cos2Sm + bigB / 4 *
        (cosS * (-1 + 2 * cos2Sm * cos2Sm) -
          bigB / 6 * cos2Sm * (-3 + 4 * sinS * sinS) *
            (-3 + 4 * cos2Sm * cos2Sm)))
      sigmaPrev = sigma
      sigma = s12 / (b * bigA) + dSigma
      iter += 1
    }
    val sinS = math.sin(sigma); val cosS = math.cos(sigma)
    val tmp = sinU1 * sinS - cosU1 * cosS * cosA1
    val phi2 = math.atan2(sinU1 * cosS + cosU1 * sinS * cosA1,
      (1 - f) * math.hypot(sinAlpha, tmp))
    val lam = math.atan2(sinS * sinA1, cosU1 * cosS - sinU1 * sinS * cosA1)
    val c = f / 16 * cos2Alpha * (4 + f * (4 - 3 * cos2Alpha))
    val bigL = lam - (1 - c) * f * sinAlpha *
      (sigma + c * sinS *
        (cos2Sm + c * cosS * (-1 + 2 * cos2Sm * cos2Sm)))
    val alpha2 = math.atan2(sinAlpha, -tmp)
    (lon1 + math.toDegrees(bigL), math.toDegrees(phi2), alpha2)
  }

  /** Geodesic distance in metres (None in the nearly-antipodal cap). */
  def distance(ell: Datum.Ellipsoid,
               lon1: Double, lat1: Double,
               lon2: Double, lat2: Double): Option[Double] =
    inverse(ell, lon1, lat1, lon2, lat2).map(_._1)

  /** Ellipsoidal azimuthal equidistant: the chart where straight-line
    * distance and bearing FROM THE CENTER are the true geodesic distance
    * and azimuth — PROJ's ellipsoidal `+proj=aeqd` semantics. Forward is
    * one inverse geodesic (NaN in the antipodal cap), inverse one direct
    * geodesic (total). */
  final case class AzimuthalEquidistant(lat0Deg: Double, lon0Deg: Double,
                                        x0: Double, y0: Double,
                                        ell: Datum.Ellipsoid) {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      Geodesic.inverse(ell, lon0Deg, lat0Deg, lonDeg, latDeg) match {
        case Some((s, a1, _)) =>
          (x0 + s * math.sin(a1), y0 + s * math.cos(a1))
        case None => (Double.NaN, Double.NaN)
      }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - x0; val dy = y - y0
      val s = math.hypot(dx, dy)
      if (s < 1e-9) (lon0Deg, lat0Deg)
      else {
        val alpha1 = math.atan2(dx, dy)
        val (lon, lat, _) = Geodesic.direct(ell, lon0Deg, lat0Deg, alpha1, s)
        (lon, lat)
      }
    }
  }
}
