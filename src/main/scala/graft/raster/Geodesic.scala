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
  * ANTIPODAL pairs (within ~0.55° of the exact antipode); raw `inverse`
  * returns None there, and [[inverseTotal]] closes the cap with a damped
  * Newton shoot on the everywhere-convergent direct solution, seeded by
  * Karney's astroid azimuth estimate — so the public surface (aeqd,
  * graft_geodesic_m) converges everywhere, like PROJ's
  * geographiclib-backed aeqd. None survives only as the
  * all-seeds-failed fail-soft, never a silent approximation.
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

  /** Inverse solution that CONVERGES EVERYWHERE: Vincenty's fast
    * fixed-point iteration outside the nearly-antipodal cap, and inside
    * it a damped 2-D Newton shoot on [[direct]] (which converges for any
    * input) seeded with Karney's astroid azimuth estimate ("Algorithms
    * for geodesics", J. Geodesy 87(1) 2013, §5 eqs. 53-57). Because the
    * cap solver inverts THIS object's own direct solution, forward and
    * inverse are exact mutual inverses by construction — the property
    * aeqd round-trips actually need. Residual target 1e-13 rad (~1 µm);
    * None only if every seed fails (not observed over the validation
    * grids — kept as the documented fail-soft). */
  def inverseTotal(ell: Datum.Ellipsoid,
                   lon1: Double, lat1: Double,
                   lon2: Double, lat2: Double): Option[(Double, Double, Double)] =
    inverse(ell, lon1, lat1, lon2, lat2)
      .orElse(antipodalInverse(ell, lon1, lat1, lon2, lat2))

  /** Newton-shooting inverse for the nearly-antipodal cap — see
    * [[inverseTotal]]. Exposed for spec access. */
  private[graft] def antipodalInverse(
      ell: Datum.Ellipsoid,
      lon1: Double, lat1: Double,
      lon2: Double, lat2: Double): Option[(Double, Double, Double)] = {
    val a = ell.a
    val f = ell.f
    val b = a * (1 - f)
    val phi1 = math.toRadians(lat1)
    val phi2 = math.toRadians(lat2)
    val lam12 = math.toRadians(((lon2 - lon1) % 360.0 + 540.0) % 360.0 - 180.0)
    // reduced latitudes on the auxiliary sphere
    val beta1 = math.atan((1 - f) * math.tan(phi1))
    val beta2 = math.atan((1 - f) * math.tan(phi2))

    // Karney's astroid seed: in the antipodal lens the azimuth solves
    // a 2-D "nearest point on an astroid" problem in scaled coordinates
    // x = (λ12 − π)/Δ, y = (β1 + β2)/Δ with Δ = f·π·cos²β1; the positive
    // root k of k⁴ + 2k³ + (1 − x² − y²)k² − 2y²k − y² = 0 yields
    // α1 = atan2(−x/(1+k), y/k).
    val delta = f * math.Pi * math.cos(beta1) * math.cos(beta1)
    val x = if (delta != 0.0) (lam12 - math.Pi * (if (lam12 >= 0) 1 else -1)) / delta
            else 0.0
    val y = if (delta != 0.0) (beta1 + beta2) / delta else 0.0
    val alphaSeed: Double = {
      if (delta == 0.0 || (x == 0.0 && y == 0.0)) 0.0
      else {
        // single positive root (the quartic is −y² at 0 and →+∞): bisect
        var lo = 0.0; var hi = 1.0
        def q(k: Double) =
          k * k * k * k + 2 * k * k * k + (1 - x * x - y * y) * k * k -
            2 * y * y * k - y * y
        while (q(hi) < 0) hi *= 2
        var it = 0
        while (it < 200 && hi - lo > 1e-15 * (1 + hi)) {
          val mid = 0.5 * (lo + hi)
          if (q(mid) < 0) lo = mid else hi = mid
          it += 1
        }
        val k = 0.5 * (lo + hi)
        if (y != 0.0) math.atan2(-x / (1 + k), y / k)
        else math.atan2(-x, math.sqrt(math.max(0.0, 1 - x * x)))
      }
    }
    // antipodal-side azimuth sign: the seed is posed for λ12 ≈ +π; a
    // negative λ12 mirrors east/west
    val sign = if (lam12 >= 0) 1.0 else -1.0
    val seed0 = if (lam12 >= 0) alphaSeed else -alphaSeed

    // distance seed: half the meridian ellipse circumference is within
    // ~0.3% of any nearly-antipodal geodesic length
    val e2 = f * (2 - f)
    val s0 = math.Pi * a * (1 - e2 / 4 - 3 * e2 * e2 / 64)

    def wrapPi(v: Double): Double = {
      var w = v % (2 * math.Pi)
      if (w > math.Pi) w -= 2 * math.Pi
      if (w <= -math.Pi) w += 2 * math.Pi
      w
    }
    // residual in balanced units: (Δλ·cosφ2, Δφ) radians
    def resid(alpha1: Double, s: Double): (Double, Double, Double) = {
      val (lo2, la2, a2) = direct(ell, lon1, lat1, alpha1, s)
      val rl = wrapPi(math.toRadians(lo2 - lon2)) * math.cos(phi2)
      val rp = math.toRadians(la2 - lat2)
      (rl, rp, a2)
    }

    def solve(seed: Double): Option[(Double, Double, Double)] = {
      var alpha = seed
      var s = s0
      var it = 0
      var (rl, rp, a2) = resid(alpha, s)
      var n2 = math.hypot(rl, rp)
      while (it < 100 && n2 > 1e-13) {
        // forward-difference Jacobian: inexactness only slows the rate —
        // the residual itself is driven to the 1e-13 target
        val ha = 1e-7
        val hs = 1.0 // metres
        val (rlA, rpA, _) = resid(alpha + ha, s)
        val (rlS, rpS, _) = resid(alpha, s + hs)
        val j11 = (rlA - rl) / ha; val j12 = (rlS - rl) / hs
        val j21 = (rpA - rp) / ha; val j22 = (rpS - rp) / hs
        val det = j11 * j22 - j12 * j21
        if (det == 0.0 || det.isNaN) return None
        var da = -(j22 * rl - j12 * rp) / det
        var ds = -(-j21 * rl + j11 * rp) / det
        // damp: halve the step until the residual shrinks
        var k = 0
        var improved = false
        while (k < 30 && !improved) {
          val (nrl, nrp, na2) = resid(alpha + da, s + ds)
          val nn = math.hypot(nrl, nrp)
          if (nn < n2) {
            alpha += da; s += ds; rl = nrl; rp = nrp; a2 = na2; n2 = nn
            improved = true
          } else { da *= 0.5; ds *= 0.5; k += 1 }
        }
        if (!improved) return None
        it += 1
      }
      if (n2 <= 1e-13 && s > 0) Some((s, wrapPi(alpha), a2)) else None
    }

    // Seed ladder: astroid first, then meridional/perturbed restarts.
    // Multiple geodesics land on a near-antipodal p2 (shortest + longer
    // windings); every converged solution IS a true geodesic through p2,
    // so the SHORTEST found is returned — min-over-seeds can only fail
    // shortest-ness by missing a root, never by inventing one, and the
    // astroid seed targets the shortest branch in the lens by
    // construction (boundary agreement with Vincenty is spec-pinned).
    val seeds = Seq(seed0, sign * 0.5 * math.Pi, seed0 + 0.3, seed0 - 0.3,
      0.0, math.Pi, sign * 0.25 * math.Pi, sign * 0.75 * math.Pi)
    val sols = seeds.flatMap(solve)
    if (sols.isEmpty) None else Some(sols.minBy(_._1))
  }

  /** Geodesic distance in metres (None in the nearly-antipodal cap). */
  def distance(ell: Datum.Ellipsoid,
               lon1: Double, lat1: Double,
               lon2: Double, lat2: Double): Option[Double] =
    inverse(ell, lon1, lat1, lon2, lat2).map(_._1)

  /** Geodesic distance in metres — converges everywhere (antipodal cap
    * included) via [[inverseTotal]]. */
  def distanceTotal(ell: Datum.Ellipsoid,
                    lon1: Double, lat1: Double,
                    lon2: Double, lat2: Double): Option[Double] =
    inverseTotal(ell, lon1, lat1, lon2, lat2).map(_._1)

  /** Ellipsoidal azimuthal equidistant: the chart where straight-line
    * distance and bearing FROM THE CENTER are the true geodesic distance
    * and azimuth — PROJ's ellipsoidal `+proj=aeqd` semantics. Forward is
    * one inverse geodesic (NaN in the antipodal cap), inverse one direct
    * geodesic (total). */
  final case class AzimuthalEquidistant(lat0Deg: Double, lon0Deg: Double,
                                        x0: Double, y0: Double,
                                        ell: Datum.Ellipsoid) {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      Geodesic.inverseTotal(ell, lon0Deg, lat0Deg, lonDeg, latDeg) match {
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
