package graft.tools

import graft.raster.{Datum, ProjExt, Proj4}

/** Scratch validation of the extended projection kernels against EPSG
  * worked examples and cross-formulation agreement. */
object ProjCheck {
  def dms(d: Int, m: Int, s: Double): Double = d + m / 60.0 + s / 3600.0

  def main(args: Array[String]): Unit = {
    // --- omerc variant B: EPSG GN7-2 Timbalai 1948 / RSO Borneo (m) ---
    val evrstSS = Datum.Ellipsoid(6377298.556, 300.8017)
    val hom = ProjExt.HotineObliqueMercator(
      latCDeg = 4.0, lonCDeg = 115.0,
      alphaDeg = dms(53, 18, 56.9537), gammaDeg = dms(53, 7, 48.3685),
      kc = 0.99984, fe = 590476.87, fn = 442857.65,
      ell = evrstSS, variantB = true)
    val (e1, n1) = hom.forward(dms(115, 48, 19.8196), dms(5, 23, 14.1129))
    println(f"TIMBALAI fwd: E=$e1%.3f (want 679245.73)  N=$n1%.3f (want 596562.78)")
    val (lo1, la1) = hom.inverse(679245.73, 596562.78)
    println(f"TIMBALAI inv: lon=$lo1%.8f (want ${dms(115, 48, 19.8196)}%.8f) lat=$la1%.8f (want ${dms(5, 23, 14.1129)}%.8f)")

    // --- krovak: EPSG GN7-2 worked example (S-JTSK) ---
    val bessel = Datum.byName("bessel")
    val kro = ProjExt.Krovak(49.5, dms(24, 50, 0), dms(30, 17, 17.3031),
      0.9999, 0, 0, bessel)
    // test point: 50°12'32.4416"N, 16°50'59.1790"E Greenwich
    val (kx, ky) = kro.forward(dms(16, 50, 59.1790), dms(50, 12, 32.4416))
    println(f"KROVAK fwd: x=$kx%.3f y=$ky%.3f (want x=-568991.00 y=-1050538.63)")
    val (klo, kla) = kro.inverse(-568991.00, -1050538.63)
    println(f"KROVAK inv: lon=$klo%.8f (want ${dms(16, 50, 59.1790)}%.8f) lat=$kla%.8f (want ${dms(50, 12, 32.4416)}%.8f)")

    // --- somerc vs HOM-B(alpha=90): Swiss LV95 params, mutual check ---
    val sw = ProjExt.SwissObliqueMercator(
      dms(46, 57, 8.66), dms(7, 26, 22.5), 1.0, 2600000, 1200000, bessel)
    val hom90 = ProjExt.HotineObliqueMercator(
      dms(46, 57, 8.66), dms(7, 26, 22.5), 90.0, 90.0, 1.0,
      2600000, 1200000, bessel, variantB = true)
    for ((lon, lat) <- Seq((7.0, 46.0), (8.5, 47.3), (6.2, 46.3), (9.9, 47.5))) {
      val (sx, sy) = sw.forward(lon, lat)
      val (hx, hy) = hom90.forward(lon, lat)
      println(f"SWISS ($lon%4.1f,$lat%4.1f): somerc=($sx%.4f,$sy%.4f) homB=($hx%.4f,$hy%.4f) d=(${sx - hx}%.5f,${sy - hy}%.5f)")
      val (blon, blat) = sw.inverse(sx, sy)
      println(f"   somerc roundtrip err: ${(blon - lon) * 3600}%.2e as, ${(blat - lat) * 3600}%.2e as")
    }
    // center invariant
    println(f"SWISS center: ${sw.forward(dms(7, 26, 22.5), dms(46, 57, 8.66))} (want (2600000,1200000))")

    // --- geos: invariants ---
    val grs80 = Datum.byName("grs80")
    val geos = ProjExt.Geos(-75.0, 35786023.0, sweepX = true, 0, 0, grs80)
    println(s"GEOS nadir: ${geos.forward(-75.0, 0.0)} (want (0,0))")
    val dlon = 0.01
    val (gx, _) = geos.forward(-75.0 + dlon, 0.0)
    println(f"GEOS near-nadir x=$gx%.3f  a*dlon=${grs80.a * math.toRadians(dlon)}%.3f (≈, parallax≲1)")
    for ((lon, lat) <- Seq((-75.0, 0.0), (-100.0, 35.0), (-60.0, -20.0), (-80.0, 45.0))) {
      val (x, y) = geos.forward(lon, lat)
      val (rl, rp) = geos.inverse(x, y)
      println(f"GEOS rt ($lon%6.1f,$lat%5.1f): err=(${(rl - lon) * 3600}%.2e as, ${(rp - lat) * 3600}%.2e as)")
    }
    println(s"GEOS off-disk: ${geos.forward(105.0, 0.0)} (want NaN)")

    // --- parse-level: full strings compile ---
    for (s <- Seq(
      "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 +k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel +towgs84=674.374,15.056,405.346,0,0,0,0 +units=m +no_defs",
      "+proj=krovak +lat_0=49.5 +lon_0=24.83333333333333 +alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel +towgs84=589,76,480 +units=m +no_defs",
      "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 +gamma=53.13010236111111 +k=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=evrstSS +units=m +no_defs",
      "+proj=geos +h=35786023 +lon_0=-75 +sweep=x +ellps=GRS80 +units=m +no_defs"))
      println(s"PARSE ${Proj4.parse(s).isDefined}  $s")
  }
}
