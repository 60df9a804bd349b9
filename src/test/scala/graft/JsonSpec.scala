package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Json
import graft.raster.GtiMosaic

/** The sidecar JSON tokenizer — exactly the shapes the old string-split
  * readers got wrong: lowercase exponents, key-like substrings inside
  * string values, escapes, nesting. */
class JsonSpec extends AnyFunSuite {

  test("scalars, nesting, and ordering") {
    val v = Json.parseObject(
      """{"a": 1, "b": [1.5, -2e3, 1e-05], "c": {"d": true, "e": null},
        | "f": "x"}""".stripMargin)
    assert(v("a") == 1.0)
    assert(v("b") == Vector(1.5, -2000.0, 1e-05))
    assert(v("c").asInstanceOf[Map[String, Any]]("d") == true)
    assert(v("c").asInstanceOf[Map[String, Any]]("e") == null)
    assert(v.keys.toSeq == Seq("a", "b", "c", "f")) // insertion-ordered
  }

  test("string escapes and key-like substrings inside values") {
    val v = Json.parseObject(
      """{"s": "quote \" slash \\ nl \n uni é", "RESX": 2.5}""")
    assert(v("s") == "quote \" slash \\ nl \n uni é")
    // a value containing "RESX": must not confuse the parse of the real key
    val w = Json.parseObject("""{"note": "fake \"RESX\": 9", "RESX": 1.0}""")
    assert(w("RESX") == 1.0)
  }

  test("malformed inputs fail with offsets, not garbage values") {
    for (bad <- Seq("""{"a" 1}""", """{"a": }""", "[1, 2", """{"a": 1} x""",
                    """{"a": --3}""", "\"unterminated"))
      intercept[IllegalArgumentException](Json.parse(bad))
  }

  test("empty object and array") {
    assert(Json.parse("{}") == Map.empty[String, Any])
    assert(Json.parse("[ ]") == Vector.empty[Any])
  }

  test("GTI meta parse handles lowercase exponents and embedded keys") {
    val m = GtiMosaic.parseMetaJson(
      """{"DATA_TYPE":"Float32","NODATA":"NaN","MINX":-1e-05,"MINY":0.0,
        |"MAXX":10.0,"MAXY":10.0,"RESX":1e-05,"RESY":2.5E-1,"BAND_COUNT":3,
        |"RESAMPLING":"says MAXX: 99 here","SRS":"EPSG:32633"}""".stripMargin)
    assert(m.resx == 1e-05 && m.resy == 0.25 && m.minx == -1e-05)
    assert(m.bandCount == 3 && m.nodata.isNaN)
    assert(m.resampling == "says MAXX: 99 here" && m.srs == "EPSG:32633")
  }
}
