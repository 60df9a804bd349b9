package graft.model

/** Minimal recursive-descent JSON parser for the engine's sidecar files
  * (`gti.json`, zarr metadata, centroid manifests). The previous
  * string-splitting readers mis-parsed lowercase exponents (`1e-05`) and
  * keys appearing inside string values; this is a real tokenizer —
  * strings with escapes, numbers per the JSON grammar, nested
  * objects/arrays, true/false/null.
  *
  * Values map to: Map[String, Any] (insertion-ordered), Vector[Any],
  * String, Double, Boolean, null.
  */
object Json {

  def parse(s: String): Any = {
    val p = new P(s)
    p.ws()
    val v = p.value()
    p.ws()
    if (p.i != s.length)
      throw new IllegalArgumentException(
        s"trailing content at offset ${p.i}: ${s.substring(p.i).take(20)}")
    v
  }

  /** parse() + cast to object — the shape every sidecar uses. */
  def parseObject(s: String): Map[String, Any] = parse(s) match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other => throw new IllegalArgumentException(
      s"expected a JSON object, got ${other.getClass.getSimpleName}")
  }

  private final class P(s: String) {
    var i = 0

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"JSON parse error at offset $i: $msg")

    def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1

    private def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c)
        fail(s"expected '$c', got ${if (i < s.length) s"'${s.charAt(i)}'" else "end of input"}")
      i += 1
    }

    def value(): Any = {
      if (i >= s.length) fail("unexpected end of input")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", java.lang.Boolean.TRUE)
        case 'f' => lit("false", java.lang.Boolean.FALSE)
        case 'n' => lit("null", null)
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, i)) fail(s"expected '$word'")
      i += word.length; v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = scala.collection.immutable.VectorMap.newBuilder[String, Any]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        ws(); val k = str(); ws(); expect(':'); ws()
        b += (k -> value()); ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      b.result()
    }

    private def arr(): Vector[Any] = {
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (i < s.length && s.charAt(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        ws(); b += value(); ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("unterminated escape")
          s.charAt(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case 'n'  => sb += '\n'
            case 'r'  => sb += '\r'
            case 't'  => sb += '\t'
            case 'u'  =>
              if (i + 4 >= s.length) fail("truncated \\u escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case e => fail(s"bad escape '\\$e'")
          }
        } else sb += c
        i += 1
      }
      expect('"')
      sb.result()
    }

    private def num(): Double = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      while (i < s.length && s.charAt(i).isDigit) i += 1
      if (i < s.length && s.charAt(i) == '.') {
        i += 1; while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i == start || (i == start + 1 && s.charAt(start) == '-'))
        fail("malformed number")
      s.substring(start, i).toDouble
    }
  }
}
