package graft.ops

/** Shared (de)serializers for the ANN index JSON sidecars: the flat
  * coarse-cell centroid table and the per-subspace PQ codebook.
  * Hand-rolled on purpose (no JSON dependency in the build); ONE
  * implementation serves IvfIndex, PqIndex, and IvfPq so a parsing fix
  * cannot drift between them. */
private[ops] object CentroidJson {

  def writeCells(cents: Seq[Array[Float]]): String =
    cents.zipWithIndex.map { case (c, i) =>
      s"""{"cell":$i,"centroid":[${c.mkString(",")}]}"""
    }.mkString("[", ",", "]")

  def parseCells(json: String): Array[Array[Float]] =
    json.split("""\{"cell":""").drop(1).map { p =>
      val cell = p.takeWhile(_.isDigit).toInt
      cell -> p.split("""\[""")(1).takeWhile(_ != ']')
        .split(',').filter(_.nonEmpty).map(_.toFloat)
    }.sortBy(_._1).map(_._2)

  def writeCodebook(cents: Array[Array[Array[Float]]]): String =
    cents.zipWithIndex.map { case (sub, i) =>
      s"""{"sub":$i,"centroids":[${
        sub.map(c => "[" + c.mkString(",") + "]").mkString(",")}]}"""
    }.mkString("[", ",", "]")

  def parseCodebook(json: String): Array[Array[Array[Float]]] =
    json.split("""\{"sub":""").drop(1).map { p =>
      val sub = p.takeWhile(_.isDigit).toInt
      var rest = p.substring(p.indexOf("[[") + 1)
      val cs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      while (rest.startsWith("[")) {
        val end = rest.indexOf(']')
        cs += rest.substring(1, end).split(',').filter(_.nonEmpty).map(_.toFloat)
        rest = rest.substring(end + 1).dropWhile(_ == ',')
      }
      sub -> cs.toArray
    }.sortBy(_._1).map(_._2)
}
