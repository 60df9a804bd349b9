package graft.ops

/** Shared (de)serializers for the ANN index JSON sidecars: the flat
  * coarse-cell centroid table and the per-subspace PQ codebook. ONE
  * implementation serves IvfIndex, PqIndex, and IvfPq so a parsing fix
  * cannot drift between them. Reads go through the engine's tokenizing
  * parser (graft.model.Json); float round-trips are exact (shortest
  * decimal repr parses back to the same float through double). */
private[ops] object CentroidJson {

  def writeCells(cents: Seq[Array[Float]]): String =
    cents.zipWithIndex.map { case (c, i) =>
      s"""{"cell":$i,"centroid":[${c.mkString(",")}]}"""
    }.mkString("[", ",", "]")

  private def floats(v: Any): Array[Float] =
    v.asInstanceOf[Vector[Any]].map(_.asInstanceOf[Double].toFloat).toArray

  def parseCells(json: String): Array[Array[Float]] =
    graft.model.Json.parse(json).asInstanceOf[Vector[Any]].map { o =>
      val m = o.asInstanceOf[Map[String, Any]]
      m("cell").asInstanceOf[Double].toInt -> floats(m("centroid"))
    }.sortBy(_._1).map(_._2).toArray

  def writeCodebook(cents: Array[Array[Array[Float]]]): String =
    cents.zipWithIndex.map { case (sub, i) =>
      s"""{"sub":$i,"centroids":[${
        sub.map(c => "[" + c.mkString(",") + "]").mkString(",")}]}"""
    }.mkString("[", ",", "]")

  def parseCodebook(json: String): Array[Array[Array[Float]]] =
    graft.model.Json.parse(json).asInstanceOf[Vector[Any]].map { o =>
      val m = o.asInstanceOf[Map[String, Any]]
      m("sub").asInstanceOf[Double].toInt ->
        m("centroids").asInstanceOf[Vector[Any]].map(floats).toArray
    }.sortBy(_._1).map(_._2).toArray
}
