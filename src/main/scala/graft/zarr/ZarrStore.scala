package graft.zarr

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.cube.ChunkRow
import graft.model.GridDef

/** Zarr v2 on-disk store — the externally-readable array sink
  * (SURVEY §2.1 S7/S8; reference contract: flyte/build.py:110 writes a
  * store xarray reopens, flytemosaic/flyte/build.py region writes).
  *
  * Layout follows the PUBLIC Zarr v2 spec
  * (https://zarr.readthedocs.io/en/stable/spec/v2.html):
  *
  *   <root>/.zgroup                    {"zarr_format": 2}
  *   <root>/<var>/.zarray              shape/chunks/dtype "<f4"/zlib/C-order
  *   <root>/<var>/.zattrs              xarray _ARRAY_DIMENSIONS convention
  *   <root>/<var>/<t>.<b>.<cy>.<cx>    zlib(deflate) of C-order LE float32
  *
  * so any Zarr v2 reader (zarr-python / xarray) opens it with no custom
  * code: dtype, grid, and compressor are declared in `.zarray`, chunk keys
  * use the default "." dimension separator, and edge chunks are padded to
  * the full chunk shape with the NaN fill value, all per spec. The write
  * path keeps ArrayStore's S9 idempotence contract (deterministic keys,
  * temp + atomic rename). ZarrSpec round-trips the metadata and validates
  * chunk bytes with an independent zlib decode.
  */
object ZarrStore {

  private val DimNames = Seq("time", "band", "y", "x")

  private def zarrayJson(g: GridDef): String =
    s"""{"zarr_format":2,"shape":[${g.nTime},${g.nBand},${g.nY},${g.nX}],""" +
      s""""chunks":[1,1,${g.chunkY},${g.chunkX}],"dtype":"<f4",""" +
      """"compressor":{"id":"zlib","level":1},"fill_value":"NaN",""" +
      """"order":"C","filters":null,"dimension_separator":"."}"""

  /** S8 metadata-only init: group + array metadata, no data bytes. Band
    * labels ride in `.zattrs` beside the xarray dimension convention. */
  def init(root: String, grid: GridDef, varName: String = "data",
           bands: Seq[String] = Nil): Unit = {
    val dir = Paths.get(root, varName)
    Files.createDirectories(dir)
    Files.writeString(Paths.get(root, ".zgroup"), """{"zarr_format":2}""")
    Files.writeString(dir.resolve(".zarray"), zarrayJson(grid))
    val dims = DimNames.mkString("\"_ARRAY_DIMENSIONS\":[\"", "\",\"", "\"]")
    val labels =
      if (bands.isEmpty) ""
      else bands.mkString(""","band_labels":["""", "\",\"", "\"]")
    Files.writeString(dir.resolve(".zattrs"), s"{$dims$labels}")
    consolidate(root)
  }

  /** Zarr v2 consolidated metadata (`.zmetadata`, the `zarr.consolidate_
    * metadata` convention xarray's `open_zarr(consolidated=True)` reads):
    * every .zgroup/.zarray/.zattrs inlined into ONE root object, so an
    * object-store open costs one GET instead of one per metadata file.
    * Idempotent; re-run after adding more variables to the group. */
  def consolidate(root: String): Unit = {
    val rootPath = Paths.get(root)
    val names = Set(".zgroup", ".zarray", ".zattrs")
    val stream = Files.walk(rootPath)
    val entries =
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(p => names.contains(p.getFileName.toString))
          .map(p => rootPath.relativize(p).toString.replace('\\', '/') -> p)
          .toSeq.sortBy(_._1)
          .map { case (rel, p) => s""""$rel":${Files.readString(p)}""" }
      } finally stream.close()
    Files.writeString(rootPath.resolve(".zmetadata"),
      s"""{"metadata":{${entries.mkString(",")}},"zarr_consolidated_format":1}""")
  }

  def readGrid(root: String, varName: String = "data"): GridDef = {
    val s = Files.readString(Paths.get(root, varName, ".zarray"))
    def arr(k: String): Array[Int] =
      s.split("\"" + k + "\":\\[")(1).takeWhile(_ != ']').split(',').map(_.trim.toInt)
    val Array(nT, nB, nY, nX) = arr("shape")
    val Array(_, _, cy, cx) = arr("chunks")
    GridDef(nT, nB, nY, nX, cy, cx, itemBytes = 4) // "<f4"
  }

  /** S9-idempotent parallel chunk writes in Zarr v2 encoding (shared body:
    * ChunkWriter — NaN edge-pad, LE float32, zlib, temp+atomic-rename). */
  def write(ds: Dataset[ChunkRow], root: String, varName: String = "data"): Unit = {
    val g = readGrid(root, varName)
    ChunkWriter.write(ds, s"$root/$varName", g.chunkY * g.chunkX,
      nestedKeys = false, gzipCodec = false)
  }

  /** Reopen the store through the DataSourceV2 chunk source — Zarr layout
    * is auto-detected there, so key-predicate pushdown prunes zlib chunk
    * files at plan time exactly like the raw layout (ZarrSpec asserts). */
  def read(spark: SparkSession, root: String, varName: String = "data"): Dataset[ChunkRow] = {
    import spark.implicits._
    spark.read.format("graft.zarr.ChunkStoreSource").load(root).as[ChunkRow]
  }
}
