package graft.model

import java.sql.Timestamp

/** Core task-IO records (SURVEY §1.1; mirrors reference
  * flytemosaic/datasets/protocols.py:16-22 and flyte/build.py:45-50,115-118).
  * Plain case classes → Spark product encoders; these cross executor
  * boundaries, so they stay primitive-typed and schema-stable.
  */
final case class TileDateUrl(tile_id: String, time: Timestamp, url: String, feature: String)

/** Axis-aligned envelope in CRS units (the reference's tile grid is
  * axis-aligned 1°×1° boxes — glad.py:39-47 — so an envelope is the whole
  * geometry model needed for its spatial predicates). */
final case class Envelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def intersects(o: Envelope): Boolean =
    xmin <= o.xmax && o.xmin <= xmax && ymin <= o.ymax && o.ymin <= ymax
}

/** One tile of the spatial dimension table. */
final case class Tile(tile_id: String, xmin: Double, ymin: Double, xmax: Double, ymax: Double)

/** Dense-cube grid descriptor (SURVEY §1.3): dims are [time, band, y, x],
  * the chunk is the physical storage unit (reference default 2048×2048×1×1,
  * flyte/build.py:187). */
final case class GridDef(
    nTime: Int, nBand: Int, nY: Int, nX: Int,
    chunkY: Int, chunkX: Int, itemBytes: Int) {
  require(chunkY > 0 && chunkX > 0 && itemBytes > 0)
  def chunksY: Int = (nY + chunkY - 1) / chunkY
  def chunksX: Int = (nX + chunkX - 1) / chunkX
  def bytesPerChunk: Long = chunkY.toLong * chunkX * itemBytes
}

/** A contiguous [start, stop) region per dim — the unit of parallel array
  * writes (reference GTIPartition, flyte/build.py:115-118; start/stop kept
  * as primitive ints for serializability, mosaics.py:262-266). */
final case class Region(
    time0: Int, time1: Int, band0: Int, band1: Int,
    y0: Int, y1: Int, x0: Int, x1: Int) {
  def cells: Long =
    (time1 - time0).toLong * (band1 - band0) * (y1 - y0) * (x1 - x0)
}
