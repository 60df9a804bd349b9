package graft.plan

import graft.model.{GridDef, Region}

/** Byte-budget region planner (SURVEY §2.6 O8) — plan-time port of the
  * reference's `build_mosaic_chunk_partitions` (mosaics.py:232-303), which
  * partitions a [time, band, y, x] cube into integer-multiple-of-chunk
  * regions of ≤ budget bytes for fan-out writes.
  *
  * Semantics preserved:
  *  - a region always spans the full requested band run and one time chunk;
  *  - x/y grow together (n² steps: 1×, 4×, 9×, …), multiplier =
  *    max(1, floor(sqrt(budget / bytesPerChunk)));
  *  - boundaries are cumsum of (scaled) chunk sizes clipped at the dim size,
  *    so edge regions may be smaller;
  *  - the selected band labels must be contiguous in the cube's band index.
  *
  * Driver-side code by design (the reference runs it on one node too): the
  * output is a few thousand Region rows at most — parallelism comes from
  * distributing the *regions*, not from planning them.
  */
object RegionPlanner {

  /** Plan regions for a band-label selection (validates contiguity like
    * mosaics.py:295-297). */
  def planRegions(grid: GridDef, budgetBytes: Long, allBands: Seq[String],
                  bands: Seq[String], timeChunk: Int = 1): Seq[Region] = {
    val idx = bands.map { b =>
      val i = allBands.indexOf(b)
      require(i >= 0, s"unknown band $b")
      i
    }
    if (idx != (idx.head to idx.last).toList)
      throw new IllegalArgumentException("Band indices are not contiguous")
    planBandRange(grid, budgetBytes, idx.head, idx.last + 1, timeChunk)
  }

  /** Plan regions for a contiguous [band0, band1) range. */
  def planBandRange(grid: GridDef, budgetBytes: Long, band0: Int, band1: Int,
                    timeChunk: Int = 1): Seq[Region] = {
    require(band0 >= 0 && band1 <= grid.nBand && band0 < band1)
    val nBands = band1 - band0
    val bytesPerChunk =
      nBands.toLong * timeChunk * grid.chunkY * grid.chunkX * grid.itemBytes
    val m = math.max(1L, math.floor(math.sqrt((budgetBytes / bytesPerChunk).toDouble)).toLong).toInt
    val cy = grid.chunkY * m
    val cx = grid.chunkX * m

    def bounds(size: Int, step: Int): Seq[(Int, Int)] =
      (0 until size by step).map(s => (s, math.min(s + step, size)))

    for {
      (t0, t1) <- bounds(grid.nTime, timeChunk)
      (y0, y1) <- bounds(grid.nY, cy)
      (x0, x1) <- bounds(grid.nX, cx)
    } yield Region(t0, t1, band0, band1, y0, y1, x0, x1)
  }
}
