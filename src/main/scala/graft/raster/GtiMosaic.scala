package graft.raster

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.cube.ChunkRow

/** GTI-style raster tile index — mosaic manifest sink + scan + assembly
  * (SURVEY §2.1 S3/S7; reference `build_recommended_gti` /
  * `build_gti_xarray`, flytemosaic/mosaics.py:20-113,116-175).
  *
  * The reference's contract has three parts, re-expressed Spark-first:
  *
  *  1. SINK — the tile index is a TABLE (one row per COG: VSI location,
  *     bounds, optional time) plus mosaic-level metadata (dtype, nodata,
  *     bounds, res, band count, resampling, srs) carried IN the index so
  *     readers never probe the tile files. Here: a parquet manifest (our
  *     FlatGeobuf stand-in — columnar, predicate-prunable) + `gti.json`
  *     sidecar, locations rewritten through Urls.gdalVsiLocation (F1).
  *  2. SCAN — opening the mosaic reads ONLY the manifest: `readMeta`
  *     touches the sidecar, `readIndex` the parquet; envelope pruning is a
  *     plain pushed-down bounds predicate on the index table.
  *  3. ASSEMBLY (the reference delegates this to GDAL's GTI driver) —
  *     `assemble` materializes target chunks in parallel: one task per
  *     chunk overlays every intersecting tile IN MANIFEST ORDER, so the
  *     LAST valid pixel wins (mosaics.py:46 "the last pixel will be used
  *     for overlapping pixels"; nodata never overwrites), resampling each
  *     file from its OWN affine grid (tiepoint/scale tags) to the target
  *     grid by nearest-neighbor — per-file grids may differ in resolution
  *     and origin. Scope note: grids must share the mosaic CRS; a PROJ
  *     port is out of scope, and the reference itself hands CRS warps to
  *     GDAL.
  *
  * Scale shape: the manifest is broadcast (it is metadata, ~100 B/tile);
  * chunk tasks fan out embarrassingly parallel; each task reads only the
  * files intersecting its chunk envelope.
  */
object GtiMosaic {

  final case class Meta(
      dataType: String, nodata: Double,
      minx: Double, miny: Double, maxx: Double, maxy: Double,
      resx: Double, resy: Double, bandCount: Int,
      resampling: String, srs: String) {
    def nX: Int = math.round((maxx - minx) / resx).toInt
    def nY: Int = math.round((maxy - miny) / resy).toInt
  }

  private def metaJson(m: Meta): String =
    s"""{"DATA_TYPE":"${m.dataType}","NODATA":"${if (m.nodata.isNaN) "NaN" else m.nodata}",""" +
      s""""MINX":${m.minx},"MINY":${m.miny},"MAXX":${m.maxx},"MAXY":${m.maxy},""" +
      s""""RESX":${m.resx},"RESY":${m.resy},"BAND_COUNT":${m.bandCount},""" +
      s""""RESAMPLING":"${m.resampling}","SRS":"${m.srs}"}"""

  /** S7 sink: `index` must carry (location, minx, miny, maxx, maxy) and
    * may carry time; locations are VSI-rewritten on write (F1). Row order
    * is the overlap precedence, so it is made explicit as `seq`. */
  def write(index: DataFrame, dst: String, meta: Meta): Unit = {
    require(meta.bandCount > 0 && meta.resx > 0 && meta.resy > 0)
    val withSeq = index
      .withColumn("seq", monotonically_increasing_id())
      .withColumn("location", graft.model.Urls.gdalVsiLocation(col("location")))
    withSeq.write.mode("overwrite").parquet(dst + "/index")
    Files.writeString(Paths.get(dst, "gti.json"), metaJson(meta))
  }

  /** S3 scan, metadata half: sidecar only — no tile file is opened. */
  def readMeta(dst: String): Meta = {
    val s = Files.readString(Paths.get(dst, "gti.json"))
    def str(k: String): String = s.split("\"" + k + "\":\"")(1).takeWhile(_ != '"')
    def num(k: String): Double =
      s.split("\"" + k + "\":")(1).takeWhile(c => c.isDigit || c == '-' || c == '.' || c == 'E').toDouble
    val nodata = { val v = str("NODATA"); if (v.equalsIgnoreCase("nan")) Double.NaN else v.toDouble }
    Meta(str("DATA_TYPE"), nodata, num("MINX"), num("MINY"), num("MAXX"),
      num("MAXY"), num("RESX"), num("RESY"), num("BAND_COUNT").toInt,
      str("RESAMPLING"), str("SRS"))
  }

  /** S3 scan, index half: envelope pruning = a pushed-down predicate. */
  def readIndex(spark: SparkSession, dst: String,
                env: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val idx = spark.read.parquet(dst + "/index")
    env.fold(idx) { case (x0, y0, x1, y1) =>
      idx.filter(col("minx") < x1 && col("maxx") > x0 &&
        col("miny") < y1 && col("maxy") > y0)
    }
  }

  /** Overlay assembly: materialize every target chunk intersecting `env`
    * for `band`, last-valid-pixel-wins in manifest order, per-file nearest
    * resample. `localize` maps a VSI location to a local path (tests:
    * fixture tree; production: a fetch cache). */
  def assemble(spark: SparkSession, dst: String, band: Int, chunkPx: Int,
               env: Option[(Double, Double, Double, Double)] = None)
              (localize: String => String): Dataset[ChunkRow] = {
    import spark.implicits._
    val meta = readMeta(dst)
    val tiles = readIndex(spark, dst, env)
      .select(col("seq"), col("location"), col("minx"), col("miny"),
        col("maxx"), col("maxy"))
      .as[(Long, String, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    val bTiles = spark.sparkContext.broadcast(tiles)
    val (qx0, qy0, qx1, qy1) = env.getOrElse((meta.minx, meta.miny, meta.maxx, meta.maxy))
    val cyRange = chunkRange(meta.maxy - qy1, meta.maxy - qy0, meta.resy, chunkPx, meta.nY)
    val cxRange = chunkRange(qx0 - meta.minx, qx1 - meta.minx, meta.resx, chunkPx, meta.nX)
    val chunkKeys = for (cy <- cyRange; cx <- cxRange) yield (cy, cx)
    val m = meta
    spark.createDataset(chunkKeys)
      .repartition(math.max(1, math.min(chunkKeys.size, 64)))
      .map { case (cy, cx) =>
        val data = Array.fill(chunkPx * chunkPx)(Float.NaN)
        val chx0 = m.minx + cx.toLong * chunkPx * m.resx
        val chy1 = m.maxy - cy.toLong * chunkPx * m.resy
        val chx1 = chx0 + chunkPx * m.resx
        val chy0 = chy1 - chunkPx * m.resy
        bTiles.value.foreach { case (_, loc, tx0, ty0, tx1, ty1) =>
          if (tx0 < chx1 && tx1 > chx0 && ty0 < chy1 && ty1 > chy0) {
            val bytes = Files.readAllBytes(Paths.get(localize(loc)))
            val fi = GeoTiff.info(bytes)
            val plane = GeoTiff.readBand(bytes, band)
            val (fresx, fresy) = fi.pixelScale.getOrElse((m.resx, m.resy))
            val (fx0, fy1) = fi.tiepoint.getOrElse((tx0, ty1))
            val nd = fi.nodata.getOrElse(m.nodata)
            var py = 0
            while (py < chunkPx) {
              val y = chy1 - (py + 0.5) * m.resy // target cell center
              val fr = math.floor((fy1 - y) / fresy).toInt
              if (fr >= 0 && fr < fi.height) {
                var px = 0
                while (px < chunkPx) {
                  val x = chx0 + (px + 0.5) * m.resx
                  val fc = math.floor((x - fx0) / fresx).toInt
                  if (fc >= 0 && fc < fi.width) {
                    val v = plane(fr * fi.width + fc)
                    val isNodata = if (nd.isNaN) v.isNaN else v == nd.toFloat
                    if (!isNodata) data(py * chunkPx + px) = v
                  }
                  px += 1
                }
              }
              py += 1
            }
          }
        }
        ChunkRow(0, band, cy, cx, data)
      }
  }

  /** Multi-manifest temporal mosaic — the reference's
    * `build_temporal_mosaic` (mosaics.py:217-262): one GTI per (dataset,
    * time) concatenated into a single [time, band, y, x] cube. Each input
    * manifest contributes its assembly at the given time index and band
    * offset; the result is a lazy union, so every (manifest, band) pair
    * materializes independently in parallel — the Spark twin of "open each
    * GTI lazily, concat dims, chunk by time". Manifests must share the
    * target grid (the reference's requirement too). */
  def temporalMosaic(spark: SparkSession,
                     parts: Seq[(String, Int, Int)], // (manifest dst, timeIdx, bandOffset)
                     env: Option[(Double, Double, Double, Double)] = None,
                     chunkPx: Int = 256)
                    (localize: String => String): Dataset[ChunkRow] = {
    import spark.implicits._
    require(parts.nonEmpty)
    parts.map { case (dst, timeIdx, bandOffset) =>
      val nBands = readMeta(dst).bandCount
      (0 until nBands).map { b =>
        assemble(spark, dst, b, chunkPx, env)(localize)
          .map(r => ChunkRow(timeIdx, bandOffset + r.band, r.cy, r.cx, r.data))
      }.reduce(_ union _)
    }.reduce(_ union _)
  }

  private def chunkRange(lo: Double, hi: Double, res: Double, chunkPx: Int,
                         nCells: Int): Seq[Int] = {
    val nChunks = (nCells + chunkPx - 1) / chunkPx
    val c0 = math.max(0, math.floor(lo / res / chunkPx).toInt)
    val c1 = math.min(nChunks - 1, math.ceil(hi / res / chunkPx).toInt - 1)
    c0 to c1
  }
}
