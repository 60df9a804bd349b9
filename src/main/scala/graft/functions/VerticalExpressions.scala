package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import graft.raster.Proj4

/** Vertical-datum kernels (PUBLIC for Janino, same convention as
  * HashKernels). The compiled vertical model is cached per-CRS-string
  * per JVM — each executor compiles once and re-reads the geoid grid
  * from its own filesystem, so on a multi-node cluster the grid path
  * must resolve on every executor (shared storage), exactly like
  * `+nadgrids`. The driver-side constructor has already validated the
  * string, so a cache miss here is an environment error (grid readable
  * on the driver but not the executor) and fails the task loudly rather
  * than emitting a silently unshifted height. */
object VerticalKernels {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Proj4.CompiledVertical]()

  private def compiled(crs: String): Proj4.CompiledVertical = {
    val v = cache.computeIfAbsent(crs,
      s => Proj4.parse3(s).flatMap(_._2).orNull)
    if (v == null)
      throw new IllegalStateException(
        s"vertical model failed to compile on this executor (grid file " +
          s"unreadable here?): $crs")
    v
  }

  def toMeters(crs: String, lon: Double, lat: Double, z: Double): Double =
    compiled(crs).toMeters(lon, lat, z)

  def fromMeters(crs: String, lon: Double, lat: Double, z: Double): Double =
    compiled(crs).fromMeters(lon, lat, z)
}

/** `graft_vertical_m(lon, lat, z)` for a fixed CRS — the distributed
  * consumer of [[Proj4.parse3]]'s vertical half: z in the CRS's vertical
  * units (orthometric when the CRS carries `+geoidgrids`) ↔ WGS84
  * ellipsoidal meters, per row, inside whole-stage codegen. The DEM
  * normalization a mosaic of mixed-vertical-datum elevation tiles needs
  * before pixels are comparable (the reference absorbs this via
  * GDAL/PROJ — flytemosaic/mosaics.py:44-50 accepts per-file CRSs).
  * Null-preserving; out-of-grid-coverage rows pass through unshifted
  * (the [[Proj4.CompiledVertical]] contract). */
case class VerticalMeters(lon: Expression, lat: Expression, z: Expression,
                          crs: String, invert: Boolean)
    extends TernaryExpression {
  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = z
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vertical_m expects 3 DOUBLEs, got ${children.map(_.dataType.sql)}")
  private def kernel: String = if (invert) "fromMeters" else "toMeters"
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    if (invert)
      VerticalKernels.fromMeters(crs, a.asInstanceOf[Double],
        b.asInstanceOf[Double], c.asInstanceOf[Double])
    else
      VerticalKernels.toMeters(crs, a.asInstanceOf[Double],
        b.asInstanceOf[Double], c.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val crsRef = ctx.addReferenceObj("crs", crs, "java.lang.String")
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.VerticalKernels.$kernel($crsRef, $a, $b, $c)")
  }
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): VerticalMeters =
    copy(lon = a, lat = b, z = c)
}

object VerticalFunctions {

  private def build(crs: String, lon: Column, lat: Column, z: Column,
                    invert: Boolean): Column = {
    // fail at PLAN time, not NaN at runtime: the string must parse AND
    // declare a vertical model (a 2-D CRS here is a caller bug)
    require(Proj4.parse3(crs).exists(_._2.nonEmpty),
      s"CRS has no vertical model (or failed to parse): $crs")
    Bridge.column(VerticalMeters(
      Bridge.expression(lon.cast("double")),
      Bridge.expression(lat.cast("double")),
      Bridge.expression(z.cast("double")), crs, invert))
  }

  /** z in `crs` vertical units (orthometric under `+geoidgrids`) →
    * WGS84 ellipsoidal meters at (lon, lat) WGS84 degrees. */
  def toEllipsoidalMeters(crs: String, lon: Column, lat: Column,
                          z: Column): Column =
    build(crs, lon, lat, z, invert = false)

  /** WGS84 ellipsoidal meters → z in `crs` vertical units. */
  def fromEllipsoidalMeters(crs: String, lon: Column, lat: Column,
                            z: Column): Column =
    build(crs, lon, lat, z, invert = true)
}
