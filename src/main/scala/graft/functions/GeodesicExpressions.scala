package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, QuaternaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Geodesic kernels (PUBLIC for Janino, same convention as HashKernels). */
object GeoDistKernels {
  /** WGS84 geodesic distance in metres — Vincenty (~0.5 mm) outside the
    * ~0.55° nearly-antipodal cap, Newton-shooting on the direct solution
    * inside it (Geodesic.inverseTotal), so the function converges
    * EVERYWHERE like PROJ/geographiclib; NaN only if every solver seed
    * fails (not observed — the documented fail-soft, never a silent
    * spherical approximation). */
  def geodesicM(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    graft.raster.Geodesic.distanceTotal(graft.raster.Datum.WGS84, lon1, lat1, lon2, lat2)
      .getOrElse(Double.NaN)
}

/** `graft_geodesic_m(lon1, lat1, lon2, lat2)` → DOUBLE metres on the WGS84
  * ellipsoid — the great-circle-distance-done-right a geo user reaches for
  * (the spherical haversine is off by up to ~0.5% on Earth). Codegen'd,
  * null-preserving. */
case class GeodesicMeters(lon1: Expression, lat1: Expression,
                          lon2: Expression, lat2: Expression)
    extends QuaternaryExpression {
  override def first: Expression = lon1
  override def second: Expression = lat1
  override def third: Expression = lon2
  override def fourth: Expression = lat2
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_geodesic_m expects 4 DOUBLEs, got ${children.map(_.dataType.sql)}")
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoDistKernels.geodesicM(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.GeoDistKernels.geodesicM($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): GeodesicMeters =
    copy(lon1 = a, lat1 = b, lon2 = c, lat2 = d)
}

object GeodesicFunctions {
  def geodesicMeters(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    Bridge.column(GeodesicMeters(
      Bridge.expression(lon1.cast("double")), Bridge.expression(lat1.cast("double")),
      Bridge.expression(lon2.cast("double")), Bridge.expression(lat2.cast("double"))))
}
