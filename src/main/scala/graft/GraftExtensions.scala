package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProductF32

/** Engine extension point — registers graft's native expressions with the
  * session so they are usable from SQL as well as the Column API:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * Injection keeps the engine a library: no fork of Spark, standard
  * `spark.sql.extensions=graft.GraftExtensions` deployment on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {
  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductF32].getName, "graft_dot"),
    (args: Seq[Expression]) => DotProductF32(args(0), args(1)))

  /** Imperative registration for an existing session (tests, Verify). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    registry.registerFunction(dotFunction._1, dotFunction._2, dotFunction._3)
  }
}
