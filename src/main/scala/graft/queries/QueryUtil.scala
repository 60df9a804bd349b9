package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity helpers shared by the query modules.
  *
  * Averages whose true value can sit arbitrarily close to a rounding
  * boundary (divisor not a power of 10) must be computed identically in
  * both engines: sum as exact DECIMAL (associative, order-independent),
  * cast to double, divide, then round — the same double reaches `round`
  * on both sides, so the half-up decision is deterministic. Plain
  * `round(avg(x), 2)` is NOT safe: float summation order differs between
  * engines and can flip the rounded digit at the boundary.
  */
object QueryUtil {

  /** Engine-parity average. The sum is exact DECIMAL; the rounding is the
    * explicit `round(x·10ⁿ)/10ⁿ` form because engines disagree on
    * `round(x, n)` for doubles just below a .5 boundary (Spark rounds the
    * exact binary expansion; DuckDB scales first — scaling can land exactly
    * on .5). Writing the scaled form on BOTH sides makes the half-up
    * decision identical. */
  def safeAvg(c: Column, ndec: Int): Column = {
    val p = math.pow(10, ndec)
    round((sum(c.cast("decimal(28,6)")).cast("double") / count(c)) * lit(p)) / lit(p) + lit(0.0)
  }

  /** DuckDB SQL twin of [[safeAvg]]. The `+ 0.0` normalizes IEEE −0.0 on
    * both sides (DuckDB round() preserves the sign of negative values
    * rounding to zero; the driver hash is byte-sensitive). */
  def safeAvgSql(expr: String, ndec: Int): String = {
    val p = math.pow(10, ndec)
    s"((round((CAST(sum(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE) / count($expr)) * $p) / $p) + 0.0)"
  }

  /** Engine-parity rounded sum. Same contract as [[safeAvg]]: the partial
    * sums are exact DECIMAL, so reduction order (salted buckets, AQE
    * partition counts) cannot perturb the value that reaches `round` —
    * a bare `round(sum(double), n)` is one ulp from flipping a digit
    * whenever the engines reduce in different orders. */
  def safeSum(c: Column, ndec: Int): Column = {
    val p = math.pow(10, ndec)
    round(sum(c.cast("decimal(28,6)")).cast("double") * lit(p)) / lit(p) + lit(0.0)
  }

  /** DuckDB SQL twin of [[safeSum]] (signed-zero normalized like
    * [[safeAvgSql]]). */
  def safeSumSql(expr: String, ndec: Int): String = {
    val p = math.pow(10, ndec)
    s"((round(CAST(sum(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE) * $p) / $p) + 0.0)"
  }
}
