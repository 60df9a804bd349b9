package graft.queries

/** Shared DuckDB SQL fragments mirroring graft.functions.TextFunctions /
  * VectorFunctions exactly (see the parity notes there). Keeping the SQL
  * twins next to a single builder prevents per-query drift. */
object DuckSql {

  /** tokens(text): lowercase whitespace split, empties dropped. */
  val tokensSql: String =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> len(w) > 0)"

  /** shingles(ws, k) for a `ws` list-typed SQL expr. */
  def shinglesSql(ws: String, k: Int): String =
    s"CASE WHEN len($ws) >= $k THEN list_distinct(list_transform(" +
      s"range(1, len($ws) - ${k - 1} + 1), i -> array_to_string(($ws)[i:i+${k - 1}], ' '))) " +
      "ELSE [] END"

  /** polyHash(s): identical fold — list_reduce's first-element-init equals
    * the 0-init fold because 0*31 + c == c. */
  def polyHashSql(s: String): String =
    s"list_reduce(list_transform(split($s, ''), x -> ascii(x)::BIGINT), " +
      "(a, b) -> (a * 31 + b) % 4294967296)"

  /** Distinct shingle hashes. */
  def shingleHashesSql(ws: String, k: Int): String =
    s"list_distinct(list_transform(${shinglesSql(ws, k)}, s -> ${polyHashSql("s")}))"

  /** simhash48(hs): ±1 votes are integers, so order-free list_sum matches
    * Spark's sequential fold exactly. Bit i contributes 2^(47-i) (matches
    * the acc*2+b MSB-first assembly). */
  def simhash48Sql(hs: String): String =
    s"list_sum(list_transform(range(0, 48), i -> " +
      s"(CASE WHEN list_sum(list_transform($hs, " +
      "h -> CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
      "THEN 1::BIGINT ELSE 0::BIGINT END) << (47 - i)))"

  /** Sequential double dot product — bit-identical to VectorFunctions.dotSeq
    * (list_reduce first-element init == 0.0 + x). */
  def dotSeqSql(a: String, b: String, n: Int): String =
    s"list_reduce(list_transform(range(1, ${n + 1}), " +
      s"i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE), (x, y) -> x + y)"

  def cosineSql(a: String, b: String, n: Int): String =
    s"(${dotSeqSql(a, b, n)} / (sqrt(${dotSeqSql(a, a, n)}) * sqrt(${dotSeqSql(b, b, n)})))"

  /** roundp twin. The trailing `+ 0.0` normalizes IEEE signed zero:
    * DuckDB's round() preserves the sign of a negative value rounding to
    * zero (−0.0) while Spark's BigDecimal-backed round returns +0.0, and
    * the driver's correctness hash is byte-sensitive, so without the
    * normalization the two engines hash-differ on cells that compare
    * numerically equal (−0.0 + 0.0 = +0.0 under round-to-nearest; every
    * other value is unchanged). Mirrored in TextFunctions.roundp. */
  def roundpSql(x: String, ndec: Int): String = {
    val p = math.pow(10, ndec)
    s"((round(($x) * $p) / $p) + 0.0)"
  }

  /** Hyperplane-LSH bucket twin of HashKernels.hyperplaneSigs for table
    * `tbl` (a SQL expr): nPlanes sign bits packed MSB-first into a BIGINT.
    * The LCG component for (t, plane p, dim d) is
    * ((1103515245·idx + 12345) mod 2³¹)/2³¹ − 0.5 with
    * idx = (31t+1)·nPlanes·nDims + p·nDims + d; the projection is the
    * SEQUENTIAL double sum over dims (list_reduce first-element init ==
    * the kernel's 0.0-init fold), so sign bits — and therefore buckets —
    * are bit-identical across engines. */
  def lshBucketSql(vec: String, tbl: String, nPlanes: Int, nDims: Int): String =
    s"list_reduce(list_transform(range(0, $nPlanes), p -> CASE WHEN " +
      s"list_reduce(list_transform(range(0, $nDims), d -> ($vec)[d+1]::DOUBLE * " +
      s"(((1103515245 * ((($tbl)*31+1)*${nPlanes.toLong * nDims} + p*$nDims + d) + 12345) " +
      s"% 2147483648)::DOUBLE / 2147483648.0 - 0.5)), (x, y) -> x + y) > 0 " +
      "THEN 1::BIGINT ELSE 0::BIGINT END), (a, b) -> a * 2 + b)"
}
