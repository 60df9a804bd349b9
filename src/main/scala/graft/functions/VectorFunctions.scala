package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (similarity search substrate).
  *
  * `dotSeq` folds strictly left-to-right in DOUBLE — bit-identical to the
  * DuckDB twin `list_reduce(list_transform(range(1, n+1),
  * i -> a[i]::DOUBLE * b[i]::DOUBLE), (x,y) -> x+y)` — so cosine scores are
  * oracle-comparable without tolerance. At production scale the same shape
  * compiles to whole-stage codegen; a native Expression with a fused loop
  * (or float4 SIMD via Gandiva-style kernels) is the drop-in upgrade.
  */
object VectorFunctions {

  /** Sequential-order double dot product (oracle-parity form). */
  def dotSeq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dotSeq(a, a))

  def cosine(a: Column, b: Column): Column =
    dotSeq(a, b) / (norm(a) * norm(b))
}
