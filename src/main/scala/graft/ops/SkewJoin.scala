package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted shuffle join for skewed keys.
  *
  * A plain equi-join hashes every row of a hot key to ONE reducer — at
  * 100 TB a single viral key stalls the stage (AQE's skew split only
  * helps sort-merge paths it can detect post-shuffle). Salting fixes the
  * layout a priori: the big (skewed) side adds a deterministic salt in
  * [0, buckets) hashed from the whole row, the small side replicates each
  * row `buckets`×, and the join key becomes (key, salt) — a hot key now
  * spreads over `buckets` reducers. Row multiset of the result is
  * IDENTICAL to the plain join (each big-side row meets exactly the one
  * replica carrying its salt), which is what the q98 oracle checks.
  *
  * Replication multiplies the small side `buckets`× — use only when the
  * small side is modest (dim-table scale) but too big or too dynamic to
  * broadcast outright.
  */
object SkewJoin {

  /** Inner equi-join of skewed `big` against replicated `small` on
    * `key`. Salt is derived from the big row's full content (xxhash64) —
    * deterministic, no RNG, rerun-stable. */
  def inner(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 1024)
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(lit((0 until buckets).toArray)))
    salted.join(replicated.hint("SHUFFLE_HASH"), Seq(key, "_salt"))
      .drop("_salt")
  }
}
