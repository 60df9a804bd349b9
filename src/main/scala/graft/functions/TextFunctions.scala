package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/hash column functions for the LLM-data-pipeline operators
  * (dedup, fingerprinting, language-ID, quality, token stats).
  *
  * Everything here is built from Spark higher-order functions — codegen'd,
  * no UDFs, so the 100 TB path is one scan + expression evaluation.
  *
  * Hash parity note: `polyHash` is a 32-bit polynomial rolling hash chosen
  * because the *identical* arithmetic is expressible in ANSI-ish SQL
  * (DuckDB `list_reduce`), which makes MinHash/SimHash pipelines
  * oracle-checkable end-to-end. At production scale you would swap it for
  * `xxhash64` (one codegen'd call, no char explode) — the pipeline shape is
  * unchanged; see Dedup.minhashSignature's `fast` flag.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)

  /** Word k-shingles as strings ("w1 w2 w3"), deduplicated.
    * Mirrors: list_distinct(list_transform(range(1, len(ws)-k+2),
    *   i -> array_to_string(ws[i:i+k-1], ' '))). */
  def shingles(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      array_distinct(transform(sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", slice(ws, i, lit(k))))))
      .otherwise(array().cast("array<string>")) // sequence(1, n<1) would count DOWN

  /** 32-bit polynomial rolling hash: h = fold(chars, 0, h*31 + code) mod 2³².
    * Identical in DuckDB: list_reduce(list_transform(split(s,''),
    *   x -> ascii(x)::BIGINT), (a,b) -> (a*31+b) % 4294967296). */
  def polyHash(s: Column): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % lit(4294967296L))

  /** Distinct shingle hashes for a document — MinHash input. */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(transform(shingles(tokens(text), k), s => polyHash(s)))

  private val MinhashPrime = 4294967291L // largest prime < 2^32

  /** n-permutation MinHash signature over shingle hashes.
    * Permutation j: h ↦ ((2j+1)·h + j² + 7) mod P. Null/empty-safe: empty
    * docs get an empty signature. */
  def minhashSignature(hs: Column, n: Int): Column =
    when(size(hs) > 0,
      transform(sequence(lit(0), lit(n - 1)),
        j => array_min(transform(hs,
          h => ((lit(2) * j + 1) * h + j * j + lit(7)) % lit(MinhashPrime)))))
      .otherwise(array().cast("array<bigint>"))

  /** 48-bit SimHash from shingle hashes (bit i set iff the +1/−1 vote over
    * hashes' bit i is positive). 48 bits keeps the `Σ bit·2ⁱ` assembly well
    * inside BIGINT on both engines. */
  def simhash48(hs: Column): Column = {
    val bits = array((0 until 48).map { i =>
      when(
        aggregate(hs, lit(0L),
          (acc, h) => acc + when(shiftright(h, i) % 2 === 1, 1L).otherwise(-1L))
          > 0, lit(1L)).otherwise(lit(0L))
    }: _*)
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** Count of tokens from `words` present in ws. */
  def stopwordCount(ws: Column, words: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(words)))

  /** BPE-ish token count: runs of alnum OR single non-alnum-non-space. */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Engine-parity rounding to `ndec` decimals (see QueryUtil.safeAvg). */
  def roundp(c: Column, ndec: Int): Column = {
    val p = math.pow(10, ndec)
    round(c * lit(p)) / lit(p)
  }
}
