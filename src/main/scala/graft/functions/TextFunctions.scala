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
    * Native expression (a char-level HOF fold costs one interpreted lambda
    * dispatch per character). Identical in DuckDB:
    * list_reduce(list_transform(split(s,''), x -> ascii(x)::BIGINT),
    *   (a,b) -> (a*31+b) % 4294967296). */
  def polyHash(s: Column): Column = HashExpressions.polyHash32(s)

  /** Distinct shingle hashes for a document — MinHash input. */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(transform(shingles(tokens(text), k), s => polyHash(s)))

  private val MinhashPrime = 4294967291L // largest prime < 2^32

  /** n-permutation MinHash signature over shingle hashes — native
    * expression (HashExpressions.MinHashSig): the HOF formulation costs an
    * interpreted lambda dispatch per (element × permutation). Permutation
    * j: h ↦ ((2j+1)·h + j² + 7) mod P; empty docs → empty signature. */
  def minhashSignature(hs: Column, n: Int): Column =
    HashExpressions.minhashSig(hs, n)

  /** 48-bit SimHash from shingle hashes (bit i set iff the +1/−1 vote over
    * hashes' bit i is positive; MSB-first assembly keeps the value in
    * BIGINT on both engines). Native expression, same rationale. */
  def simhash48(hs: Column): Column =
    HashExpressions.simhash48(hs)

  /** Count of tokens from `words` present in ws. */
  def stopwordCount(ws: Column, words: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(words)))

  /** Chars of `t` matching regex class `pat` (e.g. "\\p{IsLatin}",
    * "[0-9]"), by strip-length difference — two codegen'd builtins, no
    * per-char explode. DuckDB twin:
    * len(t) - len(regexp_replace(t, pat, '', 'g')) (RE2 spells scripts
    * \p{Latin} where Java spells \p{IsLatin}). */
  def charClassCount(t: Column, pat: String): Column =
    (length(t) - length(regexp_replace(t, pat, ""))).cast("bigint")

  /** BPE-ish token count: runs of alnum OR single non-alnum-non-space. */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Engine-parity rounding to `ndec` decimals (see QueryUtil.safeAvg).
    * The `+ 0.0` normalizes IEEE −0.0 to +0.0, mirroring
    * DuckSql.roundpSql — the byte-sensitive correctness hash treats the
    * two zero bit patterns as different values. */
  def roundp(c: Column, ndec: Int): Column = {
    val p = math.pow(10, ndec)
    round(c * lit(p)) / lit(p) + lit(0.0)
  }
}
