package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector + hash-sketch primitives (SURVEY.md §2.D/E).
  *
  * Composed from `zip_with` / `aggregate` / `transform` higher-order
  * functions — codegen'd, shuffle-free, and with a deterministic
  * left-to-right summation order (important for cross-engine FP
  * parity with the DuckDB oracle).
  */
object VectorFunctions {

  /** array<float> → array<double> via a native Cast (codegen'd; a
    * `transform` lambda here would be interpreted), so all arithmetic
    * runs in f64 in both engines. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Native codegen'd dot product — see [[DotProductExpr]]. Children
    * must already be array<double>. */
  def dot(a: Column, b: Column): Column = NativeVectorExpressions.vectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** MinHash signature (k components) over a string-array column.
    * Component i = min over shingles of xxhash64(shingle, i) — xxhash64
    * is a native codegen'd Catalyst expression, no UDF.
    *
    * Single `aggregate` pass with a k-wide running-min accumulator —
    * NOT transform-per-seed, which re-evaluates the `shingles`
    * expression k times per row once projection collapse inlines the
    * upstream tokenize/shingle pipeline (a 16× blow-up in practice).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    aggregate(
      shingles,
      array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (m, i) => least(m, xxhash64(s, i))))

  /** Banded LSH keys for a minhash signature: `bands` keys, each
    * hashing `rowsPerBand` consecutive signature components plus the
    * band index (so bands don't collide with each other).
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** Estimated Jaccard from two minhash signatures: fraction of equal
    * components. */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), _ + _).cast("double") / size(sigA)

  /** SimHash as a 64-element 0/1 bit array: per-token xxhash64, ±1 vote
    * per bit (bit j of the token hash), sign of the vote sum → bit.
    * Kept as an array (not packed) so hamming/banding stay pure
    * higher-order-function compositions.
    */
  def simhashBits(toks: Column): Column = {
    val votes = aggregate(
      transform(toks, t => xxhash64(t)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        // literal shift amounts: bit j of the token hash as a ±1 vote
        array((0 until 64).map(j =>
          when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))): _*),
        (a, v) => a + v))
    transform(votes, s => when(s > 0, 1).otherwise(0))
  }

  /** Hamming distance between two simhash bit arrays. */
  def hammingBits(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0), _ + _)

  /** 16-bit band `k` (0..3) of a simhash bit array, hashed to a key —
    * near-dups within hamming distance ≤ 3 share at least one band.
    */
  def simhashBandKey(bits: Column, k: Int): Column =
    xxhash64(slice(bits, 16 * k + 1, 16), lit(k))

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * plane p, dimension d — engine-independent arithmetic on xxhash64.
    */
  def planeComponent(p: Column, d: Column): Column =
    (pmod(xxhash64(p, d), lit(2000L)).cast("double") / lit(1000.0)) - lit(1.0)

  /** Random-hyperplane LSH bucket: the sign-bit vector of `nPlanes`
    * projections, hashed to a single long key.
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int): Column = {
    val signs = transform(sequence(lit(0), lit(nPlanes - 1)), p => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * planeComponent(p.cast("long"), d.cast("long"))),
        lit(0.0), _ + _)
      when(proj >= 0, 1).otherwise(0)
    })
    xxhash64(signs)
  }
}
