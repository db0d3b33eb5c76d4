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
    * Component i = min over shingles of xxhash64(shingle, i). Native
    * codegen'd expression ([[MinHashSigExpr]]): one shingle pass with a
    * k-wide running-min array in a plain JVM loop — bit-identical to
    * (and ~30× faster than) the previous interpreted `aggregate`
    * accumulator.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    NativeTextExpressions.minhashSig(shingles, k)

  /** Banded LSH keys for a minhash signature: `bands` keys, each
    * hashing `rowsPerBand` consecutive signature components plus the
    * band index (so bands don't collide with each other).
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** Estimated Jaccard from two minhash signatures: fraction of equal
    * components. Native ([[SigMatchFracExpr]]). */
  def estJaccard(sigA: Column, sigB: Column): Column =
    NativeTextExpressions.sigMatchFrac(sigA, sigB)

  /** 64-bit SimHash packed into a long — native expression
    * ([[SimHash64Expr]]): the per-token ±1 vote loop runs as a plain
    * JVM loop inside codegen, not interpreted lambdas.
    */
  def simhash64(toks: Column): Column = NativeVectorExpressions.simhash64(toks)

  /** Hamming distance between two packed simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 16-bit band `k` (0..3) of a packed simhash — near-dups within
    * hamming distance ≤ 3 share at least one band.
    */
  def simhashBand64(sim: Column, k: Int): Column =
    shiftright(sim, 16 * k).bitwiseAND(lit(0xFFFFL))

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
