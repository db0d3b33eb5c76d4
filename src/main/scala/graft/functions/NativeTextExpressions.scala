package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text/sketch hot paths.
  *
  * Round-1 profiling showed the three slowest queries (t4/t5/t6, 26–81s
  * at sf0.1) were all bottlenecked on INTERPRETED higher-order-function
  * lambdas (`aggregate`/`transform`/`zip_with` evaluate their lambda per
  * element through the interpreter, outside whole-stage codegen). Same
  * story for the minhash signature feeding d2/d6. Each expression here
  * keeps the hot loop in a plain static JVM method (JIT-compiled), and
  * codegen emits a single call to it — the [[SimHash64Expr]] pattern.
  *
  * All semantics are engine-independent arithmetic (or xxhash64, which
  * is already Spark-native), bit-identical to the previous HOF forms so
  * the DuckDB oracles are unchanged.
  */
object NativeTextExpressions {

  private val SPACE = UTF8String.fromString(" ")

  /** Position-weighted rolling-hash fingerprint:
    * sum_i( i * codepoint(text[i]) ), 1-based, 0 for empty text.
    * Replaces an O(n²) `transform(sequence)` + per-position `substr`.
    */
  def fingerprintCompute(s: UTF8String): Long = {
    val str = s.toString
    var sum = 0L
    var i = 0
    var pos = 1L
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      sum += pos * cp
      i += Character.charCount(cp)
      pos += 1
    }
    sum
  }

  /** Word n-grams as space-joined strings; empty when fewer than n
    * tokens. Null tokens propagate to null grams (matching the
    * `zip_with`+`concat` form).
    */
  def wordNgramsCompute(arr: ArrayData, n: Int): ArrayData = {
    val num = arr.numElements()
    val m = num - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](num)
    var i = 0
    while (i < num) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      var ok = true
      while (j < n) {
        if (toks(i + j) == null) ok = false
        parts(2 * j) = toks(i + j)
        if (j < n - 1) parts(2 * j + 1) = SPACE
        j += 1
      }
      out(i) = if (ok) UTF8String.concat(parts: _*) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  /** BPE-ish subword estimate: sum over tokens of ceil(len/4) — the
    * ~4-chars-per-BPE-token rule. Null tokens contribute nothing (the
    * documents pipeline never produces them).
    */
  def subwordEstCompute(arr: ArrayData): Long = {
    val num = arr.numElements()
    var sum = 0L
    var i = 0
    while (i < num) {
      val s = arr.getUTF8String(i)
      if (s != null) sum += (s.numChars() + 3) / 4
      i += 1
    }
    sum
  }

  /** MinHash signature: component i = min over shingles of
    * xxhash64(shingle, i) with Spark's column semantics (seed 42, the
    * string hashed first, the component index folded in after) — bit-
    * identical to the previous `aggregate`+`zip_with` accumulator.
    */
  def minhashSigCompute(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val num = arr.numElements()
    var i = 0
    while (i < num) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        var c = 0
        while (c < k) {
          val h = XxHash64Function.hash(c, IntegerType, h1)
          if (h < mins(c)) mins(c) = h
          c += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Deterministic FEATURE-HASHING text embedding: every char
    * trigram's codepoints mix through a splitmix64-style finalizer,
    * the hash picks a dimension and a ±1 sign, and the accumulated
    * vector L2-normalizes — the classic hashing-trick stand-in for a
    * learned embedding model (no model weights in this container; a
    * real deployment swaps the kernel, the Spark plumbing and every
    * consumer — semantic dedup, ANN, MIPS — is unchanged). Texts
    * shorter than 3 codepoints embed as the zero vector.
    */
  def featureHashEmbedCompute(s: UTF8String, dim: Int): ArrayData = {
    val str = s.toString
    val acc = new Array[Double](dim)
    val n = str.length
    if (n >= 3) {
      var i = 0
      var c0 = 0; var c1 = 0; var c2 = 0
      var seen = 0
      while (i < n) {
        val cp = str.codePointAt(i)
        c0 = c1; c1 = c2; c2 = cp
        seen += 1
        if (seen >= 3) {
          var h = c0 * 0x9E3779B97F4A7C15L + c1 * 0xC2B2AE3D27D4EB4FL + c2
          h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
          h ^= h >>> 27; h *= 0x94D049BB133111EBL
          h ^= h >>> 31
          val idx = ((h >>> 1) % dim).toInt
          acc(idx) += (if ((h & 1L) == 0L) 1.0 else -1.0)
        }
        i += Character.charCount(cp)
      }
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      j = 0
      while (j < dim) { acc(j) *= inv; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(acc)
  }

  /** Fraction of equal components between two equal-length signatures
    * (the minhash Jaccard estimate).
    */
  def sigMatchFracCompute(a: ArrayData, b: ArrayData): Double = {
    // Differing lengths (caller error — signatures from different k)
    // compare only the shared prefix instead of reading past the end.
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * pmod(xxhash64(p, d), 2000)/1000 - 1 with Spark's two-long column
    * hash (seed 42 folded through both) — identical to the previous
    * [[VectorFunctions.planeComponent]].
    */
  def planeComponentCompute(p: Long, d: Long): Double = {
    val h1 = XxHash64Function.hash(p, LongType, 42L)
    val h = XxHash64Function.hash(d, LongType, h1)
    val m = h % 2000L
    val pm = if (m < 0) m + 2000L else m
    pm.toDouble / 1000.0 - 1.0
  }

  /** Random-hyperplane LSH buckets, one per table: table t projects
    * onto planes [t*nPlanes, (t+1)*nPlanes) and packs the projection
    * sign bits into a long (bit p set ⇔ projection on plane p ≥ 0).
    * The (table, bucket) pair is the shuffle key for ANN candidate
    * generation — never all-pairs.
    */
  def hyperplaneBucketsCompute(vec: ArrayData, nPlanes: Int, nTables: Int): ArrayData = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) { v(d) = vec.getDouble(d); d += 1 }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bits = 0L
      var pi = 0
      while (pi < nPlanes) {
        val p = (t * nPlanes + pi).toLong
        var proj = 0.0
        d = 0
        while (d < dim) { proj += v(d) * planeComponentCompute(p, d.toLong); d += 1 }
        if (proj >= 0) bits |= (1L << pi)
        pi += 1
      }
      out(t) = bits
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Engine-independent pseudo-random hyperplane component in [-1, 1):
    * a 31-bit LCG over the (plane, dimension) pair, pure integer
    * arithmetic + a power-of-two division — every step is exact in
    * both engines, so a DuckDB oracle reproduces the buckets
    * bit-for-bit (unlike xxhash64, which DuckDB lacks).
    */
  def lcgPlaneComponent(p: Long, d: Long): Double = {
    val m = (1103515245L * (p * 131L + d) + 12345L) % 2147483648L
    m.toDouble / 1073741824.0 - 1.0
  }

  /** LCG-hyperplane LSH buckets, one per table — the oracle-
    * reproducible twin of [[hyperplaneBucketsCompute]], used where the
    * result feeds an exact-match DuckDB oracle (d5 near-dup blocking).
    */
  def lcgBucketsCompute(vec: ArrayData, nPlanes: Int, nTables: Int): ArrayData = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) { v(d) = vec.getDouble(d); d += 1 }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bits = 0L
      var pi = 0
      while (pi < nPlanes) {
        val p = (t * nPlanes + pi).toLong
        var proj = 0.0
        d = 0
        while (d < dim) { proj += v(d) * lcgPlaneComponent(p, d.toLong); d += 1 }
        if (proj >= 0) bits |= (1L << pi)
        pi += 1
      }
      out(t) = bits
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Engine-independent polynomial string hash: fold over codepoints
    * h = (h*131 + cp) mod P with P = 2^31−1 (prime). Every step fits a
    * 64-bit integer exactly (h < 2^31, ×131 < 2^39), so a DuckDB
    * `list_reduce` over `unicode(s[i])` reproduces it bit-for-bit —
    * the string-valued sibling of [[lcgPlaneComponent]], used where a
    * minhash/simhash result feeds an exact-match oracle (d2/d3).
    */
  final val POLY_P = 2147483647L

  def polyHashCompute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 131L + cp) % POLY_P
      i += Character.charCount(cp)
    }
    h
  }

  /** Oracle-reproducible minhash signature: component c = min over
    * shingles of (A_c·polyhash + B_c) mod P, an affine universal-hash
    * family with LCG-derived coefficients. Empty shingle sets emit the
    * P sentinel (no hash can reach it, and both engines agree on it).
    */
  def polyMinhashSigCompute(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, POLY_P)
    // hoist the affine coefficients out of the shingle loop: they
    // depend only on the component index, and the %-heavy recompute
    // per (shingle × component) dominated the kernel
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var c = 0
    while (c < k) {
      as(c) = (1103515245L * (c + 1) + 12345L) % POLY_P
      bs(c) = (69069L * (c + 1) + 1L) % POLY_P
      c += 1
    }
    val num = arr.numElements()
    var i = 0
    while (i < num) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = polyHashCompute(s)
        c = 0
        while (c < k) {
          val hc = (as(c) * h + bs(c)) % POLY_P
          if (hc < mins(c)) mins(c) = hc
          c += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** LSH band keys over a poly-minhash signature: band b folds its
    * `rows` components through (acc·131 + comp) mod P, seeded with
    * b+1 so distinct bands virtually never collide. Same fold both
    * engines → exact-match oracle.
    */
  def polyBandKeysCompute(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = (b + 1).toLong
      var r = 0
      while (r < rows) {
        acc = (acc * 131L + sig.getLong(b * rows + r)) % POLY_P
        r += 1
      }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Oracle-reproducible 60-bit simhash: per token the affine rehash
    * (A_b·polyhash + B_b) mod P votes bit b by its parity (+1 odd /
    * −1 even); bit b of the result is set iff its vote sum is
    * strictly positive. Token-free docs hash to 0. 60 bits (not 64)
    * keeps every derived value — the hash, 2^b terms, band slices —
    * inside a signed 64-bit integer in BOTH engines, so the DuckDB
    * oracle stays exact; four 15-bit bands give 32768 buckets per
    * band, the candidate-blocking cardinality a 100 TB corpus needs
    * (an 8-bit band would cap at 256 buckets → quadratic buckets).
    */
  // simhash affine coefficients are bit-indexed constants — computed
  // once, not per (token × bit)
  private val SimA: Array[Long] =
    Array.tabulate(60)(b => (2654435761L * (b + 1) + 101L) % POLY_P)
  private val SimB: Array[Long] =
    Array.tabulate(60)(b => (40503L * (b + 1) + 7L) % POLY_P)

  def polySimhash32Compute(toks: ArrayData): Long = {
    val votes = new Array[Int](60)
    val num = toks.numElements()
    var i = 0
    while (i < num) {
      val s = toks.getUTF8String(i)
      if (s != null) {
        val h = polyHashCompute(s)
        var b = 0
        while (b < 60) {
          if (((SimA(b) * h + SimB(b)) % POLY_P) % 2L == 1L) votes(b) += 1
          else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** Second embedding KERNEL behind the same bridge: word-unigram
    * feature hashing (whitespace tokens, xxhash64 seed 42 → dimension
    * + ±1 sign, L2-normalized). Exists to prove the "swap the kernel,
    * consumers unchanged" contract — semantic dedup / ANN / MIPS take
    * any unit-norm array<double>, so switching char-trigram →
    * word-unigram (→ a real model) is a one-line change at the embed
    * site, never in the consumers. Token-free texts embed as the zero
    * vector, same as the trigram kernel.
    */
  def unigramHashEmbedCompute(s: UTF8String, dim: Int): ArrayData = {
    val str = s.toString
    val acc = new Array[Double](dim)
    val n = str.length
    var i = 0
    var start = -1
    def feed(lo: Int, hi: Int): Unit = {
      val h = XxHash64Function.hash(
        UTF8String.fromString(str.substring(lo, hi)), StringType, 42L)
      val idx = ((h >>> 1) % dim).toInt
      acc(idx) += (if ((h & 1L) == 0L) 1.0 else -1.0)
    }
    while (i < n) {
      val ws = Character.isWhitespace(str.charAt(i))
      if (!ws && start < 0) start = i
      if (ws && start >= 0) { feed(start, i); start = -1 }
      i += 1
    }
    if (start >= 0) feed(start, n)
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      j = 0
      while (j < dim) { acc(j) *= inv; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(acc)
  }

  // ---- Column API ----

  def fingerprint64(text: Column): Column =
    GraftColumnBridge.column(Fingerprint64Expr(GraftColumnBridge.expression(text)))

  def wordNgramsNative(toks: Column, n: Int): Column =
    GraftColumnBridge.column(WordNgramsExpr(GraftColumnBridge.expression(toks), n))

  def subwordEstimate(toks: Column): Column =
    GraftColumnBridge.column(SubwordEstExpr(GraftColumnBridge.expression(toks)))

  def minhashSig(shingles: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSigExpr(GraftColumnBridge.expression(shingles), k))

  def polyMinhashSig(shingles: Column, k: Int): Column =
    GraftColumnBridge.column(PolyMinhashSigExpr(GraftColumnBridge.expression(shingles), k))

  def polyBandKeys(sig: Column, bands: Int, rows: Int): Column =
    GraftColumnBridge.column(PolyBandKeysExpr(GraftColumnBridge.expression(sig), bands, rows))

  def polySimhash32(toks: Column): Column =
    GraftColumnBridge.column(PolySimhash32Expr(GraftColumnBridge.expression(toks)))

  def featureHashEmbed(text: Column, dim: Int = 64): Column =
    GraftColumnBridge.column(FeatureHashEmbedExpr(
      GraftColumnBridge.expression(text), dim))

  def unigramHashEmbed(text: Column, dim: Int = 64): Column =
    GraftColumnBridge.column(UnigramHashEmbedExpr(
      GraftColumnBridge.expression(text), dim))

  def sigMatchFrac(a: Column, b: Column): Column =
    GraftColumnBridge.column(SigMatchFracExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def hyperplaneBuckets(vec: Column, nPlanes: Int, nTables: Int): Column =
    GraftColumnBridge.column(HyperplaneBucketsExpr(
      GraftColumnBridge.expression(vec), nPlanes, nTables))

  def lcgBuckets(vec: Column, nPlanes: Int, nTables: Int): Column =
    GraftColumnBridge.column(LcgBucketsExpr(
      GraftColumnBridge.expression(vec), nPlanes, nTables))
}

case class Fingerprint64Expr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.fingerprintCompute(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.fingerprintCompute($a);")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint64Expr =
    copy(child = newChild)
}

case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression
    with ExpectsInputTypes {
  require(n >= 2, "n-grams need n >= 2")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "word_ngrams"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.wordNgramsCompute(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.wordNgramsCompute($a, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

case class SubwordEstExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_estimate"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.subwordEstCompute(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.subwordEstCompute($a);")
  override protected def withNewChildInternal(newChild: Expression): SubwordEstExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression
    with ExpectsInputTypes {
  require(k > 0, "signature length must be positive")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.minhashSigCompute(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.minhashSigCompute($a, $k);")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class PolyMinhashSigExpr(child: Expression, k: Int) extends UnaryExpression
    with ExpectsInputTypes {
  require(k > 0, "signature length must be positive")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_minhash_sig"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.polyMinhashSigCompute(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.polyMinhashSigCompute($a, $k);")
  override protected def withNewChildInternal(newChild: Expression): PolyMinhashSigExpr =
    copy(child = newChild)
}

case class PolyBandKeysExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bands > 0 && rows > 0, "bands and rows must be positive")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_band_keys"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.polyBandKeysCompute(a.asInstanceOf[ArrayData], bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.polyBandKeysCompute($a, $bands, $rows);")
  override protected def withNewChildInternal(newChild: Expression): PolyBandKeysExpr =
    copy(child = newChild)
}

case class PolySimhash32Expr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_simhash32"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.polySimhash32Compute(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.polySimhash32Compute($a);")
  override protected def withNewChildInternal(newChild: Expression): PolySimhash32Expr =
    copy(child = newChild)
}

case class FeatureHashEmbedExpr(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0, "embedding dimension must be positive")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "feature_hash_embed"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.featureHashEmbedCompute(a.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.featureHashEmbedCompute($a, $dim);")
  override protected def withNewChildInternal(newChild: Expression): FeatureHashEmbedExpr =
    copy(child = newChild)
}

case class UnigramHashEmbedExpr(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0, "embedding dimension must be positive")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unigram_hash_embed"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.unigramHashEmbedCompute(a.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.unigramHashEmbedCompute($a, $dim);")
  override protected def withNewChildInternal(newChild: Expression): UnigramHashEmbedExpr =
    copy(child = newChild)
}

case class SigMatchFracExpr(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sig_match_frac"
  override def nullSafeEval(a: Any, b: Any): Any =
    NativeTextExpressions.sigMatchFracCompute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NativeTextExpressions.sigMatchFracCompute($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMatchFracExpr =
    copy(left = newLeft, right = newRight)
}

case class LcgBucketsExpr(child: Expression, nPlanes: Int, nTables: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nPlanes >= 1 && nPlanes <= 63, "nPlanes must fit a long's bits")
  require(nTables >= 1, "need at least one table")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lcg_buckets"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.lcgBucketsCompute(a.asInstanceOf[ArrayData], nPlanes, nTables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.lcgBucketsCompute($a, $nPlanes, $nTables);")
  override protected def withNewChildInternal(newChild: Expression): LcgBucketsExpr =
    copy(child = newChild)
}

case class HyperplaneBucketsExpr(child: Expression, nPlanes: Int, nTables: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nPlanes >= 1 && nPlanes <= 63, "nPlanes must fit a long's bits")
  require(nTables >= 1, "need at least one table")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"
  override def nullSafeEval(a: Any): Any =
    NativeTextExpressions.hyperplaneBucketsCompute(a.asInstanceOf[ArrayData], nPlanes, nTables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NativeTextExpressions.hyperplaneBucketsCompute($a, $nPlanes, $nTables);")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}
