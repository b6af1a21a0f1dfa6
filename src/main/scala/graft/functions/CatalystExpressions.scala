package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row/per-pair paths where
  * the built-in higher-order functions (`aggregate`, `zip_with`,
  * `transform`) are interpreted per lambda call and dominate the bench
  * (SURVEY.md §4: "custom Expression … is a bench upgrade").
  *
  * Numeric note: `DotProduct` folds left-to-right exactly like
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0d, _+_)` and DuckDB's
  * `list_dot_product`, so query results stay bit-identical to the oracle.
  */
object GraftExpressions {
  /** Sequential-fold dot product over two double arrays (whole-stage
    * codegen; the per-pair path of the similarity joins).
    */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a.cast("array<double>")),
      ExpressionUtils.expression(b.cast("array<double>"))))

  /** |A ∩ B| for two string arrays each sorted + deduplicated by the
    * caller (once per row, upstream of the pair join) — merge-counts
    * without materializing the intersection array.
    */
  def intersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayIntersectSize(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** One-pass MinHash: struct(sig: array<long>, bands: array<long>) from a
    * token array — numHashes hash functions, banded into numBands buckets.
    */
  def minhashBands(toks: Column, numHashes: Int, numBands: Int): Column =
    ExpressionUtils.column(MinHashBands(ExpressionUtils.expression(toks), numHashes, numBands))

  /** First index i where a(i) == b(i), else -1 (LSH first-matching-band
    * dedup: emit a colliding pair only from its first shared band).
    */
  def firstMatchIndex(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayFirstMatchIndex(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Sorted distinct character k-gram shingles of a string — one pass,
    * feeding ArrayIntersectSize's sorted-merge contract directly.
    */
  def charShingles(text: Column, k: Int): Column =
    ExpressionUtils.column(CharShingles(ExpressionUtils.expression(text), k))
}

/** dot(a, b) = Σ a_i * b_i, folded left-to-right (see GraftExpressions).
  * Inputs must be equal-length arrays of non-null doubles (the embeddings
  * fixture guarantees both; extra elements on the longer side are ignored).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // Input typing is enforced by GraftExpressions.dotProduct's casts
  // (ExpectsInputTypes would need the package-private AbstractDataType).
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
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
  */
case class ArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  /** Pure function, deliberately flagged non-deterministic as an
    * optimizer barrier: predicate pushdown otherwise inlines the Jaccard
    * filter into the join residual and the projection, re-running this
    * merge scan 3× per pair (visible in the sf0.1 plan). The flag only
    * stops Catalyst from DUPLICATING/moving the call — the value is
    * stable, so results are unchanged.
    */
  override lazy val deterministic: Boolean = false

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
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

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sorted distinct character k-gram shingles, one pass over the string —
  * replaces `array_sort(array_distinct(transform(sequence(...),
  * substring)))`, whose interpreted lambdas and CollapseProject
  * duplication dominate shingle-based near-dup. TreeSet ordering is
  * UTF8String binary order — identical to `array_sort`, as
  * ArrayIntersectSize's merge requires. Char (codepoint) indexing matches
  * SQL `substr` semantics on both engines.
  */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Pure; flagged as an optimizer barrier (see ArrayIntersectSize). */
  override lazy val deterministic: Boolean = false

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val n = text.numChars()
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i + k <= n) { set.add(text.substring(i, i + k)); i += 1 }
    new GenericArrayData(set.toArray())
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** First position where two long arrays agree, -1 if none — evaluated per
  * band-collision row, so a tight loop instead of an interpreted
  * zip_with/exists chain.
  */
case class ArrayFirstMatchIndex(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature + LSH band hashes in ONE pass over the token array:
  * sig_i = min over tokens of xxhash64(token, seed=i); band_b chains the
  * xxhash64 of its signature slice with seed b. The built-in
  * `transform(sequence(...), ...)` form re-evaluates the whole signature
  * per band through CollapseProject (measured 16× recompute at sf0.1);
  * this expression computes everything once per row.
  */
case class MinHashBands(child: Expression, numHashes: Int, numBands: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes % numBands == 0, "numBands must divide numHashes")

  /** Pure, but flagged non-deterministic as an optimizer barrier (see
    * ArrayIntersectSize): otherwise CollapseProject inlines the struct
    * fields (2× full recompute) and InferFiltersFromGenerate clones the
    * whole signature computation into posexplode null-guards that are
    * pushed below the repartition — 3 more single-partition recomputes.
    */
  override lazy val deterministic: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("bands", ArrayType(LongType, containsNull = false))))

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
