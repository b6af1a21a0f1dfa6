package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** PCA over the embedding corpus — the whitening/compression step ahead
  * of clustering and semantic dedup (SemDeDup §4 runs k-means in a
  * PCA-reduced space at scale).
  *
  * Split to match Spark's execution model:
  *   - the COVARIANCE accumulation is the distributed stage: each row
  *     expands in-row to its 2080 upper-triangle (i, j, x·y) products
  *     (no self-join — the pair stream never shuffles corpus×corpus,
  *     and map-side partial aggregation reduces every partition to
  *     ≤ 2080 rows before the one shuffle on the (i, j) key);
  *   - the EIGENDECOMPOSITION runs on the driver over the 64×64 matrix
  *     — bounded model state by contract (the k-means-centroid rule),
  *     via a deterministic cyclic Jacobi solver (no native LAPACK — the
  *     same arithmetic on every platform, sign-fixed eigenvectors, so
  *     reruns are bit-identical; spec-pinned);
  *   - the PROJECTION is map-only again: the k×64 basis folds into
  *     dot-product expressions against a broadcast basis frame.
  *
  * Grading: the covariance frame is ORACLE-EXACT (DuckDB recomputes
  * Σxy/Σx/n independently); the eigenbasis itself has no SQL twin, so
  * its correctness is gated two ways — PcaSpec verifies A·v = λ·v,
  * orthonormality, and descending order directly, and `q_pca_check` is
  * an oracle-graded NORM-PRESERVATION frame: ‖Vᵀv‖² re-derived through
  * the full 64-component projection must hash-match DuckDB's ‖v‖² from
  * the raw parquet — a non-orthonormal or mass-dropping basis fails the
  * driver's hash gate, not just a spec.
  */
object Pca {
  import graft.functions.GraftExpressions.dotProduct
  type Q = (SparkSession, String) => DataFrame

  val Dim = 64
  val TopK = 8

  private def vec(c: Column): Column = transform(c, x => x.cast("double"))

  // -------------------------------------------- single-pass moment kernel
  // (r17 optimization) The covariance accumulation used to expand each row
  // in-row to its 2080 (i, j, x·y) structs and push rows × 2080 through a
  // HashAggregate; the CovMomentsAgg fold produces the same 2145 sums in
  // one tight per-row loop with a single buffer row per partition crossing
  // the exchange (guide §2.3: aggregate before you shuffle / shuffle fewer
  // bytes). Plan shape: 4 stages + 2 exchanges → 2 stages + 1 exchange,
  // and the per-row work drops from 2080 struct allocations + hash probes
  // to 2080 multiply-adds. Values land on the same 6-decimal rounding
  // grid (fold-order float drift ~1e-13, documented in finalize).
  private val MomentPairs = Dim * (Dim + 1) / 2

  private lazy val covMomentsUdaf =
    org.apache.spark.sql.functions.udaf(new graft.functions.CovMomentsAgg(Dim))

  /** 0-based (i, j) lookup tables for the flat upper-triangle index. */
  private lazy val (momI, momJ): (Seq[Int], Seq[Int]) = {
    val is = new Array[Int](MomentPairs); val js = new Array[Int](MomentPairs)
    var t = 0
    for (i <- 0 until Dim; j <- i until Dim) { is(t) = i; js(t) = j; t += 1 }
    (is.toSeq, js.toSeq)
  }

  /** ONE-row frame holding the flat moment array (Σxy upper-tri, Σx, n) —
    * the ADDITIVE state behind the covariance: disjoint batches merge by
    * element-wise addition, so incremental maintenance is an array merge,
    * never a corpus recompute — how a 100 TB covariance stays fresh under
    * ingest (the delta key grades exactly that algebra).
    */
  private[graft] def momentArray(embs: DataFrame): DataFrame =
    embs.select(vec(col("embedding")).as("v"))
      .agg(covMomentsUdaf(col("v")).as("m"))

  /** (i, j, cov) from a flat moment array — all three inputs of
    * cov = (Σxy − Σx·Σy/n) / (n−1) come out of the SAME array row, so no
    * join/broadcast is needed (the old moments split re-attached Σx via
    * two broadcast joins). Rounding identical to the previous finalize:
    * 6 decimals, −0.0 folded to +0.0.
    */
  private def covFromArray(mom: DataFrame): DataFrame = {
    val iLit = typedLit(momI); val jLit = typedLit(momJ)
    mom.select(col("m"),
        posexplode(slice(col("m"), 1, MomentPairs)).as(Seq("t", "sxy")))
      .select(
        (element_at(iLit, col("t") + 1) + 1).cast("long").as("i"),
        (element_at(jLit, col("t") + 1) + 1).cast("long").as("j"),
        col("sxy"),
        element_at(col("m"), element_at(iLit, col("t") + 1) + MomentPairs + 1).as("sxi"),
        element_at(col("m"), element_at(jLit, col("t") + 1) + MomentPairs + 1).as("sxj"),
        element_at(col("m"), MomentPairs + Dim + 1).as("n"))
      .select(col("i"), col("j"),
        (round((col("sxy") - col("sxi") * col("sxj") / col("n")) / (col("n") - 1), 6)
          + lit(0.0)).as("cov"))
  }

  /** Upper-triangle sample covariance, 1-based (i ≤ j): one single-pass
    * moment fold, cov derived in-row from the flat array. cov =
    * (Σxy − Σx·Σy/n) / (n−1), mirrored literally in the oracle.
    */
  def covarianceFrame(embs: DataFrame): DataFrame =
    covFromArray(momentArray(embs))

  val qPcaCovariance: Q = (s, d) =>
    covarianceFrame(Tables.embeddings(s, d)).orderBy("i", "j")

  /** The moment frames as ONE keyed table — the shape streaming state
    * can hold: (i, j, m) with pair moments at 1 ≤ i ≤ j (m = Σx·y),
    * per-dim sums at (i, 0) (m = Σx), and the row count at (0, 0).
    * All three are plain sums, so the SAME transform runs as a batch
    * aggregate or an update-mode streaming aggregation whose state IS
    * this table (2145 keys — bounded model-state size regardless of
    * corpus size; the censusUpdates discipline applied to moments).
    * Streaming face: [[graft.streaming.Streams.pcaMomentStream]];
    * two-batch seam parity spec'd in PcaSpec.
    */
  private[graft] def unifiedMoments(embs: DataFrame): DataFrame =
    embs.select(vec(col("embedding")).as("v"))
      .select(explode(expr(
        """concat(
             filter(flatten(transform(v, (x, i) -> transform(v, (y, j) ->
               struct(i + 1 AS i, j + 1 AS j, x * y AS m)))), s -> s.i <= s.j),
             transform(v, (x, i) -> struct(i + 1 AS i, 0 AS j, x AS m)),
             array(struct(0 AS i, 0 AS j, cast(1.0 AS double) AS m)))"""))
        .as("s"))
      .groupBy(col("s.i").as("i"), col("s.j").as("j"))
      .agg(sum(col("s.m")).as("sm"))

  /** Covariance derived from a [[unifiedMoments]] table — the
    * calendar-bounded-derivation half of the streaming split: the state
    * already holds the corpus reduced to 2145 sums, so re-deriving the
    * covariance per batch costs O(dim²), never a corpus re-scan.
    */
  private[graft] def covFromMoments(mom: DataFrame): DataFrame = {
    val n = mom.where(col("i") === 0 && col("j") === 0)
      .select(col("sm").as("n"))
    val sums = mom.where(col("i") > 0 && col("j") === 0)
      .select(col("i"), col("sm").as("sx"))
      .crossJoin(broadcast(n))
    val xy = mom.where(col("j") > 0)
      .select(col("i"), col("j"), col("sm").as("sxy"))
    finalize(xy, sums)
  }

  private def finalize(xy: DataFrame, sums: DataFrame): DataFrame =
    xy.join(broadcast(sums.select(col("i"), col("sx").as("sxi"), col("n"))), "i")
      .join(broadcast(sums.select(col("i").as("j"), col("sx").as("sxj"))), "j")
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        // + 0.0 folds IEEE −0.0 to +0.0: near-zero covariances otherwise
        // round to −0.0 in one engine and +0.0 in the other, and the
        // harness's stringified row sort sees those as different keys.
        (round((col("sxy") - col("sxi") * col("sxj") / col("n")) / (col("n") - 1), 6)
          + lit(0.0)).as("cov"))

  /** Graded structural identity: 7/8 snapshot + 1/8 delta moment arrays,
    * element-wise sum-merged, finalized — SAME oracle string as
    * q_pca_covariance, so the merge algebra is hash-gated against the
    * from-scratch frame. (r17: the merge is now a zip_with over the two
    * one-row moment arrays instead of a union + re-aggregation of the
    * exploded frames — same additive algebra, two fewer shuffles.)
    *
    * Exact-identity caveat made safe by construction: a float sum over
    * a different grouping order could drift past the rounding grid, so
    * the merge result is graded through the same 6-decimal rounding as
    * the batch frame — drift ~1e-13 ≪ grid, spec'd equal.
    */
  val qPcaCovDelta: Q = (s, d) => {
    val embs = Tables.embeddings(s, d)
    val momA = momentArray(embs.where(col("vec_id") % 8 =!= 0))
    val momB = momentArray(embs.where(col("vec_id") % 8 === 0))
      .withColumnRenamed("m", "mb")
    val merged = momA.crossJoin(momB)
      .select(zip_with(col("m"), col("mb"), (a, b) => a + b).as("m"))
    covFromArray(merged).orderBy("i", "j")
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: fixed sweep order, fixed sweep count, no pivot-by-magnitude
    * — the same rotations in the same order every run on every platform.
    * Returns (eigenvalues desc, row-major eigenvectors), each vector
    * sign-fixed so its first coordinate with |x| > 1e-9 is positive.
    */
  private[graft] def jacobiEigSym(aIn: Array[Array[Double]],
      sweeps: Int = 16): (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < n) { // column rotation A·J
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) { // row rotation Jᵀ·A
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) { // accumulate V·J
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { c =>
      val col = Array.tabulate(n)(r => v(r)(c))
      val lead = col.indexWhere(x => math.abs(x) > 1e-9)
      if (lead >= 0 && col(lead) < 0) col.map(-_) else col
    }.toArray
    (values, vectors)
  }

  /** (means, eigenvalues desc, eigenvectors) of the corpus covariance —
    * all bounded model state (64 + 64 + 64×64 doubles on the driver).
    */
  private[graft] def fitModel(embs: DataFrame): (Array[Double], Array[Double], Array[Array[Double]]) = {
    val cov = Array.ofDim[Double](Dim, Dim)
    // Unrounded covariance for the model fit (the graded frame rounds
    // for hash stability; the eigensolver wants full precision). ONE
    // single-pass moment collect (2145 doubles — bounded model state)
    // instead of the former two collect jobs over exploded frames.
    val m = momentArray(embs).head().getSeq[Double](0)
    val n = m(MomentPairs + Dim)
    val means = Array.tabulate(Dim)(i => m(MomentPairs + i) / n)
    var t = 0
    for (i <- 0 until Dim; j <- i until Dim) {
      val c = (m(t) - n * means(i) * means(j)) / (n - 1)
      cov(i)(j) = c; cov(j)(i) = c
      t += 1
    }
    val (values, vectors) = jacobiEigSym(cov)
    (means, values, vectors)
  }

  /** Top-k principal coordinates of every (mean-centered) vector, long
    * form (vec_id, comp, coord) — map-only against the broadcast basis.
    * No SQL twin (the basis is engine model state) → rows-only graded;
    * the basis itself is gated by q_pca_check + PcaSpec.
    */
  val qPcaProject: Q = (s, d) => {
    val embs = Tables.embeddings(s, d)
    val (means, _, vectors) = fitModel(embs)
    val mu = typedLit(means.toSeq)
    // (r17) The k×64 basis folds into the projection as a LITERAL array
    // of arrays — one map-only posexplode instead of the former
    // broadcast-cross-join against a 8-row basis frame (same rows, same
    // rounding; comp ≡ explode position). Still bounded model state:
    // the basis is k×dim driver data either way.
    val basis = typedLit(vectors.take(TopK).map(_.toSeq).toSeq)
    embs.select(col("vec_id"),
        zip_with(vec(col("embedding")), mu, (x, m) => x - m).as("v"))
      .select(col("vec_id"),
        posexplode(transform(basis, bv => round(dotProduct(col("v"), bv), 6)))
          .as(Seq("comp", "coord")))
      .select(col("vec_id"), col("comp").cast("long").as("comp"), col("coord"))
      .orderBy("vec_id", "comp")
  }

  /** Oracle-graded norm-preservation check: ‖Vᵀv‖² through the FULL
    * 64-component projection of the RAW vector must equal DuckDB's
    * independently computed ‖v‖² (orthonormal transforms preserve
    * norms; rotation round-off ~1e-13 ≪ the 6-decimal grid). A skewed,
    * non-orthogonal, or truncated basis breaks the hash.
    */
  val qPcaCheck: Q = (s, d) => {
    val embs = Tables.embeddings(s, d)
    val (_, _, vectors) = fitModel(embs)
    embs.select(col("vec_id"), vec(col("embedding")).as("v"))
      .select(col("vec_id"),
        // (r17) Σ_comp (v·b_comp)² as an in-row fold over the LITERAL
        // 64×64 basis — map-only, replacing the 64× cross-join fan-out +
        // groupBy shuffle (the fold visits components 0..63 in the same
        // order the grouped sum consumed them, so the rounded value is
        // unchanged).
        round(aggregate(
          transform(typedLit(vectors.take(Dim).map(_.toSeq).toSeq),
            bv => dotProduct(col("v"), bv)),
          lit(0.0), (acc, c) => acc + c * c), 6).as("norm2"))
      .orderBy("vec_id")
  }

  val queries: Map[String, Q] = Map(
    "q_pca_covariance" -> qPcaCovariance,
    "q_pca_cov_delta" -> qPcaCovDelta,
    "q_pca_project" -> qPcaProject,
    "q_pca_check" -> qPcaCheck
  )
}
