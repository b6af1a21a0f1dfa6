package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the billion-vector storage path next
  * to [[Ivf]]: each vector is split into `m` disjoint subvectors; each
  * subspace gets its own `ksub`-centroid codebook (trained with the same
  * Lloyd machinery as the IVF coarse quantizer, one subspace at a time);
  * a vector is then stored as `m` small codebook indices — m bytes/vector
  * at ksub ≤ 256 versus 4·dim bytes of floats (32× smaller at dim 64),
  * which is what makes exhaustive candidate scoring affordable at corpus
  * sizes where even the VECTORS don't fit storage budgets.
  *
  * Query-time scoring is ADC (asymmetric distance computation): the
  * query stays un-quantized; a per-query lookup table
  * `lut[s][c] = q_s · codebook(s)(c)` (plus a query-independent norm
  * table `n2[s][c] = ‖codebook(s)(c)‖²`) turns each candidate's
  * approximate inner product / norm — and hence approximate cosine —
  * into `m` array lookups over its codes. Top `topK × rerankFactor`
  * ADC candidates are then re-ranked by EXACT cosine against the real
  * vectors, so precision of the final top-k is exact; only recall (did
  * a true neighbor survive the ADC cut?) is approximate.
  *
  * Scale notes (100 TB): training collects only O(m · ksub · dim/m)
  * = O(ksub · dim) centroid doubles (model state, the [[Ivf]] contract);
  * encoding is a single map-only projection of `m` codegen'd NearestCell
  * argmins — no join, no shuffle, at any corpus size; the persisted
  * index is (vec_id, codes). A query collects the one query vector,
  * builds the O(m · ksub) LUT driver-side (per-query model state), and
  * scores candidates map-only with a TakeOrdered top-N — never a global
  * sort; the exact re-rank touches only topK × rerankFactor real
  * vectors. Compose with [[Ivf]] cells to prune the candidate scan too
  * (IVF-PQ); here the ADC scan is exhaustive over codes, the standard
  * flat-PQ layout.
  */
object Pq {
  import graft.functions.GraftExpressions.dotProduct
  type Q = (SparkSession, String) => DataFrame

  private def vec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Per-subspace codebooks: `codebooks(s)(c)` is the (dim/m)-dim
    * centroid `c` of subspace `s`. Driver-side model state, O(ksub·dim)
    * doubles total.
    */
  final case class PqModel(dim: Int, m: Int, ksub: Int,
      codebooks: IndexedSeq[Array[Array[Double]]]) {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim: Int = dim / m
  }

  /** The m per-subspace argmins as ONE array column — shared by train's
    * assignment step and [[encode]] (so training and the persisted index
    * cannot disagree on assignment). Map-only codegen, no join/shuffle.
    */
  private def codesCol(v: Column, codebooks: IndexedSeq[Array[Array[Double]]],
      subDim: Int): Column = {
    import graft.functions.GraftExpressions.nearestCell
    array(codebooks.indices.map(s =>
      nearestCell(slice(v, s * subDim + 1, subDim), codebooks(s))): _*)
  }

  /** Train a PQ model: ALL m subspaces ride ONE Lloyd loop — per
    * iteration, assignment is a single map-only projection of m
    * codegen'd NearestCell argmins and the centroid update is one
    * posexplode → (subspace, cell, component) partial-aggregated mean,
    * so each iteration is ONE distributed pass + an O(ksub·dim) collect
    * (the per-subspace-sequential form paid m× the job/driver round
    * trips for identical results). Seeding is deterministic: the ksub
    * smallest-xxhash64(vec_id) vectors, sliced per subspace — the
    * [[Ivf.train]] contract. `ksub = 256` is the standard byte-code
    * setting; use less when the training corpus is small (a codebook
    * should not memorize the corpus).
    */
  def train(embs: DataFrame, dim: Int, m: Int, ksub: Int = 256,
      iters: Int = 3, sampleFraction: Double = 1.0): PqModel = {
    val base = embs.select(col("vec_id"), vec(col("embedding")).as("v"))
    // (r17) sampleFraction = 1.0 keeps every row — skip the filter.
    val staged = if (sampleFraction >= 1.0) base
      else base.where(pmod(xxhash64(col("vec_id")), lit(10000)) <
        lit((sampleFraction * 10000).toLong))
    trainOn(staged.localCheckpoint(), dim, m, ksub, iters)
  }

  /** [[train]] over a PRE-STAGED (vec_id, v: array<double>) corpus that is
    * already cheap to re-scan (checkpointed, or a map-only view over a
    * checkpoint) — the r17 reuse point that lets qAnnIvfPq feed the SAME
    * residual frame to training and encoding without materializing it
    * twice.
    */
  private[graft] def trainOn(corpus: DataFrame, dim: Int, m: Int,
      ksub: Int, iters: Int): PqModel = {
    val subDim = dim / m
    val seeds = corpus.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(ksub)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(seeds.length == ksub, s"need >= $ksub training vectors, got ${seeds.length}")
    var codebooks: IndexedSeq[Array[Array[Double]]] =
      (0 until m).map(s => seeds.map(_.slice(s * subDim, (s + 1) * subDim)))
    var it = 0
    while (it < iters) {
      val updated = corpus
        .select(codesCol(col("v"), codebooks, subDim).as("codes"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .select((col("pos") / subDim).cast("int").as("s"),
          pmod(col("pos"), lit(subDim)).cast("int").as("subpos"),
          col("x"), col("codes"))
        .withColumn("cell", element_at(col("codes"), col("s") + 1))
        .groupBy(col("s"), col("cell"), col("subpos")).agg(avg(col("x")).as("m"))
        .collect()
      // Empty cells keep their previous centroid (standard Lloyd handling).
      val next = codebooks.map(_.map(_.clone()))
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      codebooks = next
      it += 1
    }
    PqModel(dim, m, ksub, codebooks)
  }

  /** Encode the corpus: (vec_id, codes array<int> of length m) — ONE
    * map-only projection of m codegen'd per-subspace argmins; this is
    * the persisted PQ index artifact.
    */
  def encode(embs: DataFrame, model: PqModel): DataFrame =
    embs.select(col("vec_id"), vec(col("embedding")).as("v"))
      .select(col("vec_id"),
        codesCol(col("v"), model.codebooks, model.subDim).as("codes"))

  /** Append a DELTA of new vectors to a persisted code table WITHOUT
    * retraining the codebooks: encoding is a pure per-row function of the
    * model, so delta rows are encoded with the same map-only projection
    * and unioned on. Ids already present in `existing` are dropped
    * (anti-join) so re-ingesting a batch is idempotent. Contract
    * (IvfDeltaSpec): encodeDelta(encode(base), delta) ≡ encode(base ∪
    * delta). Codebook FITNESS for a drifted delta is Ivf.driftProbe's
    * analogue decision — quantization error against the subspace
    * codebooks — not this method's.
    */
  def encodeDelta(existing: DataFrame, deltaEmbs: DataFrame, model: PqModel): DataFrame = {
    // Dedupe inside the batch before the anti-join: a replayed delta row
    // would otherwise produce two code rows for one vec_id.
    val fresh = deltaEmbs.dropDuplicates("vec_id")
      .join(existing.select(col("vec_id")), Seq("vec_id"), "left_anti")
    existing.unionByName(encode(fresh, model))
  }

  /** Sum of per-subspace LUT entries selected by this row's codes:
    * `Σ_s lut(s)(codes(s))` — the ADC inner loop as a built-in codegen
    * fold (no UDF). `lut` is an m × ksub literal (per-query model state).
    */
  private def adcSum(codes: Column, lut: Seq[Seq[Double]]): Column = {
    val lutLit = typedLit(lut)
    aggregate(sequence(lit(0), lit(lut.size - 1)), lit(0.0),
      (acc, s) => acc +
        element_at(element_at(lutLit, s + 1), element_at(codes, s + 1) + 1))
  }

  /** ANN query over the PQ index: ADC-approximate cosine over the codes,
    * exact re-rank of the top `topK × rerankFactor` candidates. `codes`
    * is the persisted [[encode]] output; `embs` supplies the query vector
    * and the re-rank vectors. Deterministic: ADC ties cut by vec_id.
    */
  def search(embs: DataFrame, codes: DataFrame, model: PqModel, queryVecId: Long,
      topK: Int, rerankFactor: Int = 4): DataFrame = {
    val e = embs.select(col("vec_id"), vec(col("embedding")).as("v"))
      .withColumn("nv2", dotProduct(col("v"), col("v")))
    val (qv, nq) = queryVector(e, queryVecId)
    val ipLut = queryLut(model, qv)
    val n2Lut = normLut(model)
    val cand = codes
      .where(col("vec_id") =!= queryVecId)
      .withColumn("__ip", adcSum(col("codes"), ipLut))
      .withColumn("__n2", adcSum(col("codes"), n2Lut))
      .where(col("__n2") > 0)
      .withColumn("adc_cos", col("__ip") / (sqrt(col("__n2")) * lit(nq)))
      .orderBy(desc("adc_cos"), asc("vec_id")).limit(topK * rerankFactor)
      .select(col("vec_id"))
    // Exact re-rank: only topK × rerankFactor real vectors are touched.
    exactRerank(e, cand, qv, nq, topK)
  }

  // ------------------------------------------------------------- IVF-PQ

  /** (vec_id, cell, embedding = v − centroid(cell)): the residual frame
    * IVF-PQ quantizes — residuals are centered near zero, so one shared
    * codebook set spends its resolution on the within-cell structure
    * instead of re-encoding coarse position (the standard IVF-PQ
    * design). Map-only after the broadcast centroid attach.
    */
  private def residuals(embs: DataFrame, cells: DataFrame,
      centroids: DataFrame): DataFrame =
    embs.select(col("vec_id"), vec(col("embedding")).as("v"))
      .join(cells, "vec_id")
      .join(broadcast(centroids.select(col("cell"), col("cv"))), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("v"), col("cv"), (x, c) => x - c).as("embedding"))

  /** Train the shared residual codebooks (one [[train]] run over the
    * residual frame). `cells`/`centroids` come from [[Ivf.train]] +
    * [[Ivf.assign]].
    */
  def trainResiduals(embs: DataFrame, cells: DataFrame, centroids: DataFrame,
      dim: Int, m: Int, ksub: Int = 256, iters: Int = 3): PqModel =
    train(residuals(embs, cells, centroids), dim, m, ksub, iters)

  /** The persisted IVF-PQ index: (vec_id, cell, codes) — coarse cell +
    * m residual codebook indices per vector.
    */
  def encodeResiduals(embs: DataFrame, cells: DataFrame, centroids: DataFrame,
      model: PqModel): DataFrame =
    residuals(embs, cells, centroids)
      .select(col("vec_id"), col("cell"),
        codesCol(vec(col("embedding")), model.codebooks, model.subDim).as("codes"))

  // --------------------------------------- shared per-query ADC pieces

  private def dotA(a: Array[Double], b: Array[Double]): Double =
    a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum

  private def subv(v: Array[Double], s: Int, subDim: Int): Array[Double] =
    v.slice(s * subDim, (s + 1) * subDim)

  /** The ONE query vector reaches the driver to build the O(m·ksub)
    * ADC lookup tables — per-query model state, bounded by design (the
    * corpus is never collected). Returns (vector, its L2 norm).
    */
  private def queryVector(e: DataFrame, queryVecId: Long): (Array[Double], Double) = {
    val qv = e.where(col("vec_id") === queryVecId)
      .select(col("v")).head().getSeq[Double](0).toArray
    (qv, math.sqrt(dotA(qv, qv)))
  }

  /** q_s · codebook entry — the query-side ADC LUT (m × ksub). */
  private def queryLut(model: PqModel, qv: Array[Double]): Seq[Seq[Double]] =
    (0 until model.m).map(s =>
      model.codebooks(s).toIndexedSeq.map(cb => dotA(subv(qv, s, model.subDim), cb)))

  /** ‖codebook entry‖² — the query-independent norm LUT (m × ksub). */
  private def normLut(model: PqModel): Seq[Seq[Double]] =
    (0 until model.m).map(s => model.codebooks(s).toIndexedSeq.map(cb => dotA(cb, cb)))

  /** Σ_s lut(probeIdx)(s)(codes(s)) — the cell-dependent ADC fold
    * (`lut` is nprobe × m × ksub; probeIdx is the row's 0-based probed
    * cell index).
    */
  private def adcSum3(codes: Column, probeIdx: Column, lut: Seq[Seq[Seq[Double]]]): Column = {
    val l = typedLit(lut)
    aggregate(sequence(lit(0), lit(lut.head.size - 1)), lit(0.0),
      (acc, s) => acc + element_at(
        element_at(element_at(l, probeIdx + 1), s + 1),
        element_at(codes, s + 1) + 1))
  }

  private def exactRerank(e: DataFrame, cand: DataFrame, qv: Array[Double],
      nq: Double, topK: Int): DataFrame =
    e.where(col("nv2") > 0)
      .join(broadcast(cand), "vec_id")
      .select(col("vec_id"),
        round(dotProduct(col("v"), typedLit(qv.toSeq)) / (sqrt(col("nv2")) * lit(nq)), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(topK)

  /** IVF-PQ ANN query — the standard billion-scale index: probe the
    * `nprobe` cells nearest the query, ADC-score ONLY their members'
    * residual codes (v̂ = c + r̂, so q·v̂ = q·c + Σ_s q_s·cb_s(code) and
    * ‖v̂‖² = ‖c‖² + 2·Σ_s c_s·cb_s(code) + Σ_s ‖cb_s(code)‖² — three
    * lookup tables, the cell-dependent one sized nprobe × m × ksub),
    * then exact-rerank the top `topK × rerankFactor`. The scan is cut
    * BOTH ways: nprobe/k of the corpus by the cell filter, m bytes per
    * candidate by the codes. Per-query driver state: the query vector,
    * the k×dim centroids, and the O(nprobe·m·ksub) LUTs — all bounded.
    */
  def searchIvfPq(embs: DataFrame, centroids: DataFrame, model: PqModel,
      codes: DataFrame, queryVecId: Long, nprobe: Int, topK: Int,
      rerankFactor: Int = 4): DataFrame = {
    val e = embs.select(col("vec_id"), vec(col("embedding")).as("v"))
      .withColumn("nv2", dotProduct(col("v"), col("v")))
    val (qv, nq) = queryVector(e, queryVecId)
    val cents: Map[Int, Array[Double]] = centroids.select(col("cell"), col("cv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val probed: Seq[Int] = cents.toSeq
      .sortBy { case (c, cv) =>
        (dotA(qv, qv) - 2 * dotA(qv, cv) + dotA(cv, cv), c)
      }
      .take(nprobe).map(_._1)
    val probeIdx: Map[Int, Int] = probed.zipWithIndex.toMap
    val qDotC: Map[Int, Double] = probed.map(c => c -> dotA(qv, cents(c))).toMap
    val c2: Map[Int, Double] = probed.map(c => c -> dotA(cents(c), cents(c))).toMap
    val lutQ = queryLut(model, qv)
    val lutN = normLut(model)
    val lutC: Seq[Seq[Seq[Double]]] = probed.map(c => (0 until model.m).map(s =>
      model.codebooks(s).toIndexedSeq.map(cb => dotA(subv(cents(c), s, model.subDim), cb))))
    val cand = codes
      .where(col("cell").isin(probed.map(Integer.valueOf): _*) &&
        col("vec_id") =!= queryVecId)
      .withColumn("__pi", element_at(typedLit(probeIdx), col("cell")))
      .withColumn("__ip",
        element_at(typedLit(qDotC), col("cell")) + adcSum(col("codes"), lutQ))
      .withColumn("__n2",
        element_at(typedLit(c2), col("cell")) +
          lit(2.0) * adcSum3(col("codes"), col("__pi"), lutC) +
          adcSum(col("codes"), lutN))
      .where(col("__n2") > 0)
      .withColumn("adc_cos", col("__ip") / (sqrt(col("__n2")) * lit(nq)))
      .orderBy(desc("adc_cos"), asc("vec_id")).limit(topK * rerankFactor)
      .select(col("vec_id"))
    exactRerank(e, cand, qv, nq, topK)
  }

  /** Graded end-to-end PQ key: train per-subspace codebooks, encode the
    * corpus to m-byte codes, ADC-score, exact re-rank — on the SAME
    * planted corpus as `q_ann_ivf_partial` (20 near-copies of query
    * vector 7 at cos ≈ 0.999⁺ vs a 0.60 background ceiling), so the
    * approximate path is provably exact on the fixture: the true top-15
    * lead the ADC ordering by a margin far beyond quantization error
    * (PqSpec pins graded-output ≡ exact brute force), and the exact
    * re-rank makes final precision exact regardless. Oracle: exact
    * global cosine top-15 over the identically-constructed corpus.
    * ksub = 16 (not the 256 standard): the fixture corpus is ~500
    * vectors — a 256-centroid-per-subspace codebook would memorize it.
    */
  /** The shared planted ANN corpus (the q_ann_ivf_partial construction):
    * 20 near-copies of query vector 7 at cos ≈ 0.999⁺ against a 0.60
    * fixture background — what makes an exact-top-15 oracle sound for
    * the approximate keys. Checkpointed: every consumer scans it
    * several times (training, encoding, re-rank).
    */
  private[graft] def plantedCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .repartition(s.sessionState.conf.numShufflePartitions)
      .select(col("vec_id"), vec(col("embedding")).as("embedding"))
    val planted = base.where(col("vec_id") === 7L)
      .crossJoin(s.range(1, 21).select(col("id").as("j")))
      .select((lit(2000000L) + col("j")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === pmod(col("j"), lit(64)).cast("int"), x * lit(1.05) + lit(0.01))
            .otherwise(x)).as("embedding"))
    base.unionByName(planted).localCheckpoint()
  }

  val qAnnPq: Q = (s, d) => {
    val corpus = plantedCorpus(s, d)
    val model = train(corpus, dim = 64, m = 8, ksub = 16, iters = 2)
    val codes = encode(corpus, model).localCheckpoint() // the persisted index
    search(corpus, codes, model, queryVecId = 7L, topK = 15)
  }

  /** Graded end-to-end IVF-PQ key — coarse quantizer + residual
    * codebooks + ADC over 2 of 8 probed cells + exact re-rank, on the
    * same planted corpus: all 20 copies sit in a tiny L2 ball around
    * v₇, so every trained coarse quantizer co-locates them in the cell
    * nearest v₇ — exactly probe #1 (the q_ann_ivf_partial containment
    * argument) — and the ADC margin (cos 0.999⁺ vs 0.60) dwarfs
    * residual quantization error, so the candidate cut provably keeps
    * the true top-15 (PqSpec pins ≡ exact brute force). Oracle: exact
    * global cosine top-15.
    */
  val qAnnIvfPq: Q = (s, d) => {
    val corpus = plantedCorpus(s, d)
    val k = 8
    val centroids = Ivf.train(corpus, k = k, iters = 3)
    // (r17) ONE residual definition feeds BOTH codebook training and
    // encoding. The old path materialized the (vec_id, cell) assignment,
    // then rebuilt the residual frame TWICE (train + encode), each time
    // re-attaching vectors through a vec_id shuffle join + a broadcast
    // centroid join. `residualIndex` computes cell + residual in one
    // map-only projection (assignment is a pure function of the literal
    // k×dim model state), and the single checkpointed frame is scanned
    // by every Lloyd iteration and the encode pass. Same cells, same
    // residual doubles, same model — 3 materializations/2 joins → 1/0.
    val res = residualIndex(corpus, centroids).localCheckpoint()
    val model = trainOn(res.select(col("vec_id"), col("v")),
      dim = 64, m = 8, ksub = 16, iters = 2)
    // The persisted IVF-PQ index (vec_id, cell, codes) — a map-only
    // projection over the checkpointed residual frame.
    val codes = res.select(col("vec_id"), col("cell"),
      codesCol(col("v"), model.codebooks, model.subDim).as("codes"))
    searchIvfPq(corpus, centroids, model, codes, queryVecId = 7L, nprobe = 2, topK = 15)
  }

  /** (vec_id, cell, v = embedding − centroid(cell)) in ONE map-only
    * projection: the cell is the codegen'd argmin over the collected
    * k×dim centroid matrix (exactly [[Ivf.assign]]'s kernel) and the
    * centroid subtraction looks the literal matrix up by cell — no
    * join, no shuffle, at any corpus size.
    */
  private[graft] def residualIndex(embs: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = Ivf.collectCentroids(centroids)
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    embs.select(col("vec_id"), vec(col("embedding")).as("v0"))
      .select(col("vec_id"), col("v0"),
        graft.functions.GraftExpressions.nearestCell(col("v0"), cents).as("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("v0"), element_at(centsLit, col("cell") + 1),
          (x, c) => x - c).as("v"))
  }

  val queries: Map[String, Q] = Map(
    "q_ann_pq" -> qAnnPq,
    "q_ann_ivfpq" -> qAnnIvfPq
  )
}
