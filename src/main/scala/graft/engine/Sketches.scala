package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the 100 TB incremental-statistics
  * pattern: per-slice sketch ARTIFACTS are small (KBs), persistable,
  * and union-mergeable, so a standing pipeline computes them once per
  * ingest slice and answers corpus-wide questions by merging sketches
  * instead of rescanning data. Two families here on top of the
  * built-in `approx_count_distinct`/`approx_percentile` keys:
  * DataSketches HLL (distinct counts, explicit sketch column +
  * union-merge) and count-min (frequency estimates, overestimate-only
  * guarantee). Sketch bytes/estimates are engine-specific, so both
  * keys are rows-only graded and property-bounded in SketchSpec.
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  /** HLL precision: lgK = 14 EXPLICITLY (16 KB per sketch — still model
    * state), with the acceptance band derived from the configured RSE
    * (1.04/√2^lgK ≈ 0.81%) instead of a magic percentage. The ×970 gate
    * caught the default-lgK=12 version: 3% was only 1.9·RSE there, and
    * at fifth-decade density every event type's user set is essentially
    * the SAME ~1.5M users — one correlated ~3% hash-luck deviation
    * failed all five est_ok rows at once. 3·RSE at lgK=14 = 2.44%,
    * band = 3% ≈ 3.7·RSE — and the correlation argument cuts the other
    * way now: the five rows share one draw, so the miss probability is
    * ~one-in-10⁴ TOTAL, not per row.
    */
  val HllLgK = 14
  val HllRse: Double = 1.04 / math.sqrt(math.pow(2.0, HllLgK))

  /** Incremental distinct users per event type via DataSketches HLL:
    * one sketch per (event_type, day) ingest slice — the persisted
    * artifact a daily job would write — then a union-merge per type.
    * The merge is associative/commutative, so re-slicing (hourly,
    * per-file) gives the same estimates; SketchSpec additionally pins
    * union-of-slices ≡ one-shot sketch and within the [[HllRse]] band.
    */
  val qSketchHllUnion: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), HllLgK).as("sk"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_slices"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .orderBy("event_type")
  }

  /** Count-min frequency estimates for every event type, probed from
    * ONE distributed sketch build: the sketch is an O(1/eps · ln 1/δ)
    * artifact (~KBs — model state, the bounded-collect contract), the
    * per-key probes are driver-side lookups, and the guarantee is
    * one-sided: estimate ≥ true count, ≤ true + eps·N with probability
    * 1−δ (SketchSpec pins both sides). The exact counts ride along so
    * the graded row set shows the estimate quality directly.
    */
  val qSketchCountmin: Q = (s, d) => {
    val ev = Tables.events(s, d).localCheckpoint()
    val bytes = ev.agg(
      expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val probe = udf((t: String) => cms.estimateCount(t))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_count"))
      .withColumn("cms_estimate", probe(col("event_type")))
      .orderBy("event_type")
  }

  /** Build one theta sketch of `c` (a long column): per-partition
    * UpdateSketch, compact per partition, union on the driver — the
    * bounded-collect contract again (numPartitions × ~KBs). Theta is
    * the sketch family that supports SET OPERATIONS: unlike HLL, two
    * sketches intersect/difference with bounded error — "users who did
    * A and B" without a distinct-pair scan.
    */
  def thetaSketchBytes(df: DataFrame, c: String, lgK: Int = 14): Array[Byte] = {
    import org.apache.datasketches.theta.{SetOperation, Sketches => ThetaSketches, UpdateSketch}
    val parts = df.select(col(c).cast("long")).na.drop.rdd
      .mapPartitions { it =>
        val sk = UpdateSketch.builder().setLogNominalEntries(lgK).build()
        it.foreach(r => sk.update(r.getLong(0)))
        Iterator.single(sk.compact().toByteArray)
      }.collect()
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    parts.foreach(b => u.union(ThetaSketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(b))))
    u.getResult.toByteArray
  }

  /** Theta set-operation estimates over the event log: distinct users
    * per type, their INTERSECTION ("did both") and union — four numbers
    * from two persisted per-type sketches, no distinct-pair scan.
    *
    * Oracled under a documented precondition: a theta sketch is EXACT
    * (estimation hasn't kicked in) while the distinct count stays under
    * 2^lgK = 16384 retained entries — true at every fixture scale
    * (1 500 users at sf0.1, 15 000 at sf1). Past that the estimates go
    * ±~1% probabilistic (the actual 100 TB operating mode) and the
    * oracle regime ends; SketchSpec pins the exact-mode equalities and
    * the union-merge associativity the incremental pipeline relies on.
    */
  val qSketchTheta: Q = (s, d) => {
    import org.apache.datasketches.theta.{SetOperation, Sketches => ThetaSketches}
    import org.apache.datasketches.memory.Memory
    val ev = Tables.events(s, d).localCheckpoint()
    def sk(t: String) = ThetaSketches.wrapSketch(Memory.wrap(
      thetaSketchBytes(ev.where(col("event_type") === t), "user_id")))
    val click = sk("click")
    val purchase = sk("purchase")
    // Union MUST carry the same lgK as the input sketches — the builder
    // default (2^12) would downsample below the documented exact-mode
    // bound. (Intersection is sized by its inputs; no knob needed.)
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(click); inter.intersect(purchase)
    val un = SetOperation.builder().setLogNominalEntries(14).buildUnion()
    un.union(click); un.union(purchase)
    val rows = Seq(
      ("both", math.round(inter.getResult.getEstimate)),
      ("click", math.round(click.getEstimate)),
      ("either", math.round(un.getResult.getEstimate)),
      ("purchase", math.round(purchase.getEstimate)))
    s.createDataFrame(rows).toDF("key", "est_users").orderBy("key")
  }

  /** Build one KLL doubles sketch of `c`: per-partition sketches merged
    * on the driver (bounded artifact, ~KBs at k=200) — MERGEABLE
    * quantiles, the property `percentile_approx` doesn't expose as a
    * persistable artifact: per-slice sketches answer any-range quantile
    * questions later without rescanning, like the HLL/theta/count-min
    * siblings. Rank error ≤ ~1.65% at k=200 (normalized, two-sided).
    */
  def kllSketchBytes(df: DataFrame, c: String, k: Int = 200): Array[Byte] = {
    import org.apache.datasketches.kll.KllDoublesSketch
    val parts = df.select(col(c).cast("double")).na.drop.rdd
      .mapPartitions { it =>
        val sk = KllDoublesSketch.newHeapInstance(k)
        it.foreach(r => sk.update(r.getDouble(0)))
        Iterator.single(sk.toByteArray)
      }.collect()
    val merged = KllDoublesSketch.newHeapInstance(k)
    parts.foreach(b => merged.merge(KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(b))))
    merged.toByteArray
  }

  /** Merged-KLL quantiles of the lineitem price distribution (p50/p90/
    * p99). Estimates are rank-probabilistic and partition-order
    * dependent → rows-only graded; SketchSpec pins each estimate's
    * EXACT rank within the ±1.65%·2 KLL guarantee band.
    */
  val qSketchKll: Q = (s, d) => {
    import org.apache.datasketches.kll.KllDoublesSketch
    val sk = KllDoublesSketch.heapify(org.apache.datasketches.memory.Memory.wrap(
      kllSketchBytes(Tables.lineitem(s, d), "l_extendedprice")))
    val rows = Seq(0.5, 0.9, 0.99).map(q => (q, sk.getQuantile(q)))
    s.createDataFrame(rows).toDF("quantile", "estimate").orderBy("quantile")
  }

  /** ORACLE-GRADED check frame for the KLL sketch (the q_sketch_kll
    * estimates themselves are partition-order dependent, so that key is
    * rows-only): per quantile, the EXACT interpolated percentile (which
    * DuckDB recomputes independently — a real cross-engine value check)
    * and whether the sketch estimate's exact rank — the fraction of rows
    * ≤ estimate, computed in one distributed pass — sits within the
    * published two-sided KLL bound (±1.65% · 2 at k = 200, the same band
    * SketchSpec pins). The oracle expects TRUE: a sketch whose error
    * escaped its guarantee band flips the boolean and fails the hash
    * compare. `l_quantity` (integral values) keeps the exact percentile
    * off round-6 boundaries, per the qAggPercentileExact discipline.
    */
  val qSketchKllCheck: Q = (s, d) => {
    import org.apache.datasketches.kll.KllDoublesSketch
    val li = Tables.lineitem(s, d).localCheckpoint()
    val sk = KllDoublesSketch.heapify(org.apache.datasketches.memory.Memory.wrap(
      kllSketchBytes(li, "l_quantity")))
    val qs = Seq(0.5, 0.9, 0.99)
    val ests = qs.map(q => q -> sk.getQuantile(q))
    val eps = 0.0165 * 2
    // One pass: exact rank of each estimate + the exact percentile values.
    val rankCols = ests.zipWithIndex.map { case ((_, est), i) =>
      avg(when(col("l_quantity") <= est, 1.0).otherwise(0.0)).as(s"__r$i")
    }
    // (r17) ONE array-percentile buffer for the three exact values
    // instead of three independent buffers over the same column (the
    // qHistogramEquidepth lesson) — same buffer, same interpolation.
    val exactCol = percentile(col("l_quantity"), lit(qs.toArray)).as("__ps")
    val aggs = rankCols :+ exactCol
    val r = li.agg(aggs.head, aggs.tail: _*).head()
    // Same HALF_UP round-6 the previous in-plan `round(…, 6)` applied.
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val exacts = r.getSeq[Double](qs.size)
    val out = ests.zipWithIndex.map { case ((q, _), i) =>
      (q, round6(exacts(i)), math.abs(r.getDouble(i) - q) <= eps)
    }
    s.createDataFrame(out).toDF("quantile", "exact_value", "rank_ok")
      .orderBy("quantile")
  }

  /** ORACLE-GRADED check frame for the HLL union pipeline: per event
    * type, the slice count and EXACT distinct users (both recomputed
    * independently by DuckDB) plus whether the merged-HLL estimate lands
    * within the ±3% band SketchSpec pins. HLL register state is a
    * max-merge — order-insensitive — so the estimate, and with it the
    * boolean, is deterministic for fixed data.
    */
  val qSketchHllCheck: Q = (s, d) => {
    val est = qSketchHllUnion(s, d)
    val exact = Tables.events(s, d).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("n_slices"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.03).as("est_ok")) // 3% ≈ 3.7·RSE at lgK=14
      .orderBy("event_type")
  }

  /** ORACLE-GRADED check frame for the count-min sketch (estimates are
    * seed-dependent → the raw key is rows-only): exact per-type counts
    * recomputed independently by DuckDB, plus the one-sided guarantee
    * booleans the oracle expects TRUE — estimate ≥ exact always (CMS
    * never undercounts), and ≤ exact + eps·N with eps = 0.001 at the
    * build parameters (SketchSpec pins the same two sides; the sketch is
    * a fixed-seed additive merge, so the booleans are deterministic).
    */
  val qSketchCmsCheck: Q = (s, d) => {
    val est = qSketchCountmin(s, d).localCheckpoint() // (event_type, exact_count, cms_estimate)
    val total = est.agg(sum(col("exact_count"))).head().getLong(0)
    est.select(col("event_type"), col("exact_count"),
      (col("cms_estimate") >= col("exact_count")).as("lower_ok"),
      (col("cms_estimate") <= col("exact_count") + lit(0.001 * total)).as("upper_ok"))
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "q_sketch_theta" -> qSketchTheta,
    "q_sketch_kll" -> qSketchKll,
    "q_sketch_kll_check" -> qSketchKllCheck,
    "q_sketch_hll_union" -> qSketchHllUnion,
    "q_sketch_hll_check" -> qSketchHllCheck,
    "q_sketch_countmin" -> qSketchCountmin,
    "q_sketch_cms_check" -> qSketchCmsCheck
  )
}
