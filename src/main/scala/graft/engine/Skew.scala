package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at 100 TB.
  *
  * Note on scope: plain `sum`/`count` aggregations rarely need salting —
  * Spark's partial (map-side) aggregation already collapses hot keys
  * before the shuffle. Salting earns its keep where per-key REDUCER state
  * is large (`collect_list` of a hot key can OOM one task) and in
  * shuffle joins where one key's rows all land on one reducer.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): hash of a unique column —
    * stable across task retries (a `rand()` salt is not, and can
    * double-count rows under speculative execution).
    */
  def salt(idCol: Column, salts: Int): Column = pmod(xxhash64(idCol), lit(salts))

  /** Two-phase salted collect: per key, the sorted array of values.
    * Phase 1 collects per (key, salt) — so no single aggregation state
    * INGESTS more than ~1/salts of a hot key's rows one at a time, and
    * the hot key's collection work parallelizes across `salts` tasks.
    * Phase 2 flattens the ≤`salts` prebuilt partial arrays; note the
    * final per-key array is still inherently O(key rows) — ANY operator
    * that materializes the full list must hold it somewhere, so if the
    * result array itself exceeds task memory the answer is a different
    * operator (top-N, sampling, a sketch), not more salt. `array_sort`
    * makes the result a deterministic function of the data (G4).
    */
  def saltedCollectList(df: DataFrame, keyCols: Seq[String], idCol: String,
      valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(idCol), salts))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(collect_list(col(valueCol)).as("__part"))
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("__part")))).as(s"${valueCol}_list"))

  /** Salted equi-join for a skewed large side: the large side's rows fan
    * out over `salts` sub-keys; the small side is replicated `salts`
    * times (explode) so every sub-key still finds its match. Use when
    * the small side is too big to broadcast but a handful of large-side
    * keys dominate a sort-merge join.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, idCol: String,
      salts: Int = 16): DataFrame = {
    val l = large.withColumn("__salt", salt(col(idCol), salts))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-filter semi-join pruning: build a bloom filter over the
    * (already-filtered) dimension's join keys, broadcast it, and drop
    * fact rows that cannot match BEFORE the join's shuffle. The join
    * itself still runs, so false positives are removed and the result
    * is EXACT — the bloom only cuts shuffle volume (with a selective
    * dim filter, most fact rows never leave the scan stage).
    *
    * Scale contract: the sketch is a bounded driver artifact
    * (~1.2 MB per million expected items at 1% fpp, tree-reduced, then
    * broadcast once) — the same bounded-collect budget as the k×dim
    * centroid pulls. Spark's own `InjectRuntimeFilter` plants this
    * exact shape automatically, but only above its size thresholds and
    * never through a UDF barrier; this operator is the explicit form
    * for pipelines that want it unconditionally. The automatic path is
    * exercised in SkewSpec (injection pinned on the optimized plan,
    * values invariant with the rule off) — the same explicit/automatic
    * pairing as saltedJoin vs AQE skew join.
    */
  def bloomPreFilter(fact: DataFrame, factKey: String,
      dimKeys: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // Spark's stat.bloomFilter NPEs on an empty input (the aggregate
    // yields a null buffer); an empty dim means the downstream join is
    // empty anyway, so passing the fact through unpruned stays correct.
    // Integral keys only: the probe casts to long, and a silent string→
    // long cast would null out and DROP every row — fail loudly instead.
    val keyType = fact.schema(factKey).dataType
    require(Seq("long", "integer", "short", "byte").contains(keyType.typeName),
      s"bloomPreFilter needs an integral fact key; $factKey is $keyType")
    // One materialization of the (possibly expensive) filtered-dim
    // lineage feeds BOTH the emptiness probe and the bloom build — it
    // previously recomputed per action. Freed once the sketch exists:
    // the returned frame references only the broadcast bytes.
    val keys = dimKeys.localCheckpoint()
    try {
      if (keys.isEmpty) fact
      else {
        val bf = keys.stat.bloomFilter(dimKey, expectedItems, fpp)
        val bcast = fact.sparkSession.sparkContext.broadcast(bf)
        val might = udf((k: Long) => bcast.value.mightContainLong(k))
        fact.where(might(col(factKey).cast("long")))
      }
    } finally keys.unpersist()
  }

  type Q = (SparkSession, String) => DataFrame

  /** Graded surface for [[bloomPreFilter]]: Q3-shaped revenue join with
    * a selective quarter filter on orders (~1/28 of the date range).
    * The join is hinted sort-merge — modelling the fact-⋈-fact case
    * where the dim side is too big to broadcast and the bloom is the
    * only way fact rows die before the shuffle; PlanSpec pins the
    * UDF filter below the shuffle and the join broadcast-free. Exact
    * by construction (the join removes bloom false positives), so the
    * oracle is the plain join.
    */
  val qBloomPrejoin: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val pruned = bloomPreFilter(Tables.lineitem(s, d), "l_orderkey",
      o.select(col("o_orderkey")), "o_orderkey", expectedItems = 100000L)
    pruned.hint("merge")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      // q5's exact fixed-point revenue discipline (cents × percent-points
      // products summed LONG per partition, DECIMAL(38,0) merge, round at
      // the cent boundary in integer space): 5 priorities each span ~n/5
      // of the quarter's lineitems, and the raw double sum drifted one
      // cent past round-2 at the ×97 mirror (Σ ≈ 2.3·10¹⁰).
      .transform(j => Relational.widePartials(j, Seq(col("o_orderpriority")),
        Seq(
          sum(Relational.cents(col("l_extendedprice")) *
            (lit(100L) - Relational.cents(col("l_discount")))).as("__rev4"),
          count(lit(1)).as("__np"))))
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("CAST(CAST((sum(CAST(__rev4 AS DECIMAL(38,0))) + 50) div 100 AS DECIMAL(38,2)) / 100 AS DOUBLE)")
          .as("revenue"),
        sum(col("__np")).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** Graded surface for [[saltedCollectList]]: the events table is
    * exactly the hot-key shape the operator exists for — 5 event_type
    * keys each holding ~1/5 of ALL rows, so a plain collect_list funnels
    * every row of a key through ONE aggregation state. The salted
    * two-phase form builds ≤`salts` partial arrays per key in parallel
    * and flattens them. Output arrays travel as joined strings (the
    * harness hash cannot compare arrays); oracle = per-key ordered list
    * over the fixture — equal iff the two-phase result is exactly the
    * sorted single-phase list.
    */
  val qSkewCollect: Q = (s, d) =>
    saltedCollectList(Tables.events(s, d), Seq("event_type"), "event_id", "event_id")
      .select(col("event_type"),
        size(col("event_id_list")).cast("long").as("n_events"),
        array_join(col("event_id_list"), ",").as("ids"))
      .orderBy("event_type")

  /** The salted-join plan the graded key aggregates — shared with
    * PlanSpec, which pins the join sort-merge (no broadcast: modelling
    * the dim side past broadcast scale) with `__salt` IN the join keys,
    * so the shuffle hash-partitions on (event_type, salt) and each hot
    * key's rows spread across `salts` reducers instead of funnelling
    * through one.
    */
  private[graft] def skewJoinPlan(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val dim = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_type_users"))
    saltedJoin(ev.hint("merge"), dim, "event_type", "event_id", salts = 16)
  }

  /** Graded surface for [[saltedJoin]]: events (5 event_type keys, each
    * ~1/5 of ALL rows — exactly the hot-key join shape) joined to a
    * per-type dim through the salted path and aggregated. An unsalted
    * shuffle join would land each type's entire row set on ONE reducer;
    * salting fans each key over 16 sub-keys at the cost of exploding
    * the dim 16×. Exact by construction (every large-side row meets
    * precisely the one dim replica sharing its salt), so the oracle is
    * the plain join — equal iff salting is invisible in the result.
    */
  val qSkewJoin: Q = (s, d) =>
    skewJoinPlan(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Relational.sumValue2(col("value")).as("sum_value"),
        max(col("n_type_users")).as("n_type_users"))
      .orderBy("event_type")

  /** AQE-skew confs scoped to `body`, restored after. Thresholds are
    * sized for the data under test — production values are per-cluster
    * tuning; the MECHANISM (a skewed SMJ partition splitting into
    * parallel task slices at runtime) is the contract. Broadcast is
    * disabled so the join stays shuffle-based (a broadcast side never
    * exhibits reducer skew to begin with). Execution must happen INSIDE
    * `body` (collect/localCheckpoint): AQE reads these at execution
    * time, not at DataFrame construction.
    */
  private[graft] def withAqeSkewConfs[T](s: SparkSession,
      threshold: String = "256KB", advisory: String = "128KB")(body: => T): T = {
    val kvs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> threshold,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisory,
      // The probe aggregates ON the join key, so the join's hash
      // partitioning is reused downstream and the default rule would
      // veto the split (it refuses to introduce the repair shuffle).
      // Force = "skew dominates; buy the extra exchange" — the knob a
      // 100 TB deployment flips for exactly this shape.
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** The UNSALTED power-law join + aggregate — shared with ScaleSmoke
    * (which executes it under [[withAqeSkewConfs]] and pins that the
    * runtime skew split fires at the scaled run) and SkewSpec. The
    * event-type key is near-uniform across its 5 values, which exercises
    * hot KEYS but not hot PARTITIONS; this probe derives a genuinely
    * power-law key — `⌊log₂(1 + event_id mod 1024)⌋`, whose top value
    * holds ~half of ALL rows, the next ~a quarter, … — so one reducer
    * partition dwarfs the median and AQE's OptimizeSkewedJoin criterion
    * (size > max(factor · median, threshold)) is actually met. log₂ is
    * exact at powers of two in both engines, so the oracle floors
    * identically.
    */
  private[graft] def aqeSkewJoinFrame(s: SparkSession, d: String): DataFrame = {
    // Both join inputs must be DIRECT shuffles: OptimizeSkewedJoin
    // pattern-matches SMJ(Sort(Shuffle), Sort(Shuffle)) — an aggregate
    // interposed between shuffle and join (e.g. a dim derived by
    // groupBy) makes the rule not apply at all, which is itself a
    // scale lesson: derive skew-exposed dims in a separate stage
    // (here a checkpoint-free literal decode table).
    // fanOut matters twice here: single-partition fixture scans are the
    // standing hazard, AND AQE's skew split divides a reduce partition
    // at MAP-BLOCK boundaries — a one-mapper upstream stage is
    // unsplittable no matter how skewed the reducer is.
    val ev = Dedup.fanOut(Tables.events(s, d))
      .select(col("event_id"), col("user_id"), col("value"),
        floor(log2(lit(1) + col("event_id") % 1024)).cast("long").as("zipf_key"))
    val dim = s.range(0, 11).select(col("id").as("zipf_key"),
      pow(lit(2.0), col("id")).cast("long").as("key_weight"))
    ev.hint("merge").join(dim.hint("merge"), "zipf_key")
      .groupBy(col("zipf_key"))
      .agg(count(lit(1)).as("n_events"),
        Relational.sumValue2(col("value")).as("sum_value"),
        max(col("key_weight")).as("key_weight"))
      .orderBy("zipf_key")
  }

  /** Graded surface for the AUTOMATIC skew path (qSkewJoin covers the
    * explicit salted one): the same hot-key join left unsalted, executed
    * under scoped AQE-skew thresholds so Spark's OptimizeSkewedJoin
    * splits the hot reducer at runtime. Execution happens inside the
    * conf scope via localCheckpoint (the returned frame reads the
    * materialized partitions); the oracle is the plain join — equal iff
    * the runtime split, like salting, is invisible in the result.
    */
  val qSkewJoinAqe: Q = (s, d) =>
    withAqeSkewConfs(s)(aqeSkewJoinFrame(s, d).localCheckpoint())

  val queries: Map[String, Q] = Map(
    "q_skew_collect" -> qSkewCollect,
    "q_skew_join" -> qSkewJoin,
    "q_skew_join_aqe" -> qSkewJoinAqe,
    "q_bloom_prejoin" -> qBloomPrejoin
  )
}
