package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: scans, filters, projections, aggregation (SURVEY.md
  * §2.B P1). Every query is a deterministic function of the data: floating
  * aggregates are rounded (G2), outputs carry a total order (G4), and
  * column aliases match the DuckDB oracle exactly.
  */
object Relational {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Exact fixed-point money: a 2-decimal double → integer cents (LONG).
    * Same 2-decimal-exactness contract the r11 DECIMAL(18,2) cast relied
    * on, but the downstream sum is primitive long arithmetic — order-free
    * like the decimal form (integer addition is associative) without its
    * per-row heap-Decimal cost (round-12 item #5). `round` first: the
    * double nearest 36485.38 × 100 is 3648537.999…, and a bare cast
    * would truncate it.
    */
  private[graft] def cents(c: Column): Column = round(c * 100).cast("long")

  /** Order-free exact 2dp sum (the money-sum-lint discipline applied to
    * every `sum(value)`-shaped aggregate): Σ integer cents in primitive
    * LONG (exact, associative — headroom to ~9·10¹⁶ cents of volume),
    * ÷100.0 (exact double below 2⁵³), round 2 (an identity on the exact
    * quotient). Replaces `round(sum(<2dp double>), 2)`, whose partial-
    * merge order drifts against the oracle once the sum spans enough
    * partitions — the class every scale decade's first gate run caught.
    */
  private[graft] def sumValue2(c: Column): Column =
    round(sum(cents(c)).cast("double") / 100.0, 2)

  /** Order-free exact 2dp MEAN — the avg() face of the same discipline
    * (the raw `avg(<2dp double>)` partial buffer IS a double Sum, so it
    * drifts identically; r13 verdict item #5 closed the lint hole and
    * this is the hardened rendering the flagged keys now use): exact
    * integer-cents LONG sum, ÷100.0 (exact below 2⁵³), ÷ nonnull count,
    * round — both engines evaluate the identical op sequence.
    */
  private[graft] def avgMoney(c: Column, scale: Int): Column =
    round(sum(cents(c)).cast("double") / 100.0 / count(c), scale)

  /** 100 TB form of the corpus-spanning money sums (the path §20 #7b
    * documented and the ×97 mirror's ANSI `long overflow` on
    * q_cbo_join_reorder made concrete): accumulate per-(group, input
    * partition) partials in primitive LONG — codegen'd, order-free,
    * bounded by partition size (a 2⁶³ partial needs ~10¹⁰ max-price rows
    * in ONE task's partition; a 200 MB split holds ~5·10⁶, a 40×-headroom
    * contract even for the 10⁻⁶-unit charge product) — then merge ONLY
    * the tiny groups×partitions partial frame in DECIMAL(38,0), where the
    * corpus-wide total never overflows. Cost: one extra exchange over
    * G×P one-row partials; the per-row hot loop stays LONG.
    *
    * Grouping by `spark_partition_id()` is safe here because the VALUE of
    * an exact integer sum is independent of how rows are sliced into
    * partials; the id only names the slice. The final `div`'s BIGINT
    * quotient (exact cents) binds next at ~10 PB of money volume — far
    * past the DOUBLE output's own 2⁵³ representability.
    */
  private[engine] def widePartials(df: DataFrame, keys: Seq[Column],
      partials: Seq[Column]): DataFrame =
    df.groupBy(keys :+ spark_partition_id().as("__wp"): _*)
      .agg(partials.head, partials.tail: _*)

  /** DECIMAL(38,0) merge of a LONG partial column (stage 2 of
    * [[widePartials]]). */
  private[engine] def wideSum(partial: String): Column =
    expr(s"sum(CAST($partial AS DECIMAL(38,0)))")

  /** Parquet scan + column pruning + pushdown filter. At 100 TB the WHERE
    * and SELECT both reach the parquet reader (PushedFilters / ReadSchema)
    * so only 4 columns and matching row groups are read.
    */
  val qScanProject: Q = (s, d) =>
    lineitem(s, d)
      .where(col("l_quantity") >= 45 && col("l_shipdate") >= lit("2000-06-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_shipdate"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Compound predicates: AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL, CASE. */
  val qFilterPredicates: Q = (s, d) =>
    part(s, d)
      .where(
        col("p_type").isin("STANDARD", "ECONOMY", "PROMO") &&
        col("p_size").between(10, 40) &&
        col("p_name").like("%a%") &&
        !(col("p_brand") === "Brand#99") &&
        col("p_retailprice").isNotNull)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"),
        when(col("p_retailprice") > 1500, "premium")
          .when(col("p_retailprice") > 800, "mid")
          .otherwise("budget").as("price_band"))
      .orderBy("p_partkey")

  /** Computed columns, aliasing, casts. */
  val qProjectExpr: Q = (s, d) =>
    lineitem(s, d)
      .where(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        // exact decimal width of the product (2dp × 2dp → 4dp; × 2dp → 6dp):
        // rounding at full precision is an identity in both engines, so no
        // cross-engine tie-breaking can disagree (SURVEY.md G2).
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("charged"),
        col("l_quantity").cast("long").as("qty_int"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag_status"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- joins

  /** TPC-H Q3 shape: 3-way equi join + agg + top-10. customer is a dim
    * (broadcast naturally under the 10 MB threshold); orders⋈lineitem is the
    * fact-fact sort-merge at scale. Top-k via orderBy+limit plans as
    * TakeOrderedAndProject — no global sort of the full result.
    */
  val q3JoinTopk: Q = (s, d) => {
    val c = customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      // Exact-cents revenue (q1's sum_disc_price discipline): 4dp integer
      // product summed in LONG, HALF_UP to cents in integer space, /100.0.
      .agg((expr("(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * " +
        "(100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) div 100") / 100.0)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 5-way star join (c⋈o⋈l⋈s⋈n⋈r) with the compound
    * c_nationkey = s_nationkey condition. All dims broadcast; lineitem is
    * the only shuffled side at scale.
    */
  val q5FiveWayJoin: Q = (s, d) => {
    val c = customer(s, d); val o = orders(s, d); val l = lineitem(s, d)
    val su = supplier(s, d); val n = nation(s, d); val r = region(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      // Fixed-point LONG accumulation (round-12 item #5, replacing the
      // r11 DECIMAL form at ~40% hot-loop cost): 2-decimal price →
      // exact integer cents, 2-decimal discount → percent points, so
      // the per-row product is an exact integer in 1e-4 currency units
      // and the sum is order-free in primitive codegen arithmetic; the
      // corpus-spanning merge is DECIMAL(38,0) over the LONG partials
      // (widePartials — the ×97-mirror overflow lesson). `+50 div 100`
      // is round-half-up at the 1e-4 → cent boundary (sums positive by
      // fixture contract); the final scale shift runs in DECIMAL so the
      // double conversion is single-rounded — identical to DuckDB's
      // round(DECIMAL, 2)::DOUBLE. Same exact value as the DECIMAL
      // form, mirror-gate-verified.
      .transform(j => widePartials(j, Seq(col("r_name"), col("n_name")),
        Seq(
          sum(cents(col("l_extendedprice")) *
            (lit(100L) - cents(col("l_discount")))).as("__rev4"),
          count(lit(1)).as("__np"))))
      .groupBy(col("r_name"), col("n_name"))
      .agg(wideSum("__rev4").as("__rev4w"), sum(col("__np")).as("n_lines"))
      .withColumn("revenue",
        expr("CAST(CAST((__rev4w + 50) div 100 AS DECIMAL(38,2)) / 100 AS DOUBLE)"))
      .drop("__rev4w")
      .select(col("r_name"), col("n_name"), col("revenue"), col("n_lines"))
      .orderBy("r_name", "n_name")
  }

  /** Left + full outer join with null-extension: per-customer 1995 vs 1996
    * order counts (full outer), re-attached to customer (left outer).
    */
  val qJoinOuter: Q = (s, d) => {
    val o = orders(s, d)
    def yearCnt(y: Int, alias: String) =
      o.where(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey").as(s"k$y"))
        .agg(count(lit(1)).as(alias))
    val full = yearCnt(1995, "cnt95").join(yearCnt(1996, "cnt96"),
      col("k1995") === col("k1996"), "full")
      .select(coalesce(col("k1995"), col("k1996")).as("custkey"),
        col("cnt95"), col("cnt96"))
    customer(s, d)
      .join(full, col("c_custkey") === col("custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("cnt95"), lit(0L)).as("orders_1995"),
        coalesce(col("cnt96"), lit(0L)).as("orders_1996"))
      .where(col("c_custkey") <= 500)
      .orderBy("c_custkey")
  }

  /** Semi join (EXISTS): customers having at least one big order. */
  val qJoinSemi: Q = (s, d) => {
    val big = orders(s, d).where(col("o_totalprice") > 100000)
    customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Anti join (NOT EXISTS): customers with no orders at all. */
  val qJoinAnti: Q = (s, d) =>
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey").cast("long").as("c_nationkey"))
      .orderBy("c_custkey")

  /** Theta/range join (non-equi): suppliers bucketed by account balance
    * against an inline bucket table. Plans as broadcast-nested-loop with the
    * 5-row side broadcast — the right shape for a bounded dim at any scale.
    */
  val qJoinRange: Q = (s, d) => {
    val buckets = s.createDataFrame(Seq(
      ("negative", -100000.0, 0.0),
      ("low", 0.0, 2500.0),
      ("mid", 2500.0, 5000.0),
      ("high", 5000.0, 7500.0),
      ("top", 7500.0, 100000.0)
    )).toDF("bucket", "lo", "hi")
    supplier(s, d)
      .join(broadcast(buckets), col("s_acctbal") >= col("lo") && col("s_acctbal") < col("hi"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_suppliers"), avgMoney(col("s_acctbal"), 2).as("avg_bal"))
      .orderBy("bucket")
  }

  /** Rewrite a point-in-interval range join as a bucketed EQUI-join —
    * the scale path for non-equi joins. Spark plans `p >= lo AND p < hi`
    * with no equi component as broadcast-nested-loop: every point row
    * against every interval row, O(points × intervals) and only viable
    * while one side broadcasts. Bucketing by a fixed width turns it
    * into: intervals explode to the buckets they cover, points map to
    * their bucket, equi-join on bucket id (shuffle- or broadcast-hash,
    * AQE-eligible, skew-splittable), then the exact predicate re-checks
    * residually. Candidates per point = intervals overlapping its
    * bucket — width should be on the order of typical interval length
    * (too wide: more false candidates; too narrow: more bucket rows
    * per interval).
    */
  def bucketedRangeJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Double): DataFrame = {
    val pb = points.withColumn("__bucket",
      floor(col(ptCol) / width).cast("long"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bucket")
  }

  /** The q_join_range semantics through [[bucketedRangeJoin]], hinted
    * sort-merge to pin the both-sides-large shape (the broadcast twin
    * is q_join_range itself): same 5 account-balance bands, same
    * aggregate, zero nested-loop anywhere in the plan (PlanSpec).
    */
  val qJoinRangeBucketed: Q = (s, d) => {
    val buckets = s.createDataFrame(Seq(
      ("negative", -100000.0, 0.0),
      ("low", 0.0, 2500.0),
      ("mid", 2500.0, 5000.0),
      ("high", 5000.0, 7500.0),
      ("top", 7500.0, 100000.0)
    )).toDF("bucket", "lo", "hi")
    bucketedRangeJoin(supplier(s, d).hint("merge"), "s_acctbal",
        buckets, "lo", "hi", width = 2500.0)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_suppliers"), avgMoney(col("s_acctbal"), 2).as("avg_bal"))
      .orderBy("bucket")
  }

  /** As-of join: for each purchase event, the user's latest prior-or-equal
    * click. Union-tag form: merge both streams, one per-user window pass
    * carrying the last click `(ts, event_id)` forward — O(n log n) per
    * user, never the candidate blow-up of the equi+range join (which
    * materializes EVERY prior click per purchase: quadratic per hot user
    * at 100 TB). Clicks sort before purchases at equal ts (`kind`), and
    * ties on click ts resolve to the highest event_id — exactly the
    * oracle's `row_number() OVER (ORDER BY c_ts DESC, c_id DESC) = 1`.
    */
  val qJoinAsof: Q = (s, d) => {
    val e = events(s, d)
    val tagged = e.where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "click", 0).otherwise(1).as("kind"))
      .withColumn("click_info",
        when(col("kind") === 0, struct(col("ts"), col("event_id"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(asc("ts"), asc("kind"), asc("event_id"))
      .rowsBetween(Long.MinValue, 0)
    tagged
      .withColumn("last_click", last(col("click_info"), ignoreNulls = true).over(w))
      .where(col("kind") === 1 && col("last_click").isNotNull)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("last_click.event_id").as("asof_click_id"),
        col("last_click.ts").as("asof_click_ts"))
      .orderBy("p_id")
  }

  /** Interval join: purchases matched to ALL same-user clicks in the
    * preceding 30 minutes (the batch twin of `Streams.intervalJoin`, the
    * KStream⋈KStream windowed-join analogue — where q_join_asof keeps
    * only the latest match, this keeps every in-window match). Equi key
    * + range condition ⇒ a hash/sort-merge join on user_id with the
    * interval as a residual, never a cartesian.
    */
  val qJoinInterval: Q = (s, d) => {
    val ev = events(s, d)
    ev.where(col("event_type") === "purchase").alias("l")
      .join(ev.where(col("event_type") === "click").alias("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") >= col("l.ts") - expr("INTERVAL 30 minutes") &&
          col("r.ts") <= col("l.ts"))
      .select(col("l.event_id").as("p_id"), col("l.user_id").as("user_id"),
        col("l.ts").as("p_ts"), col("r.event_id").as("c_id"), col("r.ts").as("c_ts"))
      .orderBy("p_id", "c_id")
  }

  /** Left-outer interval join — the batch twin of
    * `Streams.intervalJoin(..., joinType = "left_outer")` (KStream
    * `leftJoin`): every purchase appears exactly once per in-window
    * click, or once null-padded when no same-user click precedes it
    * within 30 minutes. Same equi-key + residual-range shape as
    * [[qJoinInterval]]; the outer side only changes null handling, not
    * the join strategy.
    */
  val qJoinIntervalOuter: Q = (s, d) => {
    val ev = events(s, d)
    ev.where(col("event_type") === "purchase").alias("l")
      .join(ev.where(col("event_type") === "click").alias("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") >= col("l.ts") - expr("INTERVAL 30 minutes") &&
          col("r.ts") <= col("l.ts"),
        "left_outer")
      .select(col("l.event_id").as("p_id"), col("l.user_id").as("user_id"),
        col("l.ts").as("p_ts"), col("r.event_id").as("c_id"), col("r.ts").as("c_ts"))
      .orderBy("p_id", "c_id")
  }

  /** Shuffle-hash join — the third strategy beside broadcast and
    * sort-merge: both sides shuffle on the key but the build side
    * HASHES instead of sorting, the win when the build side is
    * mid-sized (past broadcast scale, small enough per-partition that a
    * hash table beats two sorts — no spill-to-sort safety net, which is
    * why Spark prefers SMJ unless hinted). Hint on the customer side =
    * build customer; PlanSpec pins ShuffledHashJoin took effect.
    */
  val qJoinShuffleHash: Q = (s, d) =>
    orders(s, d)
      .join(customer(s, d).hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      // Exact-cents + widePartials money sum: 5 mktsegments each span
      // ~n/5 orders, so the raw double sum drifted past round-2 at the
      // ×97 mirror (Σ ≈ 7·10¹¹) like every other corpus-spanning money
      // aggregate before it.
      .transform(j => widePartials(j, Seq(col("c_mktsegment")),
        Seq(count(lit(1)).as("__np"),
          sum(cents(col("o_totalprice"))).as("__pp"))))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("__np")).as("n_orders"),
        expr("CAST(CAST(sum(CAST(__pp AS DECIMAL(38,0))) AS DECIMAL(38,2)) / 100 AS DOUBLE)")
          .as("sum_price"))
      .orderBy("c_mktsegment")

  /** Cartesian product (tiny dims only): region × nation. */
  val qJoinCross: Q = (s, d) =>
    region(s, d).select(col("r_name"))
      .crossJoin(nation(s, d).select(col("n_name")))
      .orderBy("r_name", "n_name")

  // ---------------------------------------------------------- aggregation

  /** TPC-H Q1 — the flagship: two-phase hash aggregation with partial
    * (map-side) combine; group-by keys are low-cardinality so the shuffle
    * moves only #groups × #partitions rows at any scale.
    *
    * Money sums are exact integer fixed-point (the `cents` discipline):
    * price/discount/tax are 2-decimal, so cents·(100−discCents)·
    * (100+taxCents) is an exact integer in 10⁻⁶ dollar units and the LONG
    * sum is summation-order-free — the ×97 mirror gate (≈sf10, 58M rows)
    * caught the raw double sums drifting past the round-2 boundary
    * (…020.28 vs …020.27 at Σ≈5·10¹¹), invisible at sf0.1 AND the ×10
    * mirror. The corpus-spanning merge runs in DECIMAL(38,0) over LONG
    * per-partition partials ([[widePartials]]) so no total ever touches
    * the 2⁶³ limit the single-phase form would hit near sf180 (and the
    * charge product near sf10⁵ ≈ the 100 TB target itself). Quantity
    * sums stay double: integral-valued, exact below 2⁵³.
    *
    * The round-2 itself ALSO happens in integer space: `(Σ + 5000) div
    * 10⁴` (HALF_UP for positive sums) → exact cents → ÷100.0 (exact
    * double below 2⁵³). round(double, 2) of the divided sum is NOT
    * cross-engine stable once Σ exceeds 2⁵³: the same ×97 gate caught a
    * residual one-cent flip on sum_charge at a half-cent boundary —
    * Spark rounds the double's exact decimal expansion HALF_UP while
    * DuckDB scales-and-rounds, and at ulp(5·10¹⁷)=64 µ$ the two see
    * different sides of .xx5 (the Oracle.scala rounding trap).
    */
  val q1PricingSummary: Q = (s, d) => {
    val pc = cents(col("l_extendedprice"))
    val dc = cents(col("l_discount"))
    val tc = cents(col("l_tax"))
    val partials = widePartials(
      lineitem(s, d)
        .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp")),
      Seq(col("l_returnflag"), col("l_linestatus")),
      Seq(
        sum(col("l_quantity")).as("__qty"),
        sum(pc).as("__pc"),
        sum(dc).as("__dc"),
        sum(pc * (lit(100L) - dc)).as("__rev4"),
        sum(pc * (lit(100L) - dc) * (lit(100L) + tc)).as("__rev6"),
        count(lit(1)).as("__n")))
    partials
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("__qty")), 2).as("sum_qty"),
        round(wideSum("__pc").cast("double") / 100.0, 2).as("sum_base_price"),
        (expr("(sum(CAST(__rev4 AS DECIMAL(38,0))) + 50) div 100") / 100.0).as("sum_disc_price"),
        (expr("(sum(CAST(__rev6 AS DECIMAL(38,0))) + 5000) div 10000") / 100.0).as("sum_charge"),
        round(sum(col("__qty")) / sum(col("__n")), 2).as("avg_qty"),
        round(wideSum("__pc").cast("double") / 100.0 / sum(col("__n")), 2).as("avg_price"),
        round(wideSum("__dc").cast("double") / 100.0 / sum(col("__n")), 4).as("avg_disc"),
        sum(col("__n")).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** COUNT(DISTINCT) + SUM(DISTINCT): expand + two-phase aggregate. */
  val qAggDistinct: Q = (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        round(sum_distinct(col("l_quantity")), 2).as("sum_distinct_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Statistical aggregates: stddev/variance/corr/covar + EXACT
    * interpolated percentiles computed rank-based in two passes — NOT the
    * built-in `percentile`, which buffers every value of a group in one
    * ObjectHashAggregate state (a hot group at 100 TB OOMs its task, and
    * it was 8× the suite's aggregate median at sf0.1). Here per-group
    * state is O(1): pass 1 is a key-partitioned window sort (sort-based,
    * spillable) assigning ranks; pass 2 keeps only the ≤2 boundary rows
    * per percentile and interpolates v_lo + frac·(v_hi − v_lo) — the same
    * expression both Spark's `percentile` and DuckDB's `quantile_cont`
    * evaluate, so values stay bit-identical to the oracle.
    */
  val qAggStats: Q = (s, d) => {
    val li = lineitem(s, d).select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val stats = li.groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
        // Non-null count and null-excluded ranks: percentile/quantile_cont
        // ignore NULLs (lineitem has none, but the form stays generic).
        count(col("l_extendedprice")).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    // 1-based rank; for percentile p the 0-based position is p·(n−1), so
    // the boundary ranks are floor/ceil of p·(n−1)+1.
    val ranked = li.select(col("l_returnflag"), col("l_extendedprice"))
      .where(col("l_extendedprice").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(stats.select(col("l_returnflag"), col("__n"))), "l_returnflag")
    // 0-based position p·(n−1), exactly as both `percentile` and
    // `quantile_cont` define it; boundary ranks are its floor/ceil + 1.
    def pos(p: Double) = lit(p) * (col("__n") - 1)
    def boundary(p: Double) =
      col("__rn") === floor(pos(p)) + 1 || col("__rn") === ceil(pos(p)) + 1
    def vAt(rank: org.apache.spark.sql.Column) =
      min(when(col("__rn") === rank, col("l_extendedprice")))
    val pcts = ranked
      .where(boundary(0.5) || boundary(0.9))
      .groupBy(col("l_returnflag"))
      .agg(
        vAt(floor(pos(0.5)) + 1).as("__m_lo"), vAt(ceil(pos(0.5)) + 1).as("__m_hi"),
        vAt(floor(pos(0.9)) + 1).as("__p_lo"), vAt(ceil(pos(0.9)) + 1).as("__p_hi"))
    def interp(lo: String, hi: String, p: Double) =
      col(lo) + (pos(p) - floor(pos(p))) * (col(hi) - col(lo))
    // LEFT join: a group whose values are all NULL has n=0 → no ranked
    // rows → no pcts row; it must still appear with NULL percentiles,
    // matching the built-in `percentile`'s semantics.
    stats.join(broadcast(pcts), Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("sd_price"), col("var_qty"),
        col("corr_qty_price"), col("covar_qty_price"),
        round(interp("__m_lo", "__m_hi", 0.5), 4).as("median_price"),
        round(interp("__p_lo", "__p_hi", 0.9), 4).as("p90_price"))
      .orderBy("l_returnflag")
  }

  /** Per-group ordinary least squares via the regr_* aggregate family —
    * closed-form simple linear regression (price on quantity per return
    * flag) computed in ONE grouped aggregate pass with map-side partials,
    * exactly like any other moment aggregate; no iterative fitting, no
    * driver math. Both engines implement the same textbook formulas, so
    * the oracle is exact under rounding.
    */
  val qAggRegression: Q = (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6).as("avg_qty"))
      .orderBy("l_returnflag")

  /** ROLLUP hierarchy totals: region → nation customer counts. */
  val qAggRollup: Q = (s, d) =>
    customer(s, d)
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      // Fixed-point LONG balance sum (item #5; was DECIMAL(18,2) since
      // the r11 mirror gate caught the double grand-total drifting past
      // round(2)): exact integer cents sum order-free in primitive
      // arithmetic; a sum of 2-decimal values has exactly 2 decimals, so
      // the r11 round(…, 2) was an identity and no half-up is needed —
      // just the exact DECIMAL scale shift before the double cast. The
      // rollup itself runs over the widePartials frame — hierarchy
      // totals merge pre-aggregated (group, partition) rows, so the
      // grand total is a DECIMAL merge of LONG partials AND the rollup's
      // own input shrinks from |customer| to groups × partitions.
      .transform(j => widePartials(j, Seq(col("r_name"), col("n_name")),
        Seq(count(lit(1)).as("__np"), sum(cents(col("c_acctbal"))).as("__balp"))))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(col("__np")).as("n_customers"), wideSum("__balp").as("__balc"))
      .withColumn("sum_bal",
        expr("CAST(CAST(__balc AS DECIMAL(38,2)) / 100 AS DOUBLE)"))
      .drop("__balc")
      .select(col("r_name"), col("n_name"), col("n_customers"), col("sum_bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** CUBE over two dims. */
  val qAggCube: Q = (s, d) =>
    lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Explicit GROUPING SETS + grouping() marker — the native Dataset API
    * (no temp view: a session-global view name would race when two
    * threads run this query against different directories on one session).
    * Money sum follows the exact-cents + [[widePartials]] discipline: the
    * ×97 gate (≈sf10) caught the raw double sum drifting past the round-2
    * boundary at Σ ≈ 1.2·10¹² (…732.64 vs …732.60) — the same class the
    * r11 ×10 gate caught on rollup, one decade later because orders is
    * 4× smaller than lineitem. The grouping-set hierarchy re-aggregates
    * the tiny (status, priority, partition) partial frame, so every
    * grouping set's total is a DECIMAL merge of LONG partials.
    */
  val qAggGroupingSets: Q = (s, d) =>
    widePartials(orders(s, d),
        Seq(col("o_orderstatus"), col("o_orderpriority")),
        Seq(count(lit(1)).as("__np"), sum(cents(col("o_totalprice"))).as("__pp")))
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")),
          Seq(col("o_orderstatus"), col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
        sum(col("__np")).as("n"),
        expr("CAST(CAST(sum(CAST(__pp AS DECIMAL(38,0))) AS DECIMAL(38,2)) / 100 AS DOUBLE)")
          .as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Ordered collect per group, emitted as a joined string (deterministic
    * and hash-stable across engines; the array form is `array_sort(
    * collect_list(...))`).
    */
  val qAggCollect: Q = (s, d) =>
    nation(s, d)
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name")

  /** Approximate distinct (HLL++). No oracle — sketch values are
    * engine-specific; the spec asserts ±5% of exact instead.
    */
  val qAggApprox: Q = (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      .orderBy("l_returnflag")

  /** ORACLE-GRADED check frame for q_agg_approx (whose raw HLL++
    * estimates are engine-specific, so that key is rows-only): exact
    * distinct counts recomputed independently by DuckDB, plus booleans
    * the oracle expects TRUE — each estimate within the documented
    * `approx_count_distinct` default rsd (5%) ×2 of its exact count.
    * HLL++ register merge is order-insensitive, so the booleans are
    * deterministic for fixed data.
    */
  val qAggApproxCheck: Q = (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        (abs(approx_count_distinct(col("l_partkey")) - countDistinct(col("l_partkey"))) <=
          countDistinct(col("l_partkey")) * 0.1).as("parts_ok"),
        (abs(approx_count_distinct(col("l_orderkey")) - countDistinct(col("l_orderkey"))) <=
          countDistinct(col("l_orderkey")) * 0.1).as("orders_ok"))
      .orderBy("l_returnflag")

  /** Approximate percentiles (approx_percentile's mergeable quantile
    * sketch) — the quantile member of the sketch family next to HLL
    * distinct: O(accuracy) state per group instead of q_agg_stats'
    * rank-based two-pass, the trade a 100 TB profile query makes. No
    * oracle — sketch internals are engine-specific; the spec bounds the
    * error against the exact interpolated percentiles.
    */
  val qAggApproxQuantile: Q = (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000)).as("approx_p90"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** ORACLE-GRADED check frame for q_agg_approx_quantile (whose raw
    * estimates are merge-order dependent, so that key is rows-only):
    * per return flag, the exact interpolated percentiles — recomputed
    * independently by DuckDB (quantile_cont), real cross-engine values —
    * plus booleans the oracle expects TRUE: the approx_percentile
    * estimate's exact rank interval [F(<v), F(≤v)] intersects
    * [q − ε, q + ε] with ε = 2/accuracy (2× the documented 1/accuracy
    * bound). The bound holds for EVERY merge order, so the booleans are
    * deterministic even though the estimates aren't. `l_quantity`
    * (integral values) keeps the exact interpolation off round-6
    * boundaries, per the qAggPercentileExact discipline; the estimate
    * frame joined back is one row per return flag — bounded by group
    * cardinality, broadcast by contract.
    */
  val qApproxQuantileCheck: Q = (s, d) => {
    val li = lineitem(s, d).select(col("l_returnflag"), col("l_quantity"))
    // (r17) Array forms for BOTH quantile pairs: each scalar
    // percentile_approx/percentile agg otherwise accumulates its own
    // per-group summary/buffer over the same rows — the array call
    // accumulates once and queries twice. Estimates and exact values
    // are identical: same summary state, same rank queries (and the
    // booleans tolerate any merge order by design, see scaladoc).
    val est = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_quantity"), lit(Array(0.5, 0.9)),
        lit(10000)).as("__e"))
      .select(col("l_returnflag"),
        element_at(col("__e"), 1).as("__e50"),
        element_at(col("__e"), 2).as("__e90"))
    val eps = 2.0 / 10000
    li.join(broadcast(est), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(Array(0.5, 0.9))).as("__px"),
        avg(when(col("l_quantity") <= col("__e50"), 1.0).otherwise(0.0)).as("__le50"),
        avg(when(col("l_quantity") < col("__e50"), 1.0).otherwise(0.0)).as("__lt50"),
        avg(when(col("l_quantity") <= col("__e90"), 1.0).otherwise(0.0)).as("__le90"),
        avg(when(col("l_quantity") < col("__e90"), 1.0).otherwise(0.0)).as("__lt90"))
      .select(col("l_returnflag"),
        round(element_at(col("__px"), 1), 6).as("exact_p50"),
        round(element_at(col("__px"), 2), 6).as("exact_p90"),
        (col("__le50") >= 0.5 - eps && col("__lt50") <= 0.5 + eps).as("p50_ok"),
        (col("__le90") >= 0.9 - eps && col("__lt90") <= 0.9 + eps).as("p90_ok"))
      .orderBy("l_returnflag")
  }

  /** Exact interpolated percentiles — the ground-truth twin of
    * [[qAggApproxQuantile]]: percentile() buffers and sorts each group's
    * values. Oracle is DuckDB's quantile_cont — both engines
    * interpolate at rank q·(n−1) in IEEE doubles; round-6 absorbs
    * association-order noise, and l_quantity's integral values keep
    * results off rounding boundaries.
    *
    * 100-TB cardinality guard (r15 verdict item #5): Spark's
    * `Percentile` buffer is a (value → count) hash map — O(DISTINCT
    * values per group), not O(rows). Every exact-percentile key here
    * runs it on a DOMAIN-bounded column: l_quantity is 50 integers, and
    * the 2-decimal money columns (q_winsorize / q_histogram_equidepth
    * on l_extendedprice) have at most (max−min)·100+1 distinct cents
    * (≈10.4M for the TPC-H price domain) regardless of row count — a
    * 100× row scale-up grows the counts, never the entry set
    * (PercentileSpec proves both the 2-decimal property and the
    * inflation-invariance of the distinct set). For arbitrary-precision
    * columns that bound disappears — use the mergeable-sketch path
    * (q_sketch_kll / q_agg_approx_quantile) at corpus scale.
    */
  val qAggPercentileExact: Q = (s, d) =>
    // (r17) ONE array-percentile buffer for the three quantiles instead
    // of three independent per-group buffers (the qHistogramEquidepth
    // lesson): same buffer, same rank interpolation, same round-6 —
    // values identical by construction.
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(Array(0.25, 0.5, 0.95))).as("__ps"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        round(element_at(col("__ps"), 1), 6).as("p25"),
        round(element_at(col("__ps"), 2), 6).as("median"),
        round(element_at(col("__ps"), 3), 6).as("p95"),
        col("n_rows"))
      .orderBy("l_returnflag")

  /** min_by/max_by: each nation's richest and poorest supplier. The
    * ordering value is an exact-integer composite (floor(bal·100 + ½) ·
    * 10⁵ + suppkey) rather than the raw double or a struct: DuckDB 1.0's
    * arg_max takes scalar ordering keys only, float FORMATTING and
    * double→int CASTS round differently across engines (Java HALF_UP vs
    * C round-half-even; Spark cast truncates, DuckDB rounds), and a
    * suppkey tiebreak keeps the survivor a pure function of the data
    * even under acctbal ties (G4).
    */
  val qAggMinmaxBy: Q = (s, d) => {
    val tie = floor(col("s_acctbal") * 100 + lit(0.5)).cast("long") * 100000L +
      col("s_suppkey")
    supplier(s, d)
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        max_by(col("s_name"), tie).as("richest_supplier"),
        round(max(col("s_acctbal")), 2).as("max_bal"),
        min_by(col("s_name"), tie).as("poorest_supplier"),
        round(min(col("s_acctbal")), 2).as("min_bal"),
        count(lit(1)).as("n_suppliers"))
      .orderBy("n_name")
  }

  /** Time-series resample with gap fill: per user, a dense hourly grid
    * from first to last activity (sequence + explode — Spark's
    * generate_series), left-joined to hourly aggregates, empty hours
    * zero-filled. The densification step every time-series feature
    * pipeline needs; grid size is bounded per key, so the explode is a
    * bounded fan-out, not a cross join.
    */
  val qResample: Q = (s, d) => {
    val ev = events(s, d).where(col("user_id") <= 20)
    val grid = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"), sumValue2(col("value")).as("sum_value"))
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("user_id", "hour")
  }

  /** Custom typed aggregation (Aggregator[IN,BUF,OUT] via udaf):
    * quantity-weighted average price. Two-phase like native aggregates.
    */
  val qAggUdaf: Q = (s, d) => {
    val wavg = udaf(graft.functions.WeightedAvg)
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(wavg(col("l_extendedprice"), col("l_quantity")), 2).as("wavg_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Grouped top-k via the bounded [[graft.functions.TopKAgg]]
    * aggregator — same result set as the q_window_rank shape (top-3
    * orders per customer) but with aggregation physics: the window
    * form shuffles and sorts EVERY order row per customer, while the
    * aggregator's map-side partial cuts each partition to ≤ k rows per
    * group before the shuffle (see TopKAgg's scaladoc for the 100 TB
    * arithmetic). The packed array is posexploded back to ranked rows;
    * the (value DESC, id ASC) total order makes rank deterministic.
    */
  val qGroupedTopkAgg: Q = (s, d) => {
    val top3 = udaf(new graft.functions.TopKAgg(3))
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(top3(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(
        col("o_custkey"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col._1").as("o_totalprice"),
        col("col._2").as("o_orderkey"))
      .orderBy("o_custkey", "rank")
  }

  /** Value-distribution histogram via `width_bucket` — the analytics
    * staple for "what does this column look like": equi-width buckets
    * over the order-price domain, one hash aggregate (map-side partial),
    * bucket edges emitted so the result reads standalone. Out-of-range
    * values land in the under/overflow buckets 0 and n+1 by the
    * function's contract.
    */
  val qAggHistogram: Q = (s, d) => {
    val n = 10
    val (lo, hi) = (0.0, 500000.0)
    orders(s, d)
      .withColumn("bucket", width_bucket(col("o_totalprice"), lit(lo), lit(hi), lit(n)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .withColumn("bucket_lo", round(lit(lo) + (col("bucket") - 1) * lit((hi - lo) / n), 2))
      .select(col("bucket"), col("bucket_lo"), col("n_orders"), col("min_price"), col("max_price"))
      .orderBy("bucket")
  }

  /** Share-of-total (ratio-to-report): each nation's revenue share of
    * the grand total via a window over the WHOLE frame — the aggregate
    * runs first (25 rows), so the unpartitioned window is trivial; at
    * any scale this shape is "aggregate, then window over the small
    * result", never a window over the fact table.
    */
  val qShareOfTotal: Q = (s, d) => {
    val w = Window.partitionBy()
    // Fixed-point LONG accumulation (item #5; DECIMAL since the r11
    // mirror gate caught the double sum's partial-agg tree order
    // drifting ~5e-3 past a round(2) boundary at ≈sf1 partition
    // counts): exact integer cents, order-free primitive sum; the
    // DECIMAL scale shift keeps the double conversion single-rounded,
    // and both engines then divide identical doubles for the share.
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .transform(j => widePartials(j, Seq(col("n_name")),
        Seq(sum(cents(col("o_totalprice"))).as("__revp"))))
      .groupBy(col("n_name"))
      .agg(wideSum("__revp").as("revc"))
      .withColumn("revenue", expr("CAST(CAST(revc AS DECIMAL(38,2)) / 100 AS DOUBLE)"))
      .withColumn("share_pct", round(col("revenue") /
        expr("CAST(CAST(sum(revc) OVER () AS DECIMAL(38,2)) / 100 AS DOUBLE)") * 100.0, 4))
      .select(col("n_name"), col("revenue"), col("share_pct"))
      .orderBy("n_name")
  }

  // -------------------------------------------------------------- windows

  /** Ranking window functions: top-3 orders per customer. */
  val qWindowRank: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .where(col("rn") <= 3 && col("o_custkey") <= 200)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("rn").cast("long").as("rn"), col("rk").cast("long").as("rk"),
        col("drk").cast("long").as("drk"), col("quartile"))
      .orderBy("o_custkey", "rn")
  }

  /** Analytic window functions: lag/lead/first/last per user over time. */
  val qWindowAnalytic: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
    val wf = w.rowsBetween(Long.MinValue, Long.MaxValue)
    events(s, d)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("first_value", first(col("value")).over(wf))
      .withColumn("last_value", last(col("value")).over(wf))
      .where(col("user_id") <= 20)
      .select(col("user_id"), col("event_id"),
        round(col("value"), 2).as("value"),
        round(coalesce(col("prev_value"), lit(0.0)), 2).as("prev_value"),
        round(coalesce(col("next_value"), lit(0.0)), 2).as("next_value"),
        round(col("first_value"), 2).as("first_value"),
        round(col("last_value"), 2).as("last_value"))
      .orderBy("user_id", "event_id")
  }

  /** Frame specs: running sum (unbounded→current) and 3-row moving average. */
  val qWindowFrame: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(asc("o_orderdate"), asc("o_orderkey"))
    orders(s, d)
      .withColumn("running_spend", sum(col("o_totalprice")).over(w.rowsBetween(Long.MinValue, 0)))
      .withColumn("moving_avg3", avg(col("o_totalprice")).over(w.rowsBetween(-2, 0)))
      .where(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        round(col("running_spend"), 2).as("running_spend"),
        round(col("moving_avg3"), 4).as("moving_avg3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Distribution window functions — percent_rank/cume_dist per priority
    * band (the ranking family's remaining members next to q_window_rank's
    * row_number/rank/dense_rank/ntile). The key filter sits BELOW the
    * window so both engines rank the identical partition contents.
    */
  val qWindowDist: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(asc("o_totalprice"), asc("o_orderkey"))
    orders(s, d)
      .where(col("o_orderkey") <= 1000)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderkey")
  }

  /** Correlated scalar subquery — each customer's max order value.
    * Deliberately SQL (reading parquet paths directly, no temp views —
    * a session-global view name would race across threads): the point is
    * Catalyst's RewriteCorrelatedScalarSubquery decorrelation, which the
    * DataFrame API can't reach. Customers with no orders surface NULL.
    */
  val qScalarSubquery: Q = (s, d) =>
    s.sql(
      s"""SELECT c_custkey, c_name,
         |  (SELECT round(max(o_totalprice), 2) FROM parquet.`$d/orders.parquet` o
         |   WHERE o.o_custkey = c.c_custkey) AS max_order
         |FROM parquet.`$d/customer.parquet` c
         |WHERE c_custkey <= 300 ORDER BY c_custkey""".stripMargin)

  // --------------------------------------------------------- sort / limit

  /** Multi-column sort with mixed direction and explicit nulls ordering
    * (nulls manufactured via nullif — fixtures are null-free).
    */
  val qSortMulti: Q = (s, d) =>
    orders(s, d)
      .where(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"), col("o_custkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
        round(col("o_totalprice"), 2).as("total_price"))
      .orderBy(asc_nulls_first("status_or_null"), desc("total_price"), asc("o_orderkey"))

  /** Global top-k → TakeOrderedAndProject (no full sort at scale). */
  val qTopk: Q = (s, d) =>
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy(desc("price"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(10)

  // -------------------------------------------------------- pivot/unpivot

  /** Pivot: per-user event counts, one column per event type. The value
    * list is given explicitly, so no extra distinct-values job runs and
    * the plan is a single hash aggregation (the 100 TB shape — an
    * unlisted pivot first scans for distinct keys).
    */
  val qPivot: Q = (s, d) =>
    events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "purchase", "view", "signup", "error"))
      .agg(count(lit(1)))
      .select(col("user_id") +: Seq("click", "purchase", "view", "signup", "error")
        .map(c => coalesce(col(c), lit(0L)).as(s"n_$c")): _*)
      .orderBy("user_id")

  /** Unpivot/melt: lineitem measures to long form (id, measure, value). */
  val qUnpivot: Q = (s, d) =>
    lineitem(s, d)
      .where(col("l_orderkey") <= 500)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")

  // ------------------------------------------------------------- set ops

  /** UNION ALL + UNION DISTINCT of two event slices. */
  val qUnion: Q = (s, d) => {
    val e = events(s, d)
    val a = e.where(col("event_type") === "click").select(col("user_id"))
    val b = e.where(col("event_type") === "purchase").select(col("user_id"))
    a.union(b).distinct()
      .withColumnRenamed("user_id", "active_user")
      .orderBy("active_user")
  }

  /** INTERSECT: users who both clicked and purchased. */
  val qIntersect: Q = (s, d) => {
    val e = events(s, d)
    e.where(col("event_type") === "click").select(col("user_id"))
      .intersect(e.where(col("event_type") === "purchase").select(col("user_id")))
      .orderBy("user_id")
  }

  /** EXCEPT: users who clicked but never purchased. */
  val qExcept: Q = (s, d) => {
    val e = events(s, d)
    e.where(col("event_type") === "click").select(col("user_id"))
      .except(e.where(col("event_type") === "purchase").select(col("user_id")))
      .orderBy("user_id")
  }

  /** Spearman rank correlation WITHOUT a global sort: ranking 600 K rows
    * with a window over an empty partition spec is a single-task sort —
    * the classic rank-correlation scale trap. Instead, per-VALUE midranks
    * (midrank = cumrank − (ties−1)/2) are computed on the tiny distinct
    * dictionaries (50 quantities, 11 discounts — the window runs over
    * the dictionary, not the data) and broadcast-joined back, so the
    * data path is two map-side joins + one aggregate. For continuous
    * columns the dictionary approaches the row count — bin or sample
    * first; the low-cardinality pair here is the honest use case.
    */
  /** Per-value midranks (midrank = cumrank − (ties−1)/2) over the
    * DISTINCT dictionary of `c` — the single-task window runs over the
    * dictionary, never the data (qCorrSpearman scaladoc).
    */
  private def midranks(df: DataFrame, c: String, out: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("__n"))
      .withColumn("__cum", sum("__n").over(Window.orderBy(col(c))))
      .select(col(c), (col("__cum") - (col("__n") - 1) / 2.0).as(out))

  /** Spearman of (cA, cB) via dictionary midranks broadcast-joined back:
    * two map-side joins + one aggregate; valid while both dictionaries
    * are small (use [[corrSpearmanBinned]] for continuous columns).
    */
  def corrSpearman(df: DataFrame, cA: String, cB: String, outName: String): DataFrame =
    df.join(broadcast(midranks(df, cA, "__rank_a")), cA)
      .join(broadcast(midranks(df, cB, "__rank_b")), cB)
      .agg(round(corr(col("__rank_a"), col("__rank_b")), 6).as(outName),
        count(lit(1)).as("n_rows"))

  /** Binned Spearman for CONTINUOUS columns, where the raw distinct
    * dictionary approaches the row count and the midrank window would
    * become the single-task global sort this formulation exists to
    * avoid: `width_bucket` pre-bins both columns to ≤ bins+2 values (a
    * monotone map, which is all rank correlation consumes), capping the
    * dictionary regardless of data cardinality. The result is Spearman
    * of the binned variables — exact whenever binning is injective on
    * the realized values (SpearmanSpec pins this on generated
    * low-cardinality data) and a bins-resolution approximation
    * otherwise, converging as bins grows. One extra aggregate for the
    * bounds (a 1-row broadcast); everything else is map-side.
    */
  def corrSpearmanBinned(df: DataFrame, cA: String, cB: String,
      outName: String, bins: Int = 1000): DataFrame = {
    val bounds = df.agg(
      min(col(cA)).as("__amin"), max(col(cA)).as("__amax"),
      min(col(cB)).as("__bmin"), max(col(cB)).as("__bmax"))
    val binned = df.crossJoin(broadcast(bounds))
      .select(
        width_bucket(col(cA), col("__amin"), col("__amax"), lit(bins)).as("__bin_a"),
        width_bucket(col(cB), col("__bmin"), col("__bmax"), lit(bins)).as("__bin_b"))
    corrSpearman(binned, "__bin_a", "__bin_b", outName)
  }

  val qCorrSpearman: Q = (s, d) =>
    corrSpearman(Tables.lineitem(s, d).select("l_quantity", "l_discount"),
      "l_quantity", "l_discount", "spearman_qty_discount")

  /** Single-pass column profiling — the data-quality census a pipeline
    * runs before training: per profiled column, non-null count, distinct
    * count, min/max/mean, all computed in ONE aggregate over one scan
    * (the multi-distinct agg plans as one Expand + hash aggregate, not
    * one scan per column) and unpivoted to a row per column via a
    * map-side explode.
    */
  val qProfile: Q = (s, d) => {
    // fanOut: the multi-distinct agg plans as Expand ×(columns+1) rows
    // BEFORE the partial aggregate — on the single-partition fixture
    // scan (G10) that 5× row blow-up would run in one task.
    val li = Dedup.fanOut(Tables.lineitem(s, d)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      round(min(col(c)), 4).as(s"${c}__min"),
      round(max(col(c)), 4).as(s"${c}__max"),
      // money columns: exact-cents mean (avgMoney); l_quantity is
      // integral-valued so its raw double sum is already order-free
      (if (c == "l_quantity") round(avg(col(c)), 4)
       else avgMoney(col(c), 4)).as(s"${c}__avg")))
    li.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col(s"${c}__nn").as("n_nonnull"), col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_value"), col(s"${c}__max").as("max_value"),
          col(s"${c}__avg").as("avg_value"))): _*)).as("p"))
      .select(col("p.column"), col("n_rows"), col("p.n_nonnull"), col("p.n_distinct"),
        col("p.min_value"), col("p.max_value"), col("p.avg_value"))
      .orderBy("column")
  }

  val queries: Map[String, Q] = Map(
    "q_profile" -> qProfile,
    "q_corr_spearman" -> qCorrSpearman,
    "q_scan_project" -> qScanProject,
    "q_filter_predicates" -> qFilterPredicates,
    "q_project_expr" -> qProjectExpr,
    "q3_join_topk" -> q3JoinTopk,
    "q5_5way_join" -> q5FiveWayJoin,
    "q_join_outer" -> qJoinOuter,
    "q_join_semi" -> qJoinSemi,
    "q_join_anti" -> qJoinAnti,
    "q_join_range" -> qJoinRange,
    "q_join_range_bucketed" -> qJoinRangeBucketed,
    "q_join_asof" -> qJoinAsof,
    "q_join_interval" -> qJoinInterval,
    "q_join_interval_outer" -> qJoinIntervalOuter,
    "q_join_cross" -> qJoinCross,
    "q_join_shuffle_hash" -> qJoinShuffleHash,
    "q1_pricing_summary" -> q1PricingSummary,
    "q_agg_distinct" -> qAggDistinct,
    "q_agg_stats" -> qAggStats,
    "q_agg_regression" -> qAggRegression,
    "q_agg_rollup" -> qAggRollup,
    "q_agg_cube" -> qAggCube,
    "q_agg_grouping_sets" -> qAggGroupingSets,
    "q_agg_collect" -> qAggCollect,
    "q_agg_approx" -> qAggApprox,
    "q_agg_approx_check" -> qAggApproxCheck,
    "q_agg_approx_quantile" -> qAggApproxQuantile,
    "q_approx_quantile_check" -> qApproxQuantileCheck,
    "q_agg_percentile_exact" -> qAggPercentileExact,
    "q_agg_minmax_by" -> qAggMinmaxBy,
    "q_resample" -> qResample,
    "q_agg_udaf" -> qAggUdaf,
    "q_agg_histogram" -> qAggHistogram,
    "q_share_of_total" -> qShareOfTotal,
    "q_grouped_topk_agg" -> qGroupedTopkAgg,
    "q_window_rank" -> qWindowRank,
    "q_window_analytic" -> qWindowAnalytic,
    "q_window_frame" -> qWindowFrame,
    "q_window_dist" -> qWindowDist,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_sort_multi" -> qSortMulti,
    "q_topk" -> qTopk,
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_union" -> qUnion,
    "q_intersect" -> qIntersect,
    "q_except" -> qExcept
  )
}
