package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-analytics staples over the events stream table — the funnel and
  * cohort-retention reports every product-analytics deployment runs, as
  * pure relational compositions (each step a hash aggregate or an
  * equi-join on user_id; no window over a global order, no state).
  *
  * Scale: everything keys on user_id (or the derived cohort day) — the
  * natural shuffle key; step frames are per-user single rows (bounded),
  * so the joins are 1:1 after map-side-partial min aggregates.
  */
object EventAnalytics {
  import Tables.events
  type Q = (SparkSession, String) => DataFrame

  /** Ordered-funnel step times per user: earliest `view`, the earliest
    * `click` AFTER that view, and the earliest `purchase` AFTER that
    * click, each within `windowHours` of the previous step. The
    * strictly-increasing-time constraint is what makes it a FUNNEL
    * rather than three independent filters.
    */
  private[graft] def funnelSteps(ev: DataFrame, windowHours: Int): DataFrame = {
    val horizon = expr(s"INTERVAL $windowHours HOURS")
    val s1 = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, "user_id")
      .where(col("ts") > col("t1") && col("ts") <= col("t1") + horizon)
      .groupBy("user_id").agg(min(col("t1")).as("t1"), min(col("ts")).as("t2"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, "user_id")
      .where(col("ts") > col("t2") && col("ts") <= col("t2") + horizon)
      .groupBy("user_id").agg(min(col("t2")).as("t2"), min(col("ts")).as("t3"))
    s1.join(s2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
      .join(s3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
  }

  /** Graded funnel report: users entering each step and the step-to-step
    * conversion rates (the drop-off chart). One row — the report head a
    * dashboard renders.
    */
  val qFunnel: Q = (s, d) => {
    val steps = funnelSteps(events(s, d), windowHours = 24)
    steps.agg(
      count(lit(1)).as("n_view"),
      count(col("t2")).as("n_click"),
      count(col("t3")).as("n_purchase"),
      round(count(col("t2")).cast("double") / count(lit(1)), 6).as("view_to_click"),
      round(count(col("t3")).cast("double") / greatest(count(col("t2")), lit(1L)), 6)
        .as("click_to_purchase"))
  }

  /** Graded cohort retention: users grouped by first-seen day (their
    * cohort), counted by how many distinct later days they came back —
    * the (cohort_day, day_offset, n_users) triangle. Two aggregates and
    * one user-keyed join; day offsets beyond `maxOffset` are truncated
    * (the report is a fixed-width triangle, not an unbounded matrix).
    */
  val qCohortRetention: Q = (s, d) => {
    val ev = events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, "user_id")
      .select(col("cohort_day"), col("user_id"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .where(col("day_offset") <= 14)
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Normalized retention curve — the percentage rendering of the
    * cohort triangle dashboards actually plot: each (cohort, offset)
    * cell divided by its cohort's day-0 size (every user is active on
    * their own first-seen day, so the offset-0 cell IS the cohort size
    * — no second aggregate; the division joins cohort-keyed frames on
    * the key they already share). Rates divide two exact integers.
    */
  val qRetentionCurve: Q = (s, d) => {
    val tri = qCohortRetention(s, d)
    val size = tri.where(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    tri.join(size, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_users"),
        col("cohort_size"),
        round(col("n_users").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  /** DAU/WAU engagement report: per day, the distinct actives that day,
    * the distinct actives over the trailing 7 days, and the stickiness
    * ratio. A DISTINCT count cannot ride a sliding window aggregate
    * (distinct is not decomposable over overlapping frames), so each
    * active (user, day) fans out to the ≤7 report days it supports —
    * linear ×7, then two plain distinct-counts. Report days are
    * restricted to days with actual activity (no calendar scaffold).
    */
  val qDauWau: Q = (s, d) => {
    val active = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = active.select(col("day")).distinct()
    val dau = active.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = active
      .withColumn("report_day", explode(sequence(col("day"), date_add(col("day"), 6))))
      .join(days.withColumnRenamed("day", "report_day"), Seq("report_day"))
      .select(col("report_day").as("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  /** Event-transition matrix — the Markov/Sankey artifact next to the
    * funnel: per (from_type → to_type), how many consecutive-event
    * transitions occur across all user timelines and each destination's
    * share of its source's outflow. `lead` over (ts, event_id) within
    * user — a deterministic total order because (user_id, ts, event_id)
    * is unique in the fixture (and event_id breaks ts ties in general).
    * Scale: ONE window partitioned by user_id (the natural high-
    * cardinality shuffle key — no global order anywhere), then a hash
    * aggregate on the 5×5-bounded type-pair key; the share window runs
    * over ≤ |event types| rows.
    */
  val qEventTransitions: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byFrom = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(byFrom).cast("double"), 6))
      .orderBy("from_type", "to_type")
  }

  /** Truncated-EWMA smoothing parameters: α = 0.3, horizon 14 days.
    * Weights are FIXED-POINT (1e-8 units): double weights summed in
    * arbitrary partial-aggregation order strayed 1 ulp across the
    * round-6 boundary at sf0.1 (measured — 609.5352945), so the
    * convolution instead accumulates n·w exactly in BIGINT, order-free,
    * and divides by the scale once at the end. The integer weight list
    * is interpolated into the oracle, so both engines share it by
    * construction.
    */
  val EwmaAlpha = 0.3
  val EwmaHorizon = 14
  val EwmaScale = 100000000L
  val EwmaWeightsFixed: IndexedSeq[Long] =
    Iterator.iterate(EwmaAlpha)(_ * (1 - EwmaAlpha)).take(EwmaHorizon)
      .map(w => math.round(w * EwmaScale)).toIndexedSeq

  /** Exponentially-weighted smoothing of the per-type daily event series
    * — the trend-monitoring staple (ingest-volume dashboards, drift
    * alarms). The recursive EWMA s_t = αx_t + (1−α)s_{t−1} is
    * deliberately re-expressed as its TRUNCATED convolution
    * Σ_{k<14} α(1−α)^k · x_{t−k} (tail weight 0.7¹⁴ ≈ 0.7 %): the
    * recursion is a sequential scan — the convolution is a bounded
    * 14-way fan-out (explode) into ONE shuffle on the (type, day) key,
    * embarrassingly parallel at any scale. Days with no events
    * contribute nothing and are not reported (observed-day smoothing);
    * the final join keeps only real days and rides the same key as the
    * fan-in aggregate.
    */
  /** The per-(type, day) count table — the ONLY corpus-scale aggregation
    * of the smoothing family; everything downstream is calendar-bounded.
    * Shared verbatim with the streaming face (Streams.dailyCountStream),
    * where this same aggregation runs in update mode and the count table
    * IS the state.
    */
  private[graft] def dailyCounts(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))

  private[graft] def smoothedDaily(ev: DataFrame): DataFrame =
    smoothFromDaily(dailyCounts(ev))

  /** EWMA convolution over an existing daily-count frame — bounded by
    * the calendar, so it runs identically over the batch aggregate or a
    * streaming state snapshot (the parity spec feeds it both).
    */
  private[graft] def smoothFromDaily(daily: DataFrame): DataFrame = {
    val wArr = array(EwmaWeightsFixed.map(lit): _*)
    val fan = daily
      .select(col("event_type"), col("day"), col("n"),
        explode(sequence(lit(0), lit(EwmaHorizon - 1))).as("k"))
      .select(col("event_type"),
        date_add(col("day"), col("k")).as("day"),
        (col("n") * element_at(wArr, col("k") + 1)).as("c"))
    val sm = fan.groupBy(col("event_type"), col("day"))
      .agg(round(sum(col("c")).cast("double") / lit(EwmaScale.toDouble), 6).as("ewma"))
    daily.join(sm, Seq("event_type", "day"))
  }

  val qEwma: Q = (s, d) =>
    smoothedDaily(events(s, d)).orderBy("event_type", "day")

  /** Volume-anomaly day flagging: each day's count against YESTERDAY'S
    * smoothed level (lag of the EWMA — the day must not predict itself).
    * The deviation ratio is computed on the already-rounded EWMA, so
    * both engines divide identical doubles and the ±20 % flag never
    * rides a summation ulp. The lag window partitions by event type and
    * orders by day — a per-type series bounded by the calendar, never by
    * corpus size (the time dimension doesn't scale with data volume; the
    * per-day aggregation upstream did the corpus-sized work).
    */
  /** Thresholds as LITERAL doubles (not 1 ± band arithmetic): parsing
    * "1.2" and computing 1 + 0.2 land on ADJACENT doubles, and the
    * oracle parses. */
  val AnomalyHi = 1.2
  val AnomalyLo = 0.8

  /** The full daily→smoothed→flagged derivation over a count frame —
    * calendar-bounded, shared by the graded key and the streaming-state
    * parity (the online monitor re-derives this over its count state
    * each batch).
    */
  private[graft] def anomalyFromDaily(daily: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    smoothFromDaily(daily)
      .withColumn("ewma_prev", lag(col("ewma"), 1).over(w))
      .where(col("ewma_prev").isNotNull)
      .withColumn("ratio", round(col("n").cast("double") / col("ewma_prev"), 6))
      .withColumn("anomaly",
        col("ratio") > lit(AnomalyHi) || col("ratio") < lit(AnomalyLo))
  }

  val qAnomalyDays: Q = (s, d) =>
    anomalyFromDaily(dailyCounts(events(s, d))).orderBy("event_type", "day")

  /** Last-touch conversion attribution: each purchase credits the most
    * recent view/click by the same user within the preceding 7 days
    * (ties — simultaneous touches — to the highest event_id, so the
    * credit is a deterministic function of the data).
    *
    * Scale shape: one shuffle equi-join on user_id between the two
    * filtered event streams (both filters reach the scan); the in-window
    * band predicate prunes the per-user pairs, and the per-purchase rank
    * window holds only that purchase's in-horizon touches — bounded by a
    * user's 7-day activity, never by the corpus. A bot-grade hot user
    * would split by the Dedup.Salted discipline before the join.
    */
  val AttributionDays = 7
  private[graft] def attribution(ev: DataFrame): DataFrame = {
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val touches = ev.where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("ts").as("t_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id")).orderBy(desc("t_ts"), desc("touch_id"))
    purchases.join(touches, "user_id")
      .where(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr(s"INTERVAL $AttributionDays DAYS"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"), col("touch_id"),
        col("touch_type"), col("t_ts"), col("p_ts"))
      .orderBy("purchase_id")
  }

  val qAttribution: Q = (s, d) => attribution(events(s, d))

  /** Linear (equal-credit) multi-touch attribution — the sibling model:
    * every in-horizon touch of a purchase shares the credit 1/n. Same
    * user-keyed band join as the last-touch key; the per-purchase count
    * window is bounded by a user's horizon activity. The share divides
    * 1 by an exact integer, so every credit is a single deterministic
    * expression.
    */
  val qAttributionLinear: Q = (s, d) => {
    val ev = events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val touches = ev.where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("ts").as("t_ts"))
    val byPurchase = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
    purchases.join(touches, "user_id")
      .where(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr(s"INTERVAL $AttributionDays DAYS"))
      .withColumn("n_touches", count(lit(1)).over(byPurchase))
      .select(col("purchase_id"), col("user_id"), col("touch_id"),
        col("touch_type"), col("n_touches"),
        round(lit(1.0) / col("n_touches"), 6).as("credit"))
      .orderBy("purchase_id", "touch_id")
  }

  val queries: Map[String, Q] = Map(
    "q_funnel" -> qFunnel,
    "q_cohort_retention" -> qCohortRetention,
    "q_retention_curve" -> qRetentionCurve,
    "q_dau_wau" -> qDauWau,
    "q_event_transitions" -> qEventTransitions,
    "q_ewma" -> qEwma,
    "q_anomaly_days" -> qAnomalyDays,
    "q_attribution" -> qAttribution,
    "q_attribution_linear" -> qAttributionLinear
  )
}
