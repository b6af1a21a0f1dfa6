package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streams.Event

/** Funnel/cohort semantics the mirrored oracle cannot independently
  * witness (both sides run the same CTE shape, so a shared semantic slip
  * would hash-match): step ORDER must matter, horizons must bind, and
  * cohort offsets must count distinct active days, not events.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private def run(evs: Seq[Event], key: String) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ea").toString
    // Write with the fixture's events schema (the loaders adapt on ts dtype).
    evs.toDF().select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    SparkEntry.queries(key)(spark, tmp)
  }

  test("funnel counts require strict step order within the horizon") {
    val evs = Seq(
      // user 1: view -> click -> purchase, in order: full conversion.
      Event(1L, 1L, "view", ts("2024-01-01 10:00:00"), 0),
      Event(2L, 1L, "click", ts("2024-01-01 11:00:00"), 0),
      Event(3L, 1L, "purchase", ts("2024-01-01 12:00:00"), 0),
      // user 2: purchase BEFORE click — no purchase conversion.
      Event(4L, 2L, "view", ts("2024-01-01 10:00:00"), 0),
      Event(5L, 2L, "purchase", ts("2024-01-01 10:30:00"), 0),
      Event(6L, 2L, "click", ts("2024-01-01 11:00:00"), 0),
      // user 3: click 30h after view — outside the 24h horizon.
      Event(7L, 3L, "view", ts("2024-01-01 10:00:00"), 0),
      Event(8L, 3L, "click", ts("2024-01-02 16:00:00"), 0),
      // user 4: click with NO view — never enters the funnel.
      Event(9L, 4L, "click", ts("2024-01-01 10:00:00"), 0))
    val r = run(evs, "q_funnel").head()
    assert(r.getAs[Long]("n_view") == 3) // users 1, 2, 3
    assert(r.getAs[Long]("n_click") == 2) // users 1, 2 (3 is out of horizon)
    assert(r.getAs[Long]("n_purchase") == 1) // only user 1 (2 is out of order)
  }

  test("cohort retention counts distinct active days, not raw events") {
    val evs = Seq(
      // user 1: 3 events on day 0, 2 on day 2 — one cell each.
      Event(1L, 1L, "view", ts("2024-01-01 08:00:00"), 0),
      Event(2L, 1L, "view", ts("2024-01-01 09:00:00"), 0),
      Event(3L, 1L, "click", ts("2024-01-01 10:00:00"), 0),
      Event(4L, 1L, "view", ts("2024-01-03 08:00:00"), 0),
      Event(5L, 1L, "view", ts("2024-01-03 09:00:00"), 0),
      // user 2: joins a day later, returns on its day 1.
      Event(6L, 2L, "view", ts("2024-01-02 08:00:00"), 0),
      Event(7L, 2L, "view", ts("2024-01-03 08:00:00"), 0))
    val got = run(evs, "q_cohort_retention").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L)))
  }

  test("streaming cohort retention changelog aggregates to the batch triangle") {
    // The full fixture in event-time arrival order, split across two
    // micro-batches: per-user bitmask state must carry the seam (a
    // return visit in batch 2 lands in the cohort its batch-1 first-seen
    // day fixed).
    val fixture = graft.engine.Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val (b1, b2) = fixture.splitAt(fixture.size / 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](
      graft.streaming.Streams.sessionConf(spark))
    val q = graft.streaming.Streams.start(
      graft.streaming.Streams.cohortRetentionStream(ms.toDS()).toDF(),
      graft.streaming.Streams.MemoryStreamSink("cohort_stream",
        Some(java.nio.file.Files.createTempDirectory("graft-cohort").toString)))
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // Each (user, offset) emitted at most once -> the triangle is a
    // plain count over the changelog.
    val triangle = spark.table("cohort_stream")
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    val batch = graft.engine.EventAnalytics.queries("q_cohort_retention")(
      spark, TestSpark.sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(triangle == batch, s"stream ${triangle.size} cells vs batch ${batch.size}")
  }

  test("streaming funnel snapshot equals the batch min-after-join twin") {
    // Event-time-ordered arrival (the documented parity discipline for
    // every stateful processor here), split across two micro-batches at
    // an awkward seam: user 1's purchase lands a batch after its click.
    val b1 = Seq(
      Event(1L, 1L, "view", ts("2024-01-01 10:00:00"), 0),
      Event(2L, 2L, "view", ts("2024-01-01 10:10:00"), 0),
      Event(3L, 1L, "click", ts("2024-01-01 11:00:00"), 0))
    val b2 = Seq(
      Event(4L, 2L, "purchase", ts("2024-01-01 11:30:00"), 0), // no click yet: blocked
      Event(5L, 1L, "purchase", ts("2024-01-01 12:00:00"), 0),
      Event(6L, 3L, "click", ts("2024-01-01 12:30:00"), 0)) // no view: never enters
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](
      graft.streaming.Streams.sessionConf(spark))
    val q = graft.streaming.Streams.start(
      graft.streaming.Streams.funnelStream(ms.toDS()).toDF(),
      graft.streaming.Streams.MemoryStreamSink("funnel_stream",
        Some(java.nio.file.Files.createTempDirectory("graft-funnel").toString)))
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // Current table = max-version row per user; -1 = step not reached.
    val cur = spark.table("funnel_stream")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(desc("version"))))
      .where(col("rn") === 1)
      .select("user_id", "t1", "t2", "t3")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // Batch twin over the union, same horizon.
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel-b").toString
    (b1 ++ b2).toDF().select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val twin = graft.engine.EventAnalytics.funnelSteps(
      graft.engine.Tables.events(spark, tmp), windowHours = 24)
      .collect().map { r =>
        def t(i: Int) = if (r.isNullAt(i)) -1L else r.getTimestamp(i).getTime
        r.getLong(0) -> (t(1), t(2), t(3))
      }.toMap
    // The streaming table only carries users whose state ever moved
    // (user 3 never entered); the batch twin only carries users with a
    // view — identical key sets here, identical step times.
    assert(cur == twin, s"stream $cur vs batch $twin")
  }

  test("dau/wau counts distinct users; wau covers the trailing 7 active days") {
    val evs = Seq(
      // day 1: users 1,2 (user 1 twice — must count once).
      Event(1L, 1L, "view", ts("2024-01-01 08:00:00"), 0),
      Event(2L, 1L, "click", ts("2024-01-01 09:00:00"), 0),
      Event(3L, 2L, "view", ts("2024-01-01 10:00:00"), 0),
      // day 5: user 3 only; trailing window still sees day 1's users.
      Event(4L, 3L, "view", ts("2024-01-05 08:00:00"), 0),
      // day 20: far past any window — wau = dau.
      Event(5L, 1L, "view", ts("2024-01-20 08:00:00"), 0))
    val got = run(evs, "q_dau_wau").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toList
    assert(got == List(
      ("2024-01-01", 2L, 2L), // dau 2; window [1..1]: users 1,2
      ("2024-01-05", 1L, 3L), // dau 1; window [-1..5] active days {1,5}: users 1,2,3
      ("2024-01-20", 1L, 1L)))
  }

  test("funnel is monotone on the fixture: n_view >= n_click >= n_purchase > 0") {
    val r = SparkEntry.queries("q_funnel")(spark, TestSpark.sfDir).head()
    val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
      r.getAs[Long]("n_purchase"))
    assert(v >= c && c >= p && p > 0, s"$v >= $c >= $p")
  }

  test("streaming transition changelog aggregates to the batch matrix") {
    // Event-time arrival order across a two-batch seam: each user's last
    // type must carry over so the seam transition (batch-1 tail →
    // batch-2 head) is emitted exactly once.
    val fixture = graft.engine.Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val (b1, b2) = fixture.splitAt(fixture.size / 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](
      graft.streaming.Streams.sessionConf(spark))
    val q = graft.streaming.Streams.start(
      graft.streaming.Streams.transitionStream(ms.toDS()).toDF(),
      graft.streaming.Streams.MemoryStreamSink("transition_stream",
        Some(java.nio.file.Files.createTempDirectory("graft-trans").toString)))
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("transition_stream")
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q_event_transitions")(spark, TestSpark.sfDir)
      .select(col("from_type"), col("to_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch, s"stream ${streamed.size} cells vs batch ${batch.size}")
  }

  test("transition matrix: totals and outflow shares are conserved") {
    val ev = graft.engine.Tables.events(spark, TestSpark.sfDir)
    val t = SparkEntry.queries("q_event_transitions")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // Every user timeline of k events contributes exactly k−1 transitions.
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(t.map(_._3).sum == expected)
    // Each source's destination shares sum to 1 (round-6 grain).
    t.groupBy(_._1).foreach { case (from, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, s"outflow of $from")
    }
  }

  test("ewma: truncated convolution over observed days, gaps contribute nothing") {
    import graft.engine.EventAnalytics._
    // One type, counts 2/3/4 on Jan 1-3, gap on Jan 4, 5 on Jan 5.
    val counts = Map(1 -> 2, 2 -> 3, 3 -> 4, 5 -> 5)
    val evs = counts.toSeq.flatMap { case (day, n) =>
      (1 to n).map(i => Event(day * 100L + i, 1L, "click",
        ts(f"2024-01-0$day 12:00:00"), 1.0))
    }
    val got = run(evs, "q_ewma")
      .collect().map(r => (r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
    def expected(day: Int): Double = {
      val fixed = (0 until EwmaHorizon).map { k =>
        counts.get(day - k).fold(0L)(_ * EwmaWeightsFixed(k))
      }.sum
      BigDecimal(fixed.toDouble / EwmaScale.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.map(_._1).toSeq ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-05"),
      "only observed days are reported, in order")
    got.foreach { case (day, n, ewma) =>
      val d = day.takeRight(2).toInt
      assert(n == counts(d).toLong)
      assert(ewma == expected(d), s"day $d: $ewma != ${expected(d)}")
    }
    // Day 5's smoothing must skip the absent day 4 but still reach back
    // to days 3/2/1 (k = 2/3/4) — the observed-day semantics.
    assert(expected(5) > counts(5) * EwmaWeightsFixed(0).toDouble / EwmaScale)
    // Weights are a proper normalized-geometric truncation: Σw < 1,
    // tail mass below 1 %.
    assert(EwmaWeightsFixed.sum < EwmaScale &&
      EwmaWeightsFixed.sum > (EwmaScale * 0.99).toLong)
  }

  test("anomaly days: flags ride the LAGGED smoothed level, first day excluded") {
    import graft.engine.EventAnalytics._
    val counts = Map(1 -> 10, 2 -> 10, 3 -> 40, 5 -> 2)
    val evs = counts.toSeq.flatMap { case (day, n) =>
      (1 to n).map(i => Event(day * 100L + i, 1L, "click",
        ts(f"2024-01-0$day 12:00:00"), 1.0))
    }
    def ewma(day: Int): Double = {
      val fixed = (0 until EwmaHorizon).map { k =>
        counts.get(day - k).fold(0L)(_ * EwmaWeightsFixed(k))
      }.sum
      BigDecimal(fixed.toDouble / EwmaScale.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = run(evs, "q_anomaly_days")
      .collect().map(r => r.getDate(1).toString.takeRight(2).toInt ->
        (r.getLong(2), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
    // Day 1 has no predecessor and must be absent; the lag chain skips
    // the gap day (day 5's baseline is day 3's level, not a zero-filled
    // day 4).
    assert(got.keySet == Set(2, 3, 5))
    val prev = Map(2 -> 1, 3 -> 2, 5 -> 3)
    got.foreach { case (d, (n, ewmaPrev, ratio, anomaly)) =>
      assert(n == counts(d).toLong)
      assert(ewmaPrev == ewma(prev(d)), s"day $d baseline")
      val expRatio = BigDecimal(n.toDouble / ewmaPrev)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ratio == expRatio, s"day $d ratio")
      assert(anomaly == (ratio > AnomalyHi || ratio < AnomalyLo), s"day $d flag")
    }
    // The planted series must exercise both outcomes: the 4x spike on
    // day 3 and the crash on day 5 flag; steady day 2 does not... unless
    // the truncated tail makes day 1's level low — assert directly.
    assert(got(3)._4 && got(5)._4, "spike and crash must flag")
  }

  test("attribution credits the LAST in-horizon touch; ties to higher id") {
    val evs = Seq(
      // User 1: view then click then purchase → click (last touch) wins.
      Event(10L, 1L, "view", ts("2024-03-01 10:00:00"), 1.0),
      Event(11L, 1L, "click", ts("2024-03-02 10:00:00"), 1.0),
      Event(12L, 1L, "purchase", ts("2024-03-03 10:00:00"), 1.0),
      // User 2: only touch is 8 days old → outside horizon, no credit.
      Event(20L, 2L, "view", ts("2024-03-01 10:00:00"), 1.0),
      Event(21L, 2L, "purchase", ts("2024-03-09 11:00:00"), 1.0),
      // User 3: two touches at the SAME instant → higher event_id wins.
      Event(30L, 3L, "view", ts("2024-03-05 09:00:00"), 1.0),
      Event(31L, 3L, "click", ts("2024-03-05 09:00:00"), 1.0),
      Event(32L, 3L, "purchase", ts("2024-03-05 10:00:00"), 1.0),
      // User 4: touch AFTER the purchase, and a signup (never a touch).
      Event(40L, 4L, "signup", ts("2024-03-04 09:00:00"), 1.0),
      Event(41L, 4L, "purchase", ts("2024-03-04 10:00:00"), 1.0),
      Event(42L, 4L, "view", ts("2024-03-04 11:00:00"), 1.0))
    val got = run(evs, "q_attribution")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got == Map(12L -> (11L, "click"), 32L -> (31L, "click")))
  }

  test("retention curve: offset-0 is exactly 1.0 and rates never exceed it") {
    val got = SparkEntry.queries("q_retention_curve")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (cd, off, n, size, rate) =>
      if (off == 0L) assert(n == size && rate == 1.0, s"$cd day-0")
      assert(rate > 0 && rate <= 1.0 && n <= size, s"$cd offset $off")
      val exp = BigDecimal(n.toDouble / size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rate == exp, s"$cd offset $off rate")
    }
    assert(got.exists(r => r._2 > 0 && r._5 < 1.0),
      "fixture must exercise decayed retention")
  }

  test("linear attribution splits credit equally across in-horizon touches") {
    val evs = Seq(
      Event(1L, 1L, "view", ts("2024-03-01 10:00:00"), 1.0),
      Event(2L, 1L, "click", ts("2024-03-02 10:00:00"), 1.0),
      Event(3L, 1L, "view", ts("2024-03-20 10:00:00"), 1.0), // out of horizon
      Event(4L, 1L, "purchase", ts("2024-03-03 09:00:00"), 1.0),
      Event(5L, 2L, "purchase", ts("2024-03-03 09:00:00"), 1.0)) // no touches
    val got = run(evs, "q_attribution_linear")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getDouble(5)))
    assert(got.map(_._1).toSet == Set(4L), "only the touched purchase appears")
    assert(got.map(_._2).toSet == Set(1L, 2L))
    got.foreach { case (_, _, n, credit) =>
      assert(n == 2L && credit == 0.5)
    }
  }

  test("streaming attribution: one-touch state equals the batch band join") {
    // Multi-user interleaved series with repeat purchases, a same-instant
    // tie, an out-of-horizon touch, and touches that arrive in the FIRST
    // batch for purchases in the SECOND (the state must carry them over
    // the seam).
    val evs = Seq(
      Event(1L, 1L, "view", ts("2024-03-01 10:00:00"), 1.0),
      Event(2L, 2L, "click", ts("2024-03-01 11:00:00"), 1.0),
      Event(3L, 1L, "click", ts("2024-03-02 10:00:00"), 1.0),
      Event(4L, 3L, "view", ts("2024-03-02 12:00:00"), 1.0),
      Event(5L, 3L, "click", ts("2024-03-02 12:00:00"), 1.0), // tie with 4
      Event(6L, 2L, "purchase", ts("2024-03-03 09:00:00"), 1.0),
      // ---- batch seam ----
      Event(7L, 1L, "purchase", ts("2024-03-04 10:00:00"), 1.0),
      Event(8L, 3L, "purchase", ts("2024-03-05 10:00:00"), 1.0),
      Event(9L, 1L, "purchase", ts("2024-03-05 11:00:00"), 1.0), // same touch twice
      Event(10L, 2L, "purchase", ts("2024-03-12 12:00:00"), 1.0)) // >7d: no credit
    val (b1, b2) = evs.splitAt(6)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event](spark)
    val q = graft.streaming.Streams.attributionStream(ms.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_stream").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getTimestamp(4), r.getTimestamp(5))).toSet
    val streamed = rows(spark.table("attr_stream"))
    val batch = rows(graft.engine.EventAnalytics.attribution(evs.toDF())
      .select("purchase_id", "user_id", "touch_id", "touch_type", "t_ts", "p_ts"))
    assert(streamed == batch, s"streamed $streamed\nbatch $batch")
    // The scenario must exercise every corner it plants.
    assert(batch.map(_._1) == Set(6L, 7L, 8L, 9L))
    assert(batch.find(_._1 == 8L).get._3 == 5L, "tie must credit higher id")
  }

  test("streaming daily-count state derives the batch anomaly report") {
    import graft.engine.EventAnalytics
    // A planted multi-type series across a two-batch seam, including a
    // day whose count is SPLIT across the batches (the update-mode state
    // must merge it before the derivation sees it).
    val evs = Seq(
      (1, "click", 8), (2, "click", 8), (3, "click", 30), (4, "click", 8),
      (1, "view", 20), (2, "view", 4), (3, "view", 20)
    ).flatMap { case (day, ty, n) =>
      (1 to n).map(i => Event(day * 1000L + i, i.toLong, ty,
        ts(f"2024-02-0$day 09:00:00"), 1.0))
    }
    val (b1, b2) = evs.splitAt(evs.size / 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event](spark)
    val q = graft.streaming.Streams.dailyCountStream(ms.toDF())
      .writeStream.outputMode("update").format("memory")
      .queryName("daily_stream").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // Counts are monotone per (type, day): latest state = max(n).
    // localCheckpoint: anomalyFromDaily self-joins its input, and the
    // memory-sink view's attributes would otherwise conflict.
    val state = spark.table("daily_stream")
      .groupBy("event_type", "day").agg(max("n").as("n"))
      .localCheckpoint()
    val viaStream = EventAnalytics.anomalyFromDaily(state)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getBoolean(6))).toSet
    val viaBatch = EventAnalytics.anomalyFromDaily(
        EventAnalytics.dailyCounts(evs.toDF()))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getBoolean(6))).toSet
    assert(viaStream == viaBatch)
    assert(viaStream.nonEmpty && viaStream.exists(_._7), "a flag must fire")
    // The seam-split day must carry its MERGED count on both paths.
    assert(viaStream.exists(r => r._1 == "click" && r._3 == 30L))
  }
}
