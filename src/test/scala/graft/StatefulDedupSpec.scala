package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** transformWithState dedup (reference R2's general form with explicit
  * keyed state + retention timer) — first-wins within and across batches.
  */
class StatefulDedupSpec extends AnyFunSuite {
  private lazy val spark = { Streams.sessionConf(TestSpark.spark) }
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("transformWithState dedup is first-wins within and across batches") {
    val ms = MemoryStream[Event](spark)
    val out = Streams.dedupStateful(ms.toDS(), "10 minutes")
    val q = Streams.start(out.toDF(), Streams.MemoryStreamSink("tws_dedup",
      Some(java.nio.file.Files.createTempDirectory("graft-tws").toString)))
    try {
      ms.addData(Seq(
        Event(10L, 1L, "click", ts("2024-01-01 10:00:00"), 1.0),
        Event(11L, 1L, "click", ts("2024-01-01 10:01:00"), 2.0), // in-batch dup
        Event(12L, 2L, "view", ts("2024-01-01 10:02:00"), 3.0)))
      q.processAllAvailable()
      ms.addData(Seq(
        Event(13L, 1L, "click", ts("2024-01-01 10:05:00"), 4.0), // cross-batch dup
        Event(14L, 2L, "click", ts("2024-01-01 10:06:00"), 5.0))) // new key
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("tws_dedup").select("event_id").as[Long].collect().toSet
    assert(got == Set(10L, 12L, 14L))
  }

  test("transformWithState retention timer clears state: same key re-emitted after expiry") {
    // R5: the explicit-state analogue of the WindowStore retention — the
    // event-time timer fires once the watermark passes firstSeen +
    // retention, clears the 'seen' state, and a later occurrence of the
    // key is forwarded again.
    val ms = MemoryStream[Event](spark)
    val out = Streams.dedupStateful(ms.toDS(), "1 minute", retentionMs = 60L * 1000)
    val q = Streams.start(out.toDF(), Streams.MemoryStreamSink("tws_evict",
      Some(java.nio.file.Files.createTempDirectory("graft-tws").toString)))
    try {
      ms.addData(Seq(Event(31L, 9L, "click", ts("2024-01-01 10:00:00"), 1.0)))
      q.processAllAvailable()
      // Watermark → ~11:59; timer at ~10:01 fires and clears the key.
      ms.addData(Seq(Event(32L, 42L, "other", ts("2024-01-01 12:00:00"), 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(Event(33L, 9L, "click", ts("2024-01-01 12:30:00"), 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("tws_evict").where(col("user_id") === 9)
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(31L, 33L))
  }

  test("transformWithState picks the min-(ts,event_id) row of the first batch") {
    val ms = MemoryStream[Event](spark)
    val out = Streams.dedupStateful(ms.toDS(), "10 minutes")
    val q = Streams.start(out.toDF(), Streams.MemoryStreamSink("tws_min",
      Some(java.nio.file.Files.createTempDirectory("graft-tws").toString)))
    try {
      // Deliberately out of order inside the batch.
      ms.addData(Seq(
        Event(22L, 5L, "click", ts("2024-01-01 10:09:00"), 1.0),
        Event(21L, 5L, "click", ts("2024-01-01 10:00:00"), 1.0),
        Event(23L, 5L, "click", ts("2024-01-01 10:04:00"), 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("tws_min").select("event_id").as[Long].collect().toSeq
    assert(got == Seq(21L))
  }

  test("MapState user profiles: latest emission per (user, type) ≡ batch counts") {
    import graft.engine.Tables
    val ms = MemoryStream[Event](spark)
    // Fixture load BEFORE starting the query: a throw here must not leak
    // a running query into the shared session.
    val fixture = Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .as[Event].collect().toSeq
    val (a, b) = fixture.splitAt(fixture.size / 2)
    val q = Streams.start(Streams.userProfileStream(ms.toDS()).toDF(),
      Streams.MemoryStreamSink("tws_profile",
        Some(java.nio.file.Files.createTempDirectory("graft-profile").toString)))
    try {
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
    } finally q.stop()
    // Counts are monotone, so the MAX emission per pair is the total.
    val streamed = spark.table("tws_profile")
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("n_events")).as("n"))
      .as[(Long, String, Long)].collect().toSet
    val batch = Tables.events(spark, TestSpark.sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
  }
}
