package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** State-schema evolution for transformWithState processors — the
  * operational cliff a long-running streaming deployment hits when it
  * needs a state field it didn't launch with. Pins BOTH halves of the
  * upgrade contract documented on FirstWinsDedupProcessorV2:
  *
  *  1. the FAILURE MODE: restarting the evolved processor from the v1
  *     checkpoint aborts with a state-schema-compatibility error (no
  *     silent misread of v1 bytes);
  *  2. the RECIPE: drain v1 → derive v2 state from the processed prefix
  *     with the batch twin → restart at a fresh checkpoint with that
  *     seed as initial state — keys keep deduplicating across the
  *     cutover as if the stream had never stopped.
  */
class StateEvolutionSpec extends AnyFunSuite {
  private lazy val spark = Streams.sessionConf(TestSpark.spark)
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private val batch1 = Seq(
    Event(10L, 1L, "click", ts("2024-01-01 10:00:00"), 1.0),
    Event(11L, 1L, "click", ts("2024-01-01 10:01:00"), 2.0), // dup of (1,click)
    Event(12L, 2L, "view", ts("2024-01-01 10:02:00"), 3.0))

  test("restarting the evolved processor from a v1 checkpoint fails fast, not silently") {
    // A recoverable (file) sink: memory sinks refuse checkpoint recovery
    // outright, which would mask the state-schema check this test pins.
    val ckpt = tmp("graft-evolve-ckpt")
    val out = tmp("graft-evolve-out")
    val ms = MemoryStream[Event](spark)
    val q1 = Streams.start(Streams.dedupStateful(ms.toDS(), "10 minutes").toDF(),
      Streams.ParquetStreamSink(out, ckpt))
    try { ms.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() == 2) // first-wins: 10, 12

    // Same checkpoint, same state VARIABLE, evolved value schema
    // (Long -> struct of two fields).
    val q2 = Streams.start(Streams.dedupStatefulV2(ms.toDS(), "10 minutes").toDF(),
      Streams.ParquetStreamSink(out, ckpt))
    val err = intercept[Throwable] {
      try { ms.addData(batch1); q2.processAllAvailable() } finally q2.stop()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => (Option(e.getMessage).toSeq ++ messages(e.getCause)))
    val all = messages(err).mkString(" | ")
    assert(all.toLowerCase.contains("schema") || all.contains("STATE_STORE"),
      s"expected a state-schema compatibility failure, got: ${err.getClass} $all")
  }

  test("drain + re-seed: v2 continues v1's dedup state across the cutover") {
    // --- v1 lifetime: process batch1, drain, stop.
    val ms1 = MemoryStream[Event](spark)
    val q1 = Streams.start(Streams.dedupStateful(ms1.toDS(), "10 minutes").toDF(),
      Streams.MemoryStreamSink("evolve_drain", Some(tmp("graft-evolve-v1"))))
    try { ms1.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    assert(spark.table("evolve_drain").select("event_id")
      .as[Long].collect().toSet == Set(10L, 12L))

    // --- re-seed: v2 state derived from the PROCESSED PREFIX by the
    // batch twin (not from the checkpoint bytes).
    val seed = Streams.dedupStateSeedV2(spark.createDataset(batch1))
    val seeded = seed.as[(Long, String, Streams.DedupStateV2)].collect()
      .map { case (u, t, s) => ((u, t), s) }.toMap
    assert(seeded(((1L, "click"))) == Streams.DedupStateV2(ts("2024-01-01 10:00:00").getTime, 1L))
    assert(seeded(((2L, "view"))) == Streams.DedupStateV2(ts("2024-01-01 10:02:00").getTime, 0L))

    // --- v2 lifetime: FRESH checkpoint, initial state = the seed,
    // post-cutover input replays old keys and introduces a new one.
    val ms2 = MemoryStream[Event](spark)
    val q2 = Streams.start(
      Streams.dedupStatefulV2(ms2.toDS(), "10 minutes",
        initialState = Some(seed)).toDF(),
      Streams.MemoryStreamSink("evolve_v2", Some(tmp("graft-evolve-v2"))))
    try {
      ms2.addData(Seq(
        Event(20L, 1L, "click", ts("2024-01-01 10:05:00"), 4.0), // dup across cutover
        Event(21L, 2L, "view", ts("2024-01-01 10:06:00"), 5.0), // dup across cutover
        Event(22L, 3L, "click", ts("2024-01-01 10:07:00"), 6.0))) // new key
      q2.processAllAvailable()
    } finally q2.stop()
    // Seeded keys stay suppressed (the state survived the upgrade);
    // only the genuinely-new key emits.
    assert(spark.table("evolve_v2").select("event_id")
      .as[Long].collect().toSet == Set(22L))
  }

  test("v2 from a fresh start (no seed) behaves like v1 plus the dup census state") {
    val ckpt = tmp("graft-evolve-f")
    val ms = MemoryStream[Event](spark)
    val q = Streams.start(Streams.dedupStatefulV2(ms.toDS(), "10 minutes").toDF(),
      Streams.MemoryStreamSink("evolve_fresh", Some(ckpt)))
    try { ms.addData(batch1); q.processAllAvailable() } finally q.stop()
    assert(spark.table("evolve_fresh").select("event_id")
      .as[Long].collect().toSet == Set(10L, 12L))
    // The v2 payoff read path: the census comes OUT OF THE STATE STORE
    // (offline batch read), not out of the dedup output stream.
    val census = Streams.dupCensus(spark, ckpt)
      .as[(Long, String, Long)].collect()
      .map { case (u, t, c) => ((u, t), c) }.toMap
    assert(census == Map((1L, "click") -> 1L, (2L, "view") -> 0L))
  }
}
