package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{ReplayMicroBatchStream, ReplayOffset, ReplaySource, Streams}

/** The `graft-replay` DataSourceV2 source (r14 verdict item #5): the one
  * Spark extension surface the engine had not exercised — a REAL streaming
  * source with genuine offsets, admission control, commit, and restart
  * semantics, standing in for the env-blocked Kafka connector (R1).
  *
  * Coverage map:
  *  - batch face ≡ staged frame (hash-exact: Double.toString round-trip);
  *  - streaming drain ≡ batch face, bounded by maxFilesPerTrigger
  *    (admission control produces one segment per micro-batch);
  *  - new segments appended between triggers are discovered exactly once;
  *  - lost-commit crash replay through a file sink stays exactly-once
  *    (the CrashRecoverySpec seam, now through OUR source's offset log);
  *  - the append-only log contract is enforced (mutated log throws);
  *  - offset JSON round-trips (what the checkpoint offsets/ dir stores).
  */
class ReplaySourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Events fixture normalized to the replay columns. */
  private lazy val fixture: DataFrame =
    graft.engine.Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))

  private def multiset(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("offset JSON round-trips") {
    assert(ReplayOffset.fromJson(ReplayOffset(42).json()) == ReplayOffset(42))
    assert(ReplayOffset.fromJson("""{"files":0}""") == ReplayOffset(0))
    intercept[IllegalArgumentException](ReplayOffset.fromJson("""{"rows":3}"""))
  }

  test("batch face reads back the staged frame exactly (nulls included)") {
    val dir = tmp("graft-replay-batch")
    // A null in every nullable column exercises the \N codec.
    val withNulls = fixture.limit(200).unionByName(
      Seq((9999999L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 7L,
        null.asInstanceOf[String], 1.25, null.asInstanceOf[String]))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val staged = ReplaySource.stage(withNulls, dir, segments = 3)
    assert(staged.size == 3 && staged == ReplaySource.listSegments(dir))
    val back = spark.read.format("graft-replay").option("path", dir).load()
    assert(back.schema == ReplaySource.schema)
    assert(multiset(back) == multiset(withNulls))
  }

  test("streaming drain equals batch face; admission control bounds each micro-batch") {
    val dir = tmp("graft-replay-stream")
    ReplaySource.stage(fixture.limit(1000), dir, segments = 4)
    val ckpt = tmp("graft-replay-stream-ckpt")
    val events = Streams.events(spark,
      Streams.ReplayStreamSource(dir, maxFilesPerTrigger = Some(1)))
    val q = Streams.start(events, Streams.MemoryStreamSink("replay_drain", Some(ckpt)),
      trigger = Some(Trigger.AvailableNow()))
    try q.awaitTermination() finally q.stop()
    val got = spark.table("replay_drain")
    val batch = spark.read.format("graft-replay").option("path", dir).load()
    assert(multiset(got) == multiset(batch))
    // One segment per micro-batch: the checkpoint's offset log has one
    // entry per admitted batch (4 data batches; a trailing empty batch
    // may close the AvailableNow run).
    val offsets = new java.io.File(s"$ckpt/offsets")
      .listFiles().count(_.getName.forall(_.isDigit))
    assert(offsets >= 4, s"expected >=4 admission-controlled batches, got $offsets")
  }

  test("segments appended between triggers are discovered exactly once") {
    val dir = tmp("graft-replay-append")
    val (first, second) = (fixture.limit(600), fixture.orderBy(desc("event_id")).limit(400))
    ReplaySource.stage(first, dir, segments = 2)
    val ckpt = tmp("graft-replay-append-ckpt")
    val q = Streams.start(
      Streams.events(spark, Streams.ReplayStreamSource(dir)),
      Streams.MemoryStreamSink("replay_append", Some(ckpt)))
    try {
      q.processAllAvailable()
      assert(spark.table("replay_append").count() == first.count())
      ReplaySource.stage(second, dir, segments = 2) // producer keeps writing
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("replay_append")
    assert(multiset(got) == multiset(first.unionByName(second)))
  }

  test("lost-commit crash replay through a file sink stays exactly-once") {
    val dir = tmp("graft-replay-crash")
    val out = tmp("graft-replay-crash-out")
    val ckpt = tmp("graft-replay-crash-ckpt")
    ReplaySource.stage(fixture.limit(900), dir, segments = 3)
    def run(): Unit = {
      val q = Streams.start(
        Streams.events(spark, Streams.ReplayStreamSource(dir, Some(1))),
        Streams.ParquetStreamSink(out, ckpt), trigger = Some(Trigger.AvailableNow()))
      try q.awaitTermination() finally q.stop()
    }
    run()
    // Kill seam: batch N ran (sink wrote, offsets/N durable) but commits/N
    // was lost. Restart MUST replan batch N from OUR offset log — the same
    // (start, end] file range, byte-identical rows — and the file sink's
    // _spark_metadata log must swallow the duplicate write.
    val commits = new java.io.File(s"$ckpt/commits")
    val latest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    val crc = new java.io.File(commits, s".${latest.getName}.crc")
    assert(latest.delete()); if (crc.exists()) assert(crc.delete())
    run()
    val got = spark.read.parquet(out)
    val batch = spark.read.format("graft-replay").option("path", dir).load()
    assert(multiset(got) == multiset(batch)) // no loss, no dup
  }

  test("replay source feeds a stateful operator: watermark dedup matches the batch key set") {
    // Integration face: the DSv2 source driving a real watermarked
    // stateful pipeline end-to-end (R1 source -> R2 dedup -> R4 sink),
    // not just a pass-through scan.
    val dir = tmp("graft-replay-dedup")
    ReplaySource.stage(fixture, dir, segments = 3)
    val ckpt = tmp("graft-replay-dedup-ckpt")
    val events = Streams.events(spark, Streams.ReplayStreamSource(dir))
    val out = Streams.dedupWithinWatermark(events, "40 days", Seq("user_id", "event_type"))
    val q = Streams.start(out, Streams.MemoryStreamSink("replay_dedup", Some(ckpt)),
      trigger = Some(Trigger.AvailableNow()))
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("replay_dedup")
      .select("user_id", "event_type").as[(Long, String)].collect().toSet
    val batch = graft.engine.Dedup.queries("q_dedup_first_wins")(spark, TestSpark.sfDir)
      .select("user_id", "event_type").as[(Long, String)].collect().toSet
    assert(streamed == batch)
  }

  test("append-only contract: a mutated log fails loudly instead of lying") {
    val dir = tmp("graft-replay-mutate")
    ReplaySource.stage(fixture.limit(300), dir, segments = 3)
    val stream = new ReplayMicroBatchStream(dir, None)
    val end = stream.latestOffset(ReplayOffset(0),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(end == ReplayOffset(3))
    stream.commit(end)
    assert(stream.committedOffset.contains(ReplayOffset(3)))
    // Truncate the log under the live stream: offsets already planned
    // would silently map to different bytes — the source must refuse.
    val victim = new java.io.File(new java.net.URI(
      ReplaySource.listSegments(dir).head).getPath)
    assert(victim.delete())
    intercept[IllegalArgumentException] {
      stream.latestOffset(end,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    }
  }
}
