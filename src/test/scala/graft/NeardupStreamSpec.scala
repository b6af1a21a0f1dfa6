package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.streaming.Streams.StreamDoc

/** Streaming MinHash-LSH near-dup dedup (Streams.neardupStream): two
  * chained transformWithState stages — per-bucket first-claim, per-doc
  * verdict — graded against a SEQUENTIAL FOLD over the same band values
  * (the Bloom-style ingest contract: an arrival is dropped iff any of
  * its band buckets was seen before; every arrival claims its buckets).
  * The fold uses the ACTUAL kernel output (Dedup.normTokens →
  * GraftExpressions.minhashBands), so the spec pins stream semantics,
  * not hash values.
  */
class NeardupStreamSpec extends AnyFunSuite {
  private lazy val spark = Streams.sessionConf(TestSpark.spark)
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private def ckpt(): String =
    java.nio.file.Files.createTempDirectory("graft-neardup").toString

  /** (doc_id → band buckets) via the SAME kernel the stream applies. */
  private def bandsOf(docs: Seq[StreamDoc]): Map[Long, Seq[(Int, Long)]] =
    spark.createDataset(docs).toDF()
      .withColumn("__toks", graft.engine.Dedup.normTokens(col("text")))
      .withColumn("__mb", graft.functions.GraftExpressions.minhashBands(
        col("__toks"), graft.engine.Dedup.NumHashes, graft.engine.Dedup.NumBands))
      .select(col("doc_id"), posexplode(col("__mb").getField("bands")).as(Seq("bi", "bh")))
      .as[(Long, Int, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap

  /** The sequential ingest fold: survivors in (ts, doc_id) order. */
  private def foldSurvivors(docs: Seq[StreamDoc]): Seq[Long] = {
    val bands = bandsOf(docs)
    val seen = scala.collection.mutable.Set.empty[(Int, Long)]
    docs.sortBy(d => (d.ts.getTime, d.doc_id)).flatMap { d =>
      val bs = bands(d.doc_id)
      val dup = bs.exists(seen.contains)
      bs.foreach(seen += _)
      if (dup) None else Some(d.doc_id)
    }
  }

  // Planted corpus: permutations/repetitions share the token SET (all 16
  // bands collide — deterministic dups); distinct vocabularies are
  // distinct sets (collisions only if the fold itself sees them, so the
  // assertion can never flake).
  private val batch1 = Seq(
    StreamDoc(1L, "alpha beta gamma delta epsilon", ts("2024-01-01 10:00:00")),
    StreamDoc(2L, "epsilon delta gamma beta alpha", ts("2024-01-01 10:01:00")), // in-batch perm dup of 1
    StreamDoc(3L, "one two three four five six", ts("2024-01-01 10:02:00")),
    StreamDoc(4L, "red orange yellow green blue", ts("2024-01-01 10:03:00")))
  private val batch2 = Seq(
    StreamDoc(5L, "three one two six five four four", ts("2024-01-01 10:10:00")), // cross-batch dup of 3 (set-equal)
    StreamDoc(6L, "lorem ipsum dolor sit amet quack", ts("2024-01-01 10:11:00")),
    StreamDoc(7L, "blue green yellow orange red", ts("2024-01-01 10:12:00"))) // cross-batch perm dup of 4
  private val batch3 = Seq(
    StreamDoc(8L, "amet sit dolor ipsum lorem quack", ts("2024-01-01 10:20:00")), // dup of 6
    StreamDoc(9L, "totally fresh vocabulary here now", ts("2024-01-01 10:21:00")))

  test("streaming survivors equal the sequential fold over the same bands") {
    val all = batch1 ++ batch2 ++ batch3
    val expected = foldSurvivors(all)
    assert(expected == Seq(1L, 3L, 4L, 6L, 9L)) // the plant, confirmed by the fold

    val ms = MemoryStream[StreamDoc](spark)
    val out = Streams.neardupStream(ms.toDS(), delay = "10 minutes")
    val q = Streams.start(out.toDF(), Streams.MemoryStreamSink("neardup_parity", Some(ckpt())))
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      ms.addData(batch3); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("neardup_parity").select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == expected.sorted)
  }

  test("within one batch the (ts, doc_id)-min arrival is the survivor") {
    val pair = Seq(
      StreamDoc(21L, "zulu yankee xray whiskey victor", ts("2024-01-01 10:05:00")),
      StreamDoc(20L, "victor whiskey xray yankee zulu", ts("2024-01-01 10:04:00"))) // earlier ts, later in Seq
    val ms = MemoryStream[StreamDoc](spark)
    val out = Streams.neardupStream(ms.toDS(), delay = "10 minutes")
    val q = Streams.start(out.toDF(), Streams.MemoryStreamSink("neardup_order", Some(ckpt())))
    try {
      ms.addData(pair); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("neardup_order").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(20L)) // event-time order, not Seq order
  }

  test("bucket state EVICTS after retention: the same content later survives") {
    val ms = MemoryStream[StreamDoc](spark)
    val out = Streams.neardupStream(ms.toDS(), delay = "1 minute", retentionMs = 60L * 1000)
    val q = Streams.start(out.toDF(), Streams.MemoryStreamSink("neardup_evict", Some(ckpt())))
    try {
      ms.addData(Seq(StreamDoc(31L, "papa quebec romeo sierra tango", ts("2024-01-01 10:00:00"))))
      q.processAllAvailable()
      // Raise the watermark far past claim + retention; timers fire in
      // the NEXT batch after the watermark advances.
      ms.addData(Seq(StreamDoc(32L, "unrelated filler vocabulary entirely", ts("2024-01-01 12:00:00"))))
      q.processAllAvailable()
      ms.addData(Seq(StreamDoc(33L, "tango sierra romeo quebec papa", ts("2024-01-01 12:30:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("neardup_evict").select("doc_id").as[Long].collect().toSet
    assert(got == Set(31L, 32L, 33L)) // 33 is NOT a duplicate after eviction
  }

  test("within the retention horizon the same content IS a duplicate across batches") {
    val ms = MemoryStream[StreamDoc](spark)
    val out = Streams.neardupStream(ms.toDS(), delay = "1 hour")
    val q = Streams.start(out.toDF(), Streams.MemoryStreamSink("neardup_horizon", Some(ckpt())))
    try {
      ms.addData(Seq(StreamDoc(41L, "kilo lima mike november oscar", ts("2024-01-01 10:00:00"))))
      q.processAllAvailable()
      ms.addData(Seq(StreamDoc(42L, "oscar november mike lima kilo", ts("2024-01-01 10:30:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("neardup_horizon").select("doc_id").as[Long].collect().toSet
    assert(got == Set(41L))
  }
}
