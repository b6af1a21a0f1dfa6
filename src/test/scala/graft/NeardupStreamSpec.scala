package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.streaming.Streams.StreamDoc

/** Streaming MinHash-LSH near-dup dedup (Streams.neardupStream): two
  * chained transformWithState stages — per-bucket claim-then-VERIFY,
  * per-doc verdict — graded against a SEQUENTIAL FOLD over the same
  * band values and signatures (an arrival is dropped iff some claimed
  * band bucket's claimant signature agrees at ≥ θ; every arrival claims
  * its unclaimed buckets). The fold uses the ACTUAL kernel output
  * (Dedup.normTokens → GraftExpressions.minhashBands), so the spec pins
  * stream semantics, not hash values.
  */
class NeardupStreamSpec extends AnyFunSuite {
  private lazy val spark = Streams.sessionConf(TestSpark.spark)
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private def ckpt(): String =
    java.nio.file.Files.createTempDirectory("graft-neardup").toString

  /** (doc_id → (band buckets, signature)) via the SAME kernel the stream
    * applies.
    */
  private def bandsOf(docs: Seq[StreamDoc]): Map[Long, (Seq[(Int, Long)], Seq[Long])] =
    spark.createDataset(docs).toDF()
      .withColumn("__toks", graft.engine.Dedup.normTokens(col("text")))
      .withColumn("__mb", graft.functions.GraftExpressions.minhashBands(
        col("__toks"), graft.engine.Dedup.NumHashes, graft.engine.Dedup.NumBands))
      .select(col("doc_id"), col("__mb").getField("sig").as("sig"),
        posexplode(col("__mb").getField("bands")).as(Seq("bi", "bh")))
      .as[(Long, Seq[Long], Int, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(rs => (rs.map(t => (t._3, t._4)), rs.head._2)).toMap

  /** The sequential claim-then-verify ingest fold: survivors in
    * (ts, doc_id) order. Buckets hold the FIRST claimant's signature;
    * an arrival is dropped iff some already-claimed band bucket's
    * claimant agrees at ≥ θ; every arrival then claims its unclaimed
    * buckets.
    */
  private def foldSurvivors(docs: Seq[StreamDoc], theta: Double = 0.9): Seq[Long] = {
    val bands = bandsOf(docs)
    val seen = scala.collection.mutable.Map.empty[(Int, Long), Seq[Long]]
    docs.sortBy(d => (d.ts.getTime, d.doc_id)).flatMap { d =>
      val (bs, sig) = bands(d.doc_id)
      val dup = bs.exists(b =>
        seen.get(b).exists(c => Streams.sigAgreement(c, sig) >= theta))
      bs.foreach(b => if (!seen.contains(b)) seen(b) = sig)
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
    StreamDoc(9L, "totally fresh vocabulary here now", ts("2024-01-01 10:21:00")),
    // Overlapping vocab (J = 3/8 vs doc 1): band buckets COLLIDE with
    // high probability, but the claimant verification (agreement
    // ~0.375 ≪ 0.9) keeps it alive — the candidate-vs-confirmed split.
    StreamDoc(10L, "alpha beta gamma apple pear plum", ts("2024-01-01 10:22:00")))

  test("streaming survivors equal the sequential fold over the same bands") {
    val all = batch1 ++ batch2 ++ batch3
    val expected = foldSurvivors(all)
    assert(expected == Seq(1L, 3L, 4L, 6L, 9L, 10L)) // the plant, confirmed by the fold

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
