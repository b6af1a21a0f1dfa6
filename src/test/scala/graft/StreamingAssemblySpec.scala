package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Assembly, Dedup}
import graft.streaming.Streams

/** Streaming face of the assembly pipeline (Streams.assemblyIngestBatch
  * / assembleSnapshot / backfillAssembly): per-batch dedup +
  * decontamination accumulate marker-committed survivors; the
  * globally-rated suffix (rebalance + shard) materializes from the
  * snapshot. Parity contract: draining a chunked history equals the
  * batch pipeline over the concatenated input (chunks arrive in doc_id
  * order, so first-arrival-wins ≡ global first-wins-by-id).
  */
class StreamingAssemblySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Benchmark docs share 5-grams with specific corpus docs; dups span
  // chunk boundaries. Langs skew so the rebalance actually downsamples.
  private val bench = Seq(
    (1001L, "en", "the quick brown fox jumps over the lazy dog"),
    (1002L, "de", "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "lang", "text")

  private val chunks: Seq[Seq[(Long, String, String)]] = Seq(
    Seq((1L, "en", "one two three four five six"),
      (2L, "en", "the quick brown fox leaps over a fence"), // clean: no shared 5-gram (leaps≠jumps)
      (3L, "en", "red orange yellow green blue indigo"),
      (4L, "de", "north south east west center middle")),
    Seq((5L, "en", "six five four three two one"), // norm-dup of 1 (same token set)
      (6L, "en", "the quick brown fox jumps over the lazy dog indeed"), // contaminated
      (7L, "en", "cats dogs birds fish mice voles"),
      (8L, "de", "alpha beta gamma delta epsilon zeta eta theta")), // contaminated
    Seq((9L, "en", "bread milk eggs cheese butter jam"),
      (10L, "de", "north south east west middle center"), // norm-dup of 4
      (11L, "en", "violin cello flute oboe drums harp"),
      (12L, "en", "one two three four five six"))) // exact dup of 1

  private def batchTwin(full: DataFrame): DataFrame = {
    // The batch pipeline prefix over the concatenated input: normalized
    // first-wins dedup, then exact 5-gram decontamination.
    val deduped = Dedup.firstWins(
        full.withColumn("__norm", Dedup.normKey(col("text"))),
        Seq("__norm"), Seq("doc_id"))
    Assembly.decontaminate(deduped, bench)
  }

  private def snapshotRows(df: DataFrame): Set[(Long, String, Long, Long, Long)] =
    df.select("doc_id", "lang", "n_tokens", "shard", "pos")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("chunked backfill ≡ batch pipeline; snapshot carries the globally-rated suffix") {
    val dir = java.nio.file.Files.createTempDirectory("graft-asm").toString
    chunks.foreach(_.toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("append").parquet(s"$dir/docs"))
    val schema = chunks.head.toDF("doc_id", "lang", "text").schema
    Streams.backfillAssembly(spark, s"$dir/docs", schema, bench,
      s"$dir/clean", s"$dir/ckpt", maxFilesPerTrigger = 1)

    // Survivor set: dups 5/10/12 drop (first arrival wins), 6/8 are
    // contaminated, everything else survives.
    def cleanIds() = spark.read.parquet(
        new java.io.File(s"$dir/clean").listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("batch_") &&
            new java.io.File(f, "_GRAFT_COMMITTED").exists())
          .map(_.toString): _*)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = Set(1L, 2L, 3L, 4L, 7L, 9L, 11L)
    assert(cleanIds() == expected)

    // Bounded drain: multiple marker-committed micro-batches.
    val committed = new java.io.File(s"$dir/clean").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("batch_") &&
        new java.io.File(f, "_GRAFT_COMMITTED").exists())
    assert(committed >= 3, s"expected >=3 committed chunks, got $committed")

    // Batch twin agrees on the clean set...
    val full = chunks.flatten.toDF("doc_id", "lang", "text")
    assert(batchTwin(full).select("doc_id").collect().map(_.getLong(0)).toSet == expected)

    // ...and the assembled snapshot equals the batch suffix over the
    // SAME survivors: identical rates (global counts), identical
    // shard/pos permutation, token accounting intact.
    val streamed = snapshotRows(Streams.assembleSnapshot(spark, s"$dir/clean", nShards = 4))
    val twin = snapshotRows(
      Assembly.shuffleShards(
        Assembly.rebalanceUniform(batchTwin(full), "lang", "doc_id")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "doc_id", 4))
    assert(streamed == twin)
    assert(streamed.map(_._1).subsetOf(expected))

    // Resume from the checkpoint: nothing new, corpus untouched.
    Streams.backfillAssembly(spark, s"$dir/docs", schema, bench,
      s"$dir/clean", s"$dir/ckpt", maxFilesPerTrigger = 1)
    assert(cleanIds() == expected)

    // Replaying an already-committed batch id is a no-op (marker short-
    // circuit), even with different content.
    val grams = Assembly.wordNgrams(bench, "text", "doc_id", 5)
      .select("gram").distinct()
    Streams.assemblyIngestBatch(
      Seq((99L, "en", "totally new replay content here now")).toDF("doc_id", "lang", "text"),
      s"$dir/clean", batchId = 0L, grams)
    assert(cleanIds() == expected)
  }

  test("decontamination inside the stream matches Assembly.decontaminate semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft-asm2").toString
    val grams = Assembly.wordNgrams(bench, "text", "doc_id", 5)
      .select("gram").distinct()
    // One batch holding a contaminated and a clean doc.
    val b = Seq(
      (21L, "en", "the quick brown fox jumps over the lazy dog again"),
      (22L, "en", "completely unrelated text with no overlap at all")).toDF("doc_id", "lang", "text")
    Streams.assemblyIngestBatch(b, s"$dir/clean", 0L, grams)
    val ids = spark.read.parquet(s"$dir/clean/batch_000000")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(22L))
    assert(Assembly.decontaminate(b, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(22L))
  }
}
