package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Dedup, Sources, Tables}

/** Keyed MERGE/upsert snapshot maintenance (Dedup.mergeSnapshot /
  * mergePartitionedSnapshot): delta wins its keys, absent corpus keys
  * survive, new delta keys insert; the partitioned form rewrites ONLY
  * the touched partition directories and re-merging the same delta is
  * idempotent.
  */
class MergeSnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")
  private val order = Seq(desc("ts"), desc("id"))

  test("mergeSnapshot: delta wins on key, corpus survives, new keys insert") {
    val corpus = Seq(("a", 1L, 10L, "old-a"), ("b", 2L, 10L, "old-b"))
      .toDF("k", "id", "ts", "v")
    val delta = Seq(("a", 3L, 20L, "new-a"), ("c", 4L, 20L, "new-c"))
      .toDF("k", "id", "ts", "v")
    val got = Dedup.mergeSnapshot(corpus, delta, keys, order)
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(3))).toSeq
    assert(got == Seq(("a", "new-a"), ("b", "old-b"), ("c", "new-c")))
  }

  test("mergeSnapshot: tie on the full order resolves deterministically (one survivor)") {
    // Identical (ts, id) in corpus and delta: row_number still emits
    // exactly one survivor per key (no dup leak), whichever side it is.
    val corpus = Seq(("a", 1L, 10L, "x")).toDF("k", "id", "ts", "v")
    val delta = Seq(("a", 1L, 10L, "y")).toDF("k", "id", "ts", "v")
    val got = Dedup.mergeSnapshot(corpus, delta, keys, order)
    assert(got.count() == 1)
  }

  test("tombstone merge: winning deletes remove keys, stale tombstones lose, re-inserts resurrect") {
    val corpus = Seq(("a", 1L, 10L, "live-a"), ("b", 2L, 10L, "live-b"),
      ("c", 3L, 30L, "live-c")).toDF("k", "id", "ts", "v")
    val delta = Seq(
      ("a", 4L, 20L, null.asInstanceOf[String], true), // newer tombstone: a dies
      ("c", 5L, 20L, null.asInstanceOf[String], true), // STALE tombstone (ts 20 < 30): c lives
      ("d", 6L, 20L, "new-d", false))
      .toDF("k", "id", "ts", "v", "deleted")
    val got = Dedup.mergeSnapshotWithDeletes(corpus, delta, keys, order)
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(3))).toSeq
    // Corpus (no deleted column) merges as all-live — the v1-snapshot
    // compatibility contract.
    assert(got == Seq(("b", "live-b"), ("c", "live-c"), ("d", "new-d")))
    // Re-insert AFTER the tombstone resurrects the key; re-applying the
    // same tombstone delta is idempotent (it stays older than the
    // re-insert and loses).
    val snap1 = Dedup.mergeSnapshotWithDeletes(corpus, delta, keys, order)
    val reinsert = Seq(("a", 7L, 30L, "reborn-a", false)).toDF("k", "id", "ts", "v", "deleted")
    val snap2 = Dedup.mergeSnapshotWithDeletes(snap1, reinsert, keys, order)
    assert(snap2.where($"k" === "a").collect().map(_.getString(3)).toSeq == Seq("reborn-a"))
    val snap3 = Dedup.mergeSnapshotWithDeletes(snap2, delta, keys, order)
    assert(snap3.orderBy("k").collect().map(r => (r.getString(0), r.getString(3))).toSeq ==
      Seq(("a", "reborn-a"), ("b", "live-b"), ("c", "live-c"), ("d", "new-d")))
  }

  test("mergePartitionedSnapshot rewrites only touched partitions; re-merge is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-part").toString
    try {
      val corpus = Seq(
        ("p1", "a", 1L, 10L, "old-a"), ("p1", "b", 2L, 10L, "old-b"),
        ("p2", "c", 3L, 10L, "old-c")).toDF("p", "k", "id", "ts", "v")
      Tables.writePartitioned(corpus, dir, Seq("p"))
      def fileState(part: String): Set[(String, Long)] = {
        val d = new java.io.File(s"$dir/p=$part")
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet
      }
      val p2Before = fileState("p2")
      // Delta touches only p1: update key a, insert key d.
      val delta = Seq(("p1", "a", 9L, 20L, "new-a"), ("p1", "d", 10L, 20L, "new-d"))
        .toDF("p", "k", "id", "ts", "v")
      Dedup.mergePartitionedSnapshot(spark, dir, delta, "p", keys, order)
      // Untouched partition directory: identical files, not rewritten.
      assert(fileState("p2") == p2Before)
      val snap1 = spark.read.parquet(dir).orderBy("k")
        .collect().map(r => (r.getAs[String]("k"), r.getAs[String]("v"))).toSeq
      assert(snap1 == Seq(("a", "new-a"), ("b", "old-b"), ("c", "old-c"), ("d", "new-d")))
      // Idempotent: folding the same delta again changes nothing.
      Dedup.mergePartitionedSnapshot(spark, dir, delta, "p", keys, order)
      val snap2 = spark.read.parquet(dir).orderBy("k")
        .collect().map(r => (r.getAs[String]("k"), r.getAs[String]("v"))).toSeq
      assert(snap2 == snap1)
      assert(fileState("p2") == p2Before)
    } finally Sources.deleteRecursively(new java.io.File(dir))
  }

  test("deletePartitionedWhere: matching rows die, full partitions vanish, untouched dirs unrewritten") {
    val dir = java.nio.file.Files.createTempDirectory("graft-delete-part").toString
    try {
      val data = Seq[(String, java.lang.Long, String)](
        ("p1", 1L, "keep"), ("p1", 2L, "drop"), // mixed partition
        ("p1", null, "null-pred"), // pred evaluates NULL → must SURVIVE
        ("p2", 4L, "drop"), ("p2", 6L, "drop"), // fully-deleted partition
        ("p3", 5L, "keep"), // untouched partition
        ("p 4", 8L, "drop")) // ESCAPED dir name (space), fully deleted
        .toDF("p", "id", "v")
      Tables.writePartitioned(data, dir, Seq("p"))
      def fileState(part: String): Option[Set[(String, Long)]] = {
        val f = new java.io.File(s"$dir/p=$part")
        if (!f.exists()) None
        else Some(f.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(x => (x.getName, x.lastModified())).toSet)
      }
      val p3Before = fileState("p3")
      Tables.deletePartitionedWhere(spark, dir, "p", col("id") % 2 === 0)
      val left = spark.read.parquet(dir).select("p", "v")
        .as[(String, String)].collect().toSet
      // The NULL-evaluating row survives (three-valued delete semantics);
      // the escaped "p 4" partition is fully gone despite its encoded
      // directory name.
      assert(left == Set(("p1", "keep"), ("p1", "null-pred"), ("p3", "keep")))
      // The all-matches partition is GONE as a directory (dynamic
      // overwrite alone would have left it), the untouched one is the
      // same files, unrewritten.
      assert(fileState("p2").isEmpty)
      assert(fileState("p3") == p3Before)
      // Idempotent: a re-run finds no matches and changes nothing.
      Tables.deletePartitionedWhere(spark, dir, "p", col("id") % 2 === 0)
      assert(spark.read.parquet(dir).select("p", "v")
        .as[(String, String)].collect().toSet == left)
      assert(fileState("p3") == p3Before)
    } finally Sources.deleteRecursively(new java.io.File(dir))
  }

  test("expirePartitionsBefore: pre-cutoff directories vanish without touching survivors") {
    val dir = java.nio.file.Files.createTempDirectory("graft-retention").toString
    try {
      val data = Seq(("2024-01-05", 1L), ("2024-01-09", 2L),
        ("2024-01-10", 3L), ("2024-02-01", 4L)).toDF("day", "id")
      Tables.writePartitioned(data, dir, Seq("day"))
      def files(day: String): Option[Set[(String, Long)]] = {
        val f = new java.io.File(s"$dir/day=$day")
        if (!f.exists()) None
        else Some(f.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(x => (x.getName, x.lastModified())).toSet)
      }
      val survivorBefore = files("2024-01-10")
      val expired = Tables.expirePartitionsBefore(spark, dir, "day", "2024-01-10")
      assert(expired.sorted == Seq("2024-01-05", "2024-01-09"))
      assert(files("2024-01-05").isEmpty && files("2024-01-09").isEmpty)
      // Cutoff day itself and later days survive, files unrewritten.
      assert(files("2024-01-10") == survivorBefore)
      assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet == Set(3L, 4L))
      // Idempotent re-run.
      assert(Tables.expirePartitionsBefore(spark, dir, "day", "2024-01-10").isEmpty)
    } finally Sources.deleteRecursively(new java.io.File(dir))
  }

  test("graded key shape: merged snapshot ≡ latest-wins over both halves' snapshots") {
    val d = TestSpark.sfDir
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
    val cutoff = lit("2024-01-15").cast("timestamp")
    val ord = Seq(desc("ts"), desc("event_id"))
    val ks = Seq("user_id", "event_type")
    val corpus = Dedup.oneWins(ev.where(col("ts") < cutoff), ks, ord)
    val delta = Dedup.oneWins(
      ev.where(col("ts") >= cutoff && col("event_type").isin("click", "purchase")), ks, ord)
    val expect = Dedup.mergeSnapshot(corpus, delta, ks, ord)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy("user_id", "event_type").collect().toSeq
    val got = Dedup.queries("q_merge_upsert")(spark, d)
      .select(col("user_id"), col("event_type"), col("cur_event_id").as("event_id"))
      .orderBy("user_id", "event_type").collect().toSeq
    assert(got == expect && expect.nonEmpty)
  }
}
