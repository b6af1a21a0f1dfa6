package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Profile, Sources, Tables}
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** DQ-gated streaming ingest: clean batches land in the corpus, a batch
  * violating any rule lands whole in quarantine with a report naming
  * the failing rules, and a replayed batch id is a no-op.
  */
class DqGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rules = Seq(
    Profile.NotNull("type_not_null", "event_type"),
    Profile.Violates("value_non_negative", col("value") < 0))

  private lazy val fixtureEvents: Seq[Event] =
    Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq

  private def committedBatches(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("batch_") &&
      new java.io.File(f, "_GRAFT_COMMITTED").exists()).map(_.getName).sorted.toSeq
  }

  test("clean batch → corpus; violating batch → quarantine with report; replay is a no-op") {
    val corpus = java.nio.file.Files.createTempDirectory("graft-dq-corpus").toString
    val quarantine = java.nio.file.Files.createTempDirectory("graft-dq-bad").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dq-ck").toString
    try {
      val (clean, toBreak) = fixtureEvents.splitAt(fixtureEvents.size / 2)
      val dirty = toBreak.zipWithIndex.map { case (e, i) =>
        if (i % 7 == 0) e.copy(value = -1.0) else e
      }
      val ms = MemoryStream[Event](spark)
      val q = Streams.start(ms.toDS().toDF(),
        Streams.dqGatedSink(rules, corpus, quarantine, Some(ckpt)))
      try {
        ms.addData(clean); q.processAllAvailable()
        ms.addData(dirty); q.processAllAvailable()
      } finally q.stop()

      assert(committedBatches(corpus) == Seq("batch_000000"))
      assert(committedBatches(quarantine) == Seq("batch_000001"))
      // Corpus holds exactly the clean rows; quarantine the whole dirty batch.
      assert(spark.read.parquet(s"$corpus/batch_000000")
        .select("event_id").as[Long].collect().toSet == clean.map(_.event_id).toSet)
      assert(spark.read.parquet(s"$quarantine/batch_000001")
        .select("event_id").as[Long].collect().toSet == dirty.map(_.event_id).toSet)
      // The report names the failing rule with its exact count.
      val report = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$quarantine/batch_000001/_GRAFT_DQ_REPORT.json")), "UTF-8")
      val nBad = dirty.count(_.value < 0)
      assert(report == s"""[{"rule":"value_non_negative","n_violations":$nBad}]""", report)

      // Replaying a committed batch id changes nothing.
      Streams.dqGateBatch(dirty.toDF(), rules, corpus, quarantine, 1L)
      assert(committedBatches(corpus) == Seq("batch_000000") &&
        committedBatches(quarantine) == Seq("batch_000001"))
    } finally {
      Seq(corpus, quarantine, ckpt).foreach(p =>
        Sources.deleteRecursively(new java.io.File(p)))
    }
  }
}
