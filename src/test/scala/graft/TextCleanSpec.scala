package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.TextClean

/** Web-corpus cleaning invariants the hash-compare oracles don't state
  * directly: scrubbing leaves NO residual PII and is idempotent, HTML
  * stripping leaves no tags/entities, the URL census sees exactly the
  * planted hosts.
  */
class TextCleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir
  import spark.implicits._

  test("scrub removes every match and is idempotent") {
    val dirty = Seq(
      "mail a.b-c_d@sub.example.co.uk now",
      "call 555-867-5309 or visit 10.0.0.1",
      "ssn 123-45-6789 twice 123-45-6789",
      "clean text stays clean").toDF("text")
    val scrubbed = dirty.select(TextClean.scrub(col("text")).as("text"))
    Seq(TextClean.EmailRe, TextClean.PhoneRe, TextClean.Ipv4Re, TextClean.SsnRe)
      .foreach { re =>
        assert(scrubbed.where(col("text").rlike(re)).count() == 0, s"residual match: $re")
      }
    val twice = scrubbed.select(TextClean.scrub(col("text")).as("text"))
    assert(twice.except(scrubbed).count() == 0, "scrub must be idempotent")
  }

  test("q_pii_scrub census counts the planted leaks") {
    val out = SparkEntry.queries("q_pii_scrub")(spark, sfDir)
    val leaked = out.where(col("doc_id") % 10 === 0)
    assert(leaked.where(col("n_emails") =!= 1).count() == 0)
    assert(out.where(col("doc_id") % 10 =!= 0 && col("n_emails") > 0).count() == 0)
    assert(out.where(col("doc_id") % 15 === 0 && (col("n_ips") =!= 1 || col("n_ssns") =!= 1))
      .count() == 0)
    assert(out.where(col("scrubbed").rlike(TextClean.EmailRe)).count() == 0)
  }

  test("html strip leaves no tags or escaped entities, preserves inner text") {
    val out = SparkEntry.queries("q_html_strip")(spark, sfDir)
    assert(out.where(col("clean").rlike("<[^>]*>")).count() == 0)
    assert(out.where(col("clean").contains("&amp;")).count() == 0)
    // Wrapped docs lost markup but kept the payload (strictly shorter raw,
    // clean contains the original text head).
    val wrapped = out.where(col("doc_id") % 7 === 0)
    assert(wrapped.where(col("n_clean") >= col("n_raw")).count() == 0)
    assert(wrapped.where(!col("clean").contains("footer & nav")).count() == 0)
  }

  test("scrub is a stateless projection: the streaming face equals the batch twin") {
    // The cleaning stages are pure per-row maps, so they lift onto
    // readStream unchanged — no watermark, no state; this pins that the
    // column expression actually planalyzes under the streaming engine.
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val q = ms.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), TextClean.scrub(col("text")).as("text"))
      .writeStream.format("memory").queryName("clean_stream").start()
    val rows = Seq((1L, "mail a@b.io now"), (2L, "ip 10.0.0.1"), (3L, "plain"))
    try { ms.addData(rows); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("clean_stream").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = rows.toDF("doc_id", "text")
      .select(col("doc_id"), TextClean.scrub(col("text")).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
  }

  test("url census sees exactly the planted hosts with the planted multiplicities") {
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val n0 = docs.where(col("doc_id") % 5 === 0).count()
    val n1 = docs.where(col("doc_id") % 5 === 1).count()
    val got = SparkEntry.queries("q_url_census")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "example.com" -> (n0 + n1),
      "data.example.org" -> n0))
  }
}
