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

  test("boilerplate census finds exactly the planted cross-doc phrase") {
    val docs = Seq(
      (1L, "en", "alpha beta this footer repeats every page gamma"),
      (2L, "en", "delta this footer repeats every page epsilon zeta"),
      (3L, "en", "this footer repeats every page"),
      (4L, "en", "totally unrelated words with no shared phrase here"),
      (5L, "en", "short one")).toDF("doc_id", "lang", "text")
    val census = TextClean.boilerplateCensus(
      TextClean.gramStream(docs, TextClean.BoilerGramN), 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Only the planted 5-token phrase itself crosses 3 documents (its
    // 6-token supergrams exist in at most one doc each).
    assert(census == Map("this footer repeats every page" -> 3L))
  }

  test("gram stream emits len-n+1 grams per doc and skips short docs") {
    val docs = Seq(
      (1L, "en", "a b c d e f"),     // 6 tokens → 2 grams
      (2L, "en", "a b c d"),         // 4 tokens → excluded
      (3L, "en", "a b c d e")        // 5 tokens → 1 gram
    ).toDF("doc_id", "lang", "text")
    val grams = TextClean.gramStream(docs, 5)
    assert(grams.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 2L, 3L -> 1L))
    assert(grams.where(col("doc_id") === 3L).head().getString(2) == "a b c d e")
  }

  test("strip report flags exactly the docs at or above the 20% share") {
    // doc 1: 5 grams, phrase shared with doc 2 gives it 1 boiler gram
    // (20% — flagged, boundary inclusive); doc 3: 10 grams, 1 shared
    // (10% — not flagged); doc 4: isolated (0%).
    val shared = "common shared footer phrase here"
    val docs = Seq(
      (1L, "en", s"$shared u1 u2 u3 u4"),
      (2L, "en", s"$shared v1 v2 v3 v4 v5 v6 v7 v8 v9"),
      (3L, "fr", "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (4L, "fr", "w1 w2 w3 w4 w5 x6 x7 x8 x9")).toDF("doc_id", "lang", "text")
    val grams = TextClean.gramStream(docs, TextClean.BoilerGramN)
    val census = TextClean.boilerplateCensus(grams, 2L)
      .select(col("gram"), lit(1L).as("__boiler"))
    val perDoc = grams.join(census, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("g"), count(col("__boiler")).as("h"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // docs 1/2 share the 5-token phrase (1 gram each); docs 3/4 share
    // their leading 5 tokens (1 gram each).
    assert(perDoc(1L) == (5L, 1L) && perDoc(2L) == (10L, 1L))
    assert(perDoc(3L) == (5L, 1L) && perDoc(4L) == (5L, 1L))
    val flagged = perDoc.collect { case (id, (g, h)) if h * 5 >= g => id }.toSet
    assert(flagged == Set(1L, 3L, 4L))
  }

  test("streaming census parity: update-mode counts converge to the batch census") {
    // Batch equivalence of the shared transform first: per-doc distinct
    // grams counted once ≡ countDistinct(doc_id) per gram.
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    val viaUpdates = TextClean.censusUpdates(docs)
    val viaDistinct = TextClean.boilerplateCensus(
      TextClean.gramStream(docs, TextClean.BoilerGramN), 1L)
    assert(viaUpdates.except(viaDistinct).count() == 0 &&
      viaDistinct.except(viaUpdates).count() == 0)
    // Streaming face: two ingest batches, update mode; counts are
    // monotone, so max-per-gram across emitted updates is the final
    // census.
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](spark)
    val q = TextClean.censusUpdates(ms.toDF().toDF("doc_id", "lang", "text"))
      .writeStream.outputMode("update").format("memory")
      .queryName("census_stream").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("census_stream")
      .groupBy("gram").agg(max("n_docs").as("n_docs"))
    val batch = viaDistinct
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
  }

  test("online boilerplate gate: streamed per-doc tags equal the batch tags") {
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    // Build + store the census artifact (the offline half).
    val censusDir = java.nio.file.Files.createTempDirectory("graft-census").toString
    TextClean.boilerplateCensus(
        TextClean.gramStream(docs, TextClean.BoilerGramN), 1L)
      .write.mode("overwrite").parquet(censusDir)
    // Stream the docs through the gate in two micro-batches.
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](spark)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Boolean)]
    val q = ms.toDF().toDF("doc_id", "lang", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.streaming.Streams.boilerplateGateBatch(censusDir, 2L)(b)
          .collect().map(r => (r.getLong(0), r.getAs[Long]("n_grams"),
            r.getAs[Long]("n_hits"), r.getAs[Boolean]("flagged")))
        ()
      }.start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val batch = TextClean.tagBoilerplate(docs,
        spark.read.parquet(censusDir).where(col("n_docs") >= 2L))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_hits"), r.getAs[Boolean]("flagged"))).toSet
    assert(got.toSet == batch)
    assert(batch.exists(_._4), "fixture must flag at least one doc")
  }

  test("incremental census merge is identical to the batch census") {
    val batch = SparkEntry.queries("q_boilerplate_grams")(spark, sfDir)
    val incr = SparkEntry.queries("q_boilerplate_delta")(spark, sfDir)
    assert(batch.count() > 0, "fixture must produce a non-empty census")
    assert(incr.except(batch).count() == 0 && batch.except(incr).count() == 0)
  }

  test("URL canonicalization folds scheme, host case, query, fragment, slash") {
    import spark.implicits._
    val variants = Seq(
      "https://Example.COM/a/b?utm=1", "http://example.com/a/b/",
      "https://example.com/a/b#frag", "HTTPS is not matched here").toDF("url")
      .where(col("url").startsWith("http"))
      .select(TextClean.canonicalUrl(col("url")).as("c"))
      .distinct().as[String].collect()
    assert(variants.sameElements(Array("example.com/a/b")), variants.mkString("|"))
    // Host-only URL (empty path) and repeated trailing slashes.
    val edge = Seq("https://Host.Org", "http://host.org///").toDF("url")
      .select(TextClean.canonicalUrl(col("url")).as("c"))
      .distinct().as[String].collect()
    assert(edge.sameElements(Array("host.org")), edge.mkString("|"))
  }

  test("url dedup keeps the first doc per canonical target") {
    val rows = SparkEntry.queries("q_url_dedup")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val target = rows.filter(_._1 == "example.com/a/b")
    val n = graft.engine.Tables.documents(spark, sfDir).count()
    // doc_id % 4 ∈ {0,1,2} all canonicalize to the shared target; keeper
    // is doc 0; every other doc keeps its own distinct crawl URL.
    assert(target.length == 1 && target.head._2 == (n - n / 4) && target.head._3 == 0L,
      s"target row: ${target.mkString}")
    assert(rows.length.toLong == 1 + n / 4, s"rows ${rows.length}")
  }
}
