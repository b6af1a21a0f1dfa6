package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Dedup, Tables}

/** Prefix-filtered containment join: candidate recall is EXACT by
  * pigeonhole (any |A| − ceil(τ|A|) + 1 tokens of A must intersect a
  * ≥τ-container), so the operator must equal brute-force all-pairs
  * containment exactly, in every physical shape.
  */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.01"

  private def fixtureToks = Tables.documents(spark, sfDir)
    .select(col("doc_id"), Dedup.normTokens(col("text")).as("toks"))

  private def bruteForce(): Set[(Long, Long, Double)] = {
    import graft.functions.GraftExpressions.intersectSize
    val t = fixtureToks.where(size(col("toks")) > 0)
    val a = t.select(col("doc_id").as("doc_a"), col("toks").as("ta"),
      size(col("toks")).as("na"))
    val b = t.select(col("doc_id").as("doc_b"), col("toks").as("tb"))
    a.join(b, col("doc_a") =!= col("doc_b"))
      .withColumn("inter", intersectSize(col("ta"), col("tb")))
      .where(col("inter") * 10 >= col("na") * 9)
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / col("na").cast("double"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
  }

  test("containmentPairs ≡ exact brute-force all-pairs containment on the full fixture") {
    val truth = bruteForce()
    assert(truth.nonEmpty, "no containment pairs at sf0.01 — vacuous test")
    val got = Dedup.containmentPairs(fixtureToks, "toks", 9, 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == truth)
  }

  test("graded key: every planted truncation is contained in its original, one direction") {
    val rows = Dedup.queries("q_containment_pairs")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    val pairSet = rows.map(r => (r._1, r._2)).toSet
    val originals = graft.engine.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 8 === 0).select("doc_id").as[Long].collect().toSeq
    assert(originals.nonEmpty)
    // copy→original at containment 1.0 for every multi-token doc; the
    // ≈0.5 reverse direction stays below τ unless the doc is tiny.
    val multiTok = graft.engine.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 8 === 0 &&
        size(Dedup.normTokens(col("text"))) >= 4)
      .select("doc_id").as[Long].collect().toSeq
    multiTok.foreach { id =>
      assert(pairSet.contains((id + 300000L, id)), s"missing planted pair for $id")
      assert(!pairSet.contains((id, id + 300000L)), s"reverse direction leaked for $id")
    }
  }

  test("asymmetric: a strict-subset doc is flagged in one direction only") {
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")),
      (2L, Seq("a", "b", "c", "d", "e", "f", "g", "h")), // ⊆ doc 1; reverse = 0.8 < 0.9
      (3L, Seq("x", "y", "z"))
    ).toDF("doc_id", "toks")
    val got = Dedup.containmentPairs(docs, "toks", 9, 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((2L, 1L, 1.0)), got.toString)
  }

  test("salted no-broadcast confirm shape ≡ broadcast shape") {
    val broad = Dedup.containmentPairs(fixtureToks, "toks", 9, 10, Dedup.Broadcast)
      .as[(Long, Long, Double)].collect().toSeq
    assert(broad.nonEmpty)
    val salted = Dedup.containmentPairs(fixtureToks, "toks", 9, 10, Dedup.Salted())
    assert(salted.as[(Long, Long, Double)].collect().toSeq == broad)
    val p = salted.queryExecution.executedPlan.toString
    assert(!p.contains("Broadcast"), p)
  }
}
