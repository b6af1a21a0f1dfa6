package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Dedup

/** The salted (no-broadcast) LSH shape must be a pure execution detail:
  * identical logical output to the broadcast shape on every input.
  */
class LshSaltedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.001's documents carry no pairs above the Jaccard thresholds —
  // the equivalence tests need a corpus where near-dups actually exist.
  private val sfDir = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    df.as[(Long, Long, Double)].collect().toSeq.sorted
  }

  test("q_neardup_lsh_salted ≡ q_neardup_lsh (token MinHash-LSH)") {
    val broad = rows(Dedup.qNeardupLsh(spark, sfDir))
    val salted = rows(Dedup.qNeardupLshSalted(spark, sfDir))
    assert(broad.nonEmpty, "fixture produced no near-dup pairs — vacuous test")
    assert(salted == broad)
  }

  test("blocked shingle near-dup: salted shape ≡ broadcast shape") {
    val base = Dedup.blockedDocSets(graft.engine.Tables.documents(spark, sfDir),
      graft.functions.GraftExpressions.charShingles(col("text"), 3, barrier = true),
      "grams", minChars = 3)
    val sigs = Dedup.signatures(base, "grams")
    val blocks = Dedup.DocBlockCols
    val broad = rows(Dedup.lshNearDupPairs(sigs, "grams", 4, 5, 0.8, Dedup.Broadcast, blocks))
    val salted = rows(Dedup.lshNearDupPairs(sigs, "grams", 4, 5, 0.8, Dedup.Salted(), blocks))
    assert(broad.nonEmpty, "fixture produced no shingle near-dup pairs — vacuous test")
    assert(salted == broad)
  }

  test("Auto shape dispatches on corpus size and matches both concrete shapes") {
    val sigs = Dedup.minhashBands(spark, sfDir)
    val broad = rows(Dedup.lshNearDupPairs(sigs, "toks", 9, 10, 0.9, Dedup.Broadcast))
    // 500 docs ≤ default cap → Broadcast branch.
    assert(rows(Dedup.lshNearDupPairs(sigs, "toks", 9, 10, 0.9, Dedup.Auto())) == broad)
    // cap 0 forces the Salted branch: same rows, no broadcast in the plan.
    val forced = Dedup.lshNearDupPairs(sigs, "toks", 9, 10, 0.9, Dedup.Auto(maxBroadcastDocs = 0))
    assert(!forced.queryExecution.executedPlan.toString.contains("Broadcast"))
    assert(rows(forced) == broad)
  }

  test("degenerate corpora: empty and single-doc inputs yield empty pair sets, no errors") {
    import spark.implicits._
    for (docs <- Seq(Seq.empty[(Long, Seq[String])], Seq((1L, Seq("only", "doc"))));
         shape <- Seq[Dedup.LshShape](Dedup.Broadcast, Dedup.Salted())) {
      val sigs = Dedup.signatures(docs.toDF("doc_id", "toks"))
      assert(Dedup.lshNearDupPairs(sigs, "toks", 9, 10, 0.9, shape).count() == 0L)
    }
  }

  test("salted shape is insensitive to the salt count") {
    val one = rows(Dedup.lshNearDupPairs(Dedup.minhashBands(spark, sfDir),
      "toks", 9, 10, 0.9, Dedup.Salted(cap = 1)))
    val many = rows(Dedup.lshNearDupPairs(Dedup.minhashBands(spark, sfDir),
      "toks", 9, 10, 0.9, Dedup.Salted(cap = 7)))
    assert(one.nonEmpty, "no pairs at sf0.01 — vacuous test")
    assert(one == many)
  }
}
