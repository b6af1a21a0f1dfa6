package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Dedup, Tables}

/** SimHash near-dup on the shared banded-LSH core: 4×16-bit banding is
  * EXACT for hamming ≤ 3 (pigeonhole — ≤3 flipped bits leave ≥1 band
  * untouched), so the operator must equal a brute-force hamming join
  * exactly, in every physical shape.
  */
class SimHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.01"

  private def bruteForce(maxHamming: Int): Set[(Long, Long, Long)] = {
    val sigs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.GraftExpressions.simhash64(col("text")).as("sig"))
    val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
  }

  test("graded q_simhash_neardup ≡ brute-force hamming join (exact recall, exact precision)") {
    val truth = bruteForce(3)
    assert(truth.nonEmpty, "no simhash pairs at sf0.01 — vacuous test")
    val got = Dedup.queries("q_simhash_neardup")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == truth)
  }

  test("salted no-broadcast shape ≡ broadcast shape, plan broadcast-free") {
    val broad = Dedup.simHashNearDup(Tables.documents(spark, sfDir), 3, Dedup.Broadcast)
      .as[(Long, Long, Long)].collect().toSeq
    val saltedDf = Dedup.simHashNearDup(Tables.documents(spark, sfDir), 3, Dedup.Salted())
    assert(broad.nonEmpty)
    assert(saltedDf.as[(Long, Long, Long)].collect().toSeq == broad)
    val p = saltedDf.queryExecution.executedPlan.toString
    assert(!p.contains("Broadcast"), p)
    assert(p.contains("SortMergeJoin"), p)
  }

  test("word reorder gives hamming 0; the operator finds exactly the reordered pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha"), // reorder: same multiset
      (4L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simHashNearDup(docs, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 0L)), s"expected only the reordered pair at hamming 0: $pairs")
    // Kernel-level ordering: a one-token edit sits closer than an
    // unrelated doc (the hamming gradient the operator thresholds).
    import graft.functions.GraftOps
    def d(a: String, b: String): Int =
      java.lang.Long.bitCount(GraftOps.simhash64(a) ^ GraftOps.simhash64(b))
    val base = "alpha beta gamma delta epsilon zeta"
    assert(d(base, "alpha beta gamma delta epsilon eta") <
      d(base, "completely different words entirely here now"))
  }

  test("multi-band: hamming 5 and 7 thresholds ≡ brute force (8×8-bit banding)") {
    for (h <- Seq(5, 7)) {
      val truth = bruteForce(h)
      assert(truth.nonEmpty, s"no pairs at hamming <= $h — vacuous")
      val got = Dedup.simHashNearDup(Tables.documents(spark, sfDir), maxHamming = h)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == truth, s"hamming $h mismatch")
    }
    // Tightest sufficient banding is selected per threshold.
    assert(Dedup.simHashBandCount(3) == 4)
    assert(Dedup.simHashBandCount(4) == 8)
    assert(Dedup.simHashBandCount(7) == 8)
    assert(Dedup.simHashBandCount(15) == 16)
  }

  test("cross-corpus delta ≡ brute-force cross hamming join") {
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
    val got = Dedup.simHashNearDupAgainst(delta, docs, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    def sigs(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      graft.functions.GraftExpressions.simhash64(col("text")).as("sig"))
    val truth = sigs(delta).select(col("doc_id").as("doc_a"), col("sig").as("sa"))
      .crossJoin(sigs(docs).select(col("doc_id").as("doc_b"), col("sig").as("sb")))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .where(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(truth.nonEmpty, "no cross pairs — vacuous")
    assert(got == truth)
  }

  test("maxHamming above the 16×4-bit banding guarantee is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.simHashNearDup(Tables.documents(spark, sfDir), maxHamming = 16)
    }
  }
}
