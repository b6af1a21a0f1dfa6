package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SpanDedup

/** Exact-substring span dedup: the fixed-L semantics are simple enough
  * to brute-force in Scala, so the operator is pinned against a
  * straight-line reference implementation, plus the structural
  * properties the rewrite must satisfy (all duplicated occurrences
  * excised, survivors in order, variable-length repeats merging to one
  * span, idempotence).
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val L = 8

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] =
    SpanDedup.substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", L)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  /** Straight-line reference: mark every position covered by an L-gram
    * seen in ≥ 2 distinct docs; count maximal marked runs; join keepers.
    */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toVector }
    val byGram = for ((id, ts) <- toks; i <- 0 to ts.size - L)
      yield (ts.slice(i, i + L).mkString(" "), id, i)
    val dup = byGram.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    toks.map { case (id, ts) =>
      val covered = (for {
        i <- (0 to ts.size - L)
        if dup(ts.slice(i, i + L).mkString(" "))
        p <- i until i + L
      } yield p).toSet
      // maximal runs of covered positions = merged spans
      val nSpans = covered.toSeq.sorted.foldLeft((0, -2)) { case ((n, prev), p) =>
        (if (p == prev + 1) n else n + 1, p)
      }._1
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> ((ts.size.toLong, nSpans.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  private val planted: Seq[(Long, String)] = {
    val span = (1 to L).map(i => s"dup$i").mkString(" ")
    Seq(
      1L -> s"alpha beta gamma $span delta epsilon zeta eta theta iota kappa",
      2L -> s"one two three four five six seven eight nine $span ten",
      3L -> "lonely words with no repeats anywhere in this corpus at all",
      4L -> "short doc")
  }

  test("planted shared span is excised from BOTH docs; unique tokens survive in order") {
    val out = run(planted)
    assert(out(1L)._4 == "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    assert(out(2L)._4 == "one two three four five six seven eight nine ten")
    assert(out(1L)._2 == 1 && out(2L)._2 == 1)        // one merged span each
    assert(out(1L)._3 == L && out(2L)._3 == L)        // exactly L tokens removed
    assert(out(3L) == ((11L, 0L, 0L, planted(2)._2))) // untouched doc intact
    assert(out(4L) == ((2L, 0L, 0L, "short doc")))    // shorter than L: no grams
  }

  test("variable-length repeat ≥ L merges staggered windows into ONE span") {
    val long = (1 to L + 5).map(i => s"r$i").mkString(" ") // repeat of L+5 tokens
    val docs = Seq(
      1L -> s"prefix one two $long suffix one two",
      2L -> s"other intro $long outro words here")
    val out = run(docs)
    assert(out(1L)._2 == 1 && out(2L)._2 == 1)
    assert(out(1L)._3 == L + 5 && out(2L)._3 == L + 5)
    assert(out(1L)._4 == "prefix one two suffix one two")
    assert(out(2L)._4 == "other intro outro words here")
  }

  test("operator ≡ straight-line reference on planted + generated corpus") {
    // Deterministic generator: small vocab forces shared grams; varying
    // doc lengths cross the n < L boundary.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val gen = (10L to 49L).map { id =>
      val n = rnd.nextInt(30)
      id -> Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // Empty-string docs split to [""], matching both engines' split(" ").
    val docs = planted ++ gen
    assert(run(docs) == reference(docs))
  }

  test("fully-duplicated docs excise to empty text") {
    val text = (1 to 12).map(i => s"t$i").mkString(" ")
    val out = run(Seq(1L -> text, 2L -> text))
    assert(out(1L) == ((12L, 1L, 12L, "")))
    assert(out(2L) == ((12L, 1L, 12L, "")))
  }

  test("idempotence on the sf0.001 fixture: re-running on rewritten text removes nothing") {
    val first = SpanDedup.substringDedup(
      graft.engine.Tables.documents(spark, TestSpark.sfDir), "doc_id", "text", L)
    val again = SpanDedup.substringDedup(
      first.select(col("doc_id"), col("kept_text").as("text")), "doc_id", "text", L)
    val residual = again.agg(sum("n_removed")).as[Long].collect().head
    assert(residual == 0,
      s"second pass removed $residual tokens — stitching created new cross-doc spans")
  }
}
