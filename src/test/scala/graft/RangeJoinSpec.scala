package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Relational

/** bucketedRangeJoin must be EXACTLY the naive non-equi join — the
  * bucketing only generates candidates; the residual predicate decides.
  * Boundary cases matter: points exactly on lo (kept), exactly on hi
  * (dropped), negative values, intervals narrower than / spanning
  * multiple buckets, and bucket-aligned interval edges.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed rewrite ≡ naive range join, incl. boundaries") {
    import spark.implicits._
    val points = Seq(-3.0, -2.5, 0.0, 0.9, 1.0, 2.49, 2.5, 5.0, 7.3, 100.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
    val intervals = Seq(
      ("neg", -5.0, 0.0),     // all-negative
      ("zero", 0.0, 1.0),     // bucket-aligned edges
      ("narrow", 2.4, 2.6),   // narrower than a bucket, crosses a boundary
      ("wide", 0.0, 50.0),    // spans many buckets
      ("empty", 3.0, 3.0)     // degenerate
    ).toDF("name", "lo", "hi")

    val naive = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "name").as[(Long, String)].collect().toSet
    val bucketed = Relational.bucketedRangeJoin(points, "p", intervals, "lo", "hi", 2.5)
      .select("pid", "name").as[(Long, String)].collect().toSet
    assert(bucketed == naive)
    assert(naive.contains((2L, "zero")))   // p=0.0 on lo: kept
    assert(!naive.exists { case (pid, n) => pid == 4L && n == "zero" }) // p=1.0 on hi: dropped
    assert(!naive.exists(_._2 == "empty"))
  }

  test("graded key plans with no nested-loop join") {
    val p = SparkEntry.queries("q_join_range_bucketed")(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin"), p)
  }
}
