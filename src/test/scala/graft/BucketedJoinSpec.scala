package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Bucketing = the shuffle paid once at write time: a join of two tables
  * bucketed+sorted on the join key must plan with ZERO shuffle exchanges,
  * and still produce exactly the plain join's rows.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed-bucketed equi-join plans without a shuffle and matches the plain join") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val agg = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    Tables.writeBucketed(ev, "events_bkt", 8, Seq("user_id"))
    Tables.writeBucketed(agg, "user_counts_bkt", 8, Seq("user_id"))

    // MERGE hint: the dimension is small enough here that the planner
    // would broadcast (also shuffle-free but not the point) — force the
    // sort-merge path to show both bucketed sides joining co-located.
    val joined = spark.table("events_bkt").hint("merge")
      .join(spark.table("user_counts_bkt"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Bucketed: true"), plan)

    val bucketed = joined.select("event_id", "user_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val plain = ev.join(agg, "user_id").select("event_id", "user_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(bucketed == plain)
  }

  test("a persisted signature store confirms candidates with no store-side shuffle") {
    // Signatures are write-once artifacts (Dedup.lshNearDupPairs scaladoc):
    // at 100 TB they live in a bucketed table so every near-dup run's
    // confirm joins shuffle ONLY the (small) candidate stream — the huge
    // per-doc set dictionary is already bucket-partitioned on doc_id.
    val sigs = graft.engine.Dedup.minhashBands(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("toks"), col("minhash_sig"))
    Tables.writeBucketed(sigs, "sig_store", 8, Seq("doc_id"))
    val store = spark.table("sig_store")
    val cands = sigs.select(col("doc_id")).where(col("doc_id") % 3 === 0)
    val confirmed = cands.join(store.hint("merge"), "doc_id")
    val plan = confirmed.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange (candidate side only): $plan")
    val got = confirmed.select("doc_id").as[Long].collect().sorted.toSeq
    val expected = sigs.where(col("doc_id") % 3 === 0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val byUser = spark.table("events_bkt").groupBy("user_id")
      .agg(round(sum(col("value")), 2).as("sum_value"))
    val plan = byUser.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val expected = Tables.events(spark, TestSpark.sfDir).groupBy("user_id")
      .agg(round(sum(col("value")), 2).as("sum_value"))
      .as[(Long, Double)].collect().toSet
    assert(byUser.as[(Long, Double)].collect().toSet == expected)
  }
}
