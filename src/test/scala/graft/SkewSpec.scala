package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Skew, Tables}

/** Salting must be an execution detail: salted results ≡ unsalted. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedCollectList equals the unsalted sorted collect_list") {
    val ev = Tables.events(spark, TestSpark.sfDir)
    val salted = Skew.saltedCollectList(ev, Seq("event_type"), "event_id", "user_id")
      .as[(String, Seq[Long])].collect().toMap
    val plain = ev.groupBy("event_type")
      .agg(array_sort(collect_list(col("user_id"))).as("user_id_list"))
      .as[(String, Seq[Long])].collect().toMap
    assert(salted == plain)
  }

  test("saltedJoin equals the plain equi-join") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "event_type")
    val users = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val salted = Skew.saltedJoin(ev, users, "user_id", "event_id", salts = 8)
      .select("event_id", "user_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val plain = ev.join(users, "user_id")
      .select("event_id", "user_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
  }
}
