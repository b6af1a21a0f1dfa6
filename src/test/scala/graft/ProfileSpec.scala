package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Profile, Tables}

/** Profile/DQ contracts: rule semantics on planted edge cases, vacuous
  * pass on empty input, approx-vs-exact distinct tolerance, and the
  * one-scan plan shape the module's scale story rests on.
  */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("check rule semantics: nulls, uniqueness excludes null keys, domain, predicate") {
    val df = Seq(
      (Some(1L), Some("en")), (Some(1L), Some("en")), // dup id
      (Some(2L), None),                               // null lang
      (None, Some("xx")),                             // null id, bad lang
      (Some(3L), Some("de"))
    ).toDF("id", "lang")
    val got = Profile.check(df, Seq(
        Profile.NotNull("id_not_null", "id"),
        Profile.Unique("id_unique", "id"),
        Profile.InSet("lang_ok", "lang", Seq("de", "en")),
        Profile.Violates("id_big", col("id") > 2L)))
      .as[(String, Long, Boolean)].collect().map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(got("id_not_null") == ((1L, false)))
    // One duplicate pair; the null id is NOT a uniqueness violation.
    assert(got("id_unique") == ((1L, false)))
    assert(got("lang_ok") == ((1L, false)), "null lang must not violate the domain rule")
    assert(got("id_big") == ((1L, false)))
  }

  test("check on an empty frame: every rule passes vacuously") {
    val empty = Seq.empty[(Long, String)].toDF("id", "lang")
    val got = Profile.check(empty, Seq(
        Profile.NotNull("a", "id"), Profile.Unique("b", "id"),
        Profile.Violates("c", col("id") > 0L)))
      .as[(String, Long, Boolean)].collect()
    assert(got.forall { case (_, n, p) => n == 0L && p })
  }

  test("profile: exact matches brute force; approx within HLL tolerance") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val exact = Profile.profile(docs, Seq("doc_id", "lang"), exact = true)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val rows = docs.select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(exact("doc_id") == (("doc_id", rows.length.toLong, 0L,
      rows.map(_._1).distinct.length.toLong)))
    assert(exact("lang") == (("lang", rows.length.toLong, 0L,
      rows.map(_._2).distinct.length.toLong)))
    val approx = Profile.profile(docs, Seq("doc_id", "lang"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(math.abs(approx("doc_id") - exact("doc_id")._4) <=
      math.max(2L, (exact("doc_id")._4 * 0.05).toLong), s"HLL off: $approx")
    assert(approx("lang") == exact("lang")._4) // tiny cardinality is exact
  }

  test("approx profile and check are single-scan plans (no Expand, one scan)") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val p1 = Profile.profile(docs, Seq("doc_id", "lang", "source"))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p1).size == 1, p1)
    assert(!p1.contains("Expand"), "approx profile must not pay Expand")
    val p2 = Profile.check(docs, Seq(
        Profile.NotNull("a", "lang"),
        Profile.Violates("b", length(col("text")) === 0)))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p2).size == 1, p2)
    assert(!p2.contains("Expand"))
  }
}
