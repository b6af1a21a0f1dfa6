package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.History

/** SCD2 history maintenance (History.scd2FromLog / scd2Merge / asOf):
  * the merge invariant is that folding any split of the log in
  * incrementally equals deriving history one-shot — including
  * out-of-order deltas that splice between existing versions — and
  * re-merging the same delta is a no-op.
  */
class HistorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  private def log(rows: (String, Int, String)*): DataFrame =
    rows.map { case (k, m, a) => (k, ts(m), a) }.toDF("k", "ts", "attr")

  private def derive(df: DataFrame): DataFrame =
    History.scd2FromLog(df, Seq("k"), Seq("attr"), "ts")

  private def canon(df: DataFrame): Seq[(String, String, Timestamp, Option[Timestamp], Boolean)] =
    df.select("k", "attr", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4))).toSeq

  test("scd2FromLog compresses repeats and seals intervals") {
    val h = canon(derive(log(
      ("u", 1, "A"), ("u", 2, "A"), ("u", 3, "B"), ("u", 4, "B"), ("u", 5, "A"))))
    assert(h == Seq(
      ("u", "A", ts(1), Some(ts(3)), false),
      ("u", "B", ts(3), Some(ts(5)), false),
      ("u", "A", ts(5), None, true)))
  }

  test("scd2Merge equals one-shot derivation for every split point") {
    val full = log(("u", 1, "A"), ("u", 2, "B"), ("u", 3, "B"), ("u", 4, "C"),
      ("v", 1, "X"), ("v", 5, "Y"), ("w", 2, "Z"))
    val rows = Seq(1, 2, 3, 4, 5)
    val oneShot = canon(derive(full))
    for (split <- rows) {
      val h0 = derive(full.where(col("ts") < lit(ts(split))))
      val merged = History.scd2Merge(h0, full.where(col("ts") >= lit(ts(split))),
        Seq("k"), Seq("attr"), "ts")
      assert(canon(merged) == oneShot, s"split at minute $split")
    }
  }

  test("out-of-order delta splices between versions and collapses the follower") {
    // History: A@1, B@3. Delta inserts B@2 — the B@3 version must
    // collapse into it (it no longer changes anything).
    val h0 = derive(log(("u", 1, "A"), ("u", 3, "B")))
    val merged = History.scd2Merge(h0, log(("u", 2, "B")),
      Seq("k"), Seq("attr"), "ts")
    assert(canon(merged) == canon(derive(log(
      ("u", 1, "A"), ("u", 2, "B"), ("u", 3, "B")))))
    assert(canon(merged) == Seq(
      ("u", "A", ts(1), Some(ts(2)), false),
      ("u", "B", ts(2), None, true)))
  }

  test("equal-attr delta rows straddling an existing version both survive") {
    // History holds B@2; the delta carries A@1 and A@3. Pre-compressing
    // the delta against itself would drop A@3 as an intra-delta repeat
    // and lose the re-activation — the merge must yield A, B, A.
    val h0 = derive(log(("u", 2, "B")))
    val merged = History.scd2Merge(h0, log(("u", 1, "A"), ("u", 3, "A")),
      Seq("k"), Seq("attr"), "ts")
    assert(canon(merged) == canon(derive(log(
      ("u", 1, "A"), ("u", 2, "B"), ("u", 3, "A")))))
    assert(canon(merged) == Seq(
      ("u", "A", ts(1), Some(ts(2)), false),
      ("u", "B", ts(2), Some(ts(3)), false),
      ("u", "A", ts(3), None, true)))
  }

  test("same-(key, ts) delta correction deterministically overrides history") {
    // A late correction re-observes minute 2 with a different attribute:
    // the delta side must win (not an arbitrary dropDuplicates survivor),
    // and the follower logic still applies across the corrected row.
    val h0 = derive(log(("u", 1, "A"), ("u", 2, "B"), ("u", 3, "C")))
    val merged = History.scd2Merge(h0, log(("u", 2, "X")),
      Seq("k"), Seq("attr"), "ts")
    assert(canon(merged) == Seq(
      ("u", "A", ts(1), Some(ts(2)), false),
      ("u", "X", ts(2), Some(ts(3)), false),
      ("u", "C", ts(3), None, true)))
    // Correcting to the predecessor's value collapses the version away.
    val collapse = History.scd2Merge(h0, log(("u", 2, "A")),
      Seq("k"), Seq("attr"), "ts")
    assert(canon(collapse) == Seq(
      ("u", "A", ts(1), Some(ts(3)), false),
      ("u", "C", ts(3), None, true)))
  }

  test("re-merging the same delta is idempotent; no-change delta is a no-op") {
    val h0 = derive(log(("u", 1, "A"), ("v", 1, "X")))
    val delta = log(("u", 2, "B"))
    val once = History.scd2Merge(h0, delta, Seq("k"), Seq("attr"), "ts")
    val twice = History.scd2Merge(once, delta, Seq("k"), Seq("attr"), "ts")
    assert(canon(twice) == canon(once))
    // A delta that only repeats current attrs changes nothing.
    val noop = History.scd2Merge(once, log(("u", 3, "B"), ("v", 3, "X")),
      Seq("k"), Seq("attr"), "ts")
    assert(canon(noop) == canon(once))
  }

  test("untouched keys pass through unchanged (delta never rewrites them)") {
    val h0 = derive(log(("u", 1, "A"), ("v", 1, "X"), ("v", 2, "Y")))
    val merged = History.scd2Merge(h0, log(("u", 2, "B")),
      Seq("k"), Seq("attr"), "ts")
    val vRows = canon(merged).filter(_._1 == "v")
    assert(vRows == canon(h0).filter(_._1 == "v"))
  }

  test("null attribute values collapse null-safely") {
    val h = canon(derive(
      Seq(("u", ts(1), null.asInstanceOf[String]),
        ("u", ts(2), null.asInstanceOf[String]), ("u", ts(3), "A"))
        .toDF("k", "ts", "attr")))
    assert(h == Seq(
      ("u", null, ts(1), Some(ts(3)), false),
      ("u", "A", ts(3), None, true)))
  }

  test("asOf returns the covering version per key") {
    val h = derive(log(("u", 1, "A"), ("u", 5, "B"), ("v", 7, "X")))
    val at3 = History.asOf(h, lit(ts(3)))
      .select("k", "attr").orderBy("k").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(at3 == Seq(("u", "A"))) // v not yet born at minute 3
    val at9 = History.asOf(h, lit(ts(9)))
      .select("k", "attr").orderBy("k").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(at9 == Seq(("u", "B"), ("v", "X")))
  }
}
