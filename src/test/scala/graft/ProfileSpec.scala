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

  test("madOutlierStats matches an independent in-JVM median/MAD computation") {
    // Deterministic skewed data: group "a" tight around 10 with two
    // planted extremes; group "b" uniform with none flagged at k=3.
    val a = Seq.tabulate(21)(i => 9.0 + i * 0.1) ++ Seq(500.0, -500.0)
    val b = Seq.tabulate(20)(i => i.toDouble)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      val r = 0.5 * (n - 1); val lo = r.toInt
      if (lo + 1 < n) s(lo) + (r - lo) * (s(lo + 1) - s(lo)) else s(lo)
    }
    val expect = Map("a" -> a, "b" -> b).map { case (g, xs) =>
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      val n = xs.count(x => math.abs(x - med) > 3.0 * 1.4826 * mad)
      g -> ((med, mad, xs.length.toLong, n.toLong))
    }
    val got = Profile.madOutlierStats(df, "g", "v")
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    for (g <- Seq("a", "b")) {
      val (med, mad, n, k) = expect(g)
      assert(got(g) == ((math.rint(med * 1e6) / 1e6,
        math.rint(mad * 1e6) / 1e6, n, k)), s"group $g: ${got(g)}")
    }
    assert(got("a")._4 == 2L && got("b")._4 == 0L)
  }

  test("madOutlierStats is robust: extremes barely move the median/MAD baseline") {
    // Mean/stddev-based flagging would be dragged by the planted
    // extreme; median/MAD must stay within the clean data's range.
    val clean = Seq.tabulate(50)(i => 100.0 + i)
    val dirty = clean :+ 1e9
    val stat = Profile.madOutlierStats(dirty.map(("g", _)).toDF("g", "v"), "g", "v")
      .as[(String, Double, Double, Long, Long)].head()
    assert(stat._2 >= 100.0 && stat._2 <= 150.0, s"median dragged: ${stat._2}")
    assert(stat._5 == 1L, s"exactly the planted extreme flags: ${stat._5}")
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

  test("winsorize matches an independent in-JVM percentile/clip/decimal-sum") {
    val data = Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // Spark's exact percentile: rank = p(n−1), linear interpolation.
    def pct(xs: Array[Double], p: Double): Double = {
      val rank = p * (xs.length - 1)
      val lo = rank.toInt
      val frac = rank - lo
      val v = if (lo + 1 < xs.length) xs(lo) + (xs(lo + 1) - xs(lo)) * frac
              else xs(lo)
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = SparkEntry.queries("q_winsorize")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet == data.keySet)
    data.foreach { case (flag, xs) =>
      val (lo, hi) = (pct(xs, 0.05), pct(xs, 0.95))
      val sum = xs.map(x => BigDecimal(math.min(math.max(x, lo), hi))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      val (n, nLo, nHi, gLo, gHi, gSum) = got(flag)
      assert(n == xs.length.toLong, s"$flag n")
      assert(nLo == xs.count(_ < lo).toLong && nHi == xs.count(_ > hi).toLong,
        s"$flag clip counts")
      assert(gLo == lo && gHi == hi, s"$flag fences $gLo/$gHi != $lo/$hi")
      assert(gSum == sum.toDouble, s"$flag sum")
      assert(nLo > 0 && nHi > 0, s"$flag must actually clip at 5/95")
    }
  }

  test("equi-depth histogram: 10 near-equal buckets that partition each group") {
    val sizes = Tables.lineitem(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(8)).groupBy(identity).view.mapValues(_.length).toMap
    val got = SparkEntry.queries("q_histogram_equidepth")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.keySet == sizes.keySet)
    got.foreach { case (flag, rows) =>
      assert(rows.map(_._3).sum == sizes(flag).toLong, s"$flag partition")
      assert(rows.map(_._2).toSet.subsetOf((1 to 10).toSet), s"$flag buckets")
      // Equi-depth: with 2-decimal ties the buckets cannot be exactly
      // n/10, but no bucket should stray past 2x the ideal depth.
      val ideal = sizes(flag) / 10.0
      rows.foreach { case (_, b, n) =>
        assert(n <= ideal * 2 + 1, s"$flag bucket $b depth $n vs ideal $ideal")
      }
    }
  }

  test("fd violations: witness pair is real and the flag tracks distinctness") {
    val parts = Tables.part(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(2) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = SparkEntry.queries("q_fd_violations")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4), r.getBoolean(5)))
      .toMap
    assert(got.keySet == parts.keySet)
    got.foreach { case (brand, (n, nd, lo, hi, v)) =>
      val names = parts(brand)
      assert(n == names.length.toLong && nd == names.distinct.length.toLong)
      assert(lo == names.min && hi == names.max)
      assert(v == (nd > 1))
    }
    assert(got.values.exists(_._5), "the brand→name FD must actually be violated")
  }

  test("benford: digit census is exact, shares sum to 1, terms non-negative") {
    val digits = Tables.orders(spark, TestSpark.sfDir)
      .collect().map(r => math.round(r.getDouble(3) * 100).toString.head.asDigit)
    val got = SparkEntry.queries("q_benford")(spark, TestSpark.sfDir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val truth = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.keySet == truth.keySet && got.keySet.subsetOf((1 to 9).toSet))
    got.foreach { case (d, (n, share, exp, chi)) =>
      assert(n == truth(d), s"digit $d")
      assert(chi >= 0 && exp > 0 && share > 0)
    }
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-4, "shares sum to 1")
    // Expected shares are the Benford distribution, which itself sums to 1.
    assert(math.abs(Profile.BenfordExp.map(_._2).sum - 1.0) < 1e-12)
  }
}
