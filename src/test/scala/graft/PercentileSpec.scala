package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The rank-based two-pass percentile in q_agg_stats must reproduce the
  * built-in exact `percentile` (which it replaced for its unbounded
  * per-group state) on arbitrary data — including groups of one row,
  * groups with duplicated values, and NULLs, which percentile ignores.
  */
class PercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The same rank-based construction as Relational.qAggStats, over a
    * generic (g, x) frame.
    */
  private def rankPercentiles(df: org.apache.spark.sql.DataFrame,
      ps: Seq[Double]): Map[(String, Double), Double] = {
    val counts = df.groupBy(col("g")).agg(count(col("x")).as("__n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g")).orderBy(col("x"))
    val ranked = df.where(col("x").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(counts), "g")
    def pos(p: Double) = lit(p) * (col("__n") - 1)
    val agg = ranked.groupBy(col("g")).agg(
      first(col("__n")).as("__n"),
      ps.flatMap { p =>
        Seq(min(when(col("__rn") === floor(pos(p)) + 1, col("x"))).as(s"lo_$p"),
          min(when(col("__rn") === ceil(pos(p)) + 1, col("x"))).as(s"hi_$p"))
      }: _*)
    agg.collect().flatMap { r =>
      val g = r.getString(0)
      val n = r.getLong(1)
      ps.map { p =>
        val lo = r.getDouble(r.fieldIndex(s"lo_$p"))
        val hi = r.getDouble(r.fieldIndex(s"hi_$p"))
        val posV = p * (n - 1)
        val frac = posV - math.floor(posV)
        (g, p) -> (lo + frac * (hi - lo))
      }
    }.toMap
  }

  test("rank-based percentile == built-in exact percentile on adversarial data") {
    // Deterministic pseudo-random data: skewed magnitudes, duplicates,
    // one singleton group, NULLs sprinkled in.
    val rows: Seq[(String, Option[Double])] =
      (1 to 997).map { i =>
        val g = s"g${i % 7}"
        val h = (i * 2654435761L) & 0xffffffffL
        val x = if (h % 13 == 0) None
          else Some(((h % 10000) / 7.0) * (if (h % 3 == 0) 1e6 else 1.0))
        (g, x)
      } :+ (("solo", Some(42.42)))
    val df = rows.toDF("g", "x")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val builtin = df.groupBy(col("g"))
      .agg(expr(s"percentile(x, array(${ps.mkString(",")}))").as("pct"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zip(ps).map { case (v, p) => (r.getString(0), p) -> v }
      }.toMap
    val mine = rankPercentiles(df, ps)
    assert(mine.keySet == builtin.keySet)
    for ((k, v) <- mine) {
      val b = builtin(k)
      assert(math.abs(v - b) <= math.max(1e-9, math.abs(b) * 1e-12),
        s"$k: rank-based $v vs builtin $b")
    }
  }

  test("exact-percentile buffer is O(distinct): domain-bounded on 2-decimal money, invariant under row inflation") {
    // The r15 verdict's 100-TB story for q_winsorize /
    // q_agg_percentile_exact / q_histogram_equidepth: Spark's Percentile
    // aggregate buffers (value -> count) pairs, so its state is the
    // DISTINCT count per group. This proves the two facts the
    // q_agg_percentile_exact scaladoc guard rests on.
    import graft.engine.Tables
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))

    // (1) The money column IS 2-decimal: every value times 100 is
    // integral (to double noise), so distinct values per group are
    // capped by the cents DOMAIN (max-min)*100+1 — independent of rows.
    val bad2dec = li.where(abs(col("x") * 100 - round(col("x") * 100, 0)) > lit(1e-6)).count()
    assert(bad2dec == 0L, s"$bad2dec non-2-decimal prices — the domain bound would not hold")
    val stats = li.groupBy(col("g"))
      .agg(countDistinct(col("x")).as("nd"), count(lit(1)).as("n"),
        min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (nd, mn, mx) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      val domainCells = math.round((mx - mn) * 100) + 1
      assert(nd <= domainCells, s"group ${r.getString(0)}: $nd distinct > domain $domainCells")
    }

    // (2) Row inflation adds COUNTS, not buffer entries: a 7x copy-union
    // has the exact same distinct set per group (the mirror-scale
    // argument — at 970x the buffer is the same size as at 1x).
    val inflated = (1 to 7).map(_ => li).reduce(_ unionAll _)
    val ndOnce = li.groupBy(col("g")).agg(countDistinct(col("x")).as("nd"))
    val ndInfl = inflated.groupBy(col("g")).agg(countDistinct(col("x")).as("nd"))
    assert(ndOnce.exceptAll(ndInfl).isEmpty && ndInfl.exceptAll(ndOnce).isEmpty)

    // (3) And the aggregate stays CORRECT on duplication-heavy input:
    // percentile over 100k rows of 9 distinct values matches the closed
    // form computed from the tiny multiset (the count-based buffer is
    // semantics-preserving, not just small).
    val nine = spark.range(100000)
      .select((col("id") % 9).cast("double").as("x")) // 0..8, ~uniform
    val got = nine.agg(expr("percentile(x, array(0.25, 0.5, 0.95))")).head()
      .getSeq[Double](0)
    // 100000 rows: ids 0..99999, value = id % 9; counts: values 0..7
    // appear 11112 times (0..7 lead the last partial cycle), 8 appears
    // 11104. Closed-form interpolated percentile at rank p*(n-1):
    def closedForm(p: Double): Double = {
      val counts = (0 to 8).map(v => (100000 / 9) + (if (v < 100000 % 9) 1 else 0))
      val cum = counts.scanLeft(0)(_ + _)
      val pos = p * (100000 - 1)
      def valueAt(rank: Long): Double = cum.indexWhere(_ > rank) - 1.0
      val (lo, hi) = (valueAt(math.floor(pos).toLong), valueAt(math.ceil(pos).toLong))
      lo + (pos - math.floor(pos)) * (hi - lo)
    }
    Seq(0.25, 0.5, 0.95).zip(got).foreach { case (p, v) =>
      assert(math.abs(v - closedForm(p)) < 1e-9, s"p=$p: $v vs ${closedForm(p)}")
    }
  }
}
