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
}
