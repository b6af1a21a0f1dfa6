package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Relational, Tables}

/** SIXTH-decade probe (round-12 verdict item #7): ~sf970 ≈ 5.8 BILLION
  * lineitem rows through the heaviest aggregation pipelines, hash-gated
  * against DuckDB — without materializing a mirror.
  *
  * Why not a real ×9700 mirror: the fifth-decade mirror measures
  * 14.4 GB for its table subset, so ×9700 needs ≈ 98 GB for lineitem
  * alone (+20 GB orders, + dump + DuckDB temp ⇒ ~150 GB peak). The box
  * has 252 GB with ~55 GB free; deleting every other scale artifact
  * frees at most ~80 GB. Exact blocker: ≥150 GB needed, ≤80 GB
  * available. (Documented per the round-12 verdict's ask.)
  *
  * What a LAZY inflation still proves: `lineitem CROSS JOIN range(N)`
  * streams N value-identical copies through the engine — 5.8B rows of
  * real scan→project→filter→partial-agg→merge work with Σ(4dp revenue
  * partials) ≈ 5·10¹⁷, an order past the fifth decade — exactly the
  * regime where a LONG single-phase sum ANSI-overflows and a double sum
  * drifts, so the widePartials DECIMAL(38,0) merge discipline is what is
  * being gated. DuckDB replays the identical construction with
  * generate_series. What it does NOT probe (stated, not hidden): group
  * cardinality and shuffle layout stay at 1× — the materialized ×970
  * mirror remains the strongest signal for those.
  *
  * Run: PROBE_FACTOR (default 9700), PROBE_SRC (default
  * /root/testdata/sf0.1). Prints one JSON line per probe + summary;
  * exit 1 on any mismatch with the DuckDB oracle printed alongside
  * (oracle run separately by tools/decade_probe.py, which reads the
  * JSON this emits — no DuckDB from the JVM).
  *
  * q1 here is the EXACT q1PricingSummary arithmetic (same cents columns,
  * same widePartials partials, same DECIMAL merge and integer-space
  * rounding) applied to the inflated frame.
  */
object DecadeProbe {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("PROBE_FACTOR", "9700").toInt
    // Overflow guard (r13 ADVICE): the per-(group, partition) __rev6 LONG
    // partial measures ~5-8·10¹⁷ at factor 9700 over 64 range partitions —
    // ~11× headroom under 2⁶³. The partial scales with factor/partitions,
    // so an unchecked 10× larger factor would silently wrap (ANSI off) and
    // the DECIMAL(38,0) merge would faithfully sum wrong partials. Cap the
    // per-partition copy count at ~2× the measured-safe regime and scale
    // the partition count past it instead of letting the partial grow.
    val parts = 64 * ((factor + 19399) / 19400) max 64
    require(factor >= 1 && factor <= 194000,
      s"PROBE_FACTOR $factor outside [1, 194000] (LONG-partial overflow guard)")
    val src = sys.env.getOrElse("PROBE_SRC", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)

    // N value-identical copies, streamed not stored. The RANGE drives
    // (`parts` partitions — 64 up to factor 19400, scaled past it to keep
    // the per-partition LONG partial in the measured-safe regime) and the
    // 600k-row projected
    // lineitem broadcasts — inverting the join keeps 5.8B rows spread
    // over 64 tasks instead of the handful of parquet scan splits, and
    // bounds each task's LONG rev6 partial at ~5·10¹⁷ ≪ 2⁶³. The copy
    // index is dropped immediately: nothing downstream keys on it.
    def inflated(): DataFrame =
      spark.range(0, factor, 1, parts).select(col("id").as("__copy"))
        .crossJoin(broadcast(
          Tables.lineitem(spark, src)
            .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"), col("l_tax"), col("l_shipdate"))))
        .drop("__copy")

    val t0 = System.nanoTime()
    val pc = Relational.cents(col("l_extendedprice"))
    val dc = Relational.cents(col("l_discount"))
    val tc = Relational.cents(col("l_tax"))
    val partials = inflated()
      .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        spark_partition_id().as("__wp"))
      .agg(
        sum(col("l_quantity")).as("__qty"),
        sum(pc).as("__pc"),
        sum(dc).as("__dc"),
        sum(pc * (lit(100L) - dc)).as("__rev4"),
        sum(pc * (lit(100L) - dc) * (lit(100L) + tc)).as("__rev6"),
        count(lit(1)).as("__n"))
    val out = partials
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("__qty")), 2).as("sum_qty"),
        (expr("sum(CAST(__pc AS DECIMAL(38,0)))") / 100.0).as("sum_base_price"),
        (expr("(sum(CAST(__rev4 AS DECIMAL(38,0))) + 50) div 100") / 100.0).as("sum_disc_price"),
        (expr("(sum(CAST(__rev6 AS DECIMAL(38,0))) + 5000) div 10000") / 100.0).as("sum_charge"),
        sum(col("__n")).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    val wall = (System.nanoTime() - t0) / 1e9
    out.foreach { r =>
      println(s"""{"probe":"q1_x$factor","l_returnflag":"${r.getString(0)}",""" +
        s""""l_linestatus":"${r.getString(1)}","sum_qty":${r.getDouble(2)},""" +
        s""""sum_base_price":${r.getDouble(3)},"sum_disc_price":${r.getDouble(4)},""" +
        s""""sum_charge":${r.getDouble(5)},"count_order":${r.getLong(6)}}""")
    }
    println(s"""{"decade_probe":{"factor":$factor,"src":"$src","rows_processed":${out.map(_.getLong(6)).sum},"wall_sec":${f"$wall%.1f"}}}""")
    spark.stop()
  }
}
