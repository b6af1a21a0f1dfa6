package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view discipline
  * at 100 TB: a standing pipeline computes PER-SLICE partial aggregates
  * once per ingest slice (day), persists them day-partitioned, and
  * answers any date-range question by MERGING the few matching partial
  * rows instead of rescanning the events. count/sum/avg merge losslessly
  * (sum of counts, sum of sums, avg re-derived at the end — never
  * averaged averages); the partial table is O(days × key-cardinality),
  * thousands of rows where the source is billions, and the range filter
  * prunes it at planning time because the layout is day-partitioned
  * (the q_partition_pruned lever applied to DERIVED state).
  */
object Incremental {
  type Q = (SparkSession, String) => DataFrame

  /** Per-(day, event_type) partials — the persisted artifact a daily
    * job appends. One hash aggregate over the slice.
    */
  def writeDailyPartials(events: DataFrame, dir: String): Unit =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      // Partials persist exact integer CENTS (LONG): a double partial sum
      // is partition-order dependent, so the same day could persist
      // different last-bits run to run and the merge would drift vs the
      // oracle at scale. Cents partials merge exactly in any order.
      .agg(count(lit(1)).as("n_events"),
        sum(Relational.cents(col("value"))).as("sum_value_cents"))
      // Dynamic partition overwrite: a daily slice replaces ONLY its own
      // day directories — static mode would wipe every previously
      // persisted day on each run, silently shrinking later merges.
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(dir)

  /** The merge algebra over any frame of (day, event_type, n_events,
    * sum_value_cents) partials: sum of counts, sum of cents, avg re-derived.
    * Associative and slice-agnostic — per-day partials, per-micro-batch
    * partials (Streams.incrementalPartialsIngest), or any mix merge to
    * the same totals.
    */
  def mergePartialsFrame(partials: DataFrame): DataFrame =
    partials
      .groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        round(sum(col("sum_value_cents")).cast("double") / 100.0, 2).as("sum_value"),
        round(sum(col("sum_value_cents")).cast("double") / 100.0 /
          sum(col("n_events")), 4).as("avg_value"))
      .orderBy("event_type")

  /** Merge the partials matching [from, until) into per-type totals.
    * Reads only the matching day directories (partition pruning).
    */
  def mergeRange(spark: SparkSession, dir: String,
      from: String, until: String): DataFrame =
    mergePartialsFrame(
      Tables.configure(spark).read.parquet(dir)
        .where(col("day") >= lit(from).cast("date") &&
          col("day") < lit(until).cast("date")))

  /** Graded round trip: build the daily partials, answer a two-week
    * range by merging them. Oracle: the same two-stage shape over the
    * fixture (per-day partials then merge) — which per the merge
    * algebra equals the direct aggregate; the staged SQL keeps the
    * double-summation ORDER comparable (G2), with the usual rounding
    * at the end.
    */
  val qIncrementalAgg: Q = (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_agg_").toString
    try {
      writeDailyPartials(Tables.events(s, d), dir)
      mergeRange(s, dir, "2024-01-08", "2024-01-22").localCheckpoint()
    } finally Sources.deleteRecursively(new java.io.File(dir))
  }

  val queries: Map[String, Q] = Map(
    "q_incremental_agg" -> qIncrementalAgg
  )
}
