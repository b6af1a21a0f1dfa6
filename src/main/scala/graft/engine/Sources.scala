package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graded surfaces for the non-parquet batch loaders (Tables.readCsv /
  * readJsonLines): write a fixture slice out in the text format, read it
  * back with an explicit schema, and aggregate the re-read frame. The
  * oracle computes the SAME aggregate from the parquet fixture — so the
  * keys grade the loaders' fidelity end to end: any loss in the text
  * round trip (timestamp precision, double formatting, quoting, nulls)
  * breaks the hash match. SourceFormatsSpec additionally pins row-exact
  * round trips.
  *
  * Scale notes (100 TB): the loaders are plain distributed scans —
  * explicit schemas mean no inference pre-pass over the data; CSV/JSON
  * are splittable by line, so a large file still fans out across tasks.
  * (Columnar pushdown does NOT exist for text formats — the scan reads
  * every byte; these loaders are the ingest edge, parquet is the at-rest
  * format.)
  */
object Sources {
  type Q = (SparkSession, String) => DataFrame

  private[graft] def eventsSlice(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select("event_id", "user_id", "event_type", "ts", "value")

  private[graft] def aggregate(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"),
        round(sum(col("value")), 2).as("sum_value"),
        max(col("ts")).as("max_ts"))
      .orderBy("event_type")

  /** CSV round trip: events → CSV (header, micro timestamps) → explicit
    * schema read-back → aggregate. Oracle: identical aggregate over the
    * parquet fixture.
    */
  val qSourceCsv: Q = (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_csv_").toString
    val ev = eventsSlice(s, d)
    Tables.writeCsv(ev, dir)
    aggregate(Tables.readCsv(s, dir, ev.schema))
  }

  /** JSON-lines round trip — same contract as [[qSourceCsv]]. */
  val qSourceJson: Q = (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_json_").toString
    val ev = eventsSlice(s, d)
    Tables.writeJsonLines(ev, dir)
    aggregate(Tables.readJsonLines(s, dir, ev.schema))
  }

  val queries: Map[String, Q] = Map(
    "q_source_csv" -> qSourceCsv,
    "q_source_json" -> qSourceJson
  )
}
