package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.TimestampType
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY.md §2.B;
  * `oracleSql` carries the DuckDB twin for each oracle-checkable key
  * (keys absent there are sketch/hash-valued and get a rows-only check;
  * they are property-tested in src/test instead).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Timestamp outputs as TIMESTAMP_NTZ: the fixtures hold naive wall-clock
    * timestamps and DuckDB emits naive values, while Spark's TimestampType
    * writes parquet as instant-adjusted (isAdjustedToUTC) — a tz-aware vs
    * naive mismatch under the driver's hash compare. Session tz is UTC, so
    * the cast is value-preserving. Projection after sort keeps row order.
    */
  private def ntz(df: DataFrame): DataFrame =
    if (!df.schema.exists(_.dataType == TimestampType)) df
    else df.select(df.schema.fields.map { f =>
      if (f.dataType == TimestampType) col(f.name).cast("timestamp_ntz").as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Relational.queries ++ Scalars.queries ++ Dedup.queries ++
      Similarity.queries ++ CosineLsh.queries ++ Ivf.queries ++
      Pq.queries ++ Skew.queries ++ Sketches.queries ++
      TextAnalysis.queries ++ Windowed.queries ++ SqlApi.queries ++
      Multimodal.queries ++ Sampling.queries ++ Sources.queries ++
      Quantize.queries ++ Incremental.queries ++ Assembly.queries ++
      Profile.queries ++ History.queries ++ Bpe.queries ++
      Stats.queries ++ SpanDedup.queries ++ FuzzyJoin.queries ++
      TextClean.queries ++ EventAnalytics.queries ++ Graph.queries ++
      Index.queries ++ SemDedup.queries ++ Linkage.queries ++
      Pca.queries ++ Privacy.queries ++ Containers.queries).map { case (k, fn) =>
      k -> ((s: SparkSession, d: String) => ntz(fn(s, d)))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q_agg_approx, q_minhash_sig, q_udf_scalar, q_doc_fingerprint). */
  def oracleSql: Map[String, String] = Oracle.sql
}
