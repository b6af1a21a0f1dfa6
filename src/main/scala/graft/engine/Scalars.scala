package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface: string / date / math / array / map+json /
  * null-handling (SURVEY.md §2.B P2). All expressions are Spark built-ins
  * (whole-stage-codegen'd); no UDFs in this file. Integer-valued computed
  * columns are cast to long to match DuckDB's BIGINT outputs; floats are
  * rounded (G2).
  */
object Scalars {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** substr/upper/lower/trim/concat/replace/length/regexp/split. */
  val qStringFuncs: Q = (s, d) =>
    part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pre"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        expr("replace(p_name, ' ', '_')").as("name_snake"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"))
      .orderBy("p_partkey")

  /** year/month/day, date_trunc, date diff, interval arithmetic. */
  val qDateFuncs: Q = (s, d) =>
    orders(s, d)
      .where(col("o_orderkey") <= 3000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_ts"))
      .orderBy("o_orderkey")

  /** round/abs/ceil/floor/sqrt/ln/pow/mod. */
  val qMathFuncs: Q = (s, d) =>
    lineitem(s, d)
      .where(col("l_orderkey") <= 500)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(pow(lit(1) + col("l_discount"), 2), 6).as("pow_disc"),
        ceil(col("l_extendedprice")).cast("long").as("ceil_price"),
        floor(col("l_extendedprice")).cast("long").as("floor_price"),
        round(abs(col("l_discount") - 0.05), 4).as("abs_disc_diff"),
        (col("l_orderkey") % 7).as("mod7"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Array functions incl. higher-order transform/filter/aggregate. */
  val qArrayFuncs: Q = (s, d) =>
    documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        array_contains(split(col("text"), " "), "spark").as("has_spark"),
        array_join(slice(array_sort(split(col("text"), " ")), 1, 3), " ").as("first3_sorted"),
        size(filter(split(col("text"), " "), t => length(t) > 4)).cast("long").as("n_long_tokens"),
        aggregate(split(col("text"), " "), lit(0L),
          (acc, t) => acc + length(t).cast("long")).as("total_token_chars"))
      .orderBy("doc_id")

  /** JSON extraction from `events.props` + MapType construction/lookup.
    * The map round-trip (map → element_at) is a no-op on the value, so the
    * oracle computes the value directly — what's verified is the JSON path.
    */
  val qMapJson: Q = (s, d) =>
    events(s, d)
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_map", map(lit("k"), col("k_val")))
      .withColumn("k_again", element_at(col("k_map"), "k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k_again")).as("sum_k"),
        count(when(col("k_val") > 50, 1)).as("n_k_gt_50"),
        min(col("k_val")).as("min_k"),
        max(col("k_val")).as("max_k"))
      .orderBy("event_type")

  /** coalesce / nullif / CASE WHEN ladders. */
  val qNullCase: Q = (s, d) =>
    orders(s, d)
      .where(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("price_band"),
        when(col("o_orderpriority").startsWith("1"), lit("urgent"))
          .otherwise(lit("normal")).as("urgency"))
      .orderBy("o_orderkey")

  val queries: Map[String, Q] = Map(
    "q_string_funcs" -> qStringFuncs,
    "q_date_funcs" -> qDateFuncs,
    "q_math_funcs" -> qMathFuncs,
    "q_array_funcs" -> qArrayFuncs,
    "q_map_json" -> qMapJson,
    "q_null_case" -> qNullCase
  )
}
