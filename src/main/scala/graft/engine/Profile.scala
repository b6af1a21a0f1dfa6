package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus profiling and declarative data-quality gates — the
  * inspect-before-you-train surface of the pipeline: a one-pass
  * long-form column profile (row/null/distinct counts) and a rule-based
  * check report (the ingest gate that decides whether a batch is fit to
  * merge). Both are single aggregation plans: every rule/column metric
  * is a conditional aggregate over ONE scan, partials map-side — the
  * only 100 TB caveats are the EXACT-distinct variants, which pay
  * Spark's Expand (one shuffle stream per distinct column); the
  * defaults use approx_count_distinct's mergeable HLL sketch instead,
  * keeping the whole profile a single hash-agg pass.
  */
object Profile {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Both report builders interpolate names into a `stack(...)` SQL
    * string (and the DQ gate embeds rule names in its JSON report), so
    * a quote/backtick/backslash in a name would break analysis or emit
    * invalid JSON. Loudly reject such names at the definition point
    * instead of silently mangling them downstream.
    */
  private val SafeName = "^[A-Za-z0-9_.\\- ]+$".r
  private def requireSafeNames(kind: String, names: Seq[String]): Unit =
    names.find(n => SafeName.findFirstIn(n).isEmpty).foreach { bad =>
      throw new IllegalArgumentException(
        s"$kind name '$bad' contains characters outside [A-Za-z0-9_.- ]; " +
          "quotes/backticks/backslashes would corrupt the stack() " +
          "expression or the DQ JSON report")
    }

  /** Long-form column profile: (col_name, n_rows, n_null, n_distinct)
    * per requested column, one row each. `exact` swaps the HLL distinct
    * estimate for count(DISTINCT) — validation scale only (Expand
    * multiplies the scan output by the distinct-column count).
    */
  def profile(df: DataFrame, columns: Seq[String], exact: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    requireSafeNames("column", columns)
    val aggs = columns.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      (if (exact) countDistinct(col(c))
       else approx_count_distinct(col(c))).as(s"__nd_$c")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = s"stack(${columns.size}, " +
      columns.map(c => s"'$c', `__nn_$c`, `__nd_$c`").mkString(", ") +
      ") as (col_name, __nonnull, n_distinct)"
    row.select(col("__n"), expr(stacked))
      .select(col("col_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nonnull")).as("n_null"), col("n_distinct"))
      .orderBy("col_name")
  }

  /** A data-quality rule: `name` labels the report row, the subclasses
    * define what counts as a violation.
    */
  sealed trait Rule { def name: String }
  /** Null in `column` is a violation. */
  final case class NotNull(name: String, column: String) extends Rule
  /** Rows in excess of one per non-null `column` value (null keys are
    * [[NotNull]]'s job, not a uniqueness violation).
    */
  final case class Unique(name: String, column: String) extends Rule
  /** Non-null value outside `values`. */
  final case class InSet(name: String, column: String, values: Seq[String]) extends Rule
  /** Any row where `cond` is true. */
  final case class Violates(name: String, cond: Column) extends Rule

  /** Evaluate `rules` in ONE aggregation pass: (rule, n_violations,
    * passed), one row per rule, ordered by rule name. An empty frame
    * passes every rule (vacuous truth — callers gate empty batches
    * separately if emptiness itself is a defect).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    requireSafeNames("rule", rules.map(_.name))
    def cnt(cond: Column) = coalesce(sum(when(cond, 1L)), lit(0L))
    val aggs = rules.map {
      case NotNull(n, c) => cnt(col(c).isNull).as(s"__r_$n")
      case Unique(n, c) => (count(col(c)) - countDistinct(col(c))).as(s"__r_$n")
      case InSet(n, c, vs) =>
        cnt(col(c).isNotNull && !col(c).isin(vs: _*)).as(s"__r_$n")
      case Violates(n, cond) => cnt(cond).as(s"__r_$n")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = s"stack(${rules.size}, " +
      rules.map(r => s"'${r.name}', `__r_${r.name}`").mkString(", ") +
      ") as (rule, n_violations)"
    row.selectExpr(stacked)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("rule")
  }

  /** Graded surface for [[profile]] (exact distinct so DuckDB can
    * re-derive it; the approx default is the corpus-scale path).
    */
  val qProfileCorpus: Q = (s, d) =>
    profile(documents(s, d), Seq("doc_id", "lang", "source", "text", "n_chars"),
      exact = true)

  /** Graded surface for [[check]]: the pristine fixture plus planted
    * defects — duplicated rows (doc_id ≡ 1 mod 37 re-emitted), nulled
    * langs (≡ 2 mod 41), out-of-domain langs (≡ 5 mod 47, null wins
    * when both hit — the oracle mirrors the CASE order), and broken
    * n_chars (≡ 3 mod 43) — so four rules fail with exact counts and
    * one (nonempty text) passes.
    */
  val qDqChecks: Q = (s, d) => {
    val base = documents(s, d)
    val v = base.unionByName(base.where(col("doc_id") % 37 === 1))
      .select(col("doc_id"),
        when(col("doc_id") % 41 === 2, lit(null).cast("string"))
          .when(col("doc_id") % 47 === 5, lit("xx"))
          .otherwise(col("lang")).as("lang"),
        col("text"),
        when(col("doc_id") % 43 === 3, col("n_chars") + 1L)
          .otherwise(col("n_chars")).as("n_chars"))
    check(v, Seq(
      NotNull("lang_not_null", "lang"),
      Unique("doc_id_unique", "doc_id"),
      InSet("lang_in_domain", "lang", Seq("de", "en", "es", "fr", "zh")),
      Violates("n_chars_consistent", col("n_chars") =!= length(col("text"))),
      Violates("text_nonempty", length(col("text")) === 0)))
  }

  /** Robust per-group outlier statistics: median + MAD (median absolute
    * deviation), and the count of values outside `k`·1.4826·MAD of the
    * median — the standard robust z-score with the Gaussian consistency
    * constant, immune to the outliers it hunts (unlike mean/stddev,
    * which the outliers themselves inflate). This is the exact
    * validation form: `percentile` buffers each group's values, and the
    * flagging pass re-joins the tiny per-group stats frame (broadcast)
    * — three scans of the input. The 100 TB twin swaps both percentile
    * calls for `approx_percentile`'s mergeable sketch (one-pass partials,
    * same plan shape), exactly the approx/exact split the percentile
    * keys document.
    */
  def madOutlierStats(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val dev = df.join(broadcast(med), Seq(groupCol))
    val mad = dev.groupBy(col(groupCol))
      .agg(percentile(abs(col(valueCol) - col("__med")), lit(0.5)).as("__mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        round(max(col("__med")), 6).as("median_value"),
        round(max(col("__mad")), 6).as("mad_value"),
        count(lit(1)).as("n_rows"),
        sum(when(abs(col(valueCol) - col("__med")) >
          lit(k) * lit(1.4826) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Graded surface: robust outlier counts per event_type over the
    * event values. Median/MAD interpolation is a single arithmetic op
    * on sorted values (no summation reassociation), so the stats are
    * bit-identical to DuckDB's quantile_cont and the `>` threshold
    * comparison is deterministic across engines.
    */
  val qOutlierMad: Q = (s, d) =>
    madOutlierStats(events(s, d).select(col("event_type"), col("value")),
      "event_type", "value")
      .orderBy("event_type")

  /** Per-group winsorization (quantile clipping) — the feature-cleanup
    * step ahead of normalization/training: values outside the group's
    * [p05, p95] are clamped to the fence, not dropped (the outlier keys
    * REPORT extremes; winsorize REPAIRS them).
    *
    *
    * Determinism contract: fences are exact interpolated percentiles
    * (percentile ↔ quantile_cont, the q_agg_percentile_exact pairing —
    * whose scaladoc carries the shared 100-TB cardinality guard: the
    * percentile buffer is O(distinct cents), domain-bounded on 2-decimal
    * money, so row-count scale-up grows counts, not buffer entries;
    * arbitrary-precision columns go through the KLL path instead)
    * ROUNDED to the data's own 2-decimal width before clamping, and the
    * winsorized sum accumulates in DECIMAL — exact and summation-order-
    * independent — then casts once to double. The fence frame is
    * |groups| rows, joined broadcast by that bound (the centroid rule);
    * clamping is map-only, so the whole operator is the two aggregates.
    */
  val qWinsorize: Q = (s, d) => {
    val rows = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice").as("x"))
    // (r17) ONE array-percentile call for both fences: each scalar
    // percentile() agg builds + sorts its own per-group value buffer;
    // the array form pays the buffer once and interpolates twice —
    // the qHistogramEquidepth lesson applied to the 2-fence pair.
    // Identical values: same buffer, same interpolation, same round-2.
    val fences = rows.groupBy(col("l_returnflag"))
      .agg(percentile(col("x"), lit(Array(0.05, 0.95))).as("fs"))
      .select(col("l_returnflag"),
        round(element_at(col("fs"), 1), 2).as("lo"),
        round(element_at(col("fs"), 2), 2).as("hi"))
    val w = least(greatest(col("x"), col("lo")), col("hi"))
    rows.join(broadcast(fences), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("x") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("x") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        first(col("lo")).as("lo"),
        first(col("hi")).as("hi"),
        sum(w.cast("decimal(28,2)")).cast("double").as("sum_winsorized"))
      .orderBy("l_returnflag")
  }

  /** Equi-depth (decile) histogram per group — the distribution summary
    * CBO histograms and drift monitors consume, and the companion of
    * [[qWinsorize]]: exact decile fences rounded to the data's 2-decimal
    * width (the same percentile ↔ quantile_cont pairing), then bucket
    * assignment as the map-only rank-by-comparison 1 + Σᵢ(x > fᵢ) —
    * ties at a fence all land on the same side in both engines because
    * the comparisons run on identical rounded doubles. The fence frame
    * is |groups| rows (broadcast by that bound); the corpus-scale work
    * is the two aggregates. Percentile state is O(distinct cents) —
    * domain-bounded on 2-decimal money (the q_agg_percentile_exact
    * cardinality guard); KLL is the arbitrary-precision route.
    */
  val qHistogramEquidepth: Q = (s, d) => {
    val rows = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice").as("x"))
    // ONE array-percentile call: nine scalar percentile() aggs each
    // buffer + sort the group independently (measured 8.2 s at sf0.1);
    // the array form pays the buffer once and interpolates nine times.
    val fences = rows.groupBy(col("l_returnflag"))
      .agg(percentile(col("x"), lit((1 to 9).map(_ / 10.0).toArray)).as("fs"))
      .select(col("l_returnflag") +:
        (1 to 9).map(i => round(element_at(col("fs"), i), 2).as(s"f$i")): _*)
    val bucket = (1 to 9).map(i =>
      when(col("x") > col(s"f$i"), 1).otherwise(0)).reduce(_ + _) + 1
    rows.join(broadcast(fences), "l_returnflag")
      .withColumn("bucket", bucket)
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag", "bucket")
  }

  /** Functional-dependency violation report for a DECLARED candidate FD
    * (here brand → name, deliberately violated by the catalog): per
    * determinant value, the dependent's distinct count and the witness
    * pair — the discovery side of the DQ rules (Profile.check asserts a
    * rule; this measures how false it is, one aggregate, output bounded
    * by the determinant's cardinality).
    */
  val qFdViolations: Q = (s, d) =>
    Tables.part(s, d).groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("p_name")).as("n_names"),
        min(col("p_name")).as("witness_min"),
        max(col("p_name")).as("witness_max"))
      .withColumn("violated", col("n_names") > 1)
      .orderBy("p_brand")

  /** Benford first-digit expected shares log10(1 + 1/d), computed in
    * Scala ONLY and interpolated into the oracle (the EWMA literal
    * discipline — no cross-engine libm log10).
    */
  val BenfordExp: IndexedSeq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1 + 1.0 / d))

  /** Benford's-law first-digit audit of order totals — the classic
    * fabricated-numbers screen: per digit, observed count/share vs the
    * Benford expectation and the χ² contribution. The first digit comes
    * from the INTEGER-CENTS string (never double formatting, which the
    * engines render differently); shares divide two exact integers, so
    * every emitted double is a deterministic single expression. One
    * corpus aggregate; everything after is 9 rows.
    */
  val qBenford: Q = (s, d) => {
    val expArr = map(BenfordExp.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    val counts = Tables.orders(s, d)
      .where(col("o_totalprice") > 0)
      .select(substring(round(col("o_totalprice") * 100, 0).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val share = col("n").cast("double") / col("total")
    val expd = element_at(expArr, col("digit"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(share, 6).as("share"),
        round(expd, 6).as("expected"),
        round((share - expd) * (share - expd) / expd, 6).as("chi2_term"))
      .orderBy("digit")
  }

  val queries: Map[String, Q] = Map(
    "q_profile_corpus" -> qProfileCorpus,
    "q_dq_checks" -> qDqChecks,
    "q_outlier_mad" -> qOutlierMad,
    "q_winsorize" -> qWinsorize,
    "q_fd_violations" -> qFdViolations,
    "q_benford" -> qBenford,
    "q_histogram_equidepth" -> qHistogramEquidepth)
}
