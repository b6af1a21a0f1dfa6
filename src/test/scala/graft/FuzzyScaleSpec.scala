package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Dedup, FuzzyJoin, Tables, TextAnalysis}

/** Many-probe fuzzy match: the PassJoin-banded candidate core + bounded
  * TopKAgg path must equal the broadcast-window twin wherever the banded
  * path answers, route only genuinely-far probes to the fallback, and run
  * broadcast-free when fallback is off — the shape that survives a probe
  * TABLE, not a probe list.
  */
class FuzzyScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir

  private lazy val names = Dedup.fanOut(Tables.part(spark, sfDir))
    .select(col("p_partkey").as("id"), col("p_name").as("name"))

  private def probesDf(ps: String*) =
    spark.createDataFrame(ps.map(Tuple1(_))).toDF("probe")

  test("banded candidates contain every pair within dmax (pigeonhole recall)") {
    val dmax = 3
    val probes = probesDf("smal ring", "red wdget", "blu bolt")
    val cand = FuzzyJoin.candidates(names, probes, dmax)
    val truth = names.crossJoin(probes)
      .where(levenshtein(col("probe"), col("name")) <= dmax)
      .select("probe", "id", "name")
    assert(truth.except(cand).count() == 0,
      "a within-dmax pair escaped the banded candidate set")
  }

  test("short names (nlen <= dmax) stay reachable: no silent wrong top-k") {
    // "cap" has only empty-or-tiny segments at dmax=8 — the segment
    // pigeonhole says nothing about it, yet it IS within dmax of the
    // probe, and with enough banded long-name candidates around, a
    // segments-only candidate set would pass the satisfied gate and
    // silently drop the true closest match. The short-name length-window
    // branch must carry it.
    // dmax=4; "cap" (nlen 3 <= dmax) is the rank-3 true match at dist 3,
    // and three LONG names are also within dmax — so the probe passes
    // the satisfied gate and a segments-only candidate set would return
    // a confident, wrong top-3 omitting "cap".
    val dmax = 4
    val corpus = spark.createDataFrame(Seq(
      (1L, "cap"), (2L, "mugab"), (3L, "mugxy"), (4L, "mugs123")) ++
      (5L to 10L).map(i => (i, s"a much longer product name $i")))
      .toDF("id", "name")
    val probes = probesDf("mug")
    val got = FuzzyJoin.fuzzyTopK(corpus, probes, k = 3, dmax = dmax, fallback = false)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe")).orderBy(asc("dist"), asc("id"))
    val truth = corpus.crossJoin(probes)
      .withColumn("dist", levenshtein(col("probe"), col("name")))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("probe"), col("rn").cast("long").as("rank"), col("name"),
        col("dist").cast("long").as("dist"))
    assert(got.except(truth).count() == 0 && truth.except(got).count() == 0,
      "banded top-k must equal the exhaustive top-k with a short name in range")
    assert(got.where(col("name") === "cap").count() == 1, "the short name must rank")
  }

  test("q_fuzzy_match_scaled equals the broadcast twin row for row") {
    val scaled = SparkEntry.queries("q_fuzzy_match_scaled")(spark, sfDir).collect().toSeq
    val bcast = SparkEntry.queries("q_fuzzy_match")(spark, sfDir).collect().toSeq
    assert(scaled == bcast)
  }

  test("fallback routes only unsatisfied probes and keeps the contract total") {
    // "zzzzqqqq" shares no trigram with any part name; its top-3 are far
    // (dist >> dmax) so the banded path cannot satisfy it at dmax=2 —
    // the fallback must still answer it, identically to the exhaustive
    // window form.
    val probes = probesDf("smal ring", "zzzzqqqq")
    val got = FuzzyJoin.fuzzyTopK(names, probes, k = 3, dmax = 2, fallback = true)
    assert(got.select("probe").distinct().count() == 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe")).orderBy(asc("dist"), asc("id"))
    val truth = names.crossJoin(probes)
      .withColumn("dist", levenshtein(col("probe"), col("name")))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("probe"), col("rn").cast("long").as("rank"), col("name"),
        col("dist").cast("long").as("dist"))
    assert(got.except(truth).count() == 0 && truth.except(got).count() == 0)
    // Without fallback, the far probe is absent (not wrong) — the
    // documented partial contract of the pure banded shape.
    val partial = FuzzyJoin.fuzzyTopK(names, probes, k = 3, dmax = 2, fallback = false)
    assert(partial.select("probe").distinct().count() == 1)
  }

  test("the fallback-free plan is broadcast-free past the auto-broadcast cap") {
    // Force every auto-broadcast off: the banded core must plan pure
    // shuffle joins (no BroadcastExchange, no nested loop, no cartesian)
    // — the 100 TB shape where probes are a table, not a literal list.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probes = probesDf("smal ring", "red wdget", "blu bolt",
        "hot gearz", "grean gizmo")
      val plan = FuzzyJoin.fuzzyTopK(names, probes, k = 3, dmax = 8, fallback = false)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"), "banded core broadcasts")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        "banded core degenerates to a nested loop")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("the graded key's fixture probes are all banded-satisfied (fallback unused)") {
    // Equality of q_fuzzy_match_scaled with the twin would hold even if
    // every probe fell back; this pins that NONE does — the banded core
    // itself answers the graded key at dmax = 8.
    val probes = probesDf("smal ring", "red wdget", "blu bolt",
      "hot gearz", "grean gizmo")
    val banded = FuzzyJoin.fuzzyTopK(names, probes, k = 3, dmax = 8, fallback = false)
    assert(banded.select("probe").distinct().count() == 5)
  }
}
