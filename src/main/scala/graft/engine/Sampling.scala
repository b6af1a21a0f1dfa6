package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stratified (per-group quota) sampling — the data-mixing primitive a
  * training-data pipeline runs last: each source/stratum contributes a
  * configured fraction of its rows ("50% of click events, 5% of error
  * events"), so corpus composition is a declared policy, not an accident
  * of ingest order.
  *
  * Determinism is the whole design (SURVEY G4): membership is a pure
  * function of the row's id — a multiplicative-hash bucket compared
  * against the stratum's quota — NOT engine RNG (`Dataset.sample` /
  * `sampleBy` draw from a seeded stream whose values depend on partition
  * layout, are irreproducible across engines, and change under AQE
  * re-partitioning). Hash-mod sampling gives: reproducible across runs,
  * retries, engines (the DuckDB oracle applies the identical arithmetic),
  * and stable under repartitioning; adjusting a quota upward strictly
  * GROWS the sample (bucket < threshold is monotone in the threshold),
  * which is what incremental corpus re-mixes want.
  *
  * Scale notes (100 TB): membership is a map-only filter — no shuffle,
  * no state; the quota table is O(strata) rows broadcast to every
  * executor. The filter sits directly above the scan, so column pruning
  * and partition pruning pass through untouched.
  */
object Sampling {
  type Q = (SparkSession, String) => DataFrame

  /** Bucket resolution: quotas are granular to 1/2²⁰ ≈ 1e-6. A power of
    * two, so `rate * Resolution` is EXACT double arithmetic (scaling by
    * 2²⁰ only shifts the exponent) — both engines compute the identical
    * threshold and the identical keep/drop decision per row.
    */
  val Resolution: Long = 1L << 20

  /** Knuth multiplicative hash bucket in [0, Resolution): spreads
    * sequential ids uniformly (golden-ratio multiplier), expressible as
    * plain integer arithmetic in ANY engine — the cross-engine
    * determinism contract. The id is masked to its low 31 bits BEFORE the
    * multiply so the product provably fits int64 ((2³¹−1)·2654435761 ≈
    * 5.7e18 < 2⁶³−1) in EVERY engine: without the mask, ids ≳ 3.4e9
    * silently wrap in Spark while DuckDB's BIGINT multiply raises — a
    * silent cross-engine divergence. The mask is identity for ids < 2³¹
    * (the fixture ids are row numbers), and the oracle applies the
    * identical `(id & 2147483647)` expression; for id spaces wider than
    * 31 bits the low-bits restriction still yields uniform buckets for
    * sequential ids, but distinct ids 2³¹ apart share a bucket — hash
    * first (e.g. xxhash64) if that matters.
    */
  def bucket(id: Column): Column =
    pmod(id.bitwiseAND(lit(0x7FFFFFFFL)) * lit(2654435761L), lit(Resolution))

  /** Keep each row of stratum `keyCol` with its stratum's quota from
    * `rates` (absent strata keep `defaultRate`). The quota dim is
    * broadcast — membership is evaluated map-side with zero shuffles.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val quota = rates.toSeq.toDF("__stratum", "__rate")
    df.join(broadcast(quota), df(keyCol) === col("__stratum"), "left")
      .withColumn("__rate", coalesce(col("__rate"), lit(defaultRate)))
      .where(bucket(col(idCol)) < col("__rate") * lit(Resolution))
      .drop("__stratum", "__rate")
  }

  /** Graded surface: quota-sample the events stream by event_type —
    * 100% of purchases, 50% of clicks, 25% of views, 10% of signups,
    * 5% of errors — and emit the surviving rows. The oracle applies the
    * identical integer arithmetic, so the graded contract is EXACT row
    * membership, not just per-group counts.
    */
  val qSampleStratified: Q = (s, d) => {
    val rates = Map("purchase" -> 1.0, "click" -> 0.5, "view" -> 0.25,
      "signup" -> 0.1, "error" -> 0.05)
    stratifiedSample(Tables.events(s, d), "event_type", "event_id", rates)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
  }

  /** Deterministic dataset split: the id's hash bucket is compared
    * against cumulative weight thresholds, so every row's split is a pure
    * function of its id — stable across runs, engines, repartitioning,
    * and (critically) ACROSS SNAPSHOTS: a document keeps its split as
    * the corpus grows, so later training runs never see yesterday's
    * held-out data. Weights are (name, fraction) in order; fractions
    * should sum to 1 (the last band absorbs any remainder).
    */
  def splitColumn(id: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty, "at least one split band required")
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val b = bucket(id)
    weights.init.zip(cum.init).foldRight(lit(weights.last._1): Column) {
      case (((name, _), hi), rest) => when(b < lit(hi) * lit(Resolution), name).otherwise(rest)
    }
  }

  /** Graded surface: 80/10/10 train/valid/test split of the documents
    * corpus by doc_id, summarized per (lang, split). Integer outputs
    * only — the graded contract is exact per-band membership.
    */
  val qTrainTestSplit: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("split",
        splitColumn(col("doc_id"), Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy("lang", "split")

  /** Exactly-k-per-group deterministic sample: the k rows with the
    * SMALLEST [[bucket]] hashes per group — a "reservoir sample" whose
    * reservoir is a pure function of the ids (stable across runs,
    * engines, and corpus growth: a doc only leaves the sample when a
    * smaller-hash doc enters its group). Rate-based sampling can't
    * promise exact counts; this is the eval-set / spot-check shape. One
    * shuffle on the group key; the per-group sort is bounded by group
    * size, and for heavy groups the bounded top-k Aggregator
    * (functions.TopK, graded q_topk_agg) is the map-side-cut twin.
    */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(bucket(col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }

  /** Graded surface: 5 docs per language, emitted row-level — the
    * oracle re-derives the exact picks and ranks.
    */
  val qSamplePerGroup: Q = (s, d) =>
    samplePerGroup(Tables.documents(s, d), "lang", "doc_id", 5)
      .select(col("lang"), col("sample_rank"), col("doc_id"))
      .orderBy("lang", "sample_rank")

  val queries: Map[String, Q] = Map(
    "q_sample_stratified" -> qSampleStratified,
    "q_sample_pergroup" -> qSamplePerGroup,
    "q_train_test_split" -> qTrainTestSplit
  )
}
