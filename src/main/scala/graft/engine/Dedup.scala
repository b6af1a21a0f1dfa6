package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication family — the reference's core semantic (SURVEY.md §2.A R2:
  * first-occurrence-wins within a bounded time window) in batch form, plus
  * the LLM-pipeline near-dup operators (exact, Jaccard, MinHash).
  *
  * Scale notes (100 TB):
  *  - first-wins dedup is a single shuffle on the dedup key; the window
  *    row_number form does key-partitioned sort, never a global sort.
  *  - time-bucketed dedup bounds state exactly like the reference's
  *    WindowStore retention: the partition key includes the bucket, so state
  *    per key is O(buckets retained), not O(history).
  *  - near-dup avoids the O(n²) pair space by blocking (lang, length
  *    bucket); swap in MinHash-LSH band buckets for the general case.
  */
object Dedup {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup: DISTINCT over a projection. */
  val qDedupExact: Q = (s, d) =>
    events(s, d)
      .select(col("user_id"), col("event_type"))
      .distinct()
      .orderBy("user_id", "event_type")

  /** Reference semantic R2, batch form: per (user_id, event_type) keep the
    * earliest record. row_number (not dropDuplicates) so the survivor is a
    * deterministic function of the data (G4).
    */
  val qDedupFirstWins: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(asc("ts"), asc("event_id"))
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"),
        col("ts").as("first_ts"), round(col("value"), 2).as("first_value"))
      .orderBy("user_id", "event_type")
  }

  /** Reference semantic R2 with bounded memory: first-wins only within a
    * 1-hour bucket — the same id in a later bucket is NOT a duplicate
    * (models the reference WindowStore retention).
    */
  val qDedupWindowed: Q = (s, d) => {
    val bucket = date_trunc("hour", col("ts"))
    val w = Window.partitionBy(col("user_id"), col("event_type"), bucket)
      .orderBy(asc("ts"), asc("event_id"))
    events(s, d)
      .withColumn("hour_bucket", bucket)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_survivors"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** Exact text dedup over documents (LLM-pipeline op). */
  val qDedupDocs: Q = (s, d) =>
    documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_dup_docs"))
      .orderBy("lang")

  /** Near-duplicate pairs: token-set Jaccard ≥ τ within candidate blocks.
    * Blocking key = (lang, n_chars div 64): near-identical docs have
    * near-identical length, so candidates stay within one block and the
    * pair space is O(Σ block²) instead of O(n²). Exact duplicates always
    * share a block. At 100 TB, replace the length block with MinHash-LSH
    * band buckets (qMinhashSig below) — same join shape.
    */
  val qNeardupPairs: Q = (s, d) => {
    val docs = documents(s, d).select(
      col("doc_id"), col("lang"),
      (col("n_chars") / 64).cast("long").as("len_bucket"),
      array_distinct(split(col("text"), " ")).as("toks"))
    val a = docs.select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
      col("len_bucket").as("lb_a"), col("toks").as("toks_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("len_bucket").as("lb_b"), col("toks").as("toks_b"))
    a.join(b, col("lang_a") === col("lang_b") && col("lb_a") === col("lb_b") &&
        col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("toks_a"), col("toks_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .where(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signatures (the 100-TB-scalable near-dup building block):
    * 16 hash functions h_i(t) = xxhash64(i, t); signature_i = min over the
    * doc's distinct tokens. Identical token sets ⇒ identical signatures
    * (property-tested; no oracle — hash-function-specific values).
    * LSH banding: group signature into 4 bands of 4, hash each band —
    * docs sharing any band hash become join candidates.
    */
  val qMinhashSig: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("doc_id"),
        expr("transform(sequence(0, 15), i -> array_min(transform(toks, t -> xxhash64(i, t))))")
          .as("minhash_sig"))
      .select(col("doc_id"), col("minhash_sig"),
        expr("transform(sequence(0, 3), b -> xxhash64(slice(minhash_sig, b * 4 + 1, 4)))")
          .as("lsh_bands"))
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_first_wins" -> qDedupFirstWins,
    "q_dedup_windowed" -> qDedupWindowed,
    "q_dedup_docs" -> qDedupDocs,
    "q_neardup_pairs" -> qNeardupPairs,
    "q_minhash_sig" -> qMinhashSig
  )
}
