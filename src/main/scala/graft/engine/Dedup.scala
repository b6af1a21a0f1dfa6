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
  import graft.functions.GraftExpressions.intersectSize
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup: DISTINCT over a projection. */
  val qDedupExact: Q = (s, d) =>
    events(s, d)
      .select(col("user_id"), col("event_type"))
      .distinct()
      .orderBy("user_id", "event_type")

  /** Generic first-wins dedup: per key, keep the single row that sorts
    * first by `orderCols`. row_number (not dropDuplicates) so the survivor
    * is a deterministic function of the data (G4). One shuffle on the key;
    * the sort is per-key-partition, never global — the 100 TB shape.
    */
  def firstWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(asc): _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Reference semantic R2, batch form: per (user_id, event_type) keep the
    * earliest record.
    */
  val qDedupFirstWins: Q = (s, d) =>
    firstWins(events(s, d), Seq("user_id", "event_type"), Seq("ts", "event_id"))
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"),
        col("ts").as("first_ts"), round(col("value"), 2).as("first_value"))
      .orderBy("user_id", "event_type")

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
    * near-identical length, so candidates stay within one block.
    *
    * Per-pair work is one native intersect-count over the two distinct
    * token arrays (graft.functions.ArrayIntersectSize; no intersection
    * array materialized), with Jaccard from precomputed per-doc set sizes:
    * |A∪B| = |A|+|B|−|A∩B| — identical integers to the
    * array_intersect/array_union form, so the oracle is unchanged.
    * (An exploded inverted-index variant was measured 2.5× SLOWER on this
    * corpus: its shuffle volume is Σ pairs×|shared toks| rows, which for a
    * near-dup-heavy corpus dwarfs shipping each ~200-token array once.
    * qNeardupLsh below is the form whose blocking survives 100 TB.)
    */
  val qNeardupPairs: Q = (s, d) => {
    val docs = documents(s, d).select(
      col("doc_id"), col("lang"),
      (col("n_chars") / 64).cast("long").as("len_bucket"),
      array_sort(array_distinct(split(col("text"), " "))).as("toks"))
    // Round-robin repartition of the pair-generating side: a single-file
    // scan is one partition, and with the other side broadcast the whole
    // O(pairs) stage would otherwise run in one task.
    val a = docs.repartition(s.sessionState.conf.numShufflePartitions)
      .select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
        col("len_bucket").as("lb_a"), col("toks").as("toks_a"), size(col("toks")).as("n_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("len_bucket").as("lb_b"), col("toks").as("toks_b"), size(col("toks")).as("n_b"))
    a.join(b, col("lang_a") === col("lang_b") && col("lb_a") === col("lb_b") &&
        col("doc_a") < col("doc_b"))
      // Lossless size-ratio prune before the merge scan: J ≥ 0.9 needs
      // 10·min(|A|,|B|) ≥ 9·max(|A|,|B|) (exact integer arithmetic) —
      // keeps ~30% of pairs on this corpus.
      .where(least(col("n_a"), col("n_b")) * 10 >= greatest(col("n_a"), col("n_b")) * 9)
      .withColumn("inter", intersectSize(col("toks_a"), col("toks_b")))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .where(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Character-3-gram (shingle) Jaccard near-dup — the n-gram variant of
    * qNeardupPairs: catches near-duplicates that word tokenization misses
    * (reordered words, punctuation edits) at the cost of larger element
    * sets. Same block/prune/merge-intersect shape; threshold 0.8
    * (shingle Jaccard dilutes faster than token Jaccard). Both engines
    * derive shingles positionally (substr over 1..len−2), so sets match.
    */
  val qNgramJaccard: Q = (s, d) => {
    val docs = documents(s, d)
      .where(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 64).cast("long").as("len_bucket"),
        graft.functions.GraftExpressions.charShingles(col("text"), 3).as("grams"))
    val a = docs.repartition(s.sessionState.conf.numShufflePartitions)
      .select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
        col("len_bucket").as("lb_a"), col("grams").as("grams_a"), size(col("grams")).as("n_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("len_bucket").as("lb_b"), col("grams").as("grams_b"), size(col("grams")).as("n_b"))
    a.join(broadcast(b), col("lang_a") === col("lang_b") && col("lb_a") === col("lb_b") &&
        col("doc_a") < col("doc_b"))
      // J ≥ 0.8 needs 5·min(|A|,|B|) ≥ 4·max(|A|,|B|) — lossless prune.
      .where(least(col("n_a"), col("n_b")) * 5 >= greatest(col("n_a"), col("n_b")) * 4)
      .withColumn("inter", intersectSize(col("grams_a"), col("grams_b")))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .where(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signature + LSH bands per document — all map-side, no UDF:
    * 32 hash functions h_i(t) = xxhash64(i, t); signature_i = min over the
    * doc's distinct tokens; 16 bands of 2 hashes each, band hash =
    * xxhash64(band slice). Identical token sets ⇒ identical signatures
    * (property-tested in src/test — hash values are engine-specific, so no
    * oracle). 16×2 banding gives P[candidate] = 1−(1−J²)¹⁶ — ≥0.9-Jaccard
    * pairs are caught with probability 1−(0.19)¹⁶ ≈ 1−3e-12, which is what
    * lets qNeardupLsh confirm against an exact oracle.
    */
  private[graft] val NumHashes = 32
  private[graft] val NumBands = 16
  private[graft] val RowsPerBand = NumHashes / NumBands

  /** Adds (minhash_sig: array<long>, bands: array<long>) to any frame with
    * a `toks` array column, via the one-pass native expression
    * (graft.functions.MinHashBands — the equivalent built-in
    * `transform(sequence(...), ...)` chain re-evaluates the whole
    * signature per band after CollapseProject: measured 16× recompute).
    * Applicable to arbitrary inputs (property-tested on generated token
    * sets in src/test).
    */
  private[graft] def signatures(docs: DataFrame): DataFrame =
    docs
      .withColumn("__mb", graft.functions.GraftExpressions.minhashBands(col("toks"), NumHashes, NumBands))
      .withColumn("minhash_sig", col("__mb.sig"))
      .withColumn("bands", col("__mb.bands"))
      .drop("__mb")

  /** (doc_id, toks, minhash_sig, bands) for the documents fixture. */
  private[graft] def minhashBands(s: SparkSession, d: String): DataFrame =
    signatures(documents(s, d)
      .select(col("doc_id"),
        array_sort(array_distinct(split(col("text"), " "))).as("toks")))

  /** Graded surface: one row per (doc, band) with scalar columns only —
    * the harness's rows-check sorts columns and cannot hash arrays, so the
    * signature travels as a joined string and bands as exploded rows.
    */
  val qMinhashSig: Q = (s, d) =>
    minhashBands(s, d)
      .select(col("doc_id"),
        array_join(col("minhash_sig"), ",").as("sig"),
        posexplode(col("bands")))
      .select(col("doc_id"), col("sig"),
        col("pos").cast("long").as("band_idx"), col("col").as("band_hash"))
      .orderBy("doc_id", "band_idx")

  /** LSH-driven near-dup: the banded signatures ARE the candidate
    * generator — explode band hashes, self-join on (band_idx, band_hash),
    * dedup candidate pairs, then confirm with EXACT Jaccard via the
    * native intersect-count (same arithmetic as qNeardupPairs). At 100 TB
    * this replaces the length-bucket block: the shuffle key is the band
    * hash (high cardinality, skew-free), pair space is only hash-colliding
    * docs, and the confirm join touches candidates — not all pairs.
    * Oracle: global exact all-pairs Jaccard ≥ 0.9 (no blocking) — sound
    * because the confirm step removes false positives and 16×2 banding
    * makes false negatives ~3e-12 per pair.
    */
  val qNeardupLsh: Q = (s, d) => {
    val sigs = minhashBands(s, d)
    def explodeBands(df: DataFrame): DataFrame =
      df.select(col("doc_id"), col("bands"), size(col("toks")).as("nt"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    // Broadcast-hash on the band key with a ROUND-ROBIN-partitioned
    // stream side: a band bucket of near-identical docs is a single hot
    // join KEY (measured: 3675-doc bucket ⇒ 6.7M pairs), which a
    // sort-merge join — and AQE skew split, whose trigger is input bytes
    // — would grind through in ONE task. Probing a broadcast map spreads
    // the bucket's rows (and so its pair fan-out and the per-pair confirm
    // below) uniformly across the stream partitions. Beyond broadcast
    // scale: salt the bucket id on one side and replicate the other.
    val bandedA = explodeBands(sigs.repartition(s.sessionState.conf.numShufflePartitions))
    val bandedB = explodeBands(sigs)
    // Each colliding pair is emitted from its FIRST shared band only —
    // exact-once without a distinct over every (pair × shared band) row
    // (measured 85M collision rows → 12M pairs at sf0.1; the distinct
    // was a 30 s shuffle this filter replaces with a per-row loop).
    val cands = bandedA.alias("a")
      .join(broadcast(bandedB.alias("b")),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      // Size-ratio prune FIRST (cheap integer compare, lossless for
      // J ≥ 0.9 — see qNeardupPairs) so ~70% of collisions short-circuit
      // before the first-match band scan.
      .where(least(col("a.nt"), col("b.nt")) * 10 >= greatest(col("a.nt"), col("b.nt")) * 9 &&
        graft.functions.GraftExpressions.firstMatchIndex(
          col("a.bands"), col("b.bands")) === col("a.band_idx"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // Confirm joins broadcast the per-doc token dictionary, so the
    // candidate stream never shuffles token arrays. (Beyond broadcast
    // scale, swap for a join co-partitioned on doc id — the candidate
    // side is already keyed by it.)
    val toks = sigs.select(col("doc_id"), col("toks"), size(col("toks")).as("n_toks"))
    cands
      .join(broadcast(toks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
        col("n_toks").as("n_a"))), "doc_a")
      .join(broadcast(toks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
        col("n_toks").as("n_b"))), "doc_b")
      // Lossless size-ratio prune (see qNeardupPairs): drops ~70% of LSH
      // candidates before the merge scan on this corpus.
      .where(least(col("n_a"), col("n_b")) * 10 >= greatest(col("n_a"), col("n_b")) * 9)
      .withColumn("inter", intersectSize(col("toks_a"), col("toks_b")))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .where(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_first_wins" -> qDedupFirstWins,
    "q_dedup_windowed" -> qDedupWindowed,
    "q_dedup_docs" -> qDedupDocs,
    "q_neardup_pairs" -> qNeardupPairs,
    "q_ngram_jaccard" -> qNgramJaccard,
    "q_neardup_lsh" -> qNeardupLsh,
    "q_minhash_sig" -> qMinhashSig
  )
}
