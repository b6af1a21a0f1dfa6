package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring (span-level) deduplication — remove every occurrence
  * of any token span repeated ACROSS documents, the corpus-hygiene pass a
  * training pipeline runs AFTER document-level dedup ("Deduplicating
  * Training Data Makes Language Models Better", Lee et al. 2022 — their
  * ExactSubstr operator, public paper). Document-granularity dedup
  * (exact/near/containment, engine/Dedup.scala) keeps a page that quotes
  * a boilerplate paragraph verbatim; this operator excises the quoted
  * span itself while keeping the unique remainder.
  *
  * Semantics (fixed-length form): with tokens = whitespace split and a
  * span length of L tokens,
  *   1. every L-gram occurring in ≥ 2 DISTINCT documents is duplicated;
  *   2. every occurrence (doc, start) of a duplicated L-gram marks the
  *      token interval [start, start+L-1] — ALL copies are removed, the
  *      paper's ExactSubstr policy (repeated boilerplate carries no
  *      training signal in any copy);
  *   3. per document, overlapping-or-adjacent marked intervals merge into
  *      maximal spans (a repeated region of R ≥ L tokens is covered by
  *      R−L+1 staggered windows that merge into ONE span of R tokens —
  *      the fixed-L form therefore removes variable-length repeats ≥ L,
  *      which is why a fixed L is the right primitive);
  *   4. the rewritten document is the ordered concatenation of unmarked
  *      tokens.
  *
  * Spark-first shape (the suffix array of the paper is a single-machine
  * index; the distributed substitute is a shuffle on the gram value):
  * gram generation is MAP-SIDE (one `transform(sequence…)` projection per
  * doc — no join, no UDF), then the occurrence table shuffles twice on
  * the gram — once to count distinct docs per gram (partial aggregation
  * applies), once as a LEFT SEMI join marking duplicated occurrences
  * (hot boilerplate grams cannot skew a semi-join output: each occurrence
  * emits at most once). Span merge is one window over (doc, start) —
  * partitioned by doc, bounded by doc length — and the rewrite is a
  * per-doc higher-order-function projection after a single join of the
  * merged span lists back to the corpus (span lists are tiny: spans per
  * doc ≤ tokens/L). At 100 TB the gram SHUFFLE is the cost driver; swap
  * the gram string for a 128-bit fingerprint (e.g. two independent
  * xxhash64 seeds) to ship 16 bytes instead of ~50 — collision odds at
  * 1e13 grams ≈ (1e13)²/2¹²⁸ ≈ 3e-13, and a collision only over-excises
  * one span. The graded key keeps the exact string (oracle parity).
  */
object SpanDedup {
  import Tables.documents
  type Q = (SparkSession, String) => DataFrame

  /** Span length in tokens for the graded key. Lee et al. use 50 BPE
    * tokens on web corpora; the fixture docs average ~54 words, so L=8
    * exercises the semantic (47 of 500 sf0.01 docs carry a cross-doc
    * repeated 8-gram) at the same windows-merge geometry.
    */
  val SpanLen = 8

  private val emptySpans = array().cast("array<struct<s:int,e:int>>")

  /** (idCol, start, gram): every L-gram occurrence in the corpus, start
    * 0-based. Docs shorter than L contribute nothing (the `when` guard —
    * `sequence(0, negative)` would otherwise generate a DESCENDING range).
    */
  /** The per-doc L-gram array (empty below L tokens — `sequence(0,
    * negative)` would otherwise generate a DESCENDING range).
    */
  private def gramArray(L: Int): Column =
    when(size(col("toks")) >= L,
      transform(sequence(lit(0), size(col("toks")) - L),
        i => array_join(slice(col("toks"), i + 1, lit(L)), " ")))
      .otherwise(array().cast("array<string>"))

  private[graft] def gramOccurrences(toks: DataFrame, idCol: String, L: Int): DataFrame =
    toks
      .select(col(idCol), posexplode(gramArray(L)))
      .toDF(idCol, "start", "gram")

  /** Per-doc MERGED duplicated spans: (idCol, spans: array<struct<s,e>>),
    * s/e inclusive 0-based token positions, spans sorted by s. Only docs
    * with at least one duplicated occurrence appear (join back with a
    * left join + coalesce-to-empty). Intervals merge when overlapping OR
    * adjacent (next.s ≤ prev.e + 1): adjacent marked regions form one
    * contiguous excision, so span counts reflect maximal removed runs.
    */
  def duplicatedSpans(toks: DataFrame, idCol: String, L: Int): DataFrame = {
    val occs = gramOccurrences(toks, idCol, L)
    // (r17) Census via per-doc IN-ROW distinct grams (array_distinct) +
    // a plain count — the boilerplate-census discipline: same distinct-
    // doc frequencies, no countDistinct Expand + double aggregation.
    val dup = toks.select(explode(array_distinct(gramArray(L))).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2)
      .select("gram")
    val hits = occs.join(dup, Seq("gram"), "left_semi")
      .select(col(idCol), col("start"), (col("start") + L - 1).as("end"))
    // Starts are unique per doc (one gram per position), so the window
    // order is total and the merge deterministic.
    val wPrev = Window.partitionBy(idCol).orderBy("start")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(idCol).orderBy("start")
      .rowsBetween(Window.unboundedPreceding, 0)
    hits
      .withColumn("prev_e", max(col("end")).over(wPrev))
      .withColumn("is_new",
        when(col("prev_e").isNull || col("start") > col("prev_e") + 1, 1).otherwise(0))
      .withColumn("span_id", sum(col("is_new")).over(wRun))
      // Both aggregations below cluster on idCol, which the window's
      // hash partitioning already satisfies — no further shuffle.
      .groupBy(col(idCol), col("span_id"))
      .agg(min("start").as("s"), max("end").as("e"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("s").cast("int").as("s"),
        col("e").cast("int").as("e")))).as("spans"))
  }

  /** Full pipeline over a (idCol, textCol) corpus: per doc the original
    * token count, merged duplicated-span count, removed-token count, and
    * the rewritten text. Whitespace re-join collapses original spacing —
    * deterministic and engine-neutral (split/join round-trips the
    * single-spaced fixtures).
    */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      L: Int = SpanLen): DataFrame = {
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("toks"))
    toks
      .join(duplicatedSpans(toks, idCol, L), Seq(idCol), "left")
      .withColumn("spans", coalesce(col("spans"), emptySpans))
      .select(
        col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("spans")).cast("long").as("n_spans"),
        aggregate(col("spans"), lit(0),
          (acc, sp) => acc + sp.getField("e") - sp.getField("s") + 1)
          .cast("long").as("n_removed"),
        array_join(
          transform(
            filter(
              transform(col("toks"), (t, i) => struct(t.as("t"), i.as("i"))),
              x => !exists(col("spans"),
                sp => x.getField("i") >= sp.getField("s") &&
                  x.getField("i") <= sp.getField("e"))),
            x => x.getField("t")),
          " ").as("kept_text"))
  }

  /** Graded surface: exact-substring dedup of the documents fixture at
    * L = [[SpanLen]]. Oracle: the same fixed-L semantics in DuckDB
    * (series-unnest grams → HAVING count(DISTINCT doc) ≥ 2 → window
    * interval-merge → position anti-join rewrite).
    */
  val qSubstringDedup: Q = (s, d) =>
    substringDedup(Dedup.fanOut(documents(s, d)), "doc_id", "text")
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "q_substring_dedup" -> qSubstringDedup
  )
}
