package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data ASSEMBLY — the last mile of an LLM data pipeline, after
  * curation and dedup have produced a clean corpus: benchmark
  * decontamination, deterministic global shuffle into shards,
  * concat-and-chunk sequence packing, and mixture rebalancing. Each op is
  * a declarative plan (explode + broadcast semi-join, map-side hash,
  * per-shard window) so Catalyst keeps it whole-stage-codegen'd and the
  * shape survives a 1000-executor scale-up:
  *
  *  - decontamination shuffles only n-grams of the (small) benchmark set
  *    and the matched doc_ids — never the corpus text;
  *  - shuffle/packing hash map-side and window PER SHARD, so parallelism
  *    is the shard count (thousands in production, 8 in the graded keys)
  *    and no global sort or single-task window ever exists;
  *  - rebalancing broadcasts a per-stratum rate table of |strata| rows and
  *    filters map-side via the same order-free [[Sampling.bucket]]
  *    arithmetic the sampling ops use — zero corpus shuffles.
  *
  * Cross-engine determinism: all randomness is the Knuth multiplicative
  * hash on the 31-bit-masked id (see [[Sampling.bucket]] for the overflow
  * contract); multiplication by an odd constant is a BIJECTION modulo 2³¹,
  * so [[orderHash]] is collision-free on masked ids — a total "shuffled"
  * order any engine reproduces with four integer ops.
  */
object Assembly {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  private val Max31 = 0x7FFFFFFFL
  private val Knuth = 2654435761L
  private val Mod31 = 1L << 31

  /** Pseudo-random total order on ids: (id & 2³¹−1) · 2654435761 mod 2³¹.
    * Injective on masked ids (odd multiplier ⇒ bijection mod 2³¹), so it
    * defines a full permutation — the deterministic "global shuffle" every
    * training run needs to be reproducible across engines and reruns.
    */
  def orderHash(id: Column): Column =
    pmod(id.bitwiseAND(lit(Max31)) * lit(Knuth), lit(Mod31))

  /** The audit shape every per-language graded key here shares: per
    * lang — total rows, rows where `hit`, and a sum(doc_id | hit)
    * membership checksum (any over- or under-selection breaks it, so
    * the oracle pins the exact selected SET, not just counts), plus
    * caller-specific extra aggregates. One map-side-partial hash
    * aggregate; extracted so the four call sites cannot drift.
    */
  private def langAudit(df: DataFrame, hit: Column, totalName: String,
      hitName: String, checksumName: String, extras: Column*): DataFrame =
    df.groupBy(col("lang"))
      .agg(count(lit(1)).as(totalName),
        (Seq(count(when(hit, lit(1))).as(hitName),
          coalesce(sum(when(hit, col("doc_id"))), lit(0L)).as(checksumName))
          ++ extras): _*)
      .orderBy("lang")

  // ------------------------------------------------------ decontamination

  /** Benchmark decontamination: drop every training doc that shares at
    * least one word n-gram with the evaluation set — the standard
    * overlap rule (the public eval-contamination literature uses 8–13-gram
    * overlap; `n` is the caller's knob). The benchmark side is tiny
    * relative to the corpus, so its distinct n-gram set is BROADCAST and
    * the corpus side stays a map-side explode + broadcast semi-join: no
    * shuffle ever carries corpus text, and only matched doc_ids (≤ corpus
    * row count, typically a small fraction) reach the one distinct
    * exchange.
    */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 5): DataFrame =
    train.join(contaminatedIds(train, benchmark, textCol, idCol, n),
      Seq(idCol), "left_anti")

  /** The ids [[decontaminate]] removes (exposed for audit logging). */
  def contaminatedIds(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    val benchGrams = wordNgrams(benchmark, textCol, idCol, n)
      .select("gram").distinct()
    wordNgrams(train, textCol, idCol, n)
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(idCol).distinct()
  }

  /** Word n-grams as space-joined strings, one row per (id, gram).
    * Docs shorter than `n` tokens emit nothing (they cannot overlap).
    */
  def wordNgrams(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    df.select(col(idCol), toks.as("__t"))
      .where(size(col("__t")) >= n)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__t")) - n + 1),
          i => array_join(slice(col("__t"), i, lit(n)), " "))).as("gram"))
  }

  /** Graded surface: the fixture's own holdout (doc_id % 23 = 0 plays the
    * benchmark) decontaminates the rest; per-language audit counts plus a
    * checksum over the dropped ids pin the EXACT contaminated set, not
    * just its size. 5-grams because the fixture docs average ~50 tokens.
    */
  val qDecontaminate: Q = (s, d) => {
    val docs = documents(s, d)
    val isBench = col("doc_id") % 23 === 0
    val contam = contaminatedIds(docs.where(!isBench), docs.where(isBench),
        "text", "doc_id", 5)
      .withColumn("__hit", lit(1L))
    langAudit(docs.where(!isBench).join(contam, Seq("doc_id"), "left"),
      col("__hit").isNotNull, "n_train", "n_contaminated", "contam_checksum",
      count(when(col("__hit").isNull, lit(1))).as("n_clean"))
  }

  // ----------------------------------------- fuzzy (doc-level) decontamination

  /** Fuzzy benchmark decontamination: drop every training doc whose
    * normalized token SET near-duplicates (Jaccard ≥ `threshold`) some
    * evaluation doc — the doc-level companion to the n-gram rule above,
    * catching reformatted/reordered eval leakage where no single word
    * n-gram survives verbatim (public decontam pipelines run both
    * tiers). Rides [[Dedup.nearDupAgainst]] with the benchmark as the
    * "corpus" side, so Auto shape resolves the (small) benchmark to
    * Broadcast: the corpus-scale train side is a map-side banded probe —
    * no shuffle ever carries training text, the same scale contract as
    * [[decontaminate]]. Same [[Dedup.fanOut]] caller contract as the
    * other signature consumers: spread single-partition inputs first.
    */
  def fuzzyDecontaminate(train: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      tauNum: Int = 9, tauDen: Int = 10, threshold: Double = 0.9): DataFrame =
    train.join(
      fuzzyContaminatedIds(train, benchmark, textCol, idCol, tauNum, tauDen, threshold),
      Seq(idCol), "left_anti")

  /** The ids [[fuzzyDecontaminate]] removes, with the benchmark doc and
    * Jaccard that convicted each (audit trail; one row per matched pair).
    */
  def fuzzyContaminatedPairs(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      tauNum: Int, tauDen: Int, threshold: Double): DataFrame = {
    def sigs(df: DataFrame) = Dedup.signatures(
      df.select(col(idCol).as("doc_id"), Dedup.normTokens(col(textCol)).as("toks")))
    Dedup.nearDupAgainst(sigs(train), sigs(benchmark), "toks",
      tauNum, tauDen, threshold)
  }

  private def fuzzyContaminatedIds(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      tauNum: Int, tauDen: Int, threshold: Double): DataFrame =
    fuzzyContaminatedPairs(train, benchmark, textCol, idCol, tauNum, tauDen, threshold)
      .select(col("doc_a").as(idCol)).distinct()

  /** Graded surface: same holdout split and per-language audit shape as
    * [[qDecontaminate]], but contamination = token-set Jaccard ≥ 0.9
    * against any benchmark doc. Oracle soundness is q_neardup_delta's
    * argument verbatim: the confirm is EXACT Jaccard on candidates, and
    * per-pair band-miss at J ≥ 0.9 is ~3e-12 — the DuckDB exact
    * train × bench all-pairs join is the truth both engines reach.
    */
  val qDecontaminateFuzzy: Q = (s, d) => {
    val docs = Dedup.fanOut(documents(s, d))
    val isBench = col("doc_id") % 23 === 0
    val contam = fuzzyContaminatedIds(docs.where(!isBench), docs.where(isBench),
        "text", "doc_id", 9, 10, 0.9)
      .withColumn("__hit", lit(1L))
    langAudit(docs.where(!isBench).join(contam, Seq("doc_id"), "left"),
      col("__hit").isNotNull, "n_train", "n_contaminated", "contam_checksum",
      count(when(col("__hit").isNull, lit(1))).as("n_clean"))
  }

  // ------------------------------------------------- shuffle into shards

  /** Deterministic global shuffle: shard by hash, order within shard by
    * the same hash — together a reproducible permutation of the corpus
    * (the training-order shuffle every run must replay identically).
    * Adds `shard` and `pos` (1-based within shard). Parallelism = shard
    * count; the only exchange is the hash partition, and each shard's
    * row_number window sorts one shard, never the corpus.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val h = orderHash(col(idCol))
    val w = Window.partitionBy("__shard").orderBy("__h")
    df.withColumn("__h", h).withColumn("__shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumnRenamed("__shard", "shard").drop("__h")
  }

  /** Permutation checksum Σ pos·doc_id mod (2⁶¹−1), emitted BIGINT. The
    * raw BIGINT sum overflowed at the ×970 (≈sf97) mirror: per-shard
    * Σ ≈ 3.5·10²² ≫ 2⁶³ — and per-partition LONG partials overflow too
    * (one 600k-row shard partition already exceeds 2⁶³), so this is the
    * one checksum the widePartials merge can't save; DuckDB's own
    * BIGINT cast dies the same way. The mod-Mersenne form is scale-free:
    * products run in DECIMAL(38,0) (exact to Σ ≈ 10³⁸ ≈ sf10¹²), the mod
    * keeps the emitted value in BIGINT, and any transposition of two
    * positions still flips it unless p divides (posᵢ−posⱼ)(idᵢ−idⱼ) — a
    * ~2⁻⁶¹ checksum collision, which is what a checksum is.
    */
  private val ChecksumP = 2305843009213693951L // Mersenne prime 2^61 - 1
  private def orderChecksum: Column =
    expr(s"CAST(sum(CAST(pos AS DECIMAL(38,0)) * doc_id) % ${ChecksumP}L AS BIGINT)")

  /** Graded surface: per-shard doc/token counts, the first doc in shuffled
    * order, and the mod-p permutation checksum [[orderChecksum]] (any swap
    * of two positions changes it), so the oracle verifies the full shuffle
    * order, not just membership.
    */
  val qShardAssign: Q = (s, d) => {
    val base = documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    shuffleShards(base, "doc_id", 8)
      .withColumn("__h2", orderHash(col("doc_id")))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min_by(col("doc_id"), col("__h2")).as("first_doc"),
        orderChecksum.as("order_checksum"))
      .orderBy("shard")
  }

  // -------------------------------------------- concat-and-chunk packing

  /** Sequence packing by concatenation: within each shard, docs in
    * shuffled order are conceptually concatenated into one token stream
    * and cut into fixed `budget`-token chunks (the GPT-style pack — no
    * padding waste, documents may straddle a cut). Emits per-doc
    * `first_chunk`/`last_chunk` (0-based chunk ids the doc's tokens land
    * in) from ONE running-sum window per shard — no sequential driver
    * loop; the greedy "close the bin early" variant trades this
    * declarative form for per-partition iteration and is deliberately not
    * the default.
    */
  def packChunks(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, nShards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("__h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = orderHash(col(idCol))
    docs.withColumn("__h", h).withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("first_chunk", expr(s"(__cum - $tokensCol) div $budget"))
      .withColumn("last_chunk", expr(s"(__cum - 1) div $budget"))
      .drop("__h", "__cum")
  }

  /** Per-shard packing-efficiency audit (the numbers a training job
    * logs): chunk count, docs split across a cut, tail fill. Shared by
    * the whitespace graded key and the BPE twin ([[Bpe.qBpePacking]]).
    */
  private[engine] def auditPacking(docs: DataFrame, tokensCol: String,
      budget: Long, nShards: Int): DataFrame =
    packChunks(docs, "doc_id", tokensCol, budget, nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"),
        (max(col("last_chunk")) + 1).as("n_chunks"),
        count(when(col("first_chunk") =!= col("last_chunk"), lit(1))).as("n_split_docs"),
        (sum(col(tokensCol)) - max(col("last_chunk")) * budget).as("tail_fill"))
      .orderBy("shard")

  /** Graded surface: 512-token chunks over 8 shards; per-shard chunk
    * count, docs split across a cut, and the tail chunk's fill level.
    */
  val qSeqPacking: Q = (s, d) =>
    auditPacking(
      documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens")),
      "n_tokens", 512L, 8)

  // --------------------------------------------------- mixture rebalance

  /** Rebalance the corpus toward a UNIFORM mix over the values of
    * `stratumCol` (language rebalancing: downsample dominant languages so
    * each observed stratum contributes ≈ total/k rows; strata already at
    * or below quota keep everything — rate caps at 1.0, never upsamples).
    * Membership is the deterministic [[Sampling.bucket]] threshold test,
    * so the sample is stable across runs and engines; the per-stratum
    * rate table (|strata| rows) broadcasts and the filter runs map-side —
    * zero corpus shuffles beyond the one counting aggregation.
    */
  def rebalanceUniform(df: DataFrame, stratumCol: String, idCol: String): DataFrame =
    df.join(broadcast(uniformRates(df, stratumCol)), Seq(stratumCol))
      .where(Sampling.bucket(col(idCol)) < col("__rate") * Sampling.Resolution)
      .drop("__rate")

  /** Per-stratum keep rate min(1, (total/k)/n_stratum) — double division
    * in this exact association order; the oracle mirrors it token for
    * token so both engines compute bit-identical rates.
    */
  private def uniformRates(df: DataFrame, stratumCol: String): DataFrame = {
    val stats = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val tot = df.agg(count(lit(1)).as("__total"),
      countDistinct(col(stratumCol)).as("__k"))
    stats.crossJoin(broadcast(tot))
      .withColumn("__rate",
        least(lit(1.0), col("__total").cast("double") / col("__k") / col("__n")))
      .select(col(stratumCol), col("__rate"))
  }

  /** Graded surface: rebalance documents to a uniform language mix;
    * per-language original/kept counts plus a checksum over the kept ids
    * pin exact membership (over- OR under-sampling breaks the hash).
    */
  val qMixtureSample: Q = (s, d) => {
    val docs = documents(s, d)
    langAudit(
      docs.join(broadcast(uniformRates(docs, "lang")), Seq("lang"))
        .withColumn("__keep",
          Sampling.bucket(col("doc_id")) < col("__rate") * Sampling.Resolution),
      col("__keep"), "n_orig", "n_kept", "kept_checksum")
  }

  /** Weight-aware rebalance — [[rebalanceUniform]] with each stratum's
    * share measured in `weightCol` units (tokens, bytes) instead of
    * rows, which is what an LLM mixture actually targets (a token
    * budget per language/domain; doc counts misallocate when mean doc
    * length differs across strata). rate_s = min(1, (Σw/k)/w_s), doc
    * membership is the same order-free Knuth bucket — so kept sets are
    * threshold-monotone: lowering a stratum's rate keeps a SUBSET of
    * the higher rate's picks, making successive rebalances stable.
    * Downsampling whole docs hits the token budget only in expectation
    * (docs are atomic); exact budgets need [[packChunks]] downstream.
    */
  def rebalanceByWeight(df: DataFrame, stratumCol: String, idCol: String,
      weightCol: String): DataFrame =
    df.join(broadcast(weightRates(df, stratumCol, weightCol)), Seq(stratumCol))
      .where(Sampling.bucket(col(idCol)) < col("__rate") * Sampling.Resolution)
      .drop("__rate")

  /** Per-stratum keep rate min(1, (Σw/k)/w_s) — same association-order
    * contract as [[uniformRates]] so the oracle reproduces the exact
    * IEEE-754 doubles.
    */
  private def weightRates(df: DataFrame, stratumCol: String,
      weightCol: String): DataFrame = {
    val stats = df.groupBy(col(stratumCol))
      .agg(sum(col(weightCol)).cast("double").as("__w"))
    val tot = df.agg(sum(col(weightCol)).cast("double").as("__totw"),
      countDistinct(col(stratumCol)).as("__k"))
    stats.crossJoin(broadcast(tot))
      .withColumn("__rate",
        least(lit(1.0), col("__totw") / col("__k").cast("double") / col("__w")))
      .select(col(stratumCol), col("__rate"))
  }

  /** The full weight-rate audit shape (rates → membership → langAudit
    * with token accounting) shared by the whitespace-token graded key
    * and its BPE twin ([[Bpe.qBpeMixture]]). Requires `lang`/`doc_id`
    * columns; `weightCol` is the token accounting being budgeted.
    */
  private[engine] def auditMixtureByWeight(docs: DataFrame,
      weightCol: String): DataFrame =
    langAudit(
      docs.join(broadcast(weightRates(docs, "lang", weightCol)), Seq("lang"))
        .withColumn("__keep",
          Sampling.bucket(col("doc_id")) < col("__rate") * Sampling.Resolution),
      col("__keep"), "n_orig", "n_kept", "kept_checksum",
      sum(col(weightCol)).as("tok_orig"),
      coalesce(sum(when(col("__keep"), col(weightCol))), lit(0L)).as("tok_kept"))

  /** Graded surface: token-weighted mixture on documents — per-language
    * original/kept doc AND token counts plus the kept-id checksum, so
    * the oracle pins exact membership and the token accounting.
    */
  val qMixtureTokens: Q = (s, d) =>
    auditMixtureByWeight(
      documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long")),
      "n_tokens")

  /** Capstone: the whole assembly pipeline end-to-end on one frame —
    * normalized exact dedup (first-wins by doc_id) → exact 5-gram
    * decontamination against the raw holdout (the eval set is NOT
    * deduped; it is whatever the benchmark ships) → uniform language
    * rebalance → deterministic shard assignment — then per-shard doc/
    * token counts and the permutation checksum. Every stage is the
    * already-graded operator, composed; the oracle replays the same CTE
    * chain, so the graded contract is the exact surviving membership
    * AND ordering after four stages of interaction — the integration
    * test for stage composition (e.g. rebalance rates computed on the
    * POST-decontamination counts, not the raw ones).
    */
  val qPipelineAssembly: Q = (s, d) => {
    val docs = documents(s, d)
    val isBench = col("doc_id") % 23 === 0
    val deduped = Dedup.firstWins(
        docs.withColumn("__norm", Dedup.normKey(col("text"))),
        Seq("__norm"), Seq("doc_id"))
      .drop("__norm")
    val clean = decontaminate(deduped.where(!isBench), docs.where(isBench))
    val balanced = rebalanceUniform(clean, "lang", "doc_id")
    shuffleShards(
        balanced.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "doc_id", 8)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        orderChecksum.as("order_checksum"))
      .orderBy("shard")
  }

  // -------------------------------------------- token-budget selection

  /** Fill a token budget with the best documents: select the prefix of
    * the corpus ordered by (quality DESC, doc_id ASC) whose cumulative
    * token count stays within `budget` — the "we can afford N tokens,
    * take the best" curation step between scoring and assembly.
    *
    * The naive form is a running sum over a GLOBAL sort — a
    * single-partition window at any scale. This is the distributed
    * two-phase prefix sum instead:
    *
    *  1. bucket by quality with `width_bucket` — a pure function of the
    *     quality VALUE, so equal qualities always share a bucket and
    *     the bucket order is exactly the quality order across buckets;
    *  2. per-bucket token totals (one map-side-partial aggregate,
    *     nBuckets rows) get a running offset via a window over that
    *     TINY frame (single partition of ≤ nBuckets rows — bounded by
    *     construction, not by data);
    *  3. the within-bucket running sum is a window PARTITIONED by
    *     bucket — every partition bounded by its bucket's share.
    *
    * offset(bucket) + within-bucket cumsum ≡ the global prefix sum over
    * (quality DESC, doc_id) exactly, because the bucket function is
    * monotone in quality (boundary ties impossible: equal values share
    * a bucket). The oracle states the SAME result as one flat window
    * cumsum, so the decomposition is hash-checked against the direct
    * formulation.
    */
  def budgetSelect(docs: DataFrame, budget: Long, nBuckets: Int = 32): DataFrame = {
    val bucketed = docs.withColumn("__b",
      width_bucket(col("quality"), lit(0.0), lit(1.0000001), lit(nBuckets)))
    val offsets = bucketed.groupBy(col("__b")).agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__off",
        coalesce(sum(col("__bt")).over(
          Window.orderBy(desc("__b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__b"), col("__off"))
    val within = Window.partitionBy(col("__b"))
      .orderBy(desc("quality"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), "__b")
      .withColumn("cum_tokens", col("__off") + sum(col("n_tokens")).over(within))
      .where(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("cum_tokens"))
  }

  /** Graded budget selection over the q_text_quality score (rounded to
    * its 4-decimal grain BEFORE ordering — both engines order identical
    * values, G2/G4) with whitespace token counts; budget 15k tokens ≈
    * the best ~30% of the sf0.01 corpus.
    */
  val qBudgetSelect: Q = (s, d) => {
    val toks = split(col("text"), " ")
    val stop = array(lit("the"), lit("a"), lit("of"), lit("and"))
    val scored = Tables.documents(s, d)
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("__stop", size(filter(toks, t => array_contains(stop, t))).cast("double"))
      .select(col("doc_id"), col("n_tokens"),
        round(least(col("n_tokens") / 100.0, lit(1.0)) *
          (lit(1.0) - col("__stop") / col("n_tokens")), 4).as("quality"))
    budgetSelect(scored, budget = 15000L).orderBy("doc_id")
  }

  // ------------------------------------- overlapping context chunking

  /** Overlapping token-window chunking — the context-window prep an
    * embedding/retrieval corpus needs (distinct from [[packChunks]],
    * which concatenates ACROSS documents; this splits WITHIN a document
    * with overlap so no retrieval context straddles a hard cut).
    * `size`-token windows every `stride` tokens; the final window may be
    * shorter (the tail), and a doc shorter than `size` yields exactly
    * one whole-doc chunk: n_chunks = ⌈max(len − size, 0) / stride⌉ + 1,
    * all in integer arithmetic (⌈a/b⌉ = (a+b−1) div b) so both engines
    * compute the identical chunk set. Map-only: a per-row fan-out of
    * ≤ len/stride + 1 rows, no shuffle at any corpus size.
    */
  def chunkDocs(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window; got window=$window stride=$stride")
    docs
      .withColumn("__t", split(col("text"), " "))
      .withColumn("__len", size(col("__t")))
      .withColumn("__nc",
        expr(s"(greatest(__len - $window, 0) + $stride - 1) div $stride + 1"))
      .select(col("doc_id"),
        explode(expr(s"""transform(sequence(0, __nc - 1), i -> struct(
            CAST(i AS BIGINT) AS chunk_idx,
            CAST(least(__len - i * $stride, $window) AS BIGINT) AS n_tokens,
            array_join(slice(__t, i * $stride + 1, $window), ' ') AS chunk_text))"""))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.n_tokens"), col("c.chunk_text"))
  }

  /** Graded surface: 32-token windows, stride 24 (25% overlap) over the
    * documents fixture — every chunk row with its exact text, so the
    * oracle pins offsets, tail handling, and the short-doc case all at
    * once.
    */
  val qDocChunks: Q = (s, d) =>
    chunkDocs(Tables.documents(s, d).select(col("doc_id"), col("text")), 32, 24)
      .orderBy("doc_id", "chunk_idx")

  val queries: Map[String, Q] = Map(
    "q_pipeline_assembly" -> qPipelineAssembly,
    "q_budget_select" -> qBudgetSelect,
    "q_doc_chunks" -> qDocChunks,
    "q_decontaminate" -> qDecontaminate,
    "q_decontaminate_fuzzy" -> qDecontaminateFuzzy,
    "q_shard_assign" -> qShardAssign,
    "q_seq_packing" -> qSeqPacking,
    "q_mixture_sample" -> qMixtureSample,
    "q_mixture_tokens" -> qMixtureTokens)
}
