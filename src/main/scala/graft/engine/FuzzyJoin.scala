package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy string matching at MANY-PROBE scale — the switch `q_fuzzy_match`'s
  * scaladoc promises once the probe set outgrows a broadcast.
  *
  * The broadcast twin (TextAnalysis.qFuzzyMatch) crossJoins every corpus
  * name with every probe: per-pair work O(|names|·|probes|) and a window
  * sort per probe — fine for a handful of typo probes, impossible for an
  * entity-resolution workload where BOTH sides are tables (say 10⁸ names ×
  * 10⁶ probes). This operator replaces it with:
  *
  *  1. a PASS-JOIN style banded candidate core (Li, Deng, Feng: "PassJoin:
  *     a partition-based method for similarity joins", public VLDB'11
  *     material): each NAME is evenly split into dmax+1 segments; by the
  *     pigeonhole principle any probe within edit distance dmax of the
  *     name must contain at least one segment EXACTLY, starting within
  *     ±dmax of the segment's home position. Each PROBE therefore emits
  *     its substrings at those (length, segment, position-window) slots —
  *     a bounded O(dmax³) fan-out per probe, independent of corpus size —
  *     and candidates come from an EQUI-join on (name_len, segment_idx,
  *     token). Both sides shuffle on the band key; nothing broadcasts, so
  *     the shape survives any probe count.
  *  2. verification on candidates only: the threshold form of the built-in
  *     `levenshtein` (codegen'd, early-exits past dmax).
  *  3. per-probe top-k via the bounded [[graft.functions.TopKAgg]] — map
  *     side already cuts each partition to ≤ k rows per probe, the exact
  *     two-phase shape of a native max, instead of the window form's full
  *     shuffle+sort of every candidate.
  *
  * Exactness: every pair with dist ≤ dmax is a candidate (pigeonhole), so
  * when a probe finds ≥ k candidates within dmax its banded top-k IS the
  * global top-k (the true k-th distance is ≤ the banded k-th ≤ dmax). A
  * probe with < k in-range candidates is UNSATISFIED — its true matches
  * are farther than dmax away — and `fallback = true` re-runs just those
  * probes through the exhaustive twin (the rare tail by construction; at
  * scale prefer raising dmax, which grows the per-probe fan-out
  * polynomially but never re-broadcasts the corpus).
  */
object FuzzyJoin {
  type Q = (SparkSession, String) => DataFrame

  /** Per-name segment rows: (nlen, seg, token) plus carried (id, name).
    * Even split of the name into dmax+1 contiguous segments — floor
    * arithmetic, 1-based `substring`. Only names LONGER than dmax take
    * this path: a name with nlen ≤ dmax has empty segments, and an empty
    * segment matches vacuously — the pigeonhole guarantee ("some segment
    * survives untouched and matches exactly") says nothing once the
    * surviving segment can be empty. Those short names go through
    * [[shortNameCandidates]] instead.
    */
  private def nameSegments(names: DataFrame, dmax: Int): DataFrame = {
    val p = dmax + 1
    names
      .withColumn("nlen", length(col("name")))
      .select(col("id"), col("name"), col("nlen"),
        explode(sequence(lit(0), lit(dmax))).as("seg"))
      .withColumn("s0", floor(col("seg") * col("nlen") / p).cast("int"))
      .withColumn("slen", floor((col("seg") + 1) * col("nlen") / p).cast("int") - col("s0"))
      .where(col("slen") > 0)
      .withColumn("token", expr("substring(name, s0 + 1, slen)"))
      .select(col("nlen"), col("seg"), col("token"), col("id"), col("name"))
  }

  /** Per-probe band substrings: for every plausible name length (±dmax),
    * every segment slot of that length, and every start position within
    * the pigeonhole window, the probe's substring at that slot. Bounded
    * (2·dmax+1)·(dmax+1)·(2·dmax+1) rows per probe — independent of the
    * corpus.
    */
  private def probeSubstrings(probes: DataFrame, dmax: Int): DataFrame = {
    val p = dmax + 1
    probes
      .withColumn("plen", length(col("probe")))
      .withColumn("nlen", explode(sequence(
        greatest(col("plen") - dmax, lit(1)), col("plen") + dmax)))
      .withColumn("seg", explode(sequence(lit(0), lit(dmax))))
      .withColumn("s0", floor(col("seg") * col("nlen") / p).cast("int"))
      .withColumn("slen", floor((col("seg") + 1) * col("nlen") / p).cast("int") - col("s0"))
      .where(col("slen") > 0)
      .withColumn("pos", explode(sequence(
        greatest(col("s0") + 1 - dmax, lit(1)),
        least(col("s0") + 1 + dmax, col("plen") - col("slen") + 1))))
      .withColumn("token", expr("substring(probe, pos, slen)"))
      .select(col("nlen"), col("seg"), col("token"), col("probe"))
  }

  /** Names with nlen ≤ dmax pair with every probe in their length window
    * (|plen − nlen| ≤ dmax — the necessary condition edit distance
    * imposes) via an EQUI-join on the length key. Sound without any
    * segment matching: a ≤-dmax-char name is within dmax edits of MANY
    * strings (delete it entirely, insert the other — cost nlen + plen ≤
    * dmax + plen), so length banding is the only filter that prunes
    * anything; and it is a bounded fan-out — each short name meets only
    * the probes in 2·dmax+1 length classes, and at web scale the
    * ≤-dmax-char slice of an entity corpus is a sliver.
    */
  private def shortNameCandidates(names: DataFrame, probes: DataFrame, dmax: Int): DataFrame =
    names
      .withColumn("nlen", length(col("name")))
      .where(col("nlen") <= dmax)
      .join(probes
        .withColumn("plen", length(col("probe")))
        .withColumn("nlen", explode(sequence(
          greatest(col("plen") - dmax, lit(1)), col("plen") + dmax)))
        .select(col("nlen"), col("probe")),
        Seq("nlen"))
      .select(col("probe"), col("id"), col("name"))

  /** Banded candidate (probe, id, name) pairs — superset of every pair
    * within edit distance dmax: segment pigeonhole for names longer than
    * dmax, length-window pairing for the short-name sliver (where the
    * pigeonhole is vacuous — FuzzyScaleSpec and DedupProps cover both
    * regimes). Deduplicated across the multiple slots a pair can collide
    * in.
    */
  def candidates(names: DataFrame, probes: DataFrame, dmax: Int): DataFrame =
    nameSegments(names.withColumn("__nl", length(col("name")))
        .where(col("__nl") > dmax).drop("__nl"), dmax)
      .join(probeSubstrings(probes, dmax), Seq("nlen", "seg", "token"))
      .select(col("probe"), col("id"), col("name"))
      .unionByName(shortNameCandidates(names, probes, dmax))
      .distinct()

  /** Top-k closest names per probe by (levenshtein ASC, id ASC).
    *
    * `names` must carry (id: long, name: string); `probes` (probe:
    * string). Output: (probe, rank, name, dist), rank 1-based. With
    * `fallback = false` the result covers exactly the probes satisfied
    * within dmax (the broadcast-free 100 TB shape, PlanSpec-pinned);
    * `fallback = true` routes unsatisfied probes through the exhaustive
    * twin so the contract is total — identical to the broadcast form on
    * any input (FuzzyScaleSpec).
    */
  def fuzzyTopK(names: DataFrame, probes: DataFrame, k: Int, dmax: Int,
      fallback: Boolean = true): DataFrame = {
    val top = udaf(new graft.functions.TopKAgg(k))
    val scored = candidates(names, probes, dmax)
      // Threshold levenshtein: codegen early-exit past dmax (returns -1).
      .withColumn("dist", levenshtein(col("probe"), col("name"), dmax))
      .where(col("dist") >= 0)
    // value = -dist under TopKAgg's (value DESC, id ASC) total order
    // ⇒ (dist ASC, id ASC) — the graded tiebreak, deterministic (G4).
    val agg = scored.groupBy(col("probe"))
      .agg(top((-col("dist")).cast("double"), col("id")).as("topk"))
    val satisfied = agg.where(size(col("topk")) === k)
    val banded = satisfied
      .select(col("probe"), posexplode(col("topk")))
      .select(col("probe"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("id"), (-col("col._1")).cast("long").as("dist"))
      .join(names, "id")
      .select(col("probe"), col("rank"), col("name"), col("dist"))
    if (!fallback) banded
    else {
      val rare = probes.join(satisfied.select(col("probe")), Seq("probe"), "left_anti")
      val w = Window.partitionBy(col("probe")).orderBy(asc("dist"), asc("id"))
      val exhaustive = names.crossJoin(broadcast(rare))
        .withColumn("dist", levenshtein(col("probe"), col("name")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= k)
        .select(col("probe"), col("rn").cast("long").as("rank"),
          col("name"), col("dist").cast("long").as("dist"))
      banded.unionByName(exhaustive)
    }
  }

  /** Graded many-probe fuzzy match: the same 5 typo probes and part-name
    * corpus as `q_fuzzy_match`, answered by the banded + TopKAgg path
    * (fallback armed but unused on the fixture — FuzzyScaleSpec pins
    * that all probes are banded-satisfied at dmax = 8 AND that the
    * fallback-free plan is broadcast-free). Same output contract as the
    * broadcast twin, so the same exact oracle grades both.
    */
  val qFuzzyMatchScaled: Q = (s, d) => {
    val probes = TextAnalysis.fuzzyProbesDf(s) // the twin's exact probe set
    val names = Dedup.fanOut(Tables.part(s, d))
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    fuzzyTopK(names, probes, k = 3, dmax = 8)
      .select(col("probe"), col("rank"), col("name").as("p_name"), col("dist"))
      .orderBy("probe", "rank")
  }

  /** Jaro–Winkler linkage threshold: a one-char deletion of a 8–12-char
    * name scores ≳ 0.93 while distinct same-brand names top out ~0.84
    * (shared adjective prefix + Winkler boost) — 0.85 splits the bands.
    */
  val JwThreshold = 0.85

  /** Similarity-scored entity matching with the JARO–WINKLER comparator
    * (the record-linkage standard for short names, where edit distance
    * over-penalizes transpositions): a corrupted feed of part names
    * (deterministic one-char deletion keyed on p_partkey, replanted
    * identically by the oracle) re-links to the catalog through
    *
    *   1. BLOCKING on the stable p_brand key — one shuffle equi-join,
    *      never all-pairs (the Linkage.linkPairs discipline);
    *   2. per-pair scoring by the codegen'd [[graft.functions
    *      .GraftExpressions.jaroWinkler]] expression — map-only over the
    *      candidate stream, validated value-for-value against DuckDB's
    *      `jaro_winkler_similarity` BY the oracle compare itself (every
    *      fixture pair, both SFs);
    *   3. best-match-per-probe on the ROUNDED score (ties → lowest
    *      catalog key), kept only above [[JwThreshold]].
    *
    * The per-probe window ranks one brand block (bounded by blocking-key
    * selectivity, not corpus size); a skewed mega-brand would move to
    * the bounded TopKAgg of [[qFuzzyMatchScaled]] unchanged.
    */
  val qFuzzyLinkage: Q = (s, d) => {
    import graft.functions.GraftExpressions.jaroWinkler
    val part = Tables.part(s, d)
    val k0 = (col("p_partkey") % length(col("p_name"))).cast("int")
    // Round-robin the probe side first: the fixture is one parquet file
    // = one scan partition, and the block join streams probes through
    // it — unpartitioned, the 16M-pair scoring loop runs on ONE core
    // (measured 20 s → 2.5 s at sf0.1).
    val feed = part
      .repartition(s.sessionState.conf.numShufflePartitions)
      .select(
        col("p_partkey").as("f_key"), col("p_brand"),
        concat(col("p_name").substr(lit(1), k0),
          col("p_name").substr(k0 + lit(2), lit(10000))).as("f_name"))
    val cat = part.select(col("p_partkey"), col("p_name"), col("p_brand"))
    // Best match as a map-side-partial max over (score, ¬key), NOT a
    // row_number window: the window form shuffles and SORTS every scored
    // pair; the aggregate carries ≤ one row per probe per partition.
    feed.join(cat, "p_brand")
      .withColumn("score", round(jaroWinkler(col("f_name"), col("p_name")), 6))
      .groupBy(col("f_key"))
      .agg(max(struct(col("score"), (-col("p_partkey")).as("nk"),
        col("p_partkey").as("mk"))).as("best"))
      .select(col("f_key"), col("best.mk").as("match_key"),
        col("best.score").as("score"))
      .where(col("score") >= JwThreshold)
      .orderBy("f_key")
  }

  /** Self-join similarity threshold: high enough (0.92) that the
    * [[graft.functions.JwLengthPruning]] length bound is non-vacuous
    * (min ≥ 0.6·max) and the survivors are near-identical names.
    */
  val JwJoinTau = 0.92

  /** Threshold similarity self-join — all same-brand name pairs with
    * Jaro–Winkler ≥ τ. The graded face of the OPTIMIZER-RULE path:
    * the filter is written as the naive `round(jw(a, b), 6) ≥ τ` and
    * [[graft.functions.JwLengthPruning]] (registered on the live
    * session here) injects the provable length-ratio prefilter in
    * front of the comparator — results are identical BY THEOREM, which
    * the oracle (no rule, DuckDB's own comparator) hash-checks; the
    * plan-shape spec pins that the bound actually lands in the plan.
    * Blocking on brand keeps the pair stream linear (one shuffle).
    */
  val qJwThresholdJoin: Q = (s, d) => {
    import graft.functions.GraftExpressions.jaroWinkler
    graft.functions.JwLengthPruning.ensure(s)
    val p = Tables.part(s, d)
    // Round-robin one side: the single-file scan would otherwise stream
    // the whole pair space through one core (see qFuzzyLinkage).
    val a = p.repartition(s.sessionState.conf.numShufflePartitions)
      .select(col("p_partkey").as("a_key"), col("p_name").as("a_name"),
        col("p_brand"))
    val b = p.select(col("p_partkey").as("b_key"), col("p_name").as("b_name"),
      col("p_brand"))
    a.join(b, "p_brand").where(col("a_key") < col("b_key"))
      .withColumn("jw", round(jaroWinkler(col("a_name"), col("b_name")), 6))
      .where(col("jw") >= lit(JwJoinTau))
      .select(col("a_key"), col("b_key"), col("jw"))
      .orderBy("a_key", "b_key")
  }

  val queries: Map[String, Q] = Map(
    "q_fuzzy_match_scaled" -> qFuzzyMatchScaled,
    "q_fuzzy_linkage" -> qFuzzyLinkage,
    "q_jw_threshold_join" -> qJwThresholdJoin
  )
}
