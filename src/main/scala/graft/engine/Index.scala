package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text retrieval infrastructure over the document corpus — the
  * index a curation pipeline materializes so that decontamination
  * lookups, boilerplate audits, and eval-set leak hunts don't re-scan
  * 100 TB of text per query: blocked posting lists, conjunctive lookup
  * through the index artifact, exact BM25 ranking, and additive
  * incremental maintenance (same algebra as TextClean's census delta).
  *
  * Scale shape: term-frequency extraction is a per-row explode (map-only)
  * followed by ONE shuffle on the (token, doc) key with map-side partial
  * counts; posting lists are then assembled per (token, doc-block) — the
  * block key bounds every row to `BlockSize` postings, so a stopword's
  * posting list is many bounded rows instead of one corpus-sized array
  * (the Lucene-segment discipline; an unblocked collect_list over a
  * common token would concentrate the corpus in single rows). Queries
  * touch only their terms' rows — predicate pushdown on the token column
  * prunes the index scan to |query| keys.
  */
object Index {
  import Tables.documents
  type Q = (SparkSession, String) => DataFrame

  /** Posting-list block width in doc_id space. Fixture-friendly small;
    * at corpus scale pick ~64–256k so a block row stays well under the
    * shuffle page size yet the per-token row count stays manageable.
    */
  val BlockSize = 1024L

  /** (doc_id, tok) token stream, duplicates preserved (tf source). */
  private[graft] def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))

  /** Structured index rows: (tok, block, posts: array<struct<doc_id,tf>>)
    * with posts sorted by doc_id — the internal representation deltas
    * merge on; [[render]] flattens it for the graded/hashable surface.
    */
  private[graft] def postingsStruct(docs: DataFrame): DataFrame =
    tokens(docs)
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("tok"), floor(col("doc_id") / BlockSize).as("block"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("tf")))).as("posts"))

  /** Graded rendering: postings as a "doc:tf,doc:tf" string (the harness
    * hash-compares scalar columns; struct arrays don't hash portably).
    */
  private[graft] def render(idx: DataFrame): DataFrame =
    idx.select(col("tok"), col("block"),
      size(col("posts")).cast("long").as("n_docs"),
      array_join(expr("transform(posts, s -> concat(s.doc_id, ':', s.tf))"), ",")
        .as("postings"),
      // Delta-gap encoding (first id absolute, then successive gaps) —
      // the storage format real posting lists compress to (small ints →
      // varint-friendly); emitted beside the absolute form so the gap
      // arithmetic itself is hash-gated against the oracle's independent
      // recomputation.
      array_join(expr(
        "transform(posts, (s, i) -> IF(i = 0, s.doc_id, s.doc_id - posts[i - 1].doc_id))"),
        ",").as("gaps"))

  /** Graded inverted index of the documents table. */
  val qInvertedIndex: Q = (s, d) =>
    render(postingsStruct(documents(s, d)))
      .orderBy("tok", "block")

  /** Additive incremental maintenance: posting rows for DISJOINT doc
    * batches never share a doc_id, so ingesting a delta is a union +
    * per-(tok, block) array merge of index-sized (not corpus-sized)
    * frames — never a corpus recompute. Mirrors TextClean.mergeCensus.
    */
  def mergeIndex(snapshot: DataFrame, delta: DataFrame): DataFrame =
    snapshot.unionByName(delta)
      .groupBy(col("tok"), col("block"))
      .agg(array_sort(flatten(collect_list(col("posts")))).as("posts"))

  /** Graded structural identity (the q_boilerplate_delta discipline):
    * 7/8 snapshot + 1/8 delta maintained incrementally, graded by the
    * SAME oracle string as q_inverted_index — incremental ≡ batch is
    * hash-gated, not asserted.
    */
  val qIndexDelta: Q = (s, d) => {
    val docs = documents(s, d)
    val snapshot = postingsStruct(docs.where(col("doc_id") % 8 =!= 0))
    val delta = postingsStruct(docs.where(col("doc_id") % 8 === 0))
    render(mergeIndex(snapshot, delta)).orderBy("tok", "block")
  }

  /** Conjunctive-AND lookup THROUGH the index artifact: prune the index
    * scan to the query terms (token-key pushdown), explode the pruned
    * posting blocks back to (doc, term) pairs, and keep docs matching
    * ALL terms — a |query|-key scan plus one bounded aggregate, never a
    * corpus text re-scan.
    */
  def lookupAll(idx: DataFrame, terms: Seq[String]): DataFrame =
    idx.where(col("tok").isin(terms: _*))
      .select(col("tok"), explode(col("posts")).as("p"))
      .groupBy(col("p.doc_id").as("doc_id"))
      .agg(countDistinct(col("tok")).as("n_terms"),
        sum(col("p.tf")).as("total_tf"))
      .where(col("n_terms") === terms.size)
      .select(col("doc_id"), col("total_tf"))

  /** Query terms for the graded lookup/BM25 keys: one rare token ("dup",
    * df ≈ 5% of docs — the fixture vocabulary's only low-df member) and
    * common ones — the mix that makes idf weighting and posting-list
    * pruning visible.
    */
  val LookupTerms = Seq("dup", "join")
  val Bm25Terms = Seq("dup", "spark", "join")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  val qIndexLookup: Q = (s, d) =>
    lookupAll(postingsStruct(documents(s, d)), LookupTerms)
      .orderBy("doc_id")

  /** Exact BM25 (Robertson k1/b form, Lucene's (k1+1) numerator and the
    * non-negative idf = ln(1 + (N − df + ½)/(df + ½))) for a fixed
    * conjunctive-OR query, top 10 by rounded score. The per-(doc, term)
    * score is a single arithmetic expression mirrored literally in the
    * oracle; ordering uses the ROUNDED score (ties → doc_id) so the
    * top-10 cut is deterministic and engine-independent.
    *
    * Plan: the token stream is filtered to the query terms BEFORE the
    * tf aggregate (pushdown — corpus rows for other tokens never reach
    * a shuffle); df/N/avgdl are query- and corpus-stat-sized frames
    * (≤|query| rows and 1 row), joined broadcast — bounded by the query,
    * not the corpus.
    */
  /** Full BM25 score frame (doc_id, score — rounded 6) for every doc
    * matching ≥1 query term; the ranking keys cut it down. */
  private[graft] def bm25Scores(docs: DataFrame): DataFrame = {
    // Everything rides the INDEX artifact, not the corpus: doc lengths
    // are Σtf over each doc's postings, df is Σ|posting block| per term
    // — the IR-engine discipline (one corpus pass builds the index;
    // scoring never re-reads text). localCheckpoint stands in for the
    // persisted parquet index a production deployment reads instead.
    val idx = postingsStruct(docs).localCheckpoint()
    val dl = idx.select(explode(col("posts")).as("p"))
      .groupBy(col("p.doc_id").as("doc_id"))
      .agg(sum(col("p.tf")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("nn"),
      avg(col("dl")).as("avgdl"))
    val pruned = idx.where(col("tok").isin(Bm25Terms: _*))
    val tf = pruned.select(col("tok"), explode(col("posts")).as("p"))
      .select(col("p.doc_id").as("doc_id"), col("tok"),
        col("p.tf").cast("double").as("tf"))
    val df = pruned.groupBy(col("tok"))
      .agg(sum(size(col("posts"))).cast("double").as("df"))
    val scored = tf
      .join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("nn") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("s",
        col("idf") * (col("tf") * lit(Bm25K1 + 1)) /
          (col("tf") + lit(Bm25K1) * (lit(1 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id")).agg(round(sum(col("s")), 6).as("score"))
    scored
  }

  val qBm25TopK: Q = (s, d) =>
    bm25Scores(documents(s, d)).orderBy(desc("score"), col("doc_id")).limit(10)

  /** Hybrid-retrieval fusion depth (per-branch candidate list length)
    * and the standard RRF dampening constant (Cormack et al. 2009). */
  val HybridDepth = 20
  val RrfK = 60

  /** Reciprocal-rank fusion of the lexical (BM25) and dense (cosine)
    * retrieval lists — the standard hybrid-search merge a RAG corpus
    * runs per query: score(d) = Σ_lists 1/(k + rank_list(d)).
    *
    * The corpus-scale work is entirely inside the two branches, each
    * already in its scaled shape (BM25 through the pruned index
    * artifact; cosine vs a broadcast 1-row query vector). Each branch
    * then cuts to `HybridDepth` rows via TakeOrdered (distributed
    * top-k — no global sort materializes), so the fusion join is a
    * bounded-by-depth frame join, independent of corpus size. Ranks are
    * assigned AFTER the cut, over the ≤20-row frame (the single-
    * partition window is bounded by HybridDepth, not the corpus), on
    * (rounded score desc, id) so both engines rank identically. Absent
    * ranks surface as 0 ("not retrieved by this branch") to keep the
    * output all-integer and NULL-free; doc 0 is the dense query's own
    * document and is excluded from both branches.
    */
  val qHybridRrf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val byLex = Window.orderBy(desc("score"), col("doc_id"))
    val lex = bm25Scores(documents(s, d))
      .where(col("doc_id") =!= 0)
      .orderBy(desc("score"), col("doc_id")).limit(HybridDepth)
      .withColumn("lex_rank", row_number().over(byLex).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val qv = e.where(col("vec_id") === 0).select(col("v").as("qv"))
    import graft.functions.GraftExpressions.dotProduct
    val byCos = Window.orderBy(desc("cos_sim"), col("doc_id"))
    val dense = e.crossJoin(broadcast(qv))
      .where(col("vec_id") =!= 0)
      .select(col("vec_id").as("doc_id"),
        round(dotProduct(col("v"), col("qv")) /
          (sqrt(dotProduct(col("v"), col("v"))) * sqrt(dotProduct(col("qv"), col("qv")))), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), col("doc_id")).limit(HybridDepth)
      .withColumn("dense_rank", row_number().over(byCos).cast("long"))
      .select(col("doc_id"), col("dense_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0L)).as("dense_rank"))
      .withColumn("rrf_score", round(
        when(col("lex_rank") > 0, lit(1.0) / (lit(RrfK) + col("lex_rank"))).otherwise(lit(0.0)) +
          when(col("dense_rank") > 0, lit(1.0) / (lit(RrfK) + col("dense_rank"))).otherwise(lit(0.0)),
        6))
      .orderBy(desc("rrf_score"), col("doc_id")).limit(15)
  }

  /** Positional token stream (doc_id, pos, tok), pos 1-based to match
    * SQL list indexing in the oracle.
    */
  private[graft] def positions(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))

  /** Exact-phrase match via POSITIONAL postings: prune the position
    * stream to the two phrase terms, then equi-join the first term's
    * positions against the second term's shifted by one — the classic
    * positional-index phrase algorithm (adjacency as intersection, no
    * text re-scan). (doc_id, n_hits) per matching doc; overlapping
    * occurrences each count (spec'd with a repeated-term phrase).
    */
  def phraseSearch(docs: DataFrame, t1: String, t2: String): DataFrame = {
    // Bounded by the phrase terms' postings size, not the corpus.
    val pos = positions(docs).where(col("tok").isin(t1, t2)).localCheckpoint()
    val a = pos.where(col("tok") === t1).select(col("doc_id"), col("pos"))
    val b = pos.where(col("tok") === t2)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
  }

  val PhraseTerms = Seq("spark", "join")

  val qPhraseSearch: Q = (s, d) =>
    phraseSearch(documents(s, d), PhraseTerms(0), PhraseTerms(1))
      .orderBy("doc_id")

  /** Streaming face of the index: the SAME postings transform run as an
    * update-mode streaming aggregation — state per (tok, block) IS the
    * posting block, the online rendering of [[mergeIndex]]'s offline
    * additive merge (docs arrive exactly once under the upstream R2
    * dedup contract, so collect_list accumulates each posting once).
    * Rendered here (string postings) because the memory-sink parity
    * check compares scalar rows; n_docs is strictly monotone per key, so
    * the latest update per key is max_by(n_docs). Spec'd in IndexSpec.
    */
  def postingsUpdates(docs: DataFrame): DataFrame =
    docs.withColumn("__t", split(col("text"), " "))
      // Per-row term frequencies (no per-(doc, term) aggregation state —
      // a streaming query allows ONE aggregation, and it must be the
      // posting-block one; the same in-row trick as censusUpdates).
      .select(col("doc_id"), explode(expr(
        "transform(array_distinct(__t), x -> struct(x AS tok, cast(size(filter(__t, y -> y = x)) AS bigint) AS tf))"))
        .as("p"))
      .select(col("doc_id"), col("p.tok").as("tok"), col("p.tf").as("tf"))
      .groupBy(col("tok"), floor(col("doc_id") / BlockSize).as("block"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("tf")))).as("posts"))

  val queries: Map[String, Q] = Map(
    "q_inverted_index" -> qInvertedIndex,
    "q_index_delta" -> qIndexDelta,
    "q_index_lookup" -> qIndexLookup,
    "q_bm25_topk" -> qBm25TopK,
    "q_hybrid_rrf" -> qHybridRrf,
    "q_phrase_search" -> qPhraseSearch
  )
}
