package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-corpus cleaning stages a real training-data pipeline runs between
  * crawl and tokenizer — PII scrubbing, HTML/boilerplate stripping, URL
  * extraction — all as pure per-row regex projections: map-only, inside
  * whole-stage codegen, zero shuffles at any corpus size (the corpus-level
  * URL census is the one aggregation, a standard two-phase count).
  *
  * The fixture documents are synthetic lowercase prose with no PII/markup,
  * so each graded key PLANTS its targets deterministically (concat keyed
  * on doc_id — the q_cosine_neardup corpus-construction discipline) and
  * the oracle replants the identical corpus in SQL. Regexes are kept in
  * the RE2-compatible subset (no lookaround, no backreferences) so Spark
  * (java.util.regex) and DuckDB (RE2) agree literally.
  */
object TextClean {
  type Q = (SparkSession, String) => DataFrame

  /** RE2-and-Java-compatible PII patterns. Deliberately minimal: the
    * graded contract is the scrub MECHANISM (match → placeholder +
    * census); production pattern packs (locale phone formats, IBANs,
    * national ids) slot into the same map.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Scrub one text column: placeholders substituted in pattern order.
    * Order matters where patterns could overlap a prefix (SSN 3-2-4 vs
    * phone 3-3-4 cannot collide; IP before phone keeps dotted quads from
    * ever being read as number runs).
    */
  def scrub(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "[EMAIL]")
    val i = regexp_replace(e, Ipv4Re, "[IP]")
    val s = regexp_replace(i, SsnRe, "[SSN]")
    regexp_replace(s, PhoneRe, "[PHONE]")
  }

  /** The planted-PII corpus both the engine and the oracle construct:
    * every 10th doc leaks an email + phone, every 15th an IP + SSN.
    */
  private def plantedPii(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      concat(col("text"),
        when(col("doc_id") % 10 === 0,
          lit(" contact jane.doe@example.com or 555-867-5309 today")).otherwise(lit("")),
        when(col("doc_id") % 15 === 0,
          lit(" host 192.168.10.42 owner 123-45-6789")).otherwise(lit(""))))

  /** Graded PII scrub: per doc, the scrubbed text plus a per-category
    * census (the audit artifact a compliance pass keeps). Map-only.
    */
  val qPiiScrub: Q = (s, d) => {
    val docs = plantedPii(Tables.documents(s, d).select(col("doc_id"), col("text")))
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(SsnRe)).cast("long").as("n_ssns"),
      regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ips"),
      scrub(col("text")).as("scrubbed"))
      .orderBy("doc_id")
  }

  /** Strip HTML: tags → space, a minimal entity table, whitespace
    * re-normalized. The planted corpus wraps every 7th doc in markup.
    */
  def stripHtml(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val ent = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  private def plantedHtml(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(col("doc_id") % 7 === 0,
        concat(lit("<html><body><p class=\"x\">"), col("text"),
          lit("</p><div>footer &amp; nav</div></body></html>")))
        .otherwise(col("text")))

  /** Graded HTML strip: cleaned text + how much was removed (the
    * boilerplate-share signal quality filters threshold on).
    */
  val qHtmlStrip: Q = (s, d) => {
    val docs = plantedHtml(Tables.documents(s, d).select(col("doc_id"), col("text")))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_raw"),
      stripHtml(col("text")).as("clean"))
      .withColumn("n_clean", length(col("clean")).cast("long"))
      .select(col("doc_id"), col("n_raw"), col("n_clean"), col("clean"))
      .orderBy("doc_id")
  }

  val UrlRe = "https?://[A-Za-z0-9.-]+(/[A-Za-z0-9._/%-]*)?"

  /** Graded URL census: extract every URL, reduce to registrable host,
    * count per host corpus-wide — the domain-mix report every crawl
    * curation run starts from. Extraction is map-only; the census is one
    * partial-aggregated count on the host key.
    */
  val qUrlCensus: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .withColumn("text",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" see https://example.com/a/b and http://data.example.org/x")))
          .when(col("doc_id") % 5 === 1,
            concat(col("text"), lit(" via https://example.com/c")))
          .otherwise(col("text")))
    docs
      .select(explode(expr(s"regexp_extract_all(text, '($UrlRe)', 1)")).as("url"))
      .select(regexp_extract(col("url"), "https?://([A-Za-z0-9.-]+)", 1).as("host"))
      .groupBy("host").agg(count(lit(1)).as("n_urls"))
      .orderBy("host")
  }

  // ------------------------------------------- cross-document boilerplate

  /** N-gram length for the boilerplate census. 5 balances specificity
    * (a 5-token phrase repeated verbatim across documents is template
    * text, not coincidence) against recall on short boilerplate.
    */
  val BoilerGramN = 5

  /** Token n-gram stream: one row per (doc, position) n-gram. Map-only —
    * the explode is a per-row fan-out of ≤ |tokens| rows, no shuffle;
    * documents shorter than `n` tokens contribute nothing (and are
    * excluded from downstream per-doc accounting, matching the oracle).
    */
  private[graft] def gramStream(docs: DataFrame, n: Int): DataFrame =
    docs
      .withColumn("__t", split(col("text"), " "))
      .where(size(col("__t")) >= n)
      .select(col("doc_id"), col("lang"),
        explode(expr(
          s"transform(sequence(0, size(__t) - $n), i -> array_join(slice(__t, i + 1, $n), ' '))"))
          .as("gram"))

  /** Corpus-wide boilerplate census: n-grams appearing in at least
    * `minDocs` DISTINCT documents — the cross-document repeated-phrase
    * detector (the token-stream rendering of RefinedWeb/CCNet's
    * "remove lines repeated across pages"; the fixture corpus is
    * single-line, so the repetition unit is the n-gram, not the line).
    * Two-phase: partial-aggregated distinct-doc count on the gram key —
    * one shuffle, output bounded by the distinct-gram count.
    */
  def boilerplateCensus(grams: DataFrame, minDocs: Long): DataFrame =
    grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)

  /** Graded census surface: every 5-gram shared by ≥ 3 documents with
    * its document frequency — the phrase blocklist a cleaning run
    * materializes before stripping.
    */
  val qBoilerplateGrams: Q = (s, d) =>
    // (r17) censusUpdates is the spec-pinned batch equivalent of
    // boilerplateCensus (TextCleanSpec "census via in-row distinct ==
    // census via countDistinct"): per-doc grams dedup IN-ROW
    // (array_distinct) so a plain count replaces countDistinct's
    // Expand + double aggregation — one exchange fewer per census.
    censusUpdates(Tables.documents(s, d), BoilerGramN)
      .where(col("n_docs") >= 3)
      .orderBy(desc("n_docs"), col("gram"))

  /** Graded strip report: per language, how much of the gram stream is
    * boilerplate (≥ 2-doc grams) and how many documents exceed a 20%
    * boilerplate share — the flag-for-removal set. The threshold is
    * integer cross-multiplication (`5·hits ≥ grams`), so no float sits
    * at the decision boundary (the qCurationPipeline discipline).
    *
    * Scale shape: the census is corpus-derived — at web scale it does
    * NOT fit a broadcast (millions of templated phrases), so the
    * gram→census membership join is a plain shuffle join on the gram
    * key, the same deliberate no-broadcast discipline as q_lm_score's
    * vocabulary join; at fixture scale AQE may demote it to broadcast,
    * which is the planner's call, not a baked-in collect.
    */
  /** Per-doc boilerplate tagging against a GIVEN census frame — the
    * shared core of the batch strip report and the online streaming
    * gate ([[graft.streaming.Streams]] `boilerplateGateBatch`): each
    * doc's gram stream left-joins census membership, then one per-doc
    * aggregate yields (n_grams, n_hits, flagged) with the integer 20%
    * threshold. The census side is corpus-derived, so no broadcast is
    * baked in.
    */
  def tagBoilerplate(docs: DataFrame, census: DataFrame,
      n: Int = BoilerGramN): DataFrame =
    gramStream(docs, n)
      .join(census.select(col("gram"), lit(1L).as("__boiler")), Seq("gram"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_grams"), count(col("__boiler")).as("n_hits"))
      .withColumn("flagged", col("n_hits") * 5 >= col("n_grams"))

  val qBoilerplateStrip: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // Census deliberately from the SAME gramStream subtree the tagging
    // join consumes: the two branches' gram exchanges are identical, so
    // ReuseExchange materializes the split + gram build once (r17:
    // switching this census to censusUpdates broke the reuse and made
    // the key 1.9x slower — reverted; grams/delta, which have no second
    // consumer, keep the in-row-distinct census).
    val census = boilerplateCensus(gramStream(docs, BoilerGramN), 2L)
    tagBoilerplate(docs, census)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("n_grams"),
        sum(col("n_hits")).as("n_boiler"),
        count(when(col("flagged"), lit(1))).as("n_flagged"))
      .orderBy("lang")
  }

  /** Incremental census maintenance: per-gram document frequencies are
    * ADDITIVE across disjoint document sets (each doc contributes 1 to
    * each of its distinct grams, and a doc is in exactly one batch), so
    * ingesting a delta batch costs one census over the DELTA plus an
    * outer count-merge with the stored snapshot census — never a
    * recompute over the corpus. At 100 TB the snapshot census is a
    * parquet artifact partitioned on the gram key; the merge is one
    * shuffle of census-sized (not corpus-sized) frames.
    *
    * Graded as a STRUCTURAL IDENTITY: the key splits the fixture into a
    * 7/8 snapshot and a 1/8 delta, maintains incrementally, and is
    * graded by the SAME oracle string as q_boilerplate_grams — the
    * incremental result must hash-match the from-scratch batch census
    * exactly (the q_neardup_lsh/salted shared-oracle discipline).
    */
  def mergeCensus(snapshot: DataFrame, deltaCensus: DataFrame): DataFrame =
    snapshot.unionByName(deltaCensus)
      .groupBy(col("gram"))
      .agg(sum(col("n_docs")).as("n_docs"))

  /** Streaming-ready census transform — the update-mode streaming face
    * of [[boilerplateCensus]], shared verbatim by batch and stream:
    * each document contributes its DISTINCT grams once (array_distinct
    * per row — in-row, map-side, no dedup state), so a plain count per
    * gram IS the document frequency, provided each doc_id arrives
    * exactly once (the upstream exact-dedup contract the R2 dedup
    * stage guarantees). Streaming state = the census itself
    * (gram → count) — the same artifact [[qBoilerplateDelta]]'s
    * additive merge maintains offline; the two are the online/offline
    * renderings of one algebra. Batch-equivalence and streaming parity
    * are spec'd in TextCleanSpec.
    */
  def censusUpdates(docs: DataFrame, n: Int = BoilerGramN): DataFrame =
    docs.withColumn("__t", split(col("text"), " "))
      .where(size(col("__t")) >= n)
      .select(explode(array_distinct(expr(
        s"transform(sequence(0, size(__t) - $n), i -> array_join(slice(__t, i + 1, $n), ' '))")))
        .as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_docs"))

  val qBoilerplateDelta: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // (r17) in-row-distinct census per part — see qBoilerplateGrams.
    def census(part: DataFrame): DataFrame = censusUpdates(part, BoilerGramN)
    val snapshot = census(docs.where(col("doc_id") % 8 =!= 0))
    val delta = census(docs.where(col("doc_id") % 8 === 0))
    mergeCensus(snapshot, delta)
      .where(col("n_docs") >= 3)
      .orderBy(desc("n_docs"), col("gram"))
  }

  // ------------------------------------------------- canonical-URL dedup

  /** Canonical form of a URL for identity purposes — the Common-Crawl
    * dedup key: scheme dropped (http ≡ https), host lowercased, query
    * string and fragment dropped, trailing slashes trimmed. All steps
    * regex-only in the RE2∩Java subset so Spark and DuckDB agree
    * literally (the TextClean module contract).
    */
  def canonicalUrl(url: Column): Column = {
    val noScheme = regexp_replace(url, "^https?://", "")
    val noQuery = regexp_replace(noScheme, "[?#].*$", "")
    val host = lower(regexp_extract(noQuery, "^[^/]+", 0))
    val path = regexp_replace(regexp_replace(noQuery, "^[^/]+", ""), "/+$", "")
    concat(host, path)
  }

  /** Graded canonical-URL dedup: each planted crawl record carries a URL
    * variant (scheme/case/query/fragment/trailing-slash noise around two
    * canonical targets, plus per-doc distinct URLs); group by canonical
    * form, keep the FIRST (min doc_id) — the crawl-level "same page
    * fetched twice" dedup that runs BEFORE any content hashing, i.e. the
    * cheapest rung of the dedup ladder. Map-only extraction +
    * canonicalization, then one count/min aggregate on the canonical key.
    */
  val qUrlDedup: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"))
      .withColumn("url",
        when(col("doc_id") % 4 === 0, lit("https://Example.COM/a/b?utm=1"))
          .when(col("doc_id") % 4 === 1, lit("http://example.com/a/b/"))
          .when(col("doc_id") % 4 === 2, lit("https://example.com/a/b#frag"))
          .otherwise(concat(lit("https://crawl.example.org/doc/"), col("doc_id"))))
    docs.select(col("doc_id"), canonicalUrl(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy("canon_url")
  }

  val queries: Map[String, Q] = Map(
    "q_url_dedup" -> qUrlDedup,
    "q_pii_scrub" -> qPiiScrub,
    "q_html_strip" -> qHtmlStrip,
    "q_url_census" -> qUrlCensus,
    "q_boilerplate_grams" -> qBoilerplateGrams,
    "q_boilerplate_strip" -> qBoilerplateStrip,
    "q_boilerplate_delta" -> qBoilerplateDelta
  )
}
