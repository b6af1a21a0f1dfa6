package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statistics-driven planning — the cost-based-optimizer lever, the one
  * planner surface the engine had not exercised (every other lever —
  * partition pruning, bucketing, sort/z-order layout, AQE skew, bloom
  * pre-join, broadcast/shuffle-hash/SMJ pins — has a graded or
  * spec-pinned face). Hand-ordered joins encode the author's guess
  * about table sizes; `CostBasedJoinReorder` replaces that guess with
  * measured table and column statistics, which is how a 100 TB
  * deployment keeps a 6-way star join from materializing a
  * fact-times-fact intermediate just because the SQL was written in
  * the wrong order.
  *
  * Mechanics: Catalyst's CBO only reads statistics from the CATALOG, so
  * the fixture parquet dirs are registered as external tables
  * (metadata-only — `CREATE TABLE ... USING parquet LOCATION`, no data
  * copied), `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`
  * scans once to record row counts, null counts, NDVs and min/max, and
  * `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled` turn
  * the reorder rule on. Everything is scoped: tables DROP and confs
  * restore afterwards (the graded session is shared across keys and
  * data dirs — the withViews discipline), while a library user keeps
  * [[registerAnalyzed]] tables standing and pays ANALYZE once per
  * ingest, amortized over every subsequent query.
  *
  * At 100 TB: ANALYZE's cost is one column-pruned scan per table and
  * the artifact is O(columns) catalog metadata; stats-bearing relations
  * also feed AQE's broadcast-threshold decisions, so the lever composes
  * with the runtime re-planner rather than competing with it.
  */
object Stats {
  import Tables.configure
  type Q = (SparkSession, String) => DataFrame

  /** Register `tables` from `sfDir` as external catalog tables named
    * `<prefix><table>` and ANALYZE them. Metadata-only registration;
    * the ANALYZE scan is the one-time cost that makes every later plan
    * stats-aware. `columns(table)` scopes the column-stats pass to the
    * join/filter columns the workload actually estimates with — the
    * production discipline (an NDV/min/max aggregate over every column
    * of a wide 100 TB fact table pays for stats nobody reads; the
    * reorderer only consults the columns in predicates). Empty seq →
    * row-count-only; None mapping → ALL COLUMNS. `histograms` adds
    * equi-height histograms to the column pass (percentile_approx per
    * column — one extra aggregate, same scan): NDV+min/max assume a
    * uniform value distribution, so a skewed predicate column (the
    * hot-key case every skew tool here exists for) misestimates badly
    * without them; with them FilterEstimation reads per-bin densities.
    */
  def registerAnalyzed(s: SparkSession, sfDir: String, tables: Seq[String],
      prefix: String = "graft_stats_",
      columns: Map[String, Seq[String]] = Map.empty,
      histograms: Boolean = false): Seq[String] = {
    require(tables.nonEmpty, "registerAnalyzed needs at least one table")
    val HistKey = "spark.sql.statistics.histogram.enabled"
    val priorHist = s.conf.getOption(HistKey)
    if (histograms) s.conf.set(HistKey, "true")
    try tables.map { t =>
      val name = s"$prefix$t"
      s.sql(s"DROP TABLE IF EXISTS `$name`")
      // LOCATION resolves RELATIVE paths against the warehouse dir, not
      // the process CWD that spark.read.parquet uses — a relative sfDir
      // (the ×10-mirror gate passes target/mirror_x10) would register an
      // empty location and fail schema inference. Absolutize local
      // paths; URIs with a scheme (hdfs://, s3a://) pass through.
      val loc0 = s"$sfDir/$t.parquet"
      val loc = if (loc0.startsWith("/") || loc0.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) loc0
        else new java.io.File(loc0).getAbsolutePath
      s.sql(s"CREATE TABLE `$name` USING parquet LOCATION '$loc'")
      columns.get(t) match {
        case None =>
          s.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS FOR ALL COLUMNS")
        case Some(Nil) =>
          s.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS")
        case Some(cols) =>
          s.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS FOR COLUMNS " +
            cols.map(c => s"`$c`").mkString(", "))
      }
      name
    } finally priorHist match {
      case Some(v) => s.conf.set(HistKey, v)
      case None => s.conf.unset(HistKey)
    }
  }

  /** Run `body` with `tables` registered+analyzed and the CBO confs on,
    * then drop the tables and restore the confs — the scoped form the
    * graded key uses. The DataFrame `body` returns is analyzed (and for
    * the graded key, executed) inside the scope.
    */
  def withCboTables[A](s: SparkSession, sfDir: String, tables: Seq[String],
      prefix: String = "graft_stats_",
      columns: Map[String, Seq[String]] = Map.empty)(body: Seq[String] => A): A = {
    val cboKeys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prior = cboKeys.map(k => k -> s.conf.getOption(k))
    val names = registerAnalyzed(s, sfDir, tables, prefix, columns)
    try {
      cboKeys.foreach(s.conf.set(_, "true"))
      body(names)
    } finally {
      prior.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
      names.foreach(n => s.sql(s"DROP TABLE IF EXISTS `$n`"))
    }
  }

  /** Outcome of a staleness probe: what the catalog believed, what the
    * data actually holds, and whether a re-ANALYZE was issued.
    */
  final case class StalenessReport(table: String, recordedRows: Option[Long],
      actualRows: Long, drift: Double, refreshed: Boolean)

  /** Staleness detection for the LIBRARY path: a standing
    * [[registerAnalyzed]] table keeps serving its ANALYZE-time statistics
    * after every append/merge that bypasses the catalog — and a
    * 100-rows-at-ANALYZE table that has since absorbed N merges still
    * LOOKS broadcast-able to the planner (catalog stats override the
    * file-size fallback), which is how standing tables silently mis-plan.
    * StatsSpec pins exactly that failure: post-merge, the join strategy
    * flips only after this refresh runs.
    *
    * The probe compares the catalog's recorded row count against a
    * current `count()` — on parquet a metadata-weight scan (zero data
    * columns; row-group row counts carry the answer), so probing after
    * each ingest batch costs footer reads, not a data pass. Drift ≥
    * `driftThreshold` (relative to the recorded count; missing stats
    * count as infinitely stale) triggers `REFRESH TABLE` (drop cached
    * file listing) plus re-ANALYZE — row+size by default, `columns`
    * scoping the column pass exactly as [[registerAnalyzed]] does.
    */
  def refreshIfStale(s: SparkSession, table: String, driftThreshold: Double = 0.2,
      columns: Seq[String] = Nil): StalenessReport = {
    // Parse the name so a qualified `db.tbl` resolves as (db, tbl) rather
    // than a single bare identifier literally named "db.tbl" — and quote
    // each PART when rebuilding SQL, so both forms hit the same table the
    // catalog probe below reads.
    val ident = s.sessionState.sqlParser.parseTableIdentifier(table)
    val quoted = (ident.database.toSeq :+ ident.table)
      .map(p => s"`${p.replace("`", "``")}`").mkString(".")
    // REFRESH first: the cached file listing predates the merge, and both
    // the count probe and any re-ANALYZE must see the post-merge files.
    s.sql(s"REFRESH TABLE $quoted")
    val recorded = s.sessionState.catalog.getTableMetadata(ident)
      .stats.flatMap(_.rowCount).map(_.toLong)
    val actual = s.table(table).count()
    val drift = recorded match {
      case Some(r) if r > 0 => math.abs(actual - r).toDouble / r
      case Some(_) => if (actual == 0) 0.0 else Double.PositiveInfinity
      case None => Double.PositiveInfinity
    }
    val stale = drift >= driftThreshold
    if (stale) {
      if (columns.nonEmpty)
        s.sql(s"ANALYZE TABLE $quoted COMPUTE STATISTICS FOR COLUMNS " +
          columns.map(c => s"`$c`").mkString(", "))
      else s.sql(s"ANALYZE TABLE $quoted COMPUTE STATISTICS")
    }
    StalenessReport(table, recorded, actual, drift, stale)
  }

  /** Graded surface: the q5-family star join written in the WORST
    * textual order — fact ⋈ fact first (lineitem ⋈ orders), the
    * selective region filter last — then handed to CostBasedJoinReorder
    * with full column stats. The oracle (DuckDB, its own cost model)
    * agrees on values whatever order either engine picks; the reorder
    * itself is pinned in StatsSpec (with CBO+stats the optimized join
    * tree differs from the no-stats plan and starts from the filtered
    * dimension side). collect() happens inside the scope so the plan
    * executes with stats present; the returned frame is the tiny
    * 5-row aggregate localCheckpoint-free.
    */
  val qCboJoinReorder: Q = (s, d) => {
    import org.apache.spark.sql.functions.col
    configure(s)
    // Column stats scoped to what the reorderer estimates with: join
    // keys + the region filter (the revenue expression columns need no
    // NDVs — they only feed the aggregate above the joins).
    val statCols = Map(
      "lineitem" -> Seq("l_orderkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey", "c_nationkey"),
      "nation" -> Seq("n_nationkey", "n_regionkey"),
      "region" -> Seq("r_regionkey", "r_name"))
    // Prefix namespaced per session: the catalog is shared across
    // newSession() clones, so concurrent clients must not race one
    // fixed-name CREATE/ANALYZE/DROP (Tables.sessionNs).
    withCboTables(s, d, Seq("lineitem", "orders", "customer", "nation", "region"),
      prefix = s"graft_stats_${Tables.sessionNs(s)}_", columns = statCols) {
      case Seq(l, o, c, n, r) =>
        val joined = s.sql(s"""
          -- Fixed-point LONG accumulation (item #5) in its 100 TB form
          -- (#7b): per-(group, partition) partials sum exact cents ×
          -- percent-points products (1e-4 units) in primitive LONG,
          -- bounded by partition size; only the tiny partial frame
          -- merges in DECIMAL(38,0) — the ×97 mirror's ANSI `long
          -- overflow` (Σ ≈ 7.9e18 under the un-offset-dimension ×97²
          -- fan-out) is exactly what the single-phase form dies on.
          -- +50 div 100 is round-half-up at the cent boundary (positive
          -- sums; BIGINT quotient exact to ~10 PB money volume), and
          -- the DECIMAL scale shift single-rounds the double.
          WITH __wp AS (
            SELECT n_name,
              sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                (100 - CAST(round(l_discount * 100) AS BIGINT))) AS __rev4p,
              count(*) AS __np
            FROM `$l` JOIN `$o` ON l_orderkey = o_orderkey
              JOIN `$c` ON o_custkey = c_custkey
              JOIN `$n` ON c_nationkey = n_nationkey
              JOIN `$r` ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY n_name, spark_partition_id()
          )
          SELECT n_name,
            CAST(CAST((sum(CAST(__rev4p AS DECIMAL(38,0))) + 50) div 100
              AS DECIMAL(38,2)) / 100 AS DOUBLE) AS revenue,
            sum(__np) AS n_items
          FROM __wp
          GROUP BY n_name
          ORDER BY n_name
        """)
        // Execute inside the scope (tables + stats still registered);
        // hand the materialized rows back as the graded frame.
        val rows = joined.collect().toIndexedSeq
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          joined.schema).orderBy(col("n_name"))
      case names => sys.error(s"unexpected registration: $names")
    }
  }

  val queries: Map[String, Q] = Map(
    "q_cbo_join_reorder" -> qCboJoinReorder)
}
