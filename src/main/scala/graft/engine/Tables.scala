package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders for the TPC-H-ish star schema plus the
  * events/documents/embeddings tables (TESTDATA.md, FIXTURES.md).
  *
  * Scale notes (100 TB): every loader is a plain parquet scan — column
  * pruning and predicate pushdown are applied by Catalyst at the scan, so
  * callers should select/filter as early as possible and let the optimizer
  * collapse it into the `FileScan`. No caching, no collect here.
  *
  * Reference provenance: the reference checkout is empty (SURVEY.md §0), so
  * semantics are reconstructed from the Kafka Streams dedup pattern; the
  * source/sink surface here corresponds to reference ops R1/R4 (SURVEY.md
  * §2.A).
  */
object Tables {

  /** Session confs the engine needs regardless of which harness built the
    * session. Safe to call repeatedly (runtime-settable SQL confs).
    */
  def configure(spark: SparkSession): SparkSession = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by default
    // (SURVEY.md §7 G1) — read the raw int64 nanos instead.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Deterministic timestamp bytes for the driver's hash compare.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Keep AQE (partition coalescing, skew split) but stop its RUNTIME
    // broadcast-join conversion: with the pair-generating pipelines the
    // materialized stats of a tiny upstream stage tempt AQE into
    // broadcasting a side that CONTAINS the heavy fan-out, executing the
    // whole pipeline twice (observed on q_neardup_lsh: two 32-task heavy
    // stages, one a broadcast build). Static broadcast() hints still apply.
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark
  }

  /** Normalize an events frame's `ts` to session-zoned TIMESTAMP regardless
    * of how the fixture encoded it. Driver generations have shipped BOTH
    * encodings: TIMESTAMP(NANOS) — read as int64 via `nanosAsLong`, exact
    * integer-division to micros (a double route could round, SURVEY.md G1) —
    * and plain TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ and the
    * UTC session casts losslessly. Adapting on dtype keeps every generation
    * (and ScaleSmoke-synthesized mirrors of either) loading identically.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Per-session namespace token for catalog DDL issued by graded keys
    * (q_bucketed_join, q_cbo_join_reorder). The catalog is SHARED across
    * `newSession()` clones (it lives in SharedState, unlike temp views
    * and conf), so concurrent clients writing fixed-name tables would
    * race each other's CREATE/ANALYZE/DROP — the reason ConcurrentVerify
    * used to exclude those two keys. The session's identity hash is
    * stable for its lifetime (re-runs in one session overwrite their own
    * tables; the in-memory catalog does not outlive the JVM) and
    * distinct across concurrent client sessions, which is exactly the
    * isolation the shared catalog lacks.
    */
  def sessionNs(s: SparkSession): String =
    java.lang.Integer.toHexString(System.identityHashCode(s))

  /** Load one fixture table; `events.ts` is normalized to TIMESTAMP
    * (see [[normalizeEventsTs]]).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = configure(spark).read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Persist `df` as a bucketed+sorted table: co-locates future equi-joins
    * and aggregations on `keys` — both sides pre-partitioned by bucket id,
    * so the join plans with NO shuffle exchange (asserted in
    * BucketedJoinSpec). At 100 TB this is how repeatedly-joined fact
    * tables amortize their shuffle once at write time.
    */
  def writeBucketed(df: DataFrame, tableName: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)

  /** Persist `df` hive-style partitioned on `cols` (`path/col=value/…`
    * directories): equality/IN filters on the partition columns then
    * prune at PLANNING time — the scan never lists, opens, or reads
    * non-matching directories. At 100 TB this is the #1 scan-cost lever:
    * a date- or source-partitioned corpus turns "read everything" into
    * "read one directory". Partition columns should be low-cardinality
    * (each value is a directory; millions of tiny partitions invert the
    * win — that's what [[writeBucketed]] is for).
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Targeted DELETE on a partitioned corpus — the right-to-be-forgotten
    * rewrite every long-lived 100 TB store eventually owes: remove every
    * row matching `pred`, rewriting ONLY the partition directories that
    * contain matches. Finding the matches is one pushdown-filtered,
    * key-column scan (inherent — a predicate delete must locate its
    * rows); the rewrite cost then scales with the touched partitions,
    * not the corpus. Partitions whose every row matches are deleted as
    * DIRECTORIES (dynamic partition overwrite never writes an empty
    * partition, so without this they would silently survive — the spec
    * pins it). Touched-partition values are a bounded driver artifact
    * per the [[writePartitioned]] low-cardinality contract. Idempotent:
    * a re-run finds no matches and is a no-op.
    */
  def deletePartitionedWhere(spark: SparkSession, dir: String, partCol: String,
      pred: Column): Unit = {
    val touched = configure(spark).read.parquet(dir).where(pred)
      .select(col(partCol)).distinct().collect().map(_.get(0))
    require(!touched.contains(null),
      s"deletePartitionedWhere: null $partCol partition values are unsupported " +
        "(the rewrite could not address their directory safely)")
    if (touched.nonEmpty) {
      // DELETE semantics on a three-valued predicate: a row where `pred`
      // evaluates to NULL does NOT match and must SURVIVE — a bare
      // `!pred` filter would silently drop it (NULL is not true).
      val keep = !coalesce(pred, lit(false))
      val kept = configure(spark).read.parquet(dir)
        .where(col(partCol).isin(touched: _*) && keep)
        .localCheckpoint() // the write overwrites dirs its lineage reads
      val keptVals = kept.select(col(partCol)).distinct().collect().map(_.get(0)).toSet
      kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol).parquet(dir)
      // Fully-deleted partitions: no kept rows → dynamic overwrite left
      // the old directory in place; drop it explicitly, addressing the
      // directory by Spark's own partition-path escaping (a value with
      // a space or '=' lives in an escaped dir name).
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val root = new Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      for (v <- touched if !keptVals.contains(v))
        fs.delete(new Path(root,
          s"$partCol=${ExternalCatalogUtils.escapePathName(v.toString)}"), true)
    }
  }

  /** Retention sweep — the TTL lever of the data lifecycle, and the cheap
    * sibling of [[deletePartitionedWhere]]: expire every partition whose
    * VALUE sorts strictly below `cutoff` by deleting its directory
    * outright. No data is scanned or rewritten — the decision reads only
    * the directory listing, which is what makes retention on a date-
    * partitioned 100 TB store an O(partitions) metadata operation
    * instead of a rewrite. Contract: partition values must compare
    * correctly as STRINGS (zero-padded ISO dates `2024-01-05`, fixed-
    * width ids) — that is the same property that makes them rangeable
    * in any object-store listing. Returns the expired values (audit
    * trail); idempotent — a re-run finds nothing below the cutoff.
    */
  def expirePartitionsBefore(spark: SparkSession, dir: String, partCol: String,
      cutoff: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"$partCol="
    // Compare and report the UNESCAPED values — directory names carry
    // Spark's partition-path escaping (identity for the ISO-date shape
    // the contract expects, but not for arbitrary strings).
    val expired = fs.listStatus(root).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(p => (p.getPath,
        ExternalCatalogUtils.unescapePathName(p.getPath.getName.stripPrefix(prefix))))
      .filter(_._2 < cutoff)
    expired.foreach(p => fs.delete(p._1, true))
    expired.map(_._2)
  }

  /** Persist `df` range-partitioned AND sorted on `cols`: every output
    * file covers a disjoint range of the sort key and parquet row-group
    * min/max stats become tight, so a selective filter on that column
    * skips whole files/row groups at READ time — single-dimension
    * clustering (z-order-lite). The third data-layout lever next to
    * `partitionBy` (prunes at planning, needs low-cardinality values)
    * and `bucketBy` (kills join shuffles): sorting prunes at scan time
    * via statistics, serves RANGE predicates, and adds no directory
    * explosion — the natural layout for a time-keyed 100 TB event log.
    * SourceFormatsSpec pins the skip: a one-month filter over the
    * sorted copy emits <¼ of the table's rows from the scan.
    *
    * Gotcha (measured on 4.1.2): cluster on an INTEGRAL or DATE key.
    * TIMESTAMP predicates appear under `PushedFilters:` but the reader
    * does NOT consult row-group stats for them (all groups read); the
    * same layout keyed by the derived `to_date(ts)` skips as expected —
    * which is why sortedOrdersScan sorts and filters on a date column.
    */
  def writeSorted(df: DataFrame, path: String, cols: Seq[String], files: Int): Unit =
    df.repartitionByRange(files, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Spread the low 16 bits of `x` to the even bit positions (standard
    * magic-mask interleave step) — pure Column arithmetic, codegen'd.
    */
  private def spread16(x: Column): Column = {
    val m1 = lit(0x00FF00FFL); val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L); val m4 = lit(0x55555555L)
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(m1)
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(m2)
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(m3)
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(m4)
  }

  /** Morton (z-order) interleave of two 16-bit keys: bit i of `a` lands
    * at position 2i, of `b` at 2i+1, so nearby (a, b) cells share long
    * z-prefixes. Caller contract: both inputs must fit 16 bits (they
    * are masked — wider keys should be range-bucketed down first).
    */
  def morton16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Persist `df` clustered by the z-order of two columns — the
    * MULTI-dimension clustering lever [[writeSorted]] can't provide: a
    * single-column sort gives perfect locality on that column and none
    * on any other, while z-ordering makes every file cover a small
    * RECTANGLE of (a, b) space, so min/max stats prune scans filtered
    * on a, on b, or both (how Delta/Iceberg OPTIMIZE ZORDER lays out
    * 100 TB fact tables). Same stats gotcha as writeSorted: cluster
    * keys must be integral/date-typed for the reader to skip.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      files: Int): Unit = {
    val z = df.withColumn("__z", morton16(col(a), col(b)))
    z.repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  // ------------------------------------------ non-parquet batch sources

  /** Timestamp text format for the CSV/JSON loaders: micro precision, so
    * a text round trip preserves the engine's event-time values exactly
    * (the default format truncates to millis). Session tz is UTC, so the
    * naive rendering is value-preserving.
    */
  val textTimestampFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Explicit-schema CSV loader — the zero-inference discipline of
    * SURVEY §1.B: schema inference would re-scan the data AND is free to
    * guess differently as the data drifts; production loaders declare
    * their schema. Headers are written/expected for humans, never used
    * for typing.
    */
  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    configure(spark).read.schema(schema)
      .option("header", "true").option("timestampFormat", textTimestampFormat)
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", textTimestampFormat)
      .csv(path)

  /** ORC loader — the OTHER columnar at-rest format (schema from the
    * file footers like parquet; vectorized reader, predicate pushdown
    * and column pruning all apply). No schema parameter: columnar
    * formats are self-describing.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    configure(spark).read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Explicit-schema JSON-lines loader (same contract as [[readCsv]]). */
  def readJsonLines(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    configure(spark).read.schema(schema)
      .option("timestampFormat", textTimestampFormat)
      .json(path)

  /** Name of the quarantine column the PERMISSIVE loaders emit. */
  val corruptRecordCol = "_corrupt_record"

  /** CSV loader with malformed-record QUARANTINE — the ingest-edge
    * discipline [[readCsv]] lacks: real 100 TB ingestion hits bad records
    * constantly, and the default parse silently nulls them out (a corrupt
    * numeric cell becomes an indistinguishable null). PERMISSIVE mode +
    * `columnNameOfCorruptRecord` instead lands each unparseable line's
    * RAW TEXT in [[corruptRecordCol]] (clean rows carry null there), so
    * [[splitQuarantine]] can route bad lines to a quarantine sink for
    * replay/forensics while clean rows flow on bit-exactly. Never
    * DROPMALFORMED (silent data loss) or FAILFAST (one bad byte kills a
    * 100 TB job) at the ingest edge.
    */
  def readCsvQuarantine(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    configure(spark).read
      .schema(schema.add(corruptRecordCol, org.apache.spark.sql.types.StringType))
      .option("header", "true").option("timestampFormat", textTimestampFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptRecordCol)
      .csv(path)

  /** JSON-lines twin of [[readCsvQuarantine]]: unparseable lines (broken
    * JSON, type mismatches) carry their raw text in [[corruptRecordCol]].
    */
  def readJsonLinesQuarantine(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    configure(spark).read
      .schema(schema.add(corruptRecordCol, org.apache.spark.sql.types.StringType))
      .option("timestampFormat", textTimestampFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptRecordCol)
      .json(path)

  /** Schema-evolution reader for a corpus grown across batch directories
    * written in DIFFERENT schema versions (a later ingest added columns).
    * Plain `read.parquet` types the whole scan from ONE footer it
    * happens to sample — old batches then surface the new column as
    * null-by-accident or the read fails outright depending on which file
    * wins. `mergeSchema` instead unions every footer's schema (a
    * planning-time footer pass, not a data scan); rows from old batches
    * carry null in the added columns, and the caller decides the default
    * explicitly (`coalesce(col, lit(default))` — the difference between
    * "absent, pre-schema-v2" and "present but null" stays visible until
    * the caller erases it). Columns may be ADDED this way; a TYPE change
    * for an existing column is a different operation (rewrite), not
    * evolution — mergeSchema fails loudly on conflicting types rather
    * than guessing.
    */
  def readMergedSchema(spark: SparkSession, paths: String*): DataFrame =
    configure(spark).read.option("mergeSchema", "true").parquet(paths: _*)

  /** Split a quarantine-loader frame into (clean, quarantined). Clean rows
    * drop the marker column; quarantined rows keep every parsed field plus
    * the raw line for forensics. Spark refuses to execute a raw text scan
    * whose plan references ONLY the corrupt column (the parser would not
    * have attempted the other fields), so the caller must persist `df`
    * first when it will consume the two halves independently — the graded
    * key caches; a 100 TB ingest writes both halves from one pass
    * (clean → corpus, quarantined → badRecordsPath-style dir) which
    * materializes the scan the same way.
    */
  def splitQuarantine(df: DataFrame): (DataFrame, DataFrame) = (
    df.where(col(corruptRecordCol).isNull).drop(corruptRecordCol),
    df.where(col(corruptRecordCol).isNotNull)
  )

  /** The ingest-edge materialization of [[splitQuarantine]]: route a
    * quarantine-loader frame's clean rows to the corpus and its bad
    * lines to a quarantine directory (parquet, raw line + whatever
    * fields parsed — the replay/forensics artifact), caching the parsed
    * scan so the source text is read once for both sinks. Returns
    * (cleanRows, quarantinedRows) — the reconciliation numbers an ingest
    * job logs (clean + quarantined = lines offered, minus headers).
    */
  def writeQuarantined(df: DataFrame, cleanDir: String, badDir: String): (Long, Long) = {
    val parsed = df.cache()
    try {
      val (clean, bad) = splitQuarantine(parsed)
      clean.write.mode("overwrite").parquet(cleanDir)
      bad.write.mode("overwrite").parquet(badDir)
      (clean.count(), bad.count())
    } finally parsed.unpersist()
  }

  /** [[writeQuarantined]] for inputs too big to cache: the counts ride
    * the write passes as [[org.apache.spark.sql.Observation]] metrics —
    * accumulator-style aggregates collected DURING each action — so
    * there is no cache and no separate count job. Two source scans
    * instead of one cached one (a batch write is single-sink, so two
    * passes is the floor without caching); at corpus scale two
    * streaming scans beat materializing the parse, which is why this,
    * not the cached form, is the 100 TB shape. Same return contract:
    * (cleanRows, quarantinedRows).
    */
  def writeQuarantinedObserved(df: DataFrame, cleanDir: String, badDir: String): (Long, Long) = {
    import org.apache.spark.sql.Observation
    val (clean, bad) = splitQuarantine(df)
    val obsClean = Observation()
    val obsBad = Observation()
    clean.observe(obsClean, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(cleanDir)
    bad.observe(obsBad, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(badDir)
    (obsClean.get("n").asInstanceOf[Long], obsBad.get("n").asInstanceOf[Long])
  }

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", textTimestampFormat)
      .json(path)

  // ------------------------------------ snapshot diff / migration audit

  /** Partition values whose content differs between two snapshot frames —
    * the cheap first phase of [[snapshotDiff]], and the standard way to
    * validate a corpus migration/rewrite at scale: each side pays ONE
    * scan aggregated map-side to a (count, checksum-sum) fingerprint per
    * partition, so the cost is a count(*), not a join. `checksum` must
    * be a deterministic integral expression over the row's payload
    * (cross-engine-reproducible if an oracle will re-derive it).
    * CAVEAT: a partition whose edits collide in the checksum SUM escapes
    * detection — organic edits don't collide 64-bit hash sums,
    * adversarial ones can; callers needing certainty skip this phase and
    * row-diff every partition ([[snapshotDiff]]'s `pruneUnchanged =
    * false`).
    */
  def changedPartitionValues(old: DataFrame, neu: DataFrame, partCol: String,
      checksum: Column): DataFrame = {
    def fp(df: DataFrame, suffix: String) = df.groupBy(col(partCol))
      .agg(count(lit(1)).as(s"__n$suffix"), sum(checksum).as(s"__ck$suffix"))
    fp(old, "_o").join(fp(neu, "_n"), Seq(partCol), "full_outer")
      .where(col("__n_o").isNull || col("__n_n").isNull ||
        col("__n_o") =!= col("__n_n") || col("__ck_o") =!= col("__ck_n") ||
        (col("__ck_o").isNull =!= col("__ck_n").isNull))
      .select(col(partCol))
  }

  /** Row-level diff between two snapshot frames keyed by (`partCol`,
    * `idCol`): one row per difference with `status` ∈ added / removed /
    * changed (changed = same key, `checksum` differs; a row whose
    * partition value moved shows as removed + added — partition identity
    * is part of the key). Unchanged rows are never emitted, so the
    * result is the (small) migration delta, not the corpus.
    *
    * Scale shape: with `pruneUnchanged` (default), phase 1
    * ([[changedPartitionValues]]) fingerprints both sides in one scan
    * each, the changed values — bounded by the [[writePartitioned]]
    * low-cardinality partition contract — come to the driver, and the
    * full-outer row join runs ONLY over those partitions; on a
    * partitioned scan the isin filter prunes directories at planning
    * time, so the expensive phase touches the delta's partitions, not
    * the corpus. The join shuffles on (part, id) — co-partitioned sides
    * (bucketed by id) skip even that.
    */
  def snapshotDiff(old: DataFrame, neu: DataFrame, idCol: String, partCol: String,
      checksum: Column, pruneUnchanged: Boolean = true): DataFrame = {
    val (o, n) =
      if (!pruneUnchanged) (old, neu)
      else {
        val changed = changedPartitionValues(old, neu, partCol, checksum)
          .collect().map(_.get(0))
        (old.where(col(partCol).isin(changed: _*)),
          neu.where(col(partCol).isin(changed: _*)))
      }
    // Presence markers, not checksum-null, decide added/removed — a null
    // checksum on a PRESENT row (nullable payload) must not fake absence.
    def side(df: DataFrame, suffix: String) =
      df.select(col(partCol), col(idCol), checksum.as(s"__ck$suffix"),
        lit(1).as(s"__p$suffix"))
    side(o, "_o").join(side(n, "_n"), Seq(partCol, idCol), "full_outer")
      .withColumn("status",
        when(col("__p_o").isNull, lit("added"))
          .when(col("__p_n").isNull, lit("removed"))
          .when(col("__ck_o") =!= col("__ck_n") ||
            (col("__ck_o").isNull =!= col("__ck_n").isNull), lit("changed")))
      .where(col("status").isNotNull)
      .select(col(partCol), col(idCol), col("status"))
  }

  /** Small-files compaction — the housekeeping pass every long-running
    * ingest needs (each micro-batch/task writes its own file; a 100 TB
    * corpus accumulates millions of KB-sized files whose open/footer
    * costs dominate scans). Rewrites `inputDir` as ~`targetFiles`
    * similarly-sized parquet files via a round-robin repartition (a full
    * shuffle — bounded by the data rewritten, which compaction must do
    * anyway); `maxRecordsPerFile` additionally caps file size when row
    * width varies.
    */
  def compact(spark: SparkSession, inputDir: String, outDir: String,
      targetFiles: Int, maxRecordsPerFile: Long = 0L): Unit = {
    val w = configure(spark).read.parquet(inputDir)
      .repartition(targetFiles)
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
      .parquet(outDir)
  }

  /** Fixture table names, in the oracle's order. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
