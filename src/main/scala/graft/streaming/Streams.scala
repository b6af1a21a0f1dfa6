package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.engine.Windowed

/** Structured Streaming layer — the reference's actual semantics
  * (SURVEY.md §2.A R1–R6), Spark-first:
  *
  *  - R1 source: `readStream` over files (offline replay) or Kafka
  *    (production; config-switchable — the connector jar is not in this
  *    container, so the Kafka branch is exercised only as a builder).
  *  - R2 dedup: `withWatermark + dropDuplicatesWithinWatermark` (exact
  *    semantics match: first-wins, state TTL'd by the watermark), plus the
  *    general explicit-state form via `transformWithState`.
  *  - R3 filter: plain `Dataset.filter` — nothing special needed.
  *  - R4 sink: checkpointed `writeStream` (parquet/kafka/memory).
  *  - R5 state store/changelog: Spark's checkpointed state store — the
  *    checkpoint dir plays the changelog-topic role; eviction by watermark
  *    (or an explicit event-time timer in the stateful processor) plays
  *    the WindowStore-retention role.
  *  - R6 timestamp extraction: the event-time `ts` column + `withWatermark`.
  *
  * Scale notes (100 TB/day stream): every stateful operator here keys its
  * state by the dedup/aggregation key, so state is partitioned across
  * executors and bounded by watermark eviction; nothing buffers unbounded
  * history and nothing funnels through the driver.
  */
object Streams {

  /** An event record — the streaming twin of the events fixture row. */
  case class Event(event_id: Long, user_id: Long, event_type: String,
      ts: java.sql.Timestamp, value: Double)

  // ----------------------------------------------------------- R1: sources

  /** Raw file-source schema: `ts` defaults to LONG for fixtures that store
    * TIMESTAMP(NANOS) — read as int64 nanos via
    * `spark.sql.legacy.parquet.nanosAsLong` (SURVEY.md G1). Newer fixture
    * generations store plain TIMESTAMP(MICROS); `events()` peeks the actual
    * footer type and substitutes it, then `Tables.normalizeEventsTs` maps
    * either encoding to the same session-zoned TIMESTAMP column.
    */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Timestamp format for the Kafka JSON codec: to_json's default
    * truncates to milliseconds — micro precision keeps the codec an exact
    * round trip of the engine's event-time values.
    */
  val jsonTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** JSON payload schema for the Kafka value bytes. */
  val jsonEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  sealed trait StreamSource
  /** Offline replay of a directory of event parquet files. */
  final case class FileStreamSource(dir: String) extends StreamSource
  /** Production source — reference op R1 (`StreamsBuilder.stream(topic)`). */
  final case class KafkaStreamSource(bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest") extends StreamSource
  /** DataSourceV2 replay log (`graft-replay`, ReplaySource.scala): genuine
    * offset/commit/admission-control semantics over a segment directory —
    * the runnable analogue of R1 in a broker-less environment.
    */
  final case class ReplayStreamSource(dir: String,
      maxFilesPerTrigger: Option[Int] = None) extends StreamSource

  /** Unbounded events DataFrame from either source, with the same columns
    * and event-time `ts` the batch loaders produce.
    */
  def events(spark: SparkSession, source: StreamSource): DataFrame = source match {
    case FileStreamSource(dir) =>
      graft.engine.Tables.configure(spark)
      // Footer-only batch peek (bounded, no data read) so the declared
      // stream schema matches whichever ts encoding this fixture
      // generation used; readStream requires an explicit schema.
      // Operational caveat: an EMPTY watch dir at definition time has no
      // footer to peek, so ONLY the cannot-infer-schema case falls back
      // to the int64-nanos assumption (logged) — a deployment whose
      // MICROS files only arrive after start should create the stream
      // once data exists (or declare the schema itself via readStream
      // directly). Genuine IO/permission failures PROPAGATE: silently
      // assuming an encoding on an unreadable dir would fail, or worse
      // misread, only at runtime.
      val tsType =
        try spark.read.parquet(dir).schema("ts").dataType
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if Option(e.getCondition).exists(c =>
                c.contains("UNABLE_TO_INFER_SCHEMA") || c.contains("PATH_NOT_FOUND")) =>
            System.err.println(
              s"[graft] no parquet footer under $dir to peek; assuming " +
                "int64-nanos ts encoding for the stream schema")
            LongType
        }
      val schema = StructType(rawEventSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = tsType) else f))
      graft.engine.Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(dir))
    case ReplayStreamSource(dir, maxFiles) =>
      val b = spark.readStream.format("graft-replay").option("path", dir)
      maxFiles.foldLeft(b)((r, n) => r.option("maxFilesPerTrigger", n.toString)).load()
    case KafkaStreamSource(bootstrap, topic, offsets) =>
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", offsets)
        .load()
        .select(from_json(col("value").cast("string"), jsonEventSchema,
          Map("timestampFormat" -> jsonTimestampFormat)).as("e"))
        .select(col("e.*"))
  }

  // --------------------------------------- incremental corpus-shard ingest

  /** Incremental corpus-shard ingest — the STREAMING face of the batch
    * `q_container_shards` loop: Structured Streaming's file source over
    * `binaryFile` discovers `.warc.gz` shard files as they LAND (the
    * checkpointed file-source log makes discovery exactly-once across
    * restarts: a file is processed in exactly one batch, ever, and a
    * re-listed directory only contributes files the log hasn't seen),
    * and every discovered shard is walked by the REAL gzip + WARC + HTTP
    * parse into one row per WARC record. Map-only — no watermark, no
    * state store; end-to-end exactly-once is the source log + the file
    * sink's manifest, the same contract the replay source proves at 97M
    * rows. At 100 TB this is the continuous-crawl shape: shards land on
    * DFS, the stream picks each up once, and the per-file parse fans out
    * across executors (one task per discovered file, the same split
    * granularity per-record gzip members give the batch scan).
    *
    * A shard that fails the strict parse emits ONE visible sentinel row
    * (`warc_type = "corrupt"`, rec_idx −1) instead of being silently
    * dropped — an ingest pipeline must be able to count what it refused.
    */
  def shardIngestStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val b = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").schema(binaryFileSchema)
    val loaded = maxFilesPerTrigger
      .foldLeft(b)((r, n) => r.option("maxFilesPerTrigger", n.toString))
      .load(dir)
    loaded.select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = "shard-(\\d+)".r.findFirstMatchIn(path)
          .map(_.group(1).toLong).getOrElse(-1L)
        graft.engine.Containers.parseWarcGz(bytes) match {
          case Some(recs) => recs.zipWithIndex.map { case (r, i) =>
            (shard, i, r.warcType, r.bodyLen, r.bodySum)
          }
          case None => Seq((shard, -1, "corrupt", 0L, 0L))
        }
      }
      .toDF("shard", "rec_idx", "warc_type", "body_len", "body_sum")
  }

  // ------------------------------------------------- R2: watermarked dedup

  /** The reference's core operator, verbatim in Spark: drop records whose
    * dedup key was already seen within the watermark delay. First
    * occurrence wins; state for keys older than the watermark is evicted —
    * exactly the `WindowStore` retention semantics.
    */
  def dedupWithinWatermark(events: DataFrame, delay: String = "1 hour",
      idCols: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming DOCUMENT dedup for an ingest pipeline: drop documents whose
    * normalized token set was already seen within the watermark. The key
    * is a fingerprint of the sorted DISTINCT tokens, so the dedup is
    * invariant to word order and repetition ("a b a" ≡ "b a") — the
    * streaming twin of batch `Dedup.qDedupDocs`-style set-normalized
    * dedup, with first-arrival-wins semantics and watermark-evicted state
    * exactly like `dedupWithinWatermark`. (64-bit fingerprint collisions
    * are the only false-positive source, ~2⁻⁶⁴ per pair; a stricter key
    * can chain a second seed.) `docs` must carry (text, ts). The key is
    * `xxhash64(Dedup.normKey(text))` — the ONE shared normalization
    * definition (graft.engine.Dedup.normTokens scaladoc), so a
    * tokenization tweak cannot silently break stream/batch parity.
    */
  def dedupDocsWithinWatermark(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    docs
      .withColumn("__fp", xxhash64(graft.engine.Dedup.normKey(col("text"))))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .drop("__fp")

  // --------------------------------- streaming near-dup (MinHash-LSH) dedup

  /** One streamed document for the near-dup ingest path. */
  case class StreamDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** One document fanned out to one of its LSH band buckets, carrying
    * its full MinHash signature for claimant verification.
    */
  case class BandedDoc(band_idx: Int, band_hash: Long, doc_id: Long,
      text: String, ts: java.sql.Timestamp, sig: Seq[Long])

  /** Stage-1 output of [[neardupStream]]: one verdict per band. `sim` is
    * the signature agreement with the bucket's claimant (< 0 ⇒ this doc
    * IS the claimant — no collision).
    */
  case class BandVerdict(doc_id: Long, text: String, ts: java.sql.Timestamp,
      sim: Double)

  /** Fraction of equal MinHash components — an unbiased Jaccard
    * estimate (E[agreement] = J), the verification step that keeps a
    * raw band collision (a CANDIDATE, common at low Jaccard on small
    * vocabularies) from being treated as a duplicate.
    */
  def sigAgreement(a: Seq[Long], b: Seq[Long]): Double = {
    var eq = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  /** Stage 1 of the streaming near-dup: per LSH bucket (band index, band
    * hash), the FIRST arrival claims the bucket and stores its SIGNATURE;
    * every later arrival — same micro-batch (ordered by (ts, doc_id)) or
    * a later one — is emitted with its signature agreement against the
    * claimant. Claims are permanent for the retention horizon (a
    * colliding-but-dissimilar document does NOT displace the claimant —
    * bucket state stays ONE signature, bounded); a document dropped for
    * a near-match elsewhere still holds the buckets it claimed. The
    * claim-then-VERIFY split is the streaming twin of the batch LSH
    * discipline (band buckets generate candidates, an exact kernel
    * confirms them — Dedup.scala): without it, any single 2-hash band
    * collision — P ≈ J² per band, so common at J ≈ 0.2 on a small
    * vocabulary — would drop genuinely distinct documents. Bucket state
    * is evicted `retentionMs` after the watermark passes the claim —
    * WindowStore-retention semantics, so state is bounded by the
    * retention horizon × bucket cardinality, never by stream length.
    */
  class BandClaimProcessor(retentionMs: Long)
      extends StatefulProcessor[(Int, Long), BandedDoc, BandVerdict] {
    @transient private var claimSig: org.apache.spark.sql.streaming.ValueState[Seq[Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      claimSig = getHandle.getValueState[Seq[Long]]("claimSig",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]](),
        TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandedDoc],
        timerValues: TimerValues): Iterator[BandVerdict] = {
      val sorted = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
      // ONE state-store lookup: get() returns null when absent — the
      // exists()+get() pair would double the per-bucket point-read cost
      // on the hot stage-1 path (review finding r17 third session).
      var cur: Seq[Long] = claimSig.get()
      sorted.iterator.map { d =>
        if (cur == null) {
          cur = d.sig
          claimSig.update(d.sig)
          getHandle.registerTimer(
            timerValues.getCurrentWatermarkInMs.max(d.ts.getTime) + retentionMs)
          BandVerdict(d.doc_id, d.text, d.ts, sim = -1.0)
        } else BandVerdict(d.doc_id, d.text, d.ts, sim = sigAgreement(cur, d.sig))
      }
    }

    override def handleExpiredTimer(key: (Int, Long), timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[BandVerdict] = {
      claimSig.clear() // retention elapsed — the bucket is claimable again (R5)
      Iterator.empty
    }
  }

  /** Stage 2 of [[neardupStream]]: a document survives iff NO band
    * verdict confirmed a near-match (max agreement < the threshold).
    * Stateless by construction — stage 1 emits all NumBands verdicts of
    * a document within the micro-batch that carried it, so after the
    * shuffle they arrive as ONE group in the SAME batch; nothing is held
    * across batches.
    */
  class DocVerdictProcessor(simThreshold: Double)
      extends StatefulProcessor[Long, BandVerdict, StreamDoc] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[BandVerdict],
        timerValues: TimerValues): Iterator[StreamDoc] = {
      var doc: StreamDoc = null
      var maxSim = -1.0
      rows.foreach { r =>
        if (doc == null) doc = StreamDoc(r.doc_id, r.text, r.ts)
        maxSim = math.max(maxSim, r.sim)
      }
      if (doc == null || maxSim >= simThreshold) Iterator.empty
      else Iterator.single(doc)
    }
  }

  /** Streaming MinHash-LSH near-dup dedup — the ingest-time twin of the
    * batch LSH family (Dedup.scala): a document is dropped iff some LSH
    * band bucket within the retention horizon is held by an earlier
    * arrival whose signature agreement is ≥ `simThreshold`; first
    * arrival wins. Identical token sets agree on every component
    * (agreement 1.0) and share all bands, so exact/permuted dups are
    * caught with certainty; ≥0.9-Jaccard near-dups band-collide with
    * P ≈ 1−3e-12 under the shared 16×2 banding and then verify at
    * E[agreement] = J. A band collision alone (common at low J) is only
    * a candidate — verification keeps distinct documents alive, exactly
    * like the batch band-then-confirm pipeline. The signature/band
    * kernel is the SAME native expression the batch queries use
    * (graft.functions.GraftExpressions.minhashBands over
    * Dedup.normTokens), so a tokenization or banding tweak cannot
    * silently break stream/batch parity — NeardupStreamSpec grades
    * survivors against a sequential fold over the same signatures, and
    * tools/NeardupStreamScale re-grades at the fifth decade with a
    * mid-stream kill.
    *
    * Scale notes: the band fan-out is map-side (NumBands rows per doc);
    * both stateful stages key by high-cardinality columns (bucket,
    * doc_id) so state partitions across executors; bucket state is one
    * signature (NumHashes longs) with event-time eviction. At 100 TB/day
    * the shuffled band rows carry the doc text — project ids+bands first
    * and re-join survivors if payloads are large (the batch family's
    * ids+bands salted shape); this ingest shape keeps the payload inline
    * because survivors must be EMITTED, not just identified.
    */
  def neardupStream(docs: Dataset[StreamDoc], delay: String = "1 hour",
      retentionMs: Long = 3600L * 1000L,
      simThreshold: Double = 0.9): Dataset[StreamDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs.toDF()
      .withColumn("__toks", graft.engine.Dedup.normTokens(col("text")))
      .withColumn("__mb", graft.functions.GraftExpressions.minhashBands(
        col("__toks"), graft.engine.Dedup.NumHashes, graft.engine.Dedup.NumBands))
      .withColumn("sig", col("__mb").getField("sig"))
      .select(col("doc_id"), col("text"), col("ts"), col("sig"),
        posexplode(col("__mb").getField("bands")).as(Seq("band_idx", "band_hash")))
      .withWatermark("ts", delay)
      .select(col("band_idx"), col("band_hash"), col("doc_id"), col("text"),
        col("ts"), col("sig"))
      .as[BandedDoc]
    banded
      .groupByKey(b => (b.band_idx, b.band_hash))
      .transformWithState(new BandClaimProcessor(retentionMs),
        TimeMode.EventTime(), OutputMode.Append())
      .groupByKey(_.doc_id)
      .transformWithState(new DocVerdictProcessor(simThreshold),
        TimeMode.None(), OutputMode.Append())
  }

  // ------------------------------------- R2 general form: explicit state

  /** Explicit-state first-wins dedup processor (transformWithState):
    * per key, forward the earliest-(ts, event_id) row of the first batch
    * that carries the key, drop everything after, and clear state via an
    * event-time timer `retention` after the watermark passes the first
    * occurrence — the explicit analogue of the reference's
    * `DeduplicationTransformer` + windowed store.
    *
    * Determinism scope: the min-(ts, event_id) tiebreak holds WITHIN one
    * micro-batch; across batches the semantics are first-ARRIVAL-wins
    * (an earlier-ts record landing in a later batch is dropped even while
    * inside the watermark) — which is what the Kafka Streams reference
    * does, since it processes one record at a time. Parity with the batch
    * twin `Dedup.qDedupFirstWins` (a pure function of the data) therefore
    * requires arrival order ~ event-time order, which is how
    * StreamingParitySpec stages its input.
    */
  class FirstWinsDedupProcessor(retentionMs: Long)
      extends StatefulProcessor[(Long, String), Event, Event] {
    @transient private var seen: ValueStateT = _
    private type ValueStateT = org.apache.spark.sql.streaming.ValueState[Long]

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("firstSeenTs", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Long, String), rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Event] = {
      if (seen.exists()) Iterator.empty
      else {
        // Deterministic survivor even if the batch iterator is unordered:
        // min by (ts, event_id), matching the batch twin's tiebreak (G4).
        val first = rows.minBy(e => (e.ts.getTime, e.event_id))
        seen.update(first.ts.getTime)
        getHandle.registerTimer(timerValues.getCurrentWatermarkInMs.max(first.ts.getTime) + retentionMs)
        Iterator.single(first)
      }
    }

    override def handleExpiredTimer(key: (Long, String), timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Event] = {
      seen.clear() // retention elapsed — same id later is NOT a duplicate (R5)
      Iterator.empty
    }
  }

  /** One emitted top-k snapshot row. `version` counts the key's state
    * updates — rows with a key's max version form its CURRENT top-k (the
    * append-mode changelog of an otherwise update-shaped result).
    */
  case class TopKRow(event_type: String, version: Long, rank: Int,
      value: Double, event_id: Long)

  /** Streaming bounded top-k per key: the state is AT MOST k (value, id)
    * pairs — the streaming face of `graft.functions.TopKAgg`, riding the
    * same TopK.merge kernel and the same (value DESC, id ASC) total
    * order, so the final snapshot is batch-parity by construction
    * (StreamingParitySpec). State never grows with the stream: a hot key
    * that sees 10⁹ events still stores k pairs — the bounded-state
    * discipline the reference's windowed dedup store models, applied to
    * a ranking aggregate. No time dependence, so no watermark and no
    * timers (TimeMode.None); a retention variant would evict via the
    * same event-time timers FirstWinsDedupProcessor uses.
    */
  class TopKProcessor(k: Int)
      extends StatefulProcessor[String, Event, TopKRow] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[(Long, Seq[(Double, Long)])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Seq[(Double, Long)])]("topk",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[(Double, Long)])](),
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TopKRow] = {
      val (version, cur) =
        if (state.exists()) state.get() else (0L, Seq.empty[(Double, Long)])
      val next = graft.functions.TopK.merge(
        cur, rows.map(e => (e.value, e.event_id)).toSeq, k)
      if (next == cur) Iterator.empty
      else {
        state.update((version + 1, next))
        next.iterator.zipWithIndex.map { case ((v, id), i) =>
          TopKRow(key, version + 1, i + 1, v, id)
        }
      }
    }
  }

  /** Running top-k events by value per event_type (bounded state). */
  def topkStream(events: Dataset[Event], k: Int = 3): Dataset[TopKRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new TopKProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  /** One emitted profile update: the user's NEW total for one type. */
  case class ProfileRow(user_id: Long, event_type: String, n_events: Long)

  /** Per-user running event-type histogram on `MapState` — the keyed
    * sub-structure surface of transformWithState (ValueState: dedup +
    * top-k; timers: retention; MapState: this). State per user is
    * O(distinct event types) — bounded by the domain, not the stream —
    * and each batch emits only the entries it changed (a changelog;
    * counts are monotone, so the latest emission per (user, type) IS
    * the current total, which is how the parity spec reads it).
    */
  class UserProfileProcessor extends StatefulProcessor[Long, Event, ProfileRow] {
    @transient private var counts:
      org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[ProfileRow] = {
      val delta = rows.foldLeft(Map.empty[String, Long]) { (m, e) =>
        m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
      }
      // State updates EAGERLY, before returning the iterator: a consumer
      // that stops pulling the output mid-iterator must not be able to
      // skip the counts.updateValue side effects (the batch would still
      // commit, permanently undercounting the unconsumed entries).
      val out = delta.toSeq.sortBy(_._1).map { case (t, n) =>
        val next = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + n
        counts.updateValue(t, next)
        ProfileRow(key, t, next)
      }
      out.iterator
    }
  }

  /** Running per-user behavior profile (bounded MapState). */
  def userProfileStream(events: Dataset[Event]): Dataset[ProfileRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor, TimeMode.None(), OutputMode.Append())
  }

  // ------------------------------------------ streaming funnel (analytics)

  /** Per-user funnel progress snapshot: step timestamps in epoch millis
    * (-1 = step not reached); `version` counts the user's state updates,
    * so max-version rows per user form the CURRENT funnel table (the
    * TopKRow changelog discipline).
    */
  case class FunnelRow(user_id: Long, version: Long, t1: Long, t2: Long, t3: Long)

  /** Streaming face of `EventAnalytics.funnelSteps` — the per-user
    * view→click→purchase state machine as a transformWithState
    * processor: THREE longs of state per user (bounded forever), each
    * event folded through the strict-order/step-horizon rules the batch
    * twin expresses with min-after joins.
    *
    * Parity scope (the FirstWinsDedupProcessor discipline): within one
    * micro-batch events are folded in (ts, event_id) order; across
    * batches processing is arrival-ordered, so a later batch carrying an
    * EARLIER view does not retroactively lower t1 the way the batch
    * twin's global min would. Streaming/batch parity therefore requires
    * arrival order ~ event-time order, which is how the spec stages
    * input — the same contract every stateful operator here documents.
    */
  class FunnelProcessor(windowMs: Long)
      extends StatefulProcessor[Long, Event, FunnelRow] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long, Long)]("funnel",
        Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[FunnelRow] = {
      val (v0, p1, p2, p3) =
        if (st.exists()) st.get() else (0L, -1L, -1L, -1L)
      val next = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        .foldLeft((p1, p2, p3)) { case ((t1, t2, t3), e) =>
          val ts = e.ts.getTime
          e.event_type match {
            case "view" if t1 < 0 => (ts, t2, t3)
            case "click" if t1 >= 0 && t2 < 0 && ts > t1 && ts <= t1 + windowMs =>
              (t1, ts, t3)
            case "purchase" if t2 >= 0 && t3 < 0 && ts > t2 && ts <= t2 + windowMs =>
              (t1, t2, ts)
            case _ => (t1, t2, t3)
          }
        }
      if (next == ((p1, p2, p3))) Iterator.empty
      else {
        st.update((v0 + 1, next._1, next._2, next._3))
        Iterator.single(FunnelRow(key, v0 + 1, next._1, next._2, next._3))
      }
    }
  }

  /** Running funnel table changelog (append-mode; current rows = max
    * version per user).
    */
  def funnelStream(events: Dataset[Event], windowHours: Int = 24): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(windowHours * 3600L * 1000L),
        TimeMode.None(), OutputMode.Append())
  }

  // ------------------------------ streaming cohort retention (analytics)

  /** One emitted row per (user, NEW day-offset): the user's cohort day
    * and the distinct offset being recorded. Each (user, offset) emits
    * AT MOST ONCE (bitmask-deduped in state), so the retention triangle
    * is a plain count over the emitted changelog —
    * `groupBy(cohort_day, day_offset).count()` ≡ the batch
    * q_cohort_retention distinct-user triangle (spec-pinned).
    */
  case class CohortRow(user_id: Long, cohort_day: java.sql.Date, day_offset: Long)

  /** Streaming face of `EventAnalytics.qCohortRetention` — the
    * incremental form of the batch self-join: per-user state is TWO
    * longs forever (first-seen epoch day + a seen-offset bitmask;
    * offsets past `maxOffset` are dropped, exactly the batch
    * truncation), each event folds in O(1). Same arrival-order parity
    * contract as FunnelProcessor: a later batch carrying an EARLIER
    * first day does not retroactively re-cohort the user — parity holds
    * when arrival order ~ event-time order, as the spec stages input.
    * Day boundaries are UTC epoch-day arithmetic on the absolute
    * timestamp — the same instant→day map the batch twin's session-UTC
    * `to_date` applies.
    */
  class CohortRetentionProcessor(maxOffset: Int)
      extends StatefulProcessor[Long, Event, CohortRow] {
    require(maxOffset >= 0 && maxOffset <= 62, s"bitmask offset cap: $maxOffset")
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("cohort",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[CohortRow] = {
      var (first, mask) = if (st.exists()) st.get() else (-1L, 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[CohortRow]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val day = Math.floorDiv(e.ts.getTime, 86400000L)
        if (first < 0) first = day
        val off = day - first
        if (off >= 0 && off <= maxOffset && (mask & (1L << off)) == 0L) {
          mask |= 1L << off
          out += CohortRow(key,
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(first)), off)
        }
      }
      if (out.nonEmpty) st.update((first, mask))
      out.iterator
    }
  }

  /** Retention changelog stream; aggregate it with
    * `groupBy(cohort_day, day_offset).count()` for the triangle.
    */
  def cohortRetentionStream(events: Dataset[Event],
      maxOffset: Int = 14): Dataset[CohortRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new CohortRetentionProcessor(maxOffset),
        TimeMode.None(), OutputMode.Append())
  }

  // ---------------------------- streaming transition matrix (analytics)

  /** One consecutive-event transition on a user's timeline. */
  case class TransitionRow(user_id: Long, from_type: String, to_type: String)

  /** Streaming face of `EventAnalytics.qEventTransitions` — per-user
    * state is ONE string forever (the last event type); each arriving
    * event emits exactly one (from, to) pair against it, so the
    * transition matrix is a plain count over the changelog:
    * `groupBy(from_type, to_type).count()` ≡ the batch lead-window
    * aggregate. Same arrival-order parity contract as the funnel and
    * cohort processors (Kafka's per-key ordering semantic): within a
    * batch rows fold in (ts, event_id) order; across batches parity
    * holds when arrival order ~ event-time order, as the spec stages
    * input.
    */
  class TransitionProcessor extends StatefulProcessor[Long, Event, TransitionRow] {
    @transient private var last:
      org.apache.spark.sql.streaming.ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[String]("last", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TransitionRow] = {
      var prev = if (last.exists()) last.get() else null
      val out = scala.collection.mutable.ArrayBuffer.empty[TransitionRow]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        if (prev != null) out += TransitionRow(key, prev, e.event_type)
        prev = e.event_type
      }
      // Eager update before returning (the UserProfileProcessor rule): a
      // half-consumed output iterator must not skip the state write.
      if (prev != null) last.update(prev)
      out.iterator
    }
  }

  /** Streaming face of the volume monitor: the per-(type, day) count
    * table maintained as an UPDATE-mode aggregation — the state IS
    * EventAnalytics.dailyCounts (one shared transform), and n is
    * strictly monotone per key, so the latest update per (type, day) is
    * max(n) over the sink (the censusUpdates discipline). The EWMA
    * convolution and anomaly flags are then a calendar-bounded
    * DERIVATION over that state (EventAnalytics.anomalyFromDaily),
    * re-run per batch by the monitor — never a corpus recompute, because
    * the state already holds the corpus reduced to (type, day) counts.
    * Two-batch parity with the batch q_anomaly_days spec'd in
    * EventAnalyticsSpec.
    */
  def dailyCountStream(events: DataFrame): DataFrame =
    graft.engine.EventAnalytics.dailyCounts(events)

  /** Streaming face of the PCA covariance: the unified (i, j, m) moment
    * table maintained as an UPDATE-mode aggregation — the state IS
    * Pca.unifiedMoments (one shared transform), 2145 keys of additive
    * sums regardless of corpus size, so ingest updates moments instead
    * of recomputing them (the q_pca_cov_delta merge algebra, online).
    * The covariance is then Pca.covFromMoments over that state — an
    * O(dim²) derivation re-run per batch, never a corpus re-scan. Unlike
    * the census counts the pair moments are NOT monotone (negative x·y
    * terms), so readers take the LATEST update per key (foreachBatch
    * upsert), not max-over-sink. Two-batch seam parity with the batch
    * q_pca_covariance spec'd in PcaSpec under the RocksDB provider.
    */
  def pcaMomentStream(embs: DataFrame): DataFrame =
    graft.engine.Pca.unifiedMoments(embs)

  /** One attribution credit: a purchase resolved to its last in-horizon
    * touch (the streaming face's output row ≡ the batch key's row).
    */
  case class AttributionRow(purchase_id: Long, user_id: Long, touch_id: Long,
      touch_type: String, t_ts: java.sql.Timestamp, p_ts: java.sql.Timestamp)

  /** Streaming face of last-touch attribution (EventAnalytics
    * .qAttribution): per-user state is ONE value — the most recent
    * touch (id, type, second-faithful ts) — replaced as views/clicks
    * arrive; a purchase reads it, checks strict-before + the 7-day
    * horizon, and emits at most one credit. Within a micro-batch a
    * key's rows process in the batch twin's (ts, event_id) total order;
    * across batches arrival must respect event time (the R5 watermark
    * contract — late touches lose, exactly like every stateful face
    * here). Constant state per user vs the batch join's per-window
    * candidate set — the online rendering. Two-batch seam parity spec'd
    * in EventAnalyticsSpec.
    */
  class AttributionProcessor
      extends StatefulProcessor[Long, Event, AttributionRow] {
    // (touch_id, touch_type, epoch_seconds, nanos)
    @transient private var touch:
      org.apache.spark.sql.streaming.ValueState[(Long, String, Long, Int)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      touch = getHandle.getValueState[(Long, String, Long, Int)]("touch",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, String, Long, Int)](),
        TTLConfig.NONE)

    // floorDiv, not `/`: truncation rounds toward zero, so a pre-1970
    // timestamp's (sec, nanos) pair would break the total order (and the
    // 7-day horizon arithmetic) against the always-non-negative getNanos —
    // Timestamp's nanos field is the floorMod fractional second, so the
    // matching seconds value is the floorDiv one.
    private def seconds(e: Event) = Math.floorDiv(e.ts.getTime, 1000L)
    private def order(e: Event) = (seconds(e), e.ts.getNanos, e.event_id)
    private def totalNanos(sec: Long, ns: Int) = sec * 1000000000L + ns

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[AttributionRow] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[AttributionRow]
      rows.toSeq.sortBy(order).foreach { e =>
        val (sec, ns) = (seconds(e), e.ts.getNanos)
        e.event_type match {
          case "view" | "click" =>
            val replace = !touch.exists() || {
              val (id, _, s0, n0) = touch.get()
              Ordering[(Long, Int, Long)].lt((s0, n0, id), (sec, ns, e.event_id))
            }
            if (replace) touch.update((e.event_id, e.event_type, sec, ns))
          case "purchase" if touch.exists() =>
            val (tid, tty, ts0, tn0) = touch.get()
            val t = totalNanos(ts0, tn0)
            val p = totalNanos(sec, ns)
            if (t < p && t >= p - 7L * 86400 * 1000000000L) {
              val tts = new java.sql.Timestamp(ts0 * 1000)
              tts.setNanos(tn0)
              out += AttributionRow(e.event_id, key, tid, tty, tts, e.ts)
            }
          case _ => ()
        }
      }
      out.iterator
    }
  }

  /** Attribution credits as an append stream, keyed per user. */
  def attributionStream(events: Dataset[Event]): Dataset[AttributionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Transition changelog stream; count it per (from_type, to_type) for
    * the matrix.
    */
  def transitionStream(events: Dataset[Event]): Dataset[TransitionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** One emitted KTable changelog row: the key's NEW current record;
    * per-key `version` makes max-version rows the current table.
    */
  case class LatestRow(user_id: Long, event_type: String, event_id: Long,
      ts: java.sql.Timestamp, value: Double, version: Long)

  /** Streaming latest-wins materialization — the KTable semantic of the
    * reference's ecosystem (a compacted topic retains the LAST value per
    * key), the dual of the first-wins dedup transformer and the
    * streaming face of batch `Dedup.lastWins`. State per key is ONE
    * record; an arriving record replaces it only when strictly newer
    * under the same (ts, tie → event_id) total order the batch twin
    * sorts by, so out-of-order arrivals lose to the held record instead
    * of regressing it, and the final max-version snapshot ≡ batch
    * lastWins by construction (StreamingParitySpec). Emissions are an
    * append-mode changelog — exactly a compacted topic's update stream.
    * No watermark needed: "current value" has no lateness cutoff; a
    * TTL'd variant would evict via the FirstWinsDedupProcessor timers.
    */
  class LatestWinsProcessor
      extends StatefulProcessor[(Long, String), Event, LatestRow] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[(Long, Event)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Event)]("latest",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Event)](),
        TTLConfig.NONE)

    // Micros-faithful recency key: Timestamp.getTime truncates to millis,
    // getNanos carries the rest; event_id is the deterministic tiebreak.
    private def recency(e: Event) = (e.ts.getTime / 1000, e.ts.getNanos, e.event_id)

    override def handleInputRows(key: (Long, String), rows: Iterator[Event],
        timerValues: TimerValues): Iterator[LatestRow] = {
      val newest = rows.maxBy(recency)
      val (version, prev) =
        if (state.exists()) state.get() else (0L, null: Event)
      if (prev != null && Ordering[(Long, Int, Long)].gteq(recency(prev), recency(newest)))
        Iterator.empty
      else {
        state.update((version + 1, newest))
        Iterator.single(LatestRow(key._1, key._2, newest.event_id,
          newest.ts, newest.value, version + 1))
      }
    }
  }

  // -------------------------------------- state-schema evolution (upgrade)

  /** Evolved dedup state: v1 stored only `firstSeenTs: Long`; v2 adds a
    * suppressed-duplicate counter. The operational cliff this models:
    * every long-running streaming deployment eventually needs a state
    * field it didn't launch with.
    */
  case class DedupStateV2(firstSeenTs: Long, dupCount: Long)

  /** One row per LIVE dedup key in a v2 checkpoint: the duplicate census
    * (how many arrivals the key has suppressed so far). Produced by
    * [[dupCensus]] from the state store OFFLINE — the output stream stays
    * `Event`-typed, and expiry only clears state.
    */
  case class DedupCensus(user_id: Long, event_type: String, dup_count: Long)

  /** The v2 payoff read path: the per-key duplicate census, read from the
    * checkpoint's state store with Spark's `statestore` batch source
    * rather than emitted into the dedup output (which would force a sum
    * output type on every downstream consumer). Point it at a STOPPED or
    * quiescent v2 query's checkpoint; it reflects the last committed
    * batch. Scale: the state source reads each store shard in place — one
    * task per state partition, nothing driver-sized.
    */
  def dupCensus(spark: SparkSession, checkpointLocation: String): DataFrame =
    spark.read.format("statestore")
      .option("path", checkpointLocation)
      .option("stateVarName", "firstSeenTs")
      .load()
      .select(col("key._1").as("user_id"), col("key._2").as("event_type"),
        col("value.dupCount").as("dup_count"))

  /** v2 of [[FirstWinsDedupProcessor]] — same first-wins forwarding, but
    * the state carries `dupCount`; the census is read offline from the
    * state store by [[dupCensus]] (expiry itself only clears state).
    *
    * == The upgrade contract (StateEvolutionSpec) ==
    *
    * Restarting v2 FROM A V1 CHECKPOINT fails fast: the default
    * (UnsafeRow) state encoding is positional, so the state store
    * validates the stored schema against the processor's and aborts with
    * `STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE` rather than silently
    * misreading v1 bytes as v2 rows — the spec pins that failure mode.
    * The supported upgrade is DRAIN + RE-SEED via the batch twin:
    *
    *  1. drain v1 (process pending input, stop; the sink now holds every
    *     v1 emission),
    *  2. derive v2 state from the PROCESSED PREFIX with the batch twin
    *     [[dedupStateSeedV2]] (a pure aggregation — exactly the
    *     batch/streaming-parity discipline the rest of this file pins),
    *  3. start v2 at a FRESH checkpoint with that seed as
    *     transformWithState INITIAL STATE, consuming post-cutover input.
    *
    * Keys seeded in step 3 keep deduplicating across the cutover (no
    * re-emission, counters continue), so the upgrade is invisible
    * downstream. (Spark's Avro state encoding can evolve SOME changes
    * in place — add/remove/reorder nullable fields — but ties the
    * deployment to Avro-compatible steps forever; the drain+re-seed
    * recipe has no such constraint and re-uses the batch twin the
    * parity specs already trust.)
    */
  class FirstWinsDedupProcessorV2(retentionMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        (Long, String), Event, Event, DedupStateV2] {
    @transient private var seen:
      org.apache.spark.sql.streaming.ValueState[DedupStateV2] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // Deliberately the SAME state-variable name v1 uses: an upgrade
      // evolves the VALUE SCHEMA of an existing variable (Long → struct),
      // which is exactly the change the state store validates on restart.
      seen = getHandle.getValueState[DedupStateV2]("firstSeenTs",
        Encoders.product[DedupStateV2], TTLConfig.NONE)

    override def handleInitialState(key: (Long, String), initial: DedupStateV2,
        timerValues: TimerValues): Unit = {
      seen.update(initial)
      getHandle.registerTimer(
        timerValues.getCurrentWatermarkInMs.max(initial.firstSeenTs) + retentionMs)
    }

    override def handleInputRows(key: (Long, String), rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Event] = {
      val rs = rows.toSeq
      if (seen.exists()) {
        val s = seen.get()
        seen.update(s.copy(dupCount = s.dupCount + rs.size))
        Iterator.empty
      } else {
        val first = rs.minBy(e => (e.ts.getTime, e.event_id))
        seen.update(DedupStateV2(first.ts.getTime, rs.size - 1L))
        getHandle.registerTimer(
          timerValues.getCurrentWatermarkInMs.max(first.ts.getTime) + retentionMs)
        Iterator.single(first)
      }
    }

    // Expiry ONLY clears state (retention, reference op R5). The census
    // the state accumulated is not emitted here — the output stays
    // Event-typed; [[dupCensus]] reads it from the store offline.
    override def handleExpiredTimer(key: (Long, String), timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Event] = {
      seen.clear()
      Iterator.empty
    }
  }

  /** Batch twin of the v2 state: per (user_id, event_type), the earliest
    * (ts, event_id) arrival and the count of everything after it — the
    * re-seed frame for the drain+re-seed upgrade. Pure aggregation over
    * the processed prefix; one shuffle on the state key at any scale.
    */
  def dedupStateSeedV2(processed: Dataset[Event]): DataFrame = {
    import processed.sparkSession.implicits._
    processed
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroups { (k, it) =>
        val rs = it.toSeq
        val first = rs.minBy(e => (e.ts.getTime, e.event_id))
        (k._1, k._2, DedupStateV2(first.ts.getTime, rs.size - 1L))
      }
      .toDF("user_id", "event_type", "state")
  }

  /** v2 stateful dedup with optional migrated initial state (None → a
    * fresh deployment; Some(seed) → the drain+re-seed upgrade path).
    */
  def dedupStatefulV2(events: Dataset[Event], delay: String = "1 hour",
      retentionMs: Long = 3600L * 1000,
      initialState: Option[DataFrame] = None): Dataset[Event] = {
    import events.sparkSession.implicits._
    val keyed = events
      .withWatermark("ts", delay)
      .groupByKey(e => (e.user_id, e.event_type))
    initialState match {
      case None =>
        keyed.transformWithState(new FirstWinsDedupProcessorV2(retentionMs),
          TimeMode.EventTime(), OutputMode.Append())
      case Some(seed) =>
        // groupByKey on the (user_id, event_type) pair — the SAME key
        // function shape as the input side (state co-partitions by key).
        val seedByKey = seed
          .select(col("user_id"), col("event_type"), col("state"))
          .as[(Long, String, DedupStateV2)]
          .map(t => ((t._1, t._2), t._3))
          .groupByKey(_._1)
          .mapValues(_._2)
        keyed.transformWithState(new FirstWinsDedupProcessorV2(retentionMs),
          TimeMode.EventTime(), OutputMode.Append(), seedByKey)
    }
  }

  /** Running current-value-per-key table (KTable view) of the event log. */
  def ktableStream(events: Dataset[Event]): Dataset[LatestRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new LatestWinsProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Stateful dedup on (user_id, event_type) with explicit retention.
    * Requires the RocksDB state store provider (transformWithState
    * contract) — set by `sessionConf` below.
    */
  def dedupStateful(events: Dataset[Event], delay: String = "1 hour",
      retentionMs: Long = 3600L * 1000): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new FirstWinsDedupProcessor(retentionMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Session confs transformWithState needs (call before building the
    * streaming query; harmless for every other operator).
    */
  def sessionConf(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark
  }

  // ------------------------------ windowed aggregations (shared bodies)

  /** Streaming tumbling counts — same body as the batch q_tumbling_window. */
  def tumblingCounts(events: DataFrame, delay: String = "1 hour"): DataFrame =
    Windowed.tumblingAgg(events.withWatermark("ts", delay))

  /** Streaming sliding counts — same body as the batch q_sliding_window. */
  def slidingCounts(events: DataFrame, delay: String = "1 hour"): DataFrame =
    Windowed.slidingAgg(events.withWatermark("ts", delay))

  /** Streaming sessionization (30-min gap) — same body the parity spec
    * compares against the batch lag+running-sum twin.
    */
  def sessionCounts(events: DataFrame, delay: String = "1 hour"): DataFrame =
    Windowed.sessionAgg(events.withWatermark("ts", delay))

  // --------------------------------------- stream-stream interval join

  /** Windowed stream-stream join — the Spark rendering of Kafka Streams'
    * `KStream.join(KStream, JoinWindows.of(...))` and its
    * `leftJoin`/`outerJoin` siblings (the DSL operators next to the
    * reference's dedup transform): for every left event, matching right
    * events with the same key whose timestamp falls in
    * [l.ts − before, l.ts]. Both sides are watermarked, so each side's
    * join state is bounded and evicted exactly like the dedup store —
    * Spark requires the interval condition + both watermarks for state
    * cleanup in EVERY stream-stream join type, and for the outer types
    * they additionally drive null emission: an unmatched outer-side row
    * is held in state until the watermark proves no in-interval partner
    * can still arrive, then emitted exactly once null-padded (the
    * KStream leftJoin/outerJoin grace-expiry semantics; spec'd in
    * StreamingParitySpec).
    *
    * `joinType`: "inner" (default), "left_outer", "right_outer", or
    * "full_outer". `left`/`right` must carry (`keyCol`, ts). Output:
    * key, l_ts, r_ts plus the caller's projected columns via `select`
    * downstream.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      before: String = "30 minutes", delay: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", delay).alias("l")
    val r = right.withWatermark("ts", delay).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $before") &&
        col("r.ts") <= col("l.ts"),
      joinType)
  }

  // ------------------------------------------ stream-static enrichment

  /** Stream-static enrichment join — the Spark rendering of Kafka
    * Streams' `KStream.join(GlobalKTable)` for a FIXED dim snapshot: the
    * dim is broadcast (GlobalKTable = replicated to every instance), no
    * watermark and no stream-side state because the static side never
    * retracts; left join keeps unmatched events (KStream#leftJoin),
    * inner drops them. CONTRACT: a path-based static side pins its FILE
    * LISTING when the query starts (the plan captures the file index —
    * `refreshByPath` does not reach it), so an in-place dim rewrite
    * mid-query fails the scan; for a dim that updates while the stream
    * runs — the actual GlobalKTable semantic — use [[refreshingEnrich]].
    */
  def enrichWithTable(events: DataFrame, dim: DataFrame, keyCol: String,
      joinType: String = "left"): DataFrame =
    events.join(broadcast(dim), Seq(keyCol), joinType)

  /** Continuously-updated GlobalKTable enrich: a `foreachBatch` transform
    * that re-reads the dim directory FRESH each micro-batch, so a
    * snapshot rewritten between batches (e.g. by
    * [[graft.engine.Dedup.mergeSnapshot]] maintenance) is joined at its
    * current state — Kafka Streams' GlobalKTable keeps its store current
    * by consuming the topic; here currency comes from per-batch
    * re-resolution, the Spark-idiomatic equivalent for file-backed dims.
    * Compose with [[ForeachBatchSink]]:
    * `ForeachBatchSink((df, id) => sink(refreshingEnrich(dimDir, key)(df)), ckpt)`.
    * The per-batch listing cost is one directory scan of the (small) dim.
    */
  def refreshingEnrich(dimDir: String, keyCol: String,
      joinType: String = "left")(batch: DataFrame): DataFrame =
    batch.join(broadcast(batch.sparkSession.read.parquet(dimDir)),
      Seq(keyCol), joinType)

  /** Online boilerplate gate — the production split of the
    * [[graft.engine.TextClean]] census family: the census is built
    * offline (`boilerplateCensus`), kept fresh by the ADDITIVE delta
    * merge (`mergeCensus` / q_boilerplate_delta), and each incoming
    * micro-batch of documents is TAGGED against the stored artifact
    * here (per-doc n_grams / n_hits / flagged via the shared
    * [[graft.engine.TextClean.tagBoilerplate]] core). Re-read fresh
    * per batch like [[refreshingEnrich]], but — unlike a dim
    * snapshot — the census is corpus-derived and NOT broadcast by
    * contract: the batch's gram fan-out joins it on the gram key.
    * Compose with [[ForeachBatchSink]]; per-doc tags depend only on
    * the doc and the census state at batch time, so replays under the
    * same census are idempotent.
    */
  def boilerplateGateBatch(censusDir: String, minDocs: Long = 2L)
      (batch: DataFrame): DataFrame =
    graft.engine.TextClean.tagBoilerplate(batch,
      batch.sparkSession.read.parquet(censusDir)
        .where(col("n_docs") >= minDocs))

  // ------------------------------------------------------------ R4: sinks

  sealed trait StreamSink
  /** Exactly-once file sink; `checkpoint` is the WAL + state root (R5). */
  final case class ParquetStreamSink(path: String, checkpoint: String) extends StreamSink
  /** Production sink — reference op R4 (`.to(outputTopic)`). */
  final case class KafkaStreamSink(bootstrapServers: String, topic: String,
      checkpoint: String) extends StreamSink
  /** In-memory table sink (tests / debugging). */
  final case class MemoryStreamSink(name: String, checkpoint: Option[String] = None)
      extends StreamSink
  /** Programmatic sink: `fn(batchDf, batchId)` per micro-batch — the
    * escape hatch for destinations without a native connector (JDBC
    * upserts, external indexes, multi-table fan-out). The batch ids are
    * the replay contract: after a restart a batch may be re-delivered
    * with the SAME id, so `fn` must be idempotent per (destination,
    * batchId) — exactly-once end to end is `fn`'s responsibility, the
    * checkpoint only guarantees at-least-once with stable ids.
    */
  final case class ForeachBatchSink(fn: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None) extends StreamSink

  /** Start `df` into `sink` with the given output mode. Returns the
    * running query; callers own `awaitTermination`/`stop`.
    *
    * `trigger`: `None` = default micro-batching (run continuously,
    * process as data arrives). `Some(Trigger.AvailableNow())` is the
    * BACKFILL mode — process everything currently available in bounded
    * micro-batches (respecting source rate limits like
    * `maxFilesPerTrigger`), then STOP, checkpointing normally so a later
    * run (backfill or continuous) resumes where it left off. That is the
    * standard "bootstrap the corpus index from a historical corpus" move:
    * same query, same exactly-once checkpoint contract, bounded run.
    */
  def start(df: DataFrame, sink: StreamSink,
      mode: OutputMode = OutputMode.Append(),
      trigger: Option[Trigger] = None): StreamingQuery = {
    def base[T](w: DataStreamWriter[T]): DataStreamWriter[T] =
      trigger.foldLeft(w.outputMode(mode))((ww, t) => ww.trigger(t))
    sink match {
      case ParquetStreamSink(path, ckpt) =>
        base(df.writeStream).format("parquet")
          .option("path", path).option("checkpointLocation", ckpt).start()
      case KafkaStreamSink(bootstrap, topic, ckpt) =>
        val value = to_json(struct(df.columns.map(col).toIndexedSeq: _*),
          Map("timestampFormat" -> jsonTimestampFormat))
        base(df.select(lit(null).cast("string").as("key"), value.as("value")).writeStream)
          .format("kafka")
          .option("kafka.bootstrap.servers", bootstrap).option("topic", topic)
          .option("checkpointLocation", ckpt).start()
      case MemoryStreamSink(name, ckpt) =>
        val w = base(df.writeStream).format("memory").queryName(name)
        ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
      case ForeachBatchSink(fn, ckpt) =>
        val w = base(df.writeStream)
          .foreachBatch((batch: DataFrame, id: Long) => fn(batch, id))
        ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
    }
  }

  // ---------------------------- incremental near-dup ingest (foreachBatch)

  /** One ingest step of [[incrementalNearDupIngest]] — public so batch
    * users can drive the same dedup-delta-against-snapshot logic
    * directly. `batch` must carry (doc_id, text, ...); survivors land in
    * `corpusDir/batch_<id>` with their normalized token sets and LSH
    * bands, so FUTURE batches probe a persisted, pre-banded corpus index
    * and only the new slice ever pays signature cost.
    *
    * Idempotent per batchId (the foreachBatch replay contract): a replay
    * of an already-ingested batch finds its output directory's
    * `_GRAFT_COMMITTED` marker and returns without touching the corpus.
    * A marker — not mere directory existence — is the ingested test,
    * because the parquet write is non-atomic: a crash mid-write leaves
    * a partial `batch_<id>` directory, which the replay DELETES and
    * rewrites (directory-existence gating would skip the batch — silent
    * loss — and later batches would probe the partial files as corpus
    * state). The marker is written by THIS method after the parquet
    * write returns (not the committer's `_SUCCESS`, which disappears
    * when `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` — a
    * common object-store setting that would otherwise silently disable
    * cross-batch dedup). The corpus probe likewise reads only
    * marker-committed batches.
    *
    * All corpus-state IO goes through the Hadoop FileSystem API resolved
    * from the path itself, so the persisted corpus index works unchanged
    * on HDFS/S3A/local — where a 100 TB corpus actually lives.
    *
    * Dedup policy, in order: (1) within the batch, locally-minimal docs
    * survive (every doc that is the larger id of some ≥τ pair drops —
    * the PipelineMain pair policy); (2) survivors that near-dup ANY
    * corpus doc drop (the corpus, being earlier, always wins —
    * first-arrival-wins across batches, exactly the streaming dedup
    * semantic of `dropDuplicatesWithinWatermark` lifted to NEAR
    * duplicates, with the persisted corpus as unbounded-retention state).
    */
  def ingestBatch(batch: DataFrame, corpusDir: String, batchId: Long,
      tauNum: Int = 9, tauDen: Int = 10, threshold: Double = 0.9,
      shape: graft.engine.Dedup.LshShape = graft.engine.Dedup.Auto()): Unit = {
    import graft.engine.Dedup
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val root = new Path(corpusDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val target = new Path(root, f"batch_$batchId%06d")
    val Marker = "_GRAFT_COMMITTED"
    if (fs.exists(new Path(target, Marker))) return // replayed batch — already ingested
    if (fs.exists(target)) fs.delete(target, true) // partial dir from a crashed write
    val staged = Dedup.fanOut(batch).withColumn("toks", Dedup.normTokens(col("text")))
    val sigs = Dedup.signatures(staged).where(size(col("toks")) > 0).localCheckpoint()
    val within = Dedup.lshNearDupPairs(sigs, "toks", tauNum, tauDen, threshold, shape)
    val afterWithin = sigs
      .join(within.select(col("doc_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val parts = committedBatchDirs(fs, root)
    val survivors =
      if (parts.isEmpty) afterWithin
      else {
        // mergeSchema: a long-lived corpus index gains columns across
        // months of batches (Tables.readMergedSchema scaladoc); a plain
        // read would type the scan from whichever footer it sampled.
        // The probe needs only the three index columns, which every
        // schema version carries.
        val corpus = spark.read.option("mergeSchema", "true").parquet(parts: _*)
          .select(col("doc_id"), col("toks"), col("bands"))
        val vsCorpus = Dedup.nearDupAgainst(afterWithin, corpus, "toks",
          tauNum, tauDen, threshold, shape)
        afterWithin.join(vsCorpus.select(col("doc_a").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      }
    survivors.write.parquet(target.toString)
    // Marker AFTER the write returns — completing the marker-gated
    // idempotency protocol independent of committer configuration.
    fs.create(new Path(target, Marker), true).close()
  }

  /** Streaming corpus ingest with NEAR-duplicate suppression: each
    * micro-batch is deduped within itself, then against every earlier
    * survivor, and its survivors are appended to the persisted corpus —
    * the reference's first-wins dedup semantic lifted from exact ids to
    * ≥τ token-set Jaccard, with the corpus itself as the (restartable,
    * parquet-backed) state store instead of opaque executor state.
    *
    * Scale notes: per batch the work is O(batch signatures) + one banded
    * probe of the corpus index (Broadcast while it fits, `Salted` past
    * that — `shape` is the standard LshShape dial); corpus signatures
    * are computed once, at ingest, never recomputed. State recovery
    * after a crash is reading a directory.
    */
  def incrementalNearDupIngest(docs: DataFrame, corpusDir: String, checkpoint: String,
      tauNum: Int = 9, tauDen: Int = 10, threshold: Double = 0.9,
      shape: graft.engine.Dedup.LshShape = graft.engine.Dedup.Auto(),
      trigger: Option[Trigger] = None): StreamingQuery =
    start(docs, ForeachBatchSink(
      (b, id) => ingestBatch(b, corpusDir, id, tauNum, tauDen, threshold, shape),
      Some(checkpoint)), trigger = trigger)

  /** Bootstrap the corpus index from a HISTORICAL document directory —
    * the backfill face of [[incrementalNearDupIngest]]: a file-source
    * stream over `docsDir` (bounded to `maxFilesPerTrigger` files per
    * micro-batch so one run never bites off more state than an executor
    * round can chew) under `Trigger.AvailableNow` — drain everything
    * present, then stop. Because each chunk passes through the SAME
    * marker-gated ingest, the resulting corpus carries first-arrival-wins
    * survivors exactly as if the history had streamed in live, and the
    * checkpoint lets the subsequent live query continue from the
    * backfill's high-water mark. Blocks until the drain completes.
    */
  def backfillNearDupIngest(spark: SparkSession, docsDir: String,
      schema: StructType, corpusDir: String, checkpoint: String,
      maxFilesPerTrigger: Int = 4,
      tauNum: Int = 9, tauDen: Int = 10, threshold: Double = 0.9,
      shape: graft.engine.Dedup.LshShape = graft.engine.Dedup.Auto()): Unit = {
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
    val q = incrementalNearDupIngest(docs, corpusDir, checkpoint,
      tauNum, tauDen, threshold, shape, trigger = Some(Trigger.AvailableNow()))
    try q.awaitTermination() finally q.stop()
  }

  /** One micro-batch of incremental-aggregate maintenance: the batch's
    * per-(day, event_type) partials land in an idempotent, marker-gated
    * `batch_<id>` directory — the same crash-safety protocol as
    * [[ingestBatch]] (committed only when the marker exists; partial
    * directories from crashed writes are deleted and rewritten on
    * replay). Because the merge algebra is associative and
    * slice-agnostic (Incremental.mergePartialsFrame), slicing by
    * micro-batch instead of by day changes nothing downstream.
    */
  def partialsBatch(batch: DataFrame, partialsDir: String, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val root = new Path(partialsDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val target = new Path(root, f"batch_$batchId%06d")
    val Marker = "_GRAFT_COMMITTED"
    if (fs.exists(new Path(target, Marker))) return
    if (fs.exists(target)) fs.delete(target, true)
    batch
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.engine.Relational.cents(col("value"))).as("sum_value_cents"))
      .write.parquet(target.toString)
    fs.create(new Path(target, Marker), true).close()
  }

  // ------------------------------------- streaming keyed upsert (CDC apply)

  /** One micro-batch of streaming keyed upsert: merge `batch` into the
    * persisted snapshot under `dir` with latest-wins-by-`order` per
    * `keyCols` — the file-backed KTable materialization (a compacted
    * topic's table face, applied per micro-batch). Each batch writes a
    * NEW versioned dir `v_<batchId>` committed by the shared
    * `_GRAFT_COMMITTED` marker protocol, then prunes older committed
    * versions: the merge STREAMS from the previous version's files into
    * the next (no read-and-overwrite-in-place hazard, no checkpoint
    * materialization), a crashed write leaves an uncommitted dir that
    * replay deletes, and a replayed batch id short-circuits on its
    * marker — so the sink is exactly-once-effective over retries.
    * Readers resolve [[readSnapshotVersion]]; single writer assumed
    * (the streaming query is the only maintainer).
    *
    * `tombstoneCol`: when set, delta rows with it true DELETE their key
    * ([[graft.engine.Dedup.mergeSnapshotWithDeletes]] semantics —
    * a stale tombstone loses to a newer live row, re-inserts resurrect).
    */
  def upsertBatch(batch: DataFrame, dir: String, batchId: Long,
      keyCols: Seq[String], order: Seq[Column],
      tombstoneCol: Option[String] = None): Unit = {
    import org.apache.hadoop.fs.Path
    import graft.engine.Dedup
    val spark = batch.sparkSession
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val target = new Path(root, f"v_$batchId%06d")
    val Marker = "_GRAFT_COMMITTED"
    if (fs.exists(new Path(target, Marker))) return // replayed, already applied
    if (fs.exists(target)) fs.delete(target, true)  // crashed partial write
    val corpus = readSnapshotVersion(spark, dir).getOrElse(batch.limit(0))
    val merged = tombstoneCol match {
      case Some(t) => Dedup.mergeSnapshotWithDeletes(corpus, batch, keyCols, order, t)
      case None => Dedup.mergeSnapshot(corpus, batch, keyCols, order)
    }
    merged.write.parquet(target.toString)
    fs.create(new Path(target, Marker), true).close()
    fs.listStatus(root).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v_") &&
        st.getPath.getName < target.getName &&
        fs.exists(new Path(st.getPath, Marker)))
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Sweep UNCOMMITTED batch/version directories — the cleanup half of
    * the `_GRAFT_COMMITTED` marker protocol. [[ingestBatch]] deletes a
    * crashed batch's partial directory only when that SAME batchId
    * replays; an orphan whose id never replays (checkpoint advanced, a
    * manual job died) stays on disk forever. Graft's own readers skip
    * it (they list marker-committed dirs only), but any OTHER consumer
    * doing a plain recursive read — the normal way downstream tools
    * consume a parquet corpus — would ingest the partial rows. Vacuum
    * makes the directory safe for everyone: after it runs, every file
    * under `dir` belongs to a committed batch.
    *
    * `graceMs` guards the inherent race with an IN-FLIGHT writer (whose
    * directory legitimately has no marker yet): only directories whose
    * latest file modification is older than the grace window are
    * swept. The default (24 h) is far beyond any batch write; tests
    * pass 0 for immediacy. O(directories) metadata calls, nothing
    * scanned; returns the swept names as the audit trail (the
    * expirePartitionsBefore contract).
    */
  def vacuumUncommitted(spark: SparkSession, dir: String,
      graceMs: Long = 24L * 3600 * 1000): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val cutoff = System.currentTimeMillis() - graceMs
    def newestMtime(p: Path): Long = {
      val children = fs.listStatus(p)
      (fs.getFileStatus(p).getModificationTime +:
        children.map(st => if (st.isDirectory) newestMtime(st.getPath)
          else st.getModificationTime).toSeq).max
    }
    fs.listStatus(root).toIndexedSeq
      .filter(st => st.isDirectory &&
        !fs.exists(new Path(st.getPath, "_GRAFT_COMMITTED")) &&
        newestMtime(st.getPath) <= cutoff)
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
      .sorted
  }

  /** The latest committed snapshot version under `dir`, if any. */
  def readSnapshotVersion(spark: SparkSession, dir: String): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    fs.listStatus(root).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v_") &&
        fs.exists(new Path(st.getPath, "_GRAFT_COMMITTED")))
      .map(_.getPath).sortBy(_.getName).lastOption
      .map(p => graft.engine.Tables.configure(spark).read.parquet(p.toString))
  }

  /** Standing streaming upsert: a changelog stream maintained as a keyed
    * snapshot table — compose with [[start]].
    */
  def upsertSink(dir: String, keyCols: Seq[String], order: Seq[Column],
      tombstoneCol: Option[String] = None,
      checkpoint: Option[String] = None): StreamSink =
    ForeachBatchSink(
      (b, id) => upsertBatch(b, dir, id, keyCols, order, tombstoneCol), checkpoint)

  // --------------------------------------------- DQ-gated streaming ingest

  /** One micro-batch through the data-quality gate: evaluate `rules`
    * ([[graft.engine.Profile.check]] — one aggregation pass) and land
    * the WHOLE batch marker-committed under `corpusDir` if every rule
    * passes, else under `quarantineDir` with a `_GRAFT_DQ_REPORT.json`
    * naming the failing rules and violation counts (the
    * inspect-and-replay artifact; underscore-prefixed so parquet
    * discovery skips it). Batch-level routing is deliberate: row-level
    * repair is the quarantine LOADER's job at the parse edge
    * (Tables.readCsvQuarantine); the gate's job is "never merge a batch
    * that violates the contract". Returns whether the batch passed.
    *
    * Replay-idempotent BECAUSE rules are deterministic: a replayed batch
    * re-evaluates to the same verdict, lands on the same dir, and
    * short-circuits on its marker. The batch is localCheckpointed so
    * check + write read one materialization, not two source replays.
    */
  def dqGateBatch(batch: DataFrame, rules: Seq[graft.engine.Profile.Rule],
      corpusDir: String, quarantineDir: String, batchId: Long): Boolean = {
    import org.apache.hadoop.fs.Path
    val b = batch.localCheckpoint()
    try {
      val report = graft.engine.Profile.check(b, rules).collect() // ≤ |rules| rows
      val ok = report.forall(_.getAs[Boolean]("passed"))
      val root = new Path(if (ok) corpusDir else quarantineDir)
      val fs = root.getFileSystem(b.sparkSession.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      val target = new Path(root, f"batch_$batchId%06d")
      val Marker = "_GRAFT_COMMITTED"
      if (fs.exists(new Path(target, Marker))) return ok // replayed, same verdict
      if (fs.exists(target)) fs.delete(target, true)
      b.write.parquet(target.toString)
      if (!ok) {
        // Rule names are JSON-safe by construction: Profile.check
        // rejects names outside [A-Za-z0-9_.- ] before this runs.
        val failing = report.filterNot(_.getAs[Boolean]("passed"))
          .map(r => s"""{"rule":"${r.getString(0)}","n_violations":${r.getLong(1)}}""")
          .mkString("[", ",", "]")
        val out = fs.create(new Path(target, "_GRAFT_DQ_REPORT.json"), true)
        out.write(failing.getBytes("UTF-8")); out.close()
      }
      fs.create(new Path(target, Marker), true).close()
      ok
    } finally { b.unpersist(); () }
  }

  /** Standing DQ-gated ingest: compose with [[start]]. */
  def dqGatedSink(rules: Seq[graft.engine.Profile.Rule],
      corpusDir: String, quarantineDir: String,
      checkpoint: Option[String] = None): StreamSink =
    ForeachBatchSink(
      (b, id) => { dqGateBatch(b, rules, corpusDir, quarantineDir, id); () },
      checkpoint)

  /** Standing incremental-aggregate pipeline: the streaming face of
    * engine.Incremental — partial aggregates maintained per micro-batch,
    * any date range answered later by merging the committed partials
    * (no event rescan, state recovery = reading a directory).
    */
  def incrementalPartialsIngest(events: DataFrame, partialsDir: String,
      checkpoint: String): StreamingQuery =
    start(events, ForeachBatchSink(
      (b, id) => partialsBatch(b, partialsDir, id), Some(checkpoint)))

  /** Merge every COMMITTED streamed partial for [from, until). */
  def mergeStreamedPartials(spark: SparkSession, partialsDir: String,
      from: String, until: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(partialsDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = committedBatchDirs(fs, root)
    require(committed.nonEmpty, s"no committed partials under $partialsDir")
    graft.engine.Incremental.mergePartialsFrame(
      spark.read.parquet(committed: _*)
        .where(col("day") >= lit(from).cast("date") &&
          col("day") < lit(until).cast("date")))
  }

  // ------------------------------------ streaming assembly pipeline

  /** Committed `batch_*` directories under `root`, sorted. */
  private def committedBatchDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[String] = {
    import org.apache.hadoop.fs.Path
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_") &&
        fs.exists(new Path(st.getPath, "_GRAFT_COMMITTED")))
      .map(_.getPath.toString).sorted
  }

  /** One micro-batch through the INGEST half of the assembly pipeline
    * (engine.Assembly gone incremental — the r7 "streaming face" gap):
    * normalized exact dedup within the batch (first-wins by doc_id)
    * and against every earlier committed survivor (first-arrival-wins
    * across batches, the persisted key index as state — the
    * q_delta_new_docs anti-join per batch), then exact word-n-gram
    * decontamination against `benchGrams` (the benchmark's distinct
    * grams — static for the life of the pipeline, so the broadcast
    * probe is map-side per batch, corpus text never shuffles).
    * Survivors land marker-committed under `cleanDir` carrying their
    * `__norm` key, so later batches anti-join on stored keys without
    * re-normalizing history.
    *
    * Deliberately NOT per-batch: mixture rebalance and shard
    * assignment need GLOBAL counts/rates, so they stay a snapshot
    * operation over the accumulated clean corpus
    * ([[assembleSnapshot]]) — dedup + decontamination are exactly the
    * incrementally-computable prefix of the batch pipeline
    * (Assembly.qPipelineAssembly), and splitting there keeps every
    * per-batch plan delta-proportional.
    */
  def assemblyIngestBatch(batch: DataFrame, cleanDir: String, batchId: Long,
      benchGrams: DataFrame, n: Int = 5): Unit = {
    import graft.engine.{Assembly, Dedup}
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val root = new Path(cleanDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val target = new Path(root, f"batch_$batchId%06d")
    val Marker = "_GRAFT_COMMITTED"
    if (fs.exists(new Path(target, Marker))) return // replayed — already landed
    if (fs.exists(target)) fs.delete(target, true) // crashed partial write
    val normed = Dedup.fanOut(batch)
      .withColumn("__norm", Dedup.normKey(col("text")))
    val within = Dedup.firstWins(normed, Seq("__norm"), Seq("doc_id"))
    val parts = committedBatchDirs(fs, root)
    val novel =
      if (parts.isEmpty) within
      else within.join(
        spark.read.option("mergeSchema", "true").parquet(parts: _*).select("__norm"),
        Seq("__norm"), "left_anti")
    val contaminated = Assembly.wordNgrams(novel, "text", "doc_id", n)
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select("doc_id").distinct()
    val clean = novel.join(contaminated, Seq("doc_id"), "left_anti")
    clean.write.parquet(target.toString)
    fs.create(new Path(target, Marker), true).close()
  }

  /** Materialize the training mix from the accumulated clean corpus:
    * uniform-language rebalance with rates over the CURRENT snapshot,
    * then the deterministic shard/pos permutation — the globally-rated
    * suffix of the assembly pipeline, run on demand before a training
    * read (cost: one counting aggregate, a broadcast rate table +
    * map-side filter, and the one shard hash shuffle — delta-
    * independent but cheap, no corpus text shuffle except the shard
    * exchange every training layout pays). Emits (doc_id, lang,
    * n_tokens, shard, pos).
    */
  def assembleSnapshot(spark: SparkSession, cleanDir: String,
      nShards: Int = 8): DataFrame = {
    import graft.engine.Assembly
    import org.apache.hadoop.fs.Path
    val root = new Path(cleanDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = committedBatchDirs(fs, root)
    require(parts.nonEmpty, s"no committed assembly batches under $cleanDir")
    val corpus = spark.read.option("mergeSchema", "true").parquet(parts: _*)
    val balanced = Assembly.rebalanceUniform(corpus, "lang", "doc_id")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Assembly.shuffleShards(balanced, "doc_id", nShards)
  }

  /** Standing assembly ingest: dedup + decontaminate every micro-batch
    * into `cleanDir` (compose with [[start]]). The benchmark's gram
    * index is computed ONCE here and pinned with localCheckpoint — per
    * batch it is only re-broadcast, never re-derived.
    */
  def assemblySink(benchmark: DataFrame, cleanDir: String,
      checkpoint: Option[String] = None, n: Int = 5): StreamSink = {
    import graft.engine.Assembly
    val benchGrams = Assembly.wordNgrams(benchmark, "text", "doc_id", n)
      .select("gram").distinct().localCheckpoint()
    ForeachBatchSink(
      (b, id) => assemblyIngestBatch(b, cleanDir, id, benchGrams, n), checkpoint)
  }

  /** Backfill the assembly pipeline from a historical docs directory in
    * bounded chunks (Trigger.AvailableNow + maxFilesPerTrigger — the
    * [[backfillNearDupIngest]] discipline), then stop. Re-running with
    * the same checkpoint resumes from the high-water mark (no-op when
    * drained). Because every chunk passes the marker-gated
    * [[assemblyIngestBatch]], the result equals live streaming of the
    * same history.
    */
  def backfillAssembly(spark: SparkSession, docsDir: String,
      schema: StructType, benchmark: DataFrame, cleanDir: String,
      checkpoint: String, maxFilesPerTrigger: Int = 4, n: Int = 5): Unit = {
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
    val q = start(docs, assemblySink(benchmark, cleanDir, Some(checkpoint), n),
      trigger = Some(Trigger.AvailableNow()))
    try q.awaitTermination() finally q.stop()
  }

  // ---------------------------------------- operational metrics (R5 ops)

  /** One micro-batch's operational snapshot — the numbers a production
    * dedup-stream operator watches: throughput, batch latency, state-store
    * size (keys held within the watermark = the WindowStore analogue),
    * eviction progress, and the current watermark.
    */
  final case class QueryMetrics(
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      batchDurationMs: Long,
      stateRows: Long,
      stateRowsUpdated: Long,
      stateRowsRemoved: Long,
      stateMemoryBytes: Long,
      watermark: Option[String])

  private def toMetrics(p: org.apache.spark.sql.streaming.StreamingQueryProgress): QueryMetrics = {
    val ops = p.stateOperators.toIndexedSeq
    QueryMetrics(
      batchId = p.batchId,
      numInputRows = p.numInputRows,
      inputRowsPerSecond = p.inputRowsPerSecond,
      processedRowsPerSecond = p.processedRowsPerSecond,
      batchDurationMs = p.batchDuration,
      stateRows = ops.map(_.numRowsTotal).sum,
      stateRowsUpdated = ops.map(_.numRowsUpdated).sum,
      stateRowsRemoved = ops.map(_.numRowsRemoved).sum,
      stateMemoryBytes = ops.map(_.memoryUsedBytes).sum,
      watermark = Option(p.eventTime.get("watermark")))
  }

  /** Latest completed micro-batch's metrics (None before the first batch
    * completes).
    */
  def lastMetrics(q: StreamingQuery): Option[QueryMetrics] =
    Option(q.lastProgress).map(toMetrics)

  /** Metrics for the retained recent progress window, oldest first. */
  def recentMetrics(q: StreamingQuery): Seq[QueryMetrics] =
    q.recentProgress.toIndexedSeq.map(toMetrics)
}
