package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.Tables
import graft.streaming.Streams

/** At-scale gate for the STREAM-STREAM watermarked interval join (r15
  * verdict item #1): Spark's `StreamingSymmetricHashJoinExec` — the one
  * major stateful operator class the fixture-scale parity specs covered
  * (StreamingParitySpec: inner / left-outer / full-outer / eviction /
  * out-of-order) but no scale artifact had ever exercised. The shape is
  * the KStream⋈KStream windowed join next to the reference's dedup
  * transform: purchases joined to same-user clicks in the preceding 30
  * minutes.
  *
  * Both faces run over the ×970 events mirror (97M rows) as the same
  * ts-range-partitioned file stream StreamScale uses, with a mid-stream
  * kill at `STREAMJOIN_CRASH_FRAC` of the input and a restart on the
  * same checkpoint — exactly-once across the crash, proven by exact
  * multiset parity against the batch twin join evaluated over the same
  * mirror:
  *
  *  - `ssjoin_inner`: every (purchase, click) pair with the same user and
  *    click.ts ∈ [purchase.ts − 30 min, purchase.ts]. Emitted on arrival;
  *    each side's state evicted once the watermark proves no partner can
  *    still arrive.
  *  - `ssjoin_left_outer`: additionally one null-padded row per purchase
  *    with NO in-interval click — emitted exactly once, only after the
  *    watermark passes the purchase's match window (the KStream leftJoin
  *    grace-expiry semantics). The sink must hold exactly one row per
  *    unmatched purchase even across the kill/replay seam.
  *  - `ssjoin_right_outer` / `ssjoin_full_outer` (r17, r16 verdict item
  *    #2): the click-padded and BOTH-padded faces under the same
  *    mid-stream kill — full_outer's double-sided null emission is the
  *    riskiest semantics (each unmatched row on EITHER side exactly once
  *    across the seam). Closure: every face's matched core ≡ inner, and
  *    full_outer's per-side null multisets ≡ the single-sided faces'.
  *
  * Sentinels: each side's watermark column sits ABOVE its event_type
  * filter, so the tail must carry one purchase AND one click to advance
  * both watermarks; outer-join null emission happens when a raised
  * watermark is APPLIED in a LATER batch, so TWO tail files are staged
  * (prepareTsOrderedInput's sentinelFiles contract). Sentinel rows carry
  * negative event_ids and are filtered from the stream side; the batch
  * twin reads the mirror directly and never sees them.
  *
  * State bound (the 100-TB claim): peak state ≈ rows inside the trailing
  * watermark+interval horizon (~2.5 h of stream ≪ 30 days), asserted as
  * peak_state_rows < rows/10. Watermark drops must be 0 (ordered
  * slices; 2 h delay ≫ slice skew). A cheap cross-face consistency check
  * closes the loop: the left-outer output minus its null rows must equal
  * the inner output.
  *
  * Run: STREAMJOIN_SRC (default target/mirror_x970ev), STREAMJOIN_OUT,
  * STREAMJOIN_SLICES (default 96), STREAMJOIN_CRASH_FRAC (default 0.5).
  * Emits one JSON line per face + a summary line; exit 1 on any failure.
  */
object StreamJoinScale {

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("STREAMJOIN_SRC", "target/mirror_x970ev")
    val out = sys.env.getOrElse("STREAMJOIN_OUT", "target/streamjoinscale")
    val slices = sys.env.getOrElse("STREAMJOIN_SLICES", "96").toInt
    val crashFrac = sys.env.getOrElse("STREAMJOIN_CRASH_FRAC", "0.5").toDouble
    require(crashFrac >= 0 && crashFrac < 1, s"STREAMJOIN_CRASH_FRAC $crashFrac outside [0, 1)")

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Outer-join null emission depends on a batch RUNNING after the
      // watermark rises; pin the default so a conf drift can't silently
      // strand unmatched rows in state (see the sentinel note below).
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)

    val ev = Tables.events(spark, src)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val evCount = ev.count()
    val crashAtRows = (evCount * crashFrac).toLong
    val crashWanted = crashFrac > 0

    val inputDir = s"$out/input"
    // THREE sentinel tail files: with maxFilesPerTrigger=2, two tails can
    // coalesce into ONE final micro-batch (96 slices + 2 = 49 two-file
    // batches — measured in the first r16 run), which would leave outer
    // null-emission to the implicit no-data batch alone. Three tails
    // guarantee at least one DATA batch strictly after the batch that
    // raised the watermark, at any slices/maxFiles alignment; the
    // explicit noDataMicroBatches conf above is belt and braces.
    StreamScale.prepareTsOrderedInput(spark, ev, inputDir, slices, maxTs,
      Seq(Seq((-1L, -1L, "purchase"), (-2L, -1L, "click")),
        Seq((-3L, -1L, "purchase"), (-4L, -1L, "click")),
        Seq((-5L, -1L, "purchase"), (-6L, -1L, "click"))),
      s"$out/_sentinel")

    val schema = ev.schema
    def stream(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(inputDir)

    def joined(st: DataFrame, joinType: String): DataFrame =
      Streams.intervalJoin(
        st.where(col("event_type") === "purchase"),
        st.where(col("event_type") === "click"),
        "user_id", before = "30 minutes", delay = "2 hours", joinType = joinType)
        .select(col("l.event_id").as("p_id"), col("r.event_id").as("c_id"))

    def batchTwin(joinType: String): DataFrame =
      ev.where(col("event_type") === "purchase").alias("l")
        .join(ev.where(col("event_type") === "click").alias("r"),
          col("l.user_id") === col("r.user_id") &&
            col("r.ts") >= col("l.ts") - expr("INTERVAL 30 minutes") &&
            col("r.ts") <= col("l.ts"),
          joinType)
        .select(col("l.event_id").as("p_id"), col("r.event_id").as("c_id"))

    // Sentinel rows carry NEGATIVE event_ids on whichever side they
    // materialize — including as one half of a null-padded outer row —
    // while REAL null-padded rows must survive: null-preserving filter,
    // not `p_id >= 0` (whose null comparison silently drops the
    // right_outer/full_outer null-left rows under test).
    val nonSentinel = (col("p_id").isNull || col("p_id") >= 0L) &&
      (col("c_id").isNull || col("c_id") >= 0L)

    case class Face(key: String, parity: Boolean, stateBounded: Boolean,
        rowsStream: Long, rowsBatch: Long, onlyS: Long, onlyB: Long,
        nullLeft: Long, nullRows: Long, peakRows: Long, peakMemMb: Long, dropped: Long,
        batches: Long, crashed: Boolean, rowsBeforeKill: Long, wallSec: Double)

    def runFace(key: String, joinType: String): Face = {
      val t0 = System.nanoTime()
      val outDir = s"$out/$key"; val ckpt = s"$out/ckpt_$key"
      Seq(outDir, ckpt).foreach(p =>
        StreamScale.Sources.deleteRecursively(new java.io.File(p)))
      def start() = joined(stream(), joinType).writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      val tracker = new StreamScale.ProgressTracker
      spark.streams.addListener(tracker)
      var crashed = false
      var rowsBeforeKill = 0L
      try {
        if (crashAtRows > 0) {
          val q1 = start()
          while (q1.isActive && tracker.rawIngested < crashAtRows) Thread.sleep(500)
          crashed = q1.isActive
          q1.stop()
          tracker.fold(q1.recentProgress.toSeq)
          rowsBeforeKill = tracker.rawIngested
        }
        val q = start()
        q.awaitTermination()
        tracker.fold(q.recentProgress.toSeq)
      } finally spark.streams.removeListener(tracker)
      val progresses = tracker.progresses
      val peakRows = progresses.flatMap(_.stateOperators.map(_.numRowsTotal)).maxOption.getOrElse(0L)
      val peakMem = progresses.flatMap(_.stateOperators.map(_.memoryUsedBytes)).maxOption.getOrElse(0L)
      val dropped = progresses.flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      val batches = progresses.count(_.numInputRows > 0).toLong
      val streamed = spark.read.parquet(outDir).where(nonSentinel).localCheckpoint()
      val batch = batchTwin(joinType).localCheckpoint()
      val onlyS = streamed.exceptAll(batch).count()
      val onlyB = batch.exceptAll(streamed).count()
      val (nS, nB) = (streamed.count(), batch.count())
      val nullLeft = streamed.where(col("p_id").isNull).count()
      val nullRows = streamed.where(col("c_id").isNull).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Face(key, onlyS == 0 && onlyB == 0 && nS == nB,
        peakRows < evCount / 10, nS, nB, onlyS, onlyB, nullLeft, nullRows,
        peakRows, peakMem / 1000000, dropped, batches, crashed, rowsBeforeKill, wall)
    }

    // r17 (r16 verdict item #2): the remaining outer faces join the gate.
    // full_outer is the semantically riskiest — null padding on BOTH
    // sides, each emitted exactly once on watermark expiry, across the
    // same mid-stream kill; right_outer pads the click side.
    val faceDefs = Seq("ssjoin_inner" -> "inner", "ssjoin_left_outer" -> "left_outer",
      "ssjoin_right_outer" -> "right_outer", "ssjoin_full_outer" -> "full_outer")
    val wanted = sys.env.get("STREAMJOIN_FACES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val faces = faceDefs.filter(fd => wanted.forall(_.contains(fd._2)))
      .map { case (k, jt) => runFace(k, jt) }
    faces.foreach { f =>
      println(s"""{"key":"${f.key}","parity":${f.parity},"state_bounded":${f.stateBounded},""" +
        s""""rows_stream":${f.rowsStream},"rows_batch":${f.rowsBatch},""" +
        s""""only_stream":${f.onlyS},"only_batch":${f.onlyB},""" +
        s""""null_padded_left_rows":${f.nullLeft},"null_padded_rows":${f.nullRows},""" +
        s""""peak_state_rows":${f.peakRows},"peak_state_mem_mb":${f.peakMemMb},""" +
        s""""dropped_by_watermark":${f.dropped},"batches":${f.batches},""" +
        s""""crash_injected":${f.crashed},"rows_before_kill":${f.rowsBeforeKill},""" +
        s""""wall_sec":${f"${f.wallSec}%.1f"}}""")
    }
    // Cross-face closure over the MATCHED core: every outer face minus
    // its null-padded rows must equal the inner face, and full_outer's
    // per-side null-padded row multisets must equal the single-sided
    // faces' (all read back from the crash-seamed sinks, sentinels
    // filtered null-preservingly).
    val ranKeys = faces.map(_.key).toSet
    def sink(key: String): DataFrame =
      spark.read.parquet(s"$out/$key").where(nonSentinel).localCheckpoint()
    def multisetEq(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0
    val crossChecks: Seq[(String, Boolean)] =
      if (!ranKeys.contains("ssjoin_inner")) Seq.empty
      else {
        val inner = sink("ssjoin_inner")
        def matchedEqInner(key: String): Option[(String, Boolean)] =
          if (!ranKeys.contains(key)) None
          else Some(s"${key}_matched_equals_inner" -> multisetEq(
            sink(key).where(col("p_id").isNotNull && col("c_id").isNotNull), inner))
        val sides: Seq[(String, Boolean)] =
          if (!ranKeys.contains("ssjoin_full_outer")) Seq.empty
          else {
            val full = sink("ssjoin_full_outer")
            val leftNulls = Option.when(ranKeys.contains("ssjoin_left_outer"))(
              "full_right_nulls_equal_left_outer" -> multisetEq(
                full.where(col("c_id").isNull),
                sink("ssjoin_left_outer").where(col("c_id").isNull)))
            val rightNulls = Option.when(ranKeys.contains("ssjoin_right_outer"))(
              "full_left_nulls_equal_right_outer" -> multisetEq(
                full.where(col("p_id").isNull),
                sink("ssjoin_right_outer").where(col("p_id").isNull)))
            Seq(leftNulls, rightNulls).flatten
          }
        Seq("ssjoin_left_outer", "ssjoin_right_outer", "ssjoin_full_outer")
          .flatMap(matchedEqInner) ++ sides
      }
    val crossOk = crossChecks.forall(_._2)
    val crashMissed = crashWanted && faces.exists(!_.crashed)
    val pass = faces.forall(f => f.parity && f.stateBounded && f.dropped == 0) &&
      crossOk && !crashMissed
    val crossJson = crossChecks.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"stream_join":{"src":"$src","rows":$evCount,"slices":$slices,""" +
      s""""crash_frac":$crashFrac,"crash_missed":$crashMissed,""" +
      s"""$crossJson${if (crossJson.nonEmpty) "," else ""}"pass":$pass}}""")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
