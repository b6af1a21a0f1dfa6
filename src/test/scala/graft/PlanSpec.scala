package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Relational, Similarity}

/** Plan-shape assertions (SURVEY.md §4): cheap insurance that a refactor
  * doesn't un-push a filter, un-broadcast a dimension, or turn a blocked
  * join into a cartesian product. These read the physical plan string the
  * same way `.explain("formatted")` renders it.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, TestSpark.sfDir).queryExecution.executedPlan.toString

  test("q_scan_project pushes its filters into the parquet scan") {
    val p = plan("q_scan_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), p)
  }

  test("q_scan_project prunes columns at the scan (ReadSchema is narrow)") {
    val p = plan("q_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_comment"), read)
  }

  test("q_filter_predicates pushes its scan predicates") {
    val p = plan("q_filter_predicates")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
  }

  test("q3 and q5 broadcast their dimension tables") {
    assert(plan("q3_join_topk").contains("BroadcastHashJoin"))
    assert(plan("q5_5way_join").contains("BroadcastHashJoin"))
  }

  test("q3 top-k is TakeOrderedAndProject, not a global sort") {
    assert(plan("q3_join_topk").contains("TakeOrderedAndProject"))
  }

  test("q_similarity_join is a real equi-join on the block key, not a cartesian") {
    val p = plan("q_similarity_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_neardup_lsh keeps the hot-bucket band join broadcast-hash, never sort-merge") {
    val p = plan("q_neardup_lsh")
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p) // bands + 2 confirm dictionaries
  }

  test("signatures are computed and checkpointed over multiple partitions (pair fan-out parallelized)") {
    // The fixture parquet scans as ONE partition; the call sites must
    // fanOut BEFORE the tokenize projection (Dedup.fanOut contract) or
    // the set build, the hashing, and every probe task feeding off the
    // checkpoint serialize on a single task.
    val parts = graft.engine.Dedup.minhashBands(spark, TestSpark.sfDir).rdd.getNumPartitions
    assert(parts == spark.sessionState.conf.numShufflePartitions, s"parts = $parts")
  }

  test("q_neardup_lsh_salted has NO broadcast anywhere — the beyond-broadcast-scale shape") {
    val p = plan("q_neardup_lsh_salted")
    assert(!p.contains("Broadcast"), p)         // no exchange, no bhj, no bnlj
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin"), p)      // salted band join + confirms
  }

  test("q_ngram_jaccard and q_neardup_pairs Auto-dispatch to the broadcast fast path at fixture scale") {
    // Auto counts the checkpointed signature corpus: under the doc cap it
    // picks the measured-faster Broadcast branch (the r3 forced-Salted
    // q_ngram_jaccard was the round's one bench regression). Never a
    // cartesian either way.
    for (key <- Seq("q_ngram_jaccard", "q_neardup_pairs")) {
      val p = plan(key)
      assert(!p.contains("CartesianProduct"), s"$key: $p")
      assert(p.contains("BroadcastHashJoin"), s"$key: $p")
      assert(!p.contains("SortMergeJoin"), s"$key: $p")
    }
  }

  test("every graded near-dup key forced past the doc cap runs broadcast-free (the 100 TB twin)") {
    // Auto(maxBroadcastDocs = 0) forces the Salted branch regardless of
    // corpus size — the plan every one of these keys would run on a
    // corpus past executor broadcast limits must contain no broadcast of
    // any corpus-derived frame.
    import org.apache.spark.sql.functions._
    import graft.engine.{Dedup, Tables}
    // The twins build on the SAME blockedDocSets preamble the graded keys
    // use, so a preamble change re-runs through these assertions.
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val tokBase = Dedup.blockedDocSets(docs, Dedup.normTokens(col("text")), "toks")
    val gramBase = Dedup.blockedDocSets(docs,
      graft.functions.GraftExpressions.charShingles(col("text"), 3, barrier = true),
      "grams", minChars = 3)
    val forced = Seq(
      "q_neardup_pairs(salted)" ->
        Dedup.lshNearDupPairs(Dedup.signatures(tokBase), "toks", 9, 10, 0.9,
          Dedup.Auto(maxBroadcastDocs = 0), Dedup.DocBlockCols),
      "q_ngram_jaccard(salted)" ->
        Dedup.lshNearDupPairs(Dedup.signatures(gramBase, "grams"), "grams", 4, 5, 0.8,
          Dedup.Auto(maxBroadcastDocs = 0), Dedup.DocBlockCols))
    for ((what, df) <- forced) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Broadcast"), s"$what: $p")
      assert(!p.contains("CartesianProduct"), s"$what: $p")
      assert(p.contains("SortMergeJoin"), s"$what: $p")
    }
  }

  test("forced-salted dedup→components composition is broadcast-free end to end") {
    // The graded q_neardup_components path = Auto-shaped LSH pairs + the
    // clustering rounds. Past the doc cap, the pair stage must run the
    // salted no-broadcast shape AND every per-round join must avoid
    // building O(docs) label/edge frames in executor memory (merge=true).
    import org.apache.spark.sql.functions._
    import graft.engine.Dedup
    val pairs = Dedup.lshNearDupPairs(Dedup.minhashBands(spark, TestSpark.sfDir),
      "toks", 9, 10, 0.9, Dedup.Auto(maxBroadcastDocs = 0))
      .select(col("doc_a"), col("doc_b"))
    val pairsPlan = pairs.queryExecution.executedPlan.toString
    assert(!pairsPlan.contains("Broadcast"), pairsPlan)
    // Checkpointed edge/label inputs mirror the loop's persistRound state —
    // exactly the small-stats case where the planner would broadcast
    // without the merge hints.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))).localCheckpoint()
    val labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("component"))
      .select(col("src").as("doc_id"), col("component")).localCheckpoint()
    val round = Dedup.componentsRound(edges, labels, merge = true, labels)
    val p = round.queryExecution.executedPlan.toString
    assert(!p.contains("Broadcast"), p)
    assert(p.contains("SortMergeJoin"), p)
  }

  test("q_grouped_topk_agg aggregates in two phases (map-side partial below the exchange)") {
    // The whole point of the TopKAgg form: partial aggregation must cut
    // every partition to ≤ k rows per group BEFORE the shuffle. The
    // plan shows two ObjectHashAggregate nodes with the exchange between
    // them — partial below, final above.
    val p = plan("q_grouped_topk_agg")
    val lines = p.linesIterator.toVector
    val aggIdxs = lines.zipWithIndex.collect {
      case (l, i) if l.contains("ObjectHashAggregate") || l.contains("SortAggregate") => i
    }
    assert(aggIdxs.size >= 2, p)
    val exchangeBetween = lines.slice(aggIdxs.head, aggIdxs.last)
      .exists(_.contains("Exchange"))
    assert(exchangeBetween, p)
    // The BOTTOM aggregate (deepest line in the tree string) must be the
    // partial one — i.e. the map-side cut happens below the exchange.
    assert(lines(aggIdxs.last).contains("partial_topkagg"), p)
  }

  test("q_bloom_prejoin: bloom filter sits below a broadcast-free join") {
    // The key models the fact-⋈-fact case: the join must be sort-merge
    // (no broadcast — at scale the dim side doesn't fit), and the bloom
    // pre-filter must run BELOW the join so pruned fact rows never reach
    // the shuffle. In plan-string terms: the UDF filter appears, the
    // join is SMJ, and the filter's line sits deeper than the join's.
    val p = plan("q_bloom_prejoin")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    val lines = p.linesIterator.toVector
    val joinIdx = lines.indexWhere(_.contains("SortMergeJoin"))
    val filterIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("UDF"))
    assert(joinIdx >= 0 && filterIdx > joinIdx, p)
  }

  test("q_skew_join: sort-merge join keyed on (event_type, __salt) — hot keys fan out") {
    // The salted join must shuffle on the COMPOSITE (key, salt) — that's
    // the whole mechanism: each hot event_type spreads over 16 sub-keys
    // instead of one reducer — and stay broadcast-free (modelling the
    // dim past broadcast scale).
    val p = plan("q_skew_join")
    assert(!p.contains("BroadcastHashJoin"), p)
    val joinLine = p.linesIterator.find(_.contains("SortMergeJoin"))
      .getOrElse(fail(s"no SortMergeJoin in:\n$p"))
    assert(joinLine.contains("event_type") && joinLine.contains("__salt"), joinLine)
  }

  test("the per-pair graft expressions execute inside whole-stage codegen") {
    // ArrayIntersectSize / MinHashBands / ArrayFirstMatchIndex /
    // CharShingles implement doGenCode via static kernels; a fallback to
    // interpreted eval would strip the `*(n)` codegen marker from the
    // operator that evaluates them. AQE only inserts WholeStageCodegen
    // when each stage materializes, so run the query before reading the
    // final plan.
    val hot = Seq("arrayintersectsize", "minhashbands", "arrayfirstmatchindex", "charshingles")
    def assertStarred(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      df.collect()
      // The adaptive plan string carries BOTH the final and the initial
      // plan; only the final section reflects what actually executed.
      val lines = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head.linesIterator.toSeq
      val hotLines = lines.filter(l => hot.exists(l.toLowerCase.contains))
      assert(hotLines.nonEmpty, s"$what: no graft expression found in the final plan")
      hotLines.foreach { l =>
        assert(l.contains("*("), s"$what: graft expression evaluated outside codegen: $l")
      }
      // Single evaluation: the barrier flag exists so Catalyst cannot
      // clone these calls into residuals/guards (measured 16× recompute
      // without it) — each hot expression may appear at most once.
      hot.foreach { h =>
        val n = lines.count(_.toLowerCase.contains(h))
        assert(n <= 1, s"$what: $h appears $n times in the final plan (duplicated evaluation)")
      }
    }
    for (key <- Seq("q_neardup_pairs", "q_neardup_lsh", "q_ngram_jaccard"))
      assertStarred(SparkEntry.queries(key)(spark, TestSpark.sfDir), key)
    // MinHashBands/CharShingles live INSIDE the queries' eager
    // localCheckpoint job, whose plan the assertions above never see —
    // cover them on an un-checkpointed signature plan directly.
    import org.apache.spark.sql.functions._
    val shingled = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .where(length(col("text")) >= 3)
      .select(col("doc_id"),
        graft.functions.GraftExpressions.charShingles(col("text"), 3, barrier = true).as("grams"))
    assertStarred(graft.engine.Dedup.signatures(shingled, "grams"), "signatures(grams)")
  }

  test("q_join_shuffle_hash: the hint takes effect (ShuffledHashJoin, not SMJ/broadcast)") {
    val p = plan("q_join_shuffle_hash")
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q_decontaminate: benchmark grams broadcast into a semi-join; corpus text never shuffles") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(2000))
    // The only shuffles are the matched-id distinct and the final agg —
    // never a sort-merge join (which would shuffle corpus-side grams).
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q_decontaminate_fuzzy: the banded candidate join probes a BROADCAST benchmark index") {
    val p = plan("q_decontaminate_fuzzy")
    // Auto shape must resolve the (small) benchmark side to Broadcast:
    // the corpus-scale train side streams map-side through the band
    // probe instead of shuffling its bands.
    assert(p.contains("BroadcastHashJoin [__band_idx"), p.take(2000))
  }

  test("partitioned layout: the scan prunes to exactly the filtered lang directories") {
    // q_partition_pruned's shared scan helper: 2 of the 5 lang partitions
    // survive the filter — the scan must plan PartitionFilters (pruning
    // happens at listing time, before any file is opened) and its
    // runtime partition-read metric must be exactly 2.
    val dir = java.nio.file.Files.createTempDirectory("graft_planspec_part_").toString
    try {
      val df = graft.engine.Sources.partitionedDocsScan(spark, TestSpark.sfDir, dir,
        Seq("de", "fr"))
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScanExec in the plan"))
      assert(scan.partitionFilters.nonEmpty, scan.toString)
      assert(scan.metrics("numPartitions").value == 2,
        s"partitions read = ${scan.metrics("numPartitions").value}")
      // And the full graded key sees only the pruned slice's rows.
      val langs = df.select("lang").distinct()
        .collect().map(_.getString(0)).toSet
      assert(langs == Set("de", "fr"), langs.toString)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("q_bucketed_join's graded join is shuffle-free with bucketed scans on both sides") {
    val df = graft.engine.Sources.bucketedJoin(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Bucketed: true"), p)
    val (evName, aggName) = graft.engine.Sources.bucketedNames(spark)
    spark.sql(s"DROP TABLE IF EXISTS `$evName`")
    spark.sql(s"DROP TABLE IF EXISTS `$aggName`")
  }

  test("q_similarity_join computes each vector's norm below the join, not per pair") {
    // The join's post-condition/projection must reference the precomputed
    // norm columns; the sqrt(aggregate(...)) expansion appears only in the
    // per-side projects below the join.
    val df = Similarity.queries("q_similarity_join")(spark, TestSpark.sfDir)
    val joinNode = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.head
    val aboveJoin = df.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project
          if p.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.nonEmpty =>
        p.projectList.map(_.sql).mkString(";")
    }
    assert(joinNode != null)
    assert(!aboveJoin.exists(_.toLowerCase.contains("sqrt")),
      s"norms recomputed above the join: $aboveJoin")
  }

  test("q_sorted_neighborhood joins on (block, rank) — no per-block pair scan") {
    // The neighborhood must be an EQUI-join against the exploded probe
    // ranks; a range predicate over a block-only join would compute
    // O(block²) pairs before filtering.
    val p = plan("q_sorted_neighborhood")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val joinLine = p.linesIterator.find(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")).getOrElse("")
    assert(joinLine.contains("rn"), s"join must key on the rank: $joinLine")
  }

  test("q_lm_score past the broadcast cap: only the one-row total broadcasts") {
    // The tf ⋈ cf join must ride the term-key shuffle when the
    // vocabulary-sized frequency table cannot broadcast (web-scale
    // vocabularies don't); the single legitimate broadcast is the hinted
    // one-row corpus total.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("q_lm_score")
      val broadcasts = "BroadcastExchange".r.findAllIn(p).size
      assert(broadcasts == 1, s"expected exactly the one-row-total broadcast, got $broadcasts:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"tf-cf join must shuffle on the term key:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_lateral_topk decorrelates to a windowed top-k, not a per-row loop") {
    // The correlated LATERAL ... ORDER BY ... LIMIT must rewrite to a
    // partitioned Window + filter below a join (the same one-shuffle
    // shape as the DataFrame top-k); a nested-loop over nations would
    // re-execute the subquery per row.
    val p = plan("q_lateral_topk")
    assert(p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
