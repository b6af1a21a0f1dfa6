package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Skew, Tables}

/** Salting must be an execution detail: salted results ≡ unsalted. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedCollectList equals the unsalted sorted collect_list") {
    val ev = Tables.events(spark, TestSpark.sfDir)
    val salted = Skew.saltedCollectList(ev, Seq("event_type"), "event_id", "user_id")
      .as[(String, Seq[Long])].collect().toMap
    val plain = ev.groupBy("event_type")
      .agg(array_sort(collect_list(col("user_id"))).as("user_id_list"))
      .as[(String, Seq[Long])].collect().toMap
    assert(salted == plain)
  }

  test("a genuinely hot key is split across multiple aggregation states and tasks") {
    // One key carries 50% of all rows — the shape where an unsalted
    // collect_list concentrates the whole key in ONE reducer state.
    val n = 10000
    val df = spark.range(n).select(
      when(col("id") % 2 === 0, lit("hot")).otherwise(concat(lit("k"), col("id") % 97)).as("k"),
      col("id"))
    // Phase-1 sub-aggregation: the hot key must fan out over >1 salt
    // sub-key (bounded state) and >1 shuffle partition (parallel tasks).
    // AQE's post-shuffle coalescing would fold this test-sized shuffle
    // back into one partition (it wouldn't at production volume), hiding
    // exactly the property under test — off for this query only.
    val coalescePrior = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val phase1 = try {
      df.withColumn("__salt", Skew.salt(col("id"), 16))
        .groupBy(col("k"), col("__salt"))
        .agg(count(lit(1)).as("c"), collect_list(col("id")).as("part"))
        .withColumn("pid", spark_partition_id())
        .where(col("k") === "hot")
        .select(col("__salt"), col("c"), col("pid"))
        .collect()
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalescePrior)
    assert(phase1.length > 1, s"hot key stayed in one aggregation state: ${phase1.toSeq}")
    assert(phase1.map(_.getInt(2)).distinct.length > 1,
      s"hot key's sub-aggregations all ran in one task: ${phase1.toSeq}")
    val maxState = phase1.map(_.getLong(1)).max
    assert(maxState < n / 2, s"one sub-state still holds the whole hot key ($maxState rows)")
    // And the end-to-end salted result is still exactly the unsalted one.
    val salted = Skew.saltedCollectList(df, Seq("k"), "id", "id")
      .as[(String, Seq[Long])].collect().toMap
    val plain = df.groupBy("k").agg(array_sort(collect_list(col("id"))).as("id_list"))
      .as[(String, Seq[Long])].collect().toMap
    assert(salted == plain)
  }

  test("graded salted join: each hot key's rows spread across >1 shuffle task") {
    // Same AQE caveat as the collect test: post-shuffle coalescing would
    // fold this test-sized shuffle into one partition and hide the spread.
    val coalescePrior = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val spread = try {
      Skew.skewJoinPlan(spark, TestSpark.sfDir)
        .withColumn("pid", spark_partition_id())
        .groupBy("event_type")
        .agg(countDistinct(col("pid")).as("n_tasks"))
        .as[(String, Long)].collect().toMap
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalescePrior)
    assert(spread.nonEmpty && spread.values.forall(_ > 1),
      s"hot keys not spread across tasks: $spread")
    // And the graded aggregate is exactly the plain-join aggregate.
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val dim = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_type_users"))
    val plain = ev.join(dim, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"),
        max(col("n_type_users")).as("n_type_users"))
      .orderBy("event_type").collect().toSeq
    val salted = Skew.queries("q_skew_join")(spark, TestSpark.sfDir).collect().toSeq
    assert(salted == plain)
  }

  test("AQE skew-join splitting fires on a genuinely skewed shuffle join (the no-salt path)") {
    // Salting (above) is the EXPLICIT skew tool; Spark's AQE skew join is
    // the automatic one — this pins that it actually engages on our
    // session config, with thresholds lowered so test-scale partitions
    // qualify (production sizes are per-cluster tuning, the MECHANISM is
    // what's under test). One key carries half of all rows.
    val prior = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val big = spark.range(200000).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") % 512).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val dim = spark.range(512).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = big.hint("merge").join(dim.hint("merge"), "k")
      // Execute through the frame's OWN QueryExecution (a write/count
      // builds a separate one whose adaptive plan we couldn't inspect),
      // then read the post-execution final plan.
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_skew_join_aqe: runtime skew split is invisible in the result and fires on the fixture") {
    import org.apache.spark.sql.functions.col
    // Result parity: the AQE-split join must equal the plain (and salted)
    // aggregate — runtime mitigation, like salting, changes no values.
    val plain = Skew.aqeSkewJoinFrame(spark, TestSpark.sfDir).collect().toSeq
    val graded = Skew.queries("q_skew_join_aqe")(spark, TestSpark.sfDir).collect().toSeq
    assert(graded == plain)
    // Mechanism: with thresholds scaled to the test fixture, the final
    // adaptive plan carries the skew-split marker.
    Skew.withAqeSkewConfs(spark, threshold = "1KB", advisory = "512B") {
      val df = Skew.aqeSkewJoinFrame(spark, TestSpark.sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"), s"AQE skew split did not fire:\n$p")
    }
  }

  test("Spark's InjectRuntimeFilter plants the bloom semi-join automatically") {
    // Skew.bloomPreFilter is the EXPLICIT/unconditional form; Spark's
    // InjectRuntimeFilter is the automatic sibling that plants the same
    // filter-below-the-shuffle shape when a selective creation side
    // qualifies — this pins that it engages on our session, with the
    // application-side threshold lowered so a test-scale scan qualifies
    // (default 10GB; the MECHANISM is what's under test). The join must
    // be shuffle-based: a broadcast side already prunes at the hash
    // lookup, so the rule skips it.
    val prior = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      // Built fresh per call: a DataFrame pins its QueryExecution, so
      // conf flips only affect NEW frames.
      def joined() = {
        val dim = Tables.orders(spark, TestSpark.sfDir)
          .where(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1995-04-01"))
        Tables.lineitem(spark, TestSpark.sfDir)
          .join(dim, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      }
      val withFilter = joined()
      val injected = withFilter.queryExecution.optimizedPlan.exists(
        _.expressions.exists(_.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])))
      assert(injected, "runtime bloom filter was not injected:\n" +
        withFilter.queryExecution.optimizedPlan.toString)
      // The filter is a pure pruning optimization — values unchanged.
      val got = withFilter.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val off = joined()
      assert(!off.queryExecution.optimizedPlan.exists(
        _.expressions.exists(_.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]))))
      val want = off.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin equals the plain equi-join") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "event_type")
    val users = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val salted = Skew.saltedJoin(ev, users, "user_id", "event_id", salts = 8)
      .select("event_id", "user_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val plain = ev.join(users, "user_id")
      .select("event_id", "user_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
  }
}
