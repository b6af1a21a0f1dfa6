package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Sampling, Tables}

/** Deterministic stratified sampling: exact-membership determinism, quota
  * convergence, monotonicity under quota growth — the contracts that make
  * hash-mod sampling the right data-mixing primitive (vs engine RNG,
  * which is irreproducible across engines/partitionings).
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sampleIds(rates: Map[String, Double], defaultRate: Double = 0.0): Set[Long] =
    Sampling.stratifiedSample(Tables.events(spark, TestSpark.sfDir),
        "event_type", "event_id", rates, defaultRate)
      .select("event_id").as[Long].collect().toSet

  test("membership is deterministic: identical sample across runs") {
    val rates = Map("click" -> 0.5, "view" -> 0.25)
    assert(sampleIds(rates) == sampleIds(rates))
  }

  test("rate 1.0 keeps every row of the stratum; rate/default 0.0 keeps none") {
    val all = Tables.events(spark, TestSpark.sfDir)
    val clicks = all.where(col("event_type") === "click").count()
    val kept = Sampling.stratifiedSample(all, "event_type", "event_id",
      Map("click" -> 1.0)).count()
    assert(kept == clicks, s"kept $kept of $clicks clicks; other strata must default to 0")
  }

  test("per-group achieved rates converge to the quotas (±0.04 at ~2000 rows/stratum)") {
    val rates = Map("purchase" -> 1.0, "click" -> 0.5, "view" -> 0.25,
      "signup" -> 0.1, "error" -> 0.05)
    // sf0.01: ~2000 rows per stratum (sf0.001's ~200 puts 3σ past the bound)
    val sfDir = "/root/testdata/sf0.01"
    val totals = Tables.events(spark, sfDir)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedSample(Tables.events(spark, sfDir),
        "event_type", "event_id", rates)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    rates.foreach { case (t, r) =>
      val achieved = sampled.getOrElse(t, 0L).toDouble / totals(t)
      assert(math.abs(achieved - r) <= 0.04,
        s"$t: achieved $achieved vs quota $r over ${totals(t)} rows")
    }
  }

  test("rates converge on synthetic sequential AND sparse id spaces (multiplier mixes)") {
    // The bucket must spread ids uniformly whatever their shape — row
    // numbers or sparse surrogate keys.
    for ((ids, what) <- Seq(
        (0L until 50000L).toSeq -> "sequential",
        (0L until 50000L).map(_ * 977L + 13L) -> "sparse")) {
      val df = ids.toDF("id").withColumn("g", lit("x"))
      val kept = Sampling.stratifiedSample(df, "g", "id", Map("x" -> 0.3)).count()
      val achieved = kept.toDouble / ids.size
      assert(math.abs(achieved - 0.3) <= 0.02, s"$what ids: achieved $achieved vs 0.3")
    }
  }

  test("growing a quota strictly grows the sample (incremental re-mix contract)") {
    val small = sampleIds(Map("click" -> 0.2))
    val big = sampleIds(Map("click" -> 0.6))
    assert(small.subsetOf(big), s"${small.diff(big).take(5)} left the sample as the quota grew")
    assert(big.size > small.size)
  }

  test("absent strata fall back to defaultRate") {
    val withDefault = sampleIds(Map("click" -> 0.5), defaultRate = 1.0)
    val total = Tables.events(spark, TestSpark.sfDir).count()
    val clicks = Tables.events(spark, TestSpark.sfDir)
      .where(col("event_type") === "click").count()
    // every non-click row survives, about half the clicks do
    assert(withDefault.size > (total - clicks))
    assert(withDefault.size < total)
  }

  test("splitColumn: every row lands in exactly one band, fractions converge, ids are stable") {
    val weights = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val ids = (0L until 20000L).toDF("id")
    val split = ids.withColumn("s", Sampling.splitColumn(col("id"), weights))
    val counts = split.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 20000L) // partition: no row dropped or doubled
    weights.foreach { case (name, w) =>
      val achieved = counts.getOrElse(name, 0L).toDouble / 20000L
      assert(math.abs(achieved - w) <= 0.02, s"$name: $achieved vs $w")
    }
    // Snapshot stability: the assignment of an id does not depend on
    // which other ids are present (pure function of the id).
    val subset = (0L until 5000L).toDF("id")
      .withColumn("s", Sampling.splitColumn(col("id"), weights))
      .as[(Long, String)].collect().toMap
    val full = split.as[(Long, String)].collect().toMap
    subset.foreach { case (id, s) => assert(full(id) == s, s"id $id moved bands") }
  }

  test("streaming stratified sample ≡ batch twin (map-side op works unchanged on streams)") {
    // Membership is a pure per-row function + a broadcast stream-static
    // join, so the SAME operator body runs on an unbounded frame.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) "click" else "view"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val sampled = Sampling.stratifiedSample(
      mem.toDF().toDF("id", "g"), "g", "id", Map("click" -> 0.5, "view" -> 0.25))
    val q = sampled.writeStream.format("memory").queryName("strat_sink")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("strat_sink").select("id").as[Long].collect().toSet
    val batch = Sampling.stratifiedSample(
      rows.toDF("id", "g"), "g", "id", Map("click" -> 0.5, "view" -> 0.25))
      .select("id").as[Long].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("samplePerGroup: exactly k per group, smallest hashes win, stable as the corpus grows") {
    def h(id: Long) = ((id & 0x7FFFFFFFL) * 2654435761L) % (1L << 20)
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val got = Sampling.samplePerGroup(docs, "lang", "doc_id", 5)
      .select($"lang", $"sample_rank", $"doc_id")
      .as[(String, Long, Long)].collect().toSeq
    val byLang = docs.select($"lang", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, rows) =>
        l -> rows.map(_._2).sortBy(id => (h(id), id)).take(5).toSeq
      }
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.sortBy(_._2).map(_._3) == byLang(lang), s"picks differ for $lang")
    }
    assert(got.groupBy(_._1).values.forall(_.size == 5))
    // Growth stability: halving the corpus keeps picks that survive the cut.
    val half = docs.where($"doc_id" % 2 === 0)
    val gotHalf = Sampling.samplePerGroup(half, "lang", "doc_id", 5)
      .select($"doc_id").as[Long].collect().toSet
    val fullPicks = got.map(_._3).filter(_ % 2 == 0).toSet
    assert(fullPicks.subsetOf(gotHalf),
      "a full-corpus pick with an even id must still be picked in the even-only corpus")
  }

  test("rebalanceByWeight: heavy-token strata downsample toward the token quota, light keep all") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
    val tokPerLang = docs.groupBy("lang").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    val quota = tokPerLang.values.sum.toDouble / tokPerLang.size
    val kept = graft.engine.Assembly.rebalanceByWeight(docs, "lang", "doc_id", "n_tokens")
    val keptTok = kept.groupBy("lang").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    tokPerLang.foreach { case (lang, t) =>
      val k = keptTok.getOrElse(lang, 0L)
      if (t <= quota) assert(k == t, s"$lang under token quota must keep all ($k of $t)")
      else assert(k < t && math.abs(k - quota) < 0.35 * quota,
        s"$lang kept $k tokens, quota $quota")
    }
    // Deterministic.
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      graft.engine.Assembly.rebalanceByWeight(docs, "lang", "doc_id", "n_tokens")
        .select("doc_id").as[Long].collect().toSet)
  }

  test("the sampling filter is map-side: no shuffle exchange in the plan") {
    val df = Sampling.stratifiedSample(Tables.events(spark, TestSpark.sfDir),
      "event_type", "event_id", Map("click" -> 0.5))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ShuffleExchange"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
