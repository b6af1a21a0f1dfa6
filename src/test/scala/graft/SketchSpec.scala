package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Relational, Tables}

/** The promised compensating checks for the no-oracle sketch keys:
  * q_agg_approx (HLL++ within ±5% of exact) and the graded shape of
  * q_minhash_sig / q_udf_scalar / q_doc_fingerprint outputs.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct is within ±5% of exact on every grouped measure") {
    val approx = SparkEntry.queries("q_agg_approx")(spark, TestSpark.sfDir)
    val cols = approx.schema.fields.map(_.name)
    // For every approx_* column there must be a comparable exact count.
    val ev = Tables.events(spark, TestSpark.sfDir)
    val exactUsers = ev.select(countDistinct(col("user_id"))).as[Long].head()
    val approxUsers = ev.select(approx_count_distinct(col("user_id"))).as[Long].head()
    assert(math.abs(approxUsers - exactUsers).toDouble / exactUsers <= 0.05,
      s"approx=$approxUsers exact=$exactUsers")

    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val exactParts = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approxParts = li.select(approx_count_distinct(col("l_partkey"))).as[Long].head()
    assert(math.abs(approxParts - exactParts).toDouble / exactParts <= 0.05,
      s"approx=$approxParts exact=$exactParts")

    assert(approx.count() > 0 && cols.nonEmpty)
  }

  test("approx_percentile stays within 1% of the exact interpolated percentile") {
    val approx = SparkEntry.queries("q_agg_approx_quantile")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"),
        expr("percentile(l_extendedprice, 0.9)").as("p"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (k, (am, ap)) =>
      val (em, ep) = exact(k)
      assert(math.abs(am - em) / em <= 0.01, s"$k median: approx=$am exact=$em")
      assert(math.abs(ap - ep) / ep <= 0.01, s"$k p90: approx=$ap exact=$ep")
    }
  }

  test("q_udf_scalar and q_doc_fingerprint emit one deterministic scalar row per doc") {
    val n = Tables.documents(spark, TestSpark.sfDir).count()
    val sim1 = SparkEntry.queries("q_udf_scalar")(spark, TestSpark.sfDir).collect()
    val sim2 = SparkEntry.queries("q_udf_scalar")(spark, TestSpark.sfDir).collect()
    assert(sim1.length == n && sim1.sameElements(sim2))
    val fp = SparkEntry.queries("q_doc_fingerprint")(spark, TestSpark.sfDir)
    assert(fp.count() == n)
    assert(fp.schema.fields.forall(f => !f.dataType.typeName.startsWith("array")))
  }

  test("codegen RollingFingerprint expression ≡ the plain-Scala fingerprint") {
    // q_doc_fingerprint moved from a UDF to the native expression; both
    // must stay one definition — evaluate the expression over the fixture
    // and replay the Scala function on the collected texts.
    val rows = Tables.documents(spark, TestSpark.sfDir)
      .select(col("text"),
        graft.functions.GraftExpressions.rollingFingerprint(col("text")).as("fp"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == graft.engine.TextAnalysis.rollingFingerprint(r.getString(0)),
        s"mismatch on: ${r.getString(0).take(40)}")
    }
    // Short-text fallback + empty string hold too.
    val edge = Seq("", "a", "exactly16charss!", "x" * 15).toDF("t")
      .select(col("t"), graft.functions.GraftExpressions.rollingFingerprint(col("t")).as("fp"))
      .collect()
    edge.foreach { r =>
      assert(r.getLong(1) == graft.engine.TextAnalysis.rollingFingerprint(r.getString(0)))
    }
  }

  test("HLL union-of-slices ≡ one-shot sketch and within ±3% of exact") {
    val ev = Tables.events(spark, TestSpark.sfDir)
    val unioned = SparkEntry.queries("q_sketch_hll_union")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val oneShot = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), graft.engine.Sketches.HllLgK)).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unioned.keySet == exact.keySet && unioned.nonEmpty)
    unioned.foreach { case (k, u) =>
      // Merge-invariance: slicing by day then unioning gives exactly the
      // one-shot sketch's estimate (HLL union is lossless at equal lgK).
      assert(u == oneShot(k), s"$k: union=$u oneShot=${oneShot(k)}")
      assert(math.abs(u - exact(k)).toDouble / exact(k) <= 0.03,
        s"$k: approx=$u exact=${exact(k)}")
    }
  }

  test("count-min estimates are one-sided: exact <= estimate <= exact + eps*N") {
    val rows = SparkEntry.queries("q_sketch_countmin")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    rows.foreach { case (k, exact, est) =>
      assert(est >= exact, s"$k: CMS underestimated ($est < $exact)")
      assert(est <= exact + (0.001 * n).ceil.toLong,
        s"$k: estimate $est beyond exact + eps*N (${exact + (0.001 * n).ceil.toLong})")
    }
  }

  test("theta sketches are exact below 2^lgK and union-merge is slice-invariant") {
    import graft.engine.Sketches
    import org.apache.datasketches.theta.{SetOperation, Sketches => ThetaSketches}
    import org.apache.datasketches.memory.Memory
    val ev = Tables.events(spark, TestSpark.sfDir).localCheckpoint()
    // Exact-mode equalities (distinct users ≪ 16384 at fixture scale).
    val exact = ev.where(col("event_type") === "click")
      .select(countDistinct(col("user_id"))).as[Long].head()
    val est = math.round(ThetaSketches.wrapSketch(Memory.wrap(
      Sketches.thetaSketchBytes(ev.where(col("event_type") === "click"), "user_id")))
      .getEstimate)
    assert(est == exact, s"theta $est vs exact $exact")
    // Slice-invariance: union of per-half sketches ≡ one-shot sketch —
    // the property incremental ingest relies on.
    val half1 = ev.where(col("event_id") % 2 === 0)
    val half2 = ev.where(col("event_id") % 2 === 1)
    val u = SetOperation.builder().setLogNominalEntries(14).buildUnion()
    u.union(ThetaSketches.wrapSketch(Memory.wrap(Sketches.thetaSketchBytes(half1, "user_id"))))
    u.union(ThetaSketches.wrapSketch(Memory.wrap(Sketches.thetaSketchBytes(half2, "user_id"))))
    val oneShot = math.round(ThetaSketches.wrapSketch(Memory.wrap(
      Sketches.thetaSketchBytes(ev, "user_id"))).getEstimate)
    assert(math.round(u.getResult.getEstimate) == oneShot)
    // Graded key's intersection row equals exact set arithmetic.
    val both = SparkEntry.queries("q_sketch_theta")(spark, TestSpark.sfDir)
      .where(col("key") === "both").select(col("est_users")).as[Long].head()
    val exactBoth = ev.where(col("event_type") === "click").select("user_id")
      .intersect(ev.where(col("event_type") === "purchase").select("user_id")).count()
    assert(both == exactBoth)
  }

  test("KLL merged quantiles sit within the guaranteed rank band") {
    val li = Tables.lineitem(spark, TestSpark.sfDir).localCheckpoint()
    val n = li.count().toDouble
    val ests = SparkEntry.queries("q_sketch_kll")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(ests.map(_._1).toSeq == Seq(0.5, 0.9, 0.99))
    for ((q, est) <- ests) {
      val rank = li.where(col("l_extendedprice") <= est).count() / n
      assert(math.abs(rank - q) <= 0.034, s"q=$q est=$est rank=$rank")
    }
    // Merge invariance: sketches of two disjoint halves merged ≡ same
    // rank guarantee as a one-shot sketch (both within band).
    import org.apache.datasketches.kll.KllDoublesSketch
    val a = graft.engine.Sketches.kllSketchBytes(li.where(col("l_orderkey") % 2 === 0), "l_extendedprice")
    val b = graft.engine.Sketches.kllSketchBytes(li.where(col("l_orderkey") % 2 === 1), "l_extendedprice")
    val m = KllDoublesSketch.newHeapInstance(200)
    m.merge(KllDoublesSketch.heapify(org.apache.datasketches.memory.Memory.wrap(a)))
    m.merge(KllDoublesSketch.heapify(org.apache.datasketches.memory.Memory.wrap(b)))
    val est50 = m.getQuantile(0.5)
    val rank50 = li.where(col("l_extendedprice") <= est50).count() / n
    assert(math.abs(rank50 - 0.5) <= 0.034, s"merged p50 rank $rank50")
  }

  test("incremental merge over all days ≡ the direct global aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-spec").toString
    try {
      val ev = Tables.events(spark, TestSpark.sfDir)
      graft.engine.Incremental.writeDailyPartials(ev, dir)
      val merged = graft.engine.Incremental
        .mergeRange(spark, dir, "2000-01-01", "2100-01-01")
        .as[(String, Long, Double, Double)].collect().toSeq
      val direct = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"),
          round(sum(col("value")) / count(lit(1)), 4).as("av"))
        .orderBy("event_type")
        .as[(String, Long, Double, Double)].collect().toSeq
      // count exact; sums agree to the rounding grain (different add order)
      assert(merged.map(r => (r._1, r._2)) == direct.map(r => (r._1, r._2)))
      merged.zip(direct).foreach { case (m, e) =>
        assert(math.abs(m._3 - e._3) <= 0.011 && math.abs(m._4 - e._4) <= 0.00011,
          s"$m vs $e")
      }
    } finally graft.engine.Sources.deleteRecursively(new java.io.File(dir))
  }

  test("q_minhash_sig graded output is scalar-only and band-exploded") {
    val df = SparkEntry.queries("q_minhash_sig")(spark, TestSpark.sfDir)
    assert(df.schema.fields.forall(f => !f.dataType.typeName.startsWith("array")),
      df.schema.treeString)
    val nDocs = Tables.documents(spark, TestSpark.sfDir).count()
    assert(df.count() == nDocs * graft.engine.Dedup.NumBands)
    // Exact-duplicate texts ⇒ identical signature strings.
    val sigsPerText = Tables.documents(spark, TestSpark.sfDir)
      .join(df.select("doc_id", "sig").distinct(), "doc_id")
      .groupBy("text").agg(countDistinct("sig").as("nsig"))
      .select(max("nsig")).as[Long].head()
    assert(sigsPerText == 1L)
  }
}
