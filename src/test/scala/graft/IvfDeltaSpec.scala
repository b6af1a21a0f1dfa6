package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Ivf, Pq, Tables}

/** Incremental ANN index maintenance: appending a delta of new vectors to a
  * persisted IVF assignment (or PQ code table) WITHOUT retraining must
  * converge to exactly the index a full rebuild would produce — assignment
  * and encoding are pure per-row functions of the frozen model — and the
  * drift probe must tell the operator when that frozen model has stopped
  * fitting the data (retrain signal), which is the one thing the append
  * path cannot fix.
  */
class IvfDeltaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val K = 8
  private val sfDir = "/root/testdata/sf0.01"
  private lazy val embs = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))
  private lazy val base = embs.where(col("vec_id") % 5 =!= 0)
  private lazy val delta = embs.where(col("vec_id") % 5 === 0)
  private lazy val centroids = Ivf.train(base, k = K, iters = 3).localCheckpoint()

  test("assignDelta on (base index, delta) equals a full assign over the union") {
    val grown = Ivf.assignDelta(Ivf.assign(base, centroids), delta, centroids)
    val full = Ivf.assign(embs, centroids)
    assert(grown.count() == embs.count())
    assert(grown.except(full).count() == 0 && full.except(grown).count() == 0)
  }

  test("assignDelta is idempotent: re-ingesting the same delta adds nothing") {
    val once = Ivf.assignDelta(Ivf.assign(base, centroids), delta, centroids)
      .localCheckpoint()
    val twice = Ivf.assignDelta(once, delta, centroids)
    assert(twice.count() == once.count())
    assert(twice.except(once).count() == 0)
  }

  test("a delta that repeats a vec_id WITHIN the batch still yields one index row") {
    // Replayed upstream feeds hand the maintenance path the same id twice
    // in one batch; the anti-join alone can't see that.
    val doubled = delta.unionAll(delta)
    val grown = Ivf.assignDelta(Ivf.assign(base, centroids), doubled, centroids)
    assert(grown.count() == embs.count())
    assert(grown.groupBy(col("vec_id")).count().where(col("count") > 1).count() == 0)
    val model = Pq.train(base, dim = 64, m = 8, ksub = 16, iters = 2)
    val codes = Pq.encodeDelta(Pq.encode(base, model), doubled, model)
    assert(codes.count() == embs.count())
  }

  test("encodeDelta on (base codes, delta) equals a full encode over the union") {
    val model = Pq.train(base, dim = 64, m = 8, ksub = 16, iters = 2)
    val grown = Pq.encodeDelta(Pq.encode(base, model), delta, model)
    val full = Pq.encode(embs, model)
    assert(grown.except(full).count() == 0 && full.except(grown).count() == 0)
    // Idempotence mirrors assignDelta.
    assert(Pq.encodeDelta(grown.localCheckpoint(), delta, model).count() == grown.count())
  }

  test("drift probe: in-distribution delta is near ratio 1, shifted delta trips retrain") {
    // The fixture's delta slice comes from the same generator as the base:
    // its quantization error under base-trained cells sits in the same band.
    val inDist = Ivf.driftProbe(base, delta, centroids)
    assert(inDist.ratio < 2.0, s"in-distribution ratio ${inDist.ratio}")
    assert(!inDist.retrainRecommended)
    // A distribution shift (e.g. a new embedding model): every component
    // moved far outside the trained cells' reach.
    val shifted = delta.withColumn("embedding",
      transform(col("embedding"), x => x + lit(10.0f)))
    val drifted = Ivf.driftProbe(base, shifted, centroids)
    assert(drifted.ratio > 10.0, s"shifted ratio ${drifted.ratio}")
    assert(drifted.retrainRecommended)
  }

  test("index artifacts survive a parquet persist/reload roundtrip") {
    // The library lifecycle: train once, persist the centroid frame and
    // the (vec_id, cell) assignment as parquet artifacts, reload in a
    // later job, search — identical results to the in-memory index.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-artifact").toString
    val cells = Ivf.assign(embs, centroids)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    cells.write.mode("overwrite").parquet(s"$dir/cells.parquet")
    val cLoaded = spark.read.parquet(s"$dir/centroids.parquet")
    val aLoaded = spark.read.parquet(s"$dir/cells.parquet")
    val fresh = Ivf.search(embs, centroids, queryVecId = 7L, nprobe = 3, topK = 10,
      cellsIn = Some(cells)).collect().toSeq
    val loaded = Ivf.search(embs, cLoaded, queryVecId = 7L, nprobe = 3, topK = 10,
      cellsIn = Some(aLoaded)).collect().toSeq
    assert(loaded == fresh)
  }

  test("q_ann_delta: the grown index reproduces the exact global top-15") {
    val got = SparkEntry.queries("q_ann_delta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // q_ann_ivf_trained trains on the FULL corpus and probes all cells —
    // spec-pinned exact global top-15 from vec 7. The delta-grown index
    // must reproduce it bit-for-bit.
    val exact = SparkEntry.queries("q_ann_ivf_trained")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact)
  }
}
