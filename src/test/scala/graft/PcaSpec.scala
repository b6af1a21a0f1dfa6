package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Pca

/** Eigensolver semantics the oracle can't see (the basis has no SQL
  * twin — only the covariance frame and the norm-preservation check are
  * hash-gated): A·v = λ·v must actually hold, the basis must be
  * orthonormal with descending non-negative eigenvalues, projections
  * must carry the eigenvalue as their variance, and the whole fit must
  * be run-deterministic.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def covOf(d: String): Array[Array[Double]] = {
    val rows = Pca.covarianceFrame(
      graft.engine.Tables.embeddings(spark, d)).collect()
    val a = Array.ofDim[Double](Pca.Dim, Pca.Dim)
    rows.foreach { r =>
      val (i, j) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
      a(i)(j) = r.getDouble(2); a(j)(i) = r.getDouble(2)
    }
    a
  }

  test("streamed moment state derives the batch covariance (two-batch seam, RocksDB)") {
    // The moment table IS the streaming state: feed the fixture corpus in
    // two batches through the update-mode aggregation (RocksDB provider
    // via sessionConf), upsert emitted updates per (i, j) — pair moments
    // are NOT monotone, so latest-write-wins, not max — then derive the
    // covariance from the final state and compare to the graded batch key
    // on its own 6-decimal grid. The vec_id % 8 split puts a seam through
    // every moment (both batches touch all 2145 keys).
    import graft.streaming.Streams
    import spark.implicits._
    val embs = graft.engine.Tables.embeddings(spark, TestSpark.sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val rows = embs.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val (b1, b2) = rows.partition(_._1 % 8 != 0)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])](Streams.sessionConf(spark))
    val state = new scala.collection.concurrent.TrieMap[(Int, Int), Double]
    val q = Streams.start(
      Streams.pcaMomentStream(ms.toDF().toDF("vec_id", "embedding")),
      Streams.ForeachBatchSink((df, _) => df.collect().foreach(r =>
        state.put((r.getInt(0), r.getInt(1)), r.getDouble(2)))),
      mode = org.apache.spark.sql.streaming.OutputMode.Update())
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(state.size == 64 * 65 / 2 + 64 + 1, s"moment keys: ${state.size}")
    val momentDf = state.toSeq.map { case ((i, j), m) => (i, j, m) }
      .toDF("i", "j", "sm")
    val derived = graft.engine.Pca.covFromMoments(momentDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val batch = SparkEntry.queries("q_pca_covariance")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(derived == batch,
      s"streamed-state covariance differs from batch on ${derived.count { case (k, v) => batch(k) != v }} cells")
  }

  test("jacobi solves a known 2x2 and a fixture-sized symmetric system") {
    // [[2,1],[1,2]] → λ = 3, 1 with eigenvectors (1,1)/√2 and (1,−1)/√2.
    val (vals, vecs) = Pca.jacobiEigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3) < 1e-12 && math.abs(vals(1) - 1) < 1e-12)
    assert(math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-12)
    // Residual ‖A·v − λ·v‖∞ on the real covariance matrix.
    val a = covOf(TestSpark.sfDir)
    val (values, vectors) = Pca.jacobiEigSym(a)
    for (k <- 0 until Pca.Dim) {
      val v = vectors(k)
      val res = (0 until Pca.Dim).map { r =>
        math.abs((0 until Pca.Dim).map(c => a(r)(c) * v(c)).sum - values(k) * v(r))
      }.max
      assert(res < 1e-9, s"eigenpair $k residual $res")
    }
    // Descending, PSD (covariance), orthonormal.
    assert(values.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(values.forall(_ > -1e-9))
    for (i <- 0 until Pca.Dim; j <- i until Pca.Dim) {
      val dot = (0 until Pca.Dim).map(c => vectors(i)(c) * vectors(j)(c)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10,
        s"basis not orthonormal at ($i,$j): $dot")
    }
  }

  test("projected coordinates carry the eigenvalue as their variance") {
    val a = covOf(TestSpark.sfDir)
    val (values, _) = Pca.jacobiEigSym(a)
    val varByComp = SparkEntry.queries("q_pca_project")(spark, TestSpark.sfDir)
      .groupBy("comp").agg(var_samp(col("coord")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- 0 until Pca.TopK) {
      assert(math.abs(varByComp(k.toLong) - values(k)) < 1e-3,
        s"component $k variance ${varByComp(k.toLong)} != eigenvalue ${values(k)}")
    }
  }

  test("the fit is run-deterministic (fixed sweep order, sign-fixed vectors)") {
    val a = SparkEntry.queries("q_pca_project")(spark, TestSpark.sfDir)
      .collect().map(_.toString)
    val b = SparkEntry.queries("q_pca_project")(spark, TestSpark.sfDir)
      .collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
