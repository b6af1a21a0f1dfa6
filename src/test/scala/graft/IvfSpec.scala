package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Ivf, Similarity, Tables}

/** Trained-IVF properties: the index is BUILT (kmeans quantizer), probing
  * all cells is exactly the brute-force scan, and partial probing keeps
  * recall@10 above threshold on the clustered embeddings fixture.
  */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val K = 8
  // sf0.001 has too few vectors for the quantizer to carve meaningful
  // cells; sf0.01's 500 label-clustered vectors are the training fixture.
  private val sfDir = "/root/testdata/sf0.01"
  private lazy val embs = Tables.embeddings(spark, sfDir)
  private lazy val centroids = Ivf.train(embs, k = K, iters = 4).localCheckpoint()

  private def exactTop10: Seq[Long] =
    Similarity.queries("q_cosine_topk")(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSeq

  test("training is deterministic and produces k non-degenerate centroids") {
    val c = centroids.collect()
    assert(c.length == K)
    val again = Ivf.train(embs, k = K, iters = 4).collect()
    assert(c.map(_.getSeq[Double](1)).toSeq.sortBy(_.head) ==
      again.map(_.getSeq[Double](1)).toSeq.sortBy(_.head))
    // centroids differ from each other (kmeans actually moved them apart)
    assert(c.map(_.getSeq[Double](1).head).distinct.length > 1)
  }

  test("every vector is assigned to exactly one of the k cells") {
    val a = Ivf.assign(embs, centroids)
    assert(a.count() == embs.count())
    val cells = a.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until K).toSet))
    assert(cells.size > 1, "quantizer collapsed to a single cell")
  }

  test("nprobe = k probes everything: result ≡ exact brute-force top-10") {
    val full = Ivf.search(embs, centroids, queryVecId = 0, nprobe = K, topK = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == exactTop10)
  }

  test("search with a precomputed (persisted) cell assignment matches on-the-fly assignment") {
    val cells = Ivf.assign(embs, centroids).localCheckpoint()
    val precomputed = Ivf.search(embs, centroids, queryVecId = 0, nprobe = 2, topK = 10,
      cellsIn = Some(cells)).collect().toSeq
    val onTheFly = Ivf.search(embs, centroids, queryVecId = 0, nprobe = 2, topK = 10)
      .collect().toSeq
    assert(precomputed == onTheFly)
  }

  test("nprobe = 2 of 8 keeps recall@10 >= 0.5 on the clustered fixture") {
    val approx = Ivf.search(embs, centroids, queryVecId = 0, nprobe = 2, topK = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exactTop10.count(approx.contains) / 10.0
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("cell assignment is map-only: no join, no exchange, and matches a driver-side argmin") {
    val cellsDf = Ivf.assign(embs, centroids)
    val p = cellsDf.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    // Kernel parity: replay squared-L2 argmin (ties to lowest cell) on
    // the collected data.
    val cents = centroids.select("cell", "cv").orderBy("cell").collect()
      .map(r => r.getSeq[Double](1).toArray)
    val got = cellsDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = embs.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    vecs.foreach { case (id, v) =>
      val want = cents.zipWithIndex.minBy { case (c, i) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }._2
      assert(got(id) == want, s"vec $id: got ${got(id)} want $want")
    }
  }

  test("training under a reliable checkpoint dir yields identical centroids") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ckpt_").toString
    val ckpt = Ivf.train(embs, k = K, iters = 4, checkpointDir = Some(dir))
      .select("cell", "cv").collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val local = centroids
      .select("cell", "cv").collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(ckpt == local)
  }

  test("graded q_ann_ivf_trained: full-probe trained path ≡ exact global top-15") {
    // The key's oracle is exact global cosine top-15 for vec 7; the
    // trained pipeline (train → assign → probe ALL cells → re-rank) must
    // reproduce it exactly — this is the driver-gate precondition.
    val graded = Ivf.queries("q_ann_ivf_trained")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    import graft.functions.GraftExpressions.dotProduct
    import org.apache.spark.sql.functions._
    val e = embs.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.where(col("vec_id") === 7).select(col("v").as("qv"))
    val exact = e.crossJoin(q).where(col("vec_id") =!= 7)
      .select(col("vec_id"),
        round(dotProduct(col("v"), col("qv")) /
          (sqrt(dotProduct(col("v"), col("v"))) * sqrt(dotProduct(col("qv"), col("qv")))), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id")).limit(15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(graded == exact)
  }

  test("graded q_ann_ivf_partial: nprobe=2 of 8 on the planted corpus ≡ exact global top-15") {
    // The oracle-soundness precondition for the PARTIAL-probe key: the 20
    // planted near-copies of vec 7 must (a) be the true global top-15 and
    // (b) land inside the 2 probed cells, so the approximate path
    // reproduces the exact answer on this corpus.
    val graded = Ivf.queries("q_ann_ivf_partial")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    import graft.functions.GraftExpressions.dotProduct
    import org.apache.spark.sql.functions._
    val base = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val planted = base.where(col("vec_id") === 7L)
      .crossJoin(spark.range(1, 21).select(col("id").as("j")))
      .select((lit(2000000L) + col("j")).as("vec_id"),
        transform(col("v"), (x, i) =>
          when(i === pmod(col("j"), lit(64)).cast("int"), x * lit(1.05) + lit(0.01))
            .otherwise(x)).as("v"))
    val corpus = base.unionByName(planted)
    val q = corpus.where(col("vec_id") === 7).select(col("v").as("qv"))
    val exact = corpus.crossJoin(q).where(col("vec_id") =!= 7)
      .select(col("vec_id"),
        round(dotProduct(col("v"), col("qv")) /
          (sqrt(dotProduct(col("v"), col("v"))) * sqrt(dotProduct(col("qv"), col("qv")))), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id")).limit(15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(exact.forall(_._1 >= 2000000L), s"planted copies are not the global top-15: $exact")
    assert(graded == exact)
  }
}
