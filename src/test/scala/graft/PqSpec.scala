package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Pq, Tables}

/** Product quantization: codes are a deterministic map-only projection;
  * ADC + exact re-rank returns the exact top-k on the planted corpus
  * (margin far beyond quantization error); ADC recall catches every
  * planted near-copy.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.01"

  /** The q_ann_pq / q_ann_ivf_partial planted corpus: 20 near-copies of
    * vector 7 over the raw fixture.
    */
  private def plantedCorpus(): DataFrame = {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val planted = base.where(col("vec_id") === 7L)
      .crossJoin(spark.range(1, 21).select(col("id").as("j")))
      .select((lit(2000000L) + col("j")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === pmod(col("j"), lit(64)).cast("int"), x * lit(1.05) + lit(0.01))
            .otherwise(x)).as("embedding"))
    base.unionByName(planted)
  }

  private def bruteForceTopK(corpus: DataFrame, k: Int): Seq[(Long, Double)] = {
    import graft.functions.GraftExpressions.dotProduct
    val e = corpus.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nv2", dotProduct(col("v"), col("v")))
    val q = e.where(col("vec_id") === 7L).select(col("v").as("qv"), col("nv2").as("nq2"))
    e.where(col("vec_id") =!= 7L && col("nv2") > 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dotProduct(col("v"), col("qv")) / (sqrt(col("nv2")) * sqrt(col("nq2"))), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id")).limit(k)
      .as[(Long, Double)].collect().toSeq
  }

  test("graded q_ann_pq ≡ exact brute-force top-15 (ordered, values included)") {
    val got = Pq.queries("q_ann_pq")(spark, sfDir).as[(Long, Double)].collect().toSeq
    val truth = bruteForceTopK(plantedCorpus(), 15)
    assert(truth.forall(_._2 > 0.99), s"planted margin missing: $truth")
    assert(got == truth)
  }

  test("ADC recall: every planted near-copy survives the candidate cut") {
    val corpus = plantedCorpus().localCheckpoint()
    val model = Pq.train(corpus, dim = 64, m = 8, ksub = 16, iters = 2)
    val codes = Pq.encode(corpus, model).localCheckpoint()
    // topK = 20, rerankFactor = 3 → the ADC stage keeps 60 candidates;
    // all 20 copies (cos ≈ 0.999⁺ vs 0.60 background) must be among
    // them, so the exact re-rank returns exactly the copy set.
    val got = Pq.search(corpus, codes, model, queryVecId = 7L, topK = 20, rerankFactor = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(got == (1 to 20).map(2000000L + _).toSet, got.toString)
  }

  test("graded q_ann_ivfpq ≡ exact brute-force top-15 (the composed index stays exact here)") {
    val got = Pq.queries("q_ann_ivfpq")(spark, sfDir).as[(Long, Double)].collect().toSeq
    val truth = bruteForceTopK(plantedCorpus(), 15)
    assert(got == truth)
  }

  test("IVF-PQ candidate scan touches only the probed cells") {
    import graft.engine.Ivf
    val corpus = plantedCorpus().localCheckpoint()
    val centroids = Ivf.train(corpus, k = 8, iters = 3)
    val cells = Ivf.assign(corpus, centroids).localCheckpoint()
    val model = Pq.trainResiduals(corpus, cells, centroids, 64, 8, 16, 2)
    val codes = Pq.encodeResiduals(corpus, cells, centroids, model).localCheckpoint()
    // All 20 copies share v7's cell (the co-location the probe rides on).
    val copyCells = codes.where(col("vec_id") >= 2000001L)
      .select("cell").distinct().as[Int].collect().toSeq
    val v7Cell = cells.where(col("vec_id") === 7L).select("cell").as[Int].head()
    assert(copyCells == Seq(v7Cell), s"copies scattered: $copyCells vs v7 in $v7Cell")
    val got = Pq.searchIvfPq(corpus, centroids, model, codes, 7L, nprobe = 2, topK = 20,
      rerankFactor = 3).select("vec_id").as[Long].collect().toSet
    assert(got == (1 to 20).map(2000000L + _).toSet, got.toString)
  }

  test("encode is deterministic, map-only shaped, and emits m in-range codes") {
    val corpus = plantedCorpus().localCheckpoint()
    val model = Pq.train(corpus, dim = 64, m = 8, ksub = 16, iters = 2)
    val a = Pq.encode(corpus, model).as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    val b = Pq.encode(corpus, model).as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.forall { case (_, cs) => cs.length == 8 && cs.forall(c => c >= 0 && c < 16) })
    // The 20 near-copies quantize to the SAME code word — the density
    // the ADC margin rides on.
    val copyCodes = a.filter(_._1 >= 2000001L).map(_._2).distinct
    assert(copyCodes.size <= 2, s"copies scattered across code words: $copyCodes")
    // Map-only: no exchange between the scan and the codes projection.
    val p = Pq.encode(corpus, model).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
