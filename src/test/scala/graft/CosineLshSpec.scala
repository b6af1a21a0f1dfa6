package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{CosineLsh, Tables}

/** Hyperplane-LSH cosine near-dup: the fixture has no pairs above
  * cos 0.9 (its similarity suite runs at τ = 0.4, below what sign-LSH
  * can discriminate), so the spec PLANTS near-duplicates — deterministic
  * small perturbations of existing vectors — and checks the operator
  * against exact brute-force ground truth on the augmented corpus.
  */
class CosineLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"
  private val Dim = 64
  private val Tau = 0.95

  /** Fixture ∪ 25 perturbed copies (ids shifted by 100000): component i
    * gets a deterministic ±3% relative nudge — cos(v, v') ≈ 0.999.
    */
  private lazy val corpus: DataFrame = {
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val planted = base.where(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + when(pmod(xxhash64(col("vec_id"), i), lit(2)) === 0, lit(0.03))
            .otherwise(lit(-0.03))).cast("float")).as("embedding"))
    base.union(planted)
  }

  private def exactPairs(threshold: Double): Set[(Long, Long)] = {
    import graft.functions.GraftExpressions.dotProduct
    val e = corpus.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n", sqrt(dotProduct(col("v"), col("v"))))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("n").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .where(dotProduct(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("planted near-duplicates are recovered: recall >= 0.9, precision exact") {
    val truth = exactPairs(Tau)
    assert(truth.nonEmpty, "no planted pairs above threshold — vacuous test")
    val found = CosineLsh.nearDup(corpus, Dim, Tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.9, s"recall = $recall (${found.size} found / ${truth.size} true)")
    // The confirm step is exact cosine, so NO false positives can survive.
    assert(found.subsetOf(truth), s"false positives: ${found.diff(truth).take(5)}")
  }

  test("salted no-broadcast shape ≡ broadcast shape, and its plan has no broadcast") {
    val broad = CosineLsh.nearDup(corpus, Dim, Tau).collect().toSeq
    val saltedDf = CosineLsh.nearDup(corpus, Dim, Tau, shapeIn = graft.engine.Dedup.Salted())
    assert(broad.nonEmpty)
    assert(saltedDf.collect().toSeq == broad)
    val plan = saltedDf.queryExecution.executedPlan.toString
    // The hyperplane frame (O(T·bits·dim) model state) is legitimately
    // broadcast even in the salted shape; it hides inside the checkpointed
    // signature job, so the visible candidate/confirm plan must be free of
    // broadcasts entirely.
    assert(!plan.contains("Broadcast"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
  }

  test("signatures and results are deterministic across runs") {
    val r1 = CosineLsh.nearDup(corpus, Dim, Tau).collect().toSeq
    val r2 = CosineLsh.nearDup(corpus, Dim, Tau).collect().toSeq
    assert(r1 == r2)
  }

  test("a random (low-cosine) corpus yields no pairs at a high threshold") {
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val found = CosineLsh.nearDup(base, Dim, Tau).count()
    assert(found == 0L)
  }
}
