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

  private def exactPairsOf(in: DataFrame, threshold: Double): Set[(Long, Long)] = {
    import graft.functions.GraftExpressions.dotProduct
    val e = in.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n", sqrt(dotProduct(col("v"), col("v"))))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("n").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .where(dotProduct(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def exactPairs(threshold: Double): Set[(Long, Long)] = exactPairsOf(corpus, threshold)

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

  test("native signature kernel ≡ declarative hyperplane crossJoin form") {
    // Same chained xxhash64(table, bit, i) parity on both paths — the
    // memoized sign matrix must reproduce the SQL-built hyperplane frame
    // bit for bit, or the two formulations drift silently.
    val e = corpus
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    def sigMap(df: DataFrame): Map[Long, Seq[Long]] =
      df.select(col("vec_id"), col("sigs")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val viaKernel = sigMap(CosineLsh.withSignatures(e, 12, 8, Dim))
    val viaJoin = sigMap(CosineLsh.signaturesViaJoin(e, CosineLsh.hyperplanes(spark, Dim, 12, 8)))
    assert(viaKernel.nonEmpty)
    assert(viaKernel == viaJoin)
  }

  test("signature computation is map-only: no exchange between scan and sigs") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val p = CosineLsh.withSignatures(e, 12, 8, Dim).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("nearDupAgainst finds exactly the delta vectors duplicating the corpus") {
    // Corpus = fixture; delta = 10 perturbed copies (near-dups, must be
    // flagged) + 10 NEGATED fixture vectors (cos −1 vs their original,
    // ≤ 0.60 vs everything else — must survive at τ = 0.99).
    val corpus = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val copies = corpus.where(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 500000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x * (lit(1.0) + when(i === 0, lit(0.02)).otherwise(lit(0.0)))).cast("float"))
          .as("embedding"))
    val fresh = corpus.where(col("vec_id") % 50 === 7)
      .select((col("vec_id") + 600000).as("vec_id"),
        transform(col("embedding"), x => (-x).cast("float")).as("embedding"))
    val delta = copies.unionByName(fresh)
    val flagged = CosineLsh.nearDupAgainst(delta, corpus, Dim, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted copy pairs with its original, nothing else
    val want = corpus.where(col("vec_id") % 50 === 0)
      .select("vec_id").collect().map(_.getLong(0)).map(v => (v + 500000, v)).toSet
    assert(flagged == want, s"flagged ${flagged.size}, want ${want.size}")
  }

  test("graded q_cosine_neardup recovers EXACTLY the planted pair set (oracle precondition)") {
    // The driver's oracle is exact all-pairs cosine on the same planted
    // corpus; at τ = 0.99 the per-pair LSH miss probability is ~1e-22
    // (CosineLsh scaladoc), so set equality — not just recall ≥ x — is
    // the contract this key is graded on.
    val graded = CosineLsh.queries("q_cosine_neardup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val planted = base.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) => when(i === 0, x * lit(1.1)).otherwise(x)).as("embedding"))
    val truth = exactPairsOf(base.unionByName(planted), 0.99)
    assert(truth.nonEmpty, "no planted pairs above threshold — vacuous key")
    assert(graded == truth)
  }
}
