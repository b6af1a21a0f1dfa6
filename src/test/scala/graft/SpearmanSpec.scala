package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Relational

/** Spearman variants vs an independent in-JVM reference: midranks +
  * Pearson over ranks computed in plain Scala — so the distributed
  * formulation (dictionary windows, broadcast joins, width_bucket
  * pre-binning) is checked against the textbook definition, not against
  * itself.
  */
class SpearmanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Textbook Spearman: midrank each column (average rank across ties),
    * then Pearson of the rank vectors.
    */
  private def exactSpearman(xs: Seq[Double], ys: Seq[Double]): Double = {
    def midranks(v: Seq[Double]): Seq[Double] = {
      val byValue = v.zipWithIndex.sortBy(_._1)
      val ranks = new Array[Double](v.length)
      var i = 0
      while (i < byValue.length) {
        var j = i
        while (j < byValue.length && byValue(j)._1 == byValue(i)._1) j += 1
        val mid = (i + 1 + j) / 2.0 // average of ranks i+1 .. j
        for (k <- i until j) ranks(byValue(k)._2) = mid
        i = j
      }
      ranks.toSeq
    }
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length
      val ma = a.sum / n; val mb = b.sum / n
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val va = a.map(x => (x - ma) * (x - ma)).sum
      val vb = b.map(y => (y - mb) * (y - mb)).sum
      cov / math.sqrt(va * vb)
    }
    pearson(midranks(xs), midranks(ys))
  }

  private def runBinned(pairs: Seq[(Double, Double)], bins: Int = 1000): Double =
    Relational.corrSpearmanBinned(pairs.toDF("a", "b"), "a", "b", "rho", bins)
      .collect()(0).getDouble(0)

  private def runPlain(pairs: Seq[(Double, Double)]): Double =
    Relational.corrSpearman(pairs.toDF("a", "b"), "a", "b", "rho")
      .collect()(0).getDouble(0)

  test("perfect monotone association is ±1 through both variants") {
    // Rank correlation sees through the nonlinearity: exactly 1 for the
    // plain variant. The binned twin is exact only when binning is
    // injective on the values — true for the evenly-spaced columns;
    // the exponential column intentionally collapses its small values
    // into shared equi-width buckets (ties), costing a hair of rho.
    val up = (1 to 50).map(i => (i.toDouble, math.exp(i / 10.0)))
    assert(runPlain(up) == 1.0)
    assert(runBinned(up) >= 0.9999, s"binned exp: ${runBinned(up)}")
    val down = (1 to 50).map(i => (i.toDouble, -i * 3.0))
    assert(runPlain(down) == -1.0 && runBinned(down) == -1.0)
  }

  test("generated low-cardinality data: plain and binned both match exact Spearman") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      // Low-cardinality integer-valued doubles with heavy ties — binning
      // with ample bins is injective on the realized values, so BOTH
      // variants must equal the textbook value to the 6-dp rounding.
      val n = 200 + rnd.nextInt(300)
      val card = 3 + rnd.nextInt(10)
      val pairs = Seq.fill(n) {
        val x = rnd.nextInt(card).toDouble
        // correlate y with x, plus noise, then discretize to force ties
        val y = math.floor(x * (if (trial % 2 == 0) 1 else -1) +
          rnd.nextInt(card) * 0.5).toDouble
        (x, y)
      }
      val want = math.rint(exactSpearman(pairs.map(_._1), pairs.map(_._2)) * 1e6) / 1e6
      val plain = runPlain(pairs)
      val binned = runBinned(pairs)
      assert(math.abs(plain - want) <= 1e-6, s"trial $trial plain: $plain vs $want")
      assert(math.abs(binned - want) <= 1e-6, s"trial $trial binned: $binned vs $want")
    }
  }

  test("binned approximation converges on continuous data as bins grow") {
    val rnd = new scala.util.Random(7)
    // Continuous (all-distinct) values: binning is the honest use case.
    val pairs = Seq.fill(500)((rnd.nextGaussian(), rnd.nextGaussian()))
      .map { case (x, y) => (x, 0.6 * x + 0.8 * y) }
    val want = exactSpearman(pairs.map(_._1), pairs.map(_._2))
    val coarse = runBinned(pairs, bins = 16)
    val fine = runBinned(pairs, bins = 100000)
    // Error shrinks with resolution: coarse lands in the neighborhood,
    // fine is near-exact (a few of the 500 gaussians still share a
    // 1/100000 bucket — binning stays an approximation on truly
    // continuous data, which is its contract).
    assert(math.abs(fine - want) <= 1e-3, s"fine: $fine vs $want")
    assert(math.abs(coarse - want) <= 0.05, s"coarse: $coarse vs $want")
    assert(math.abs(fine - want) < math.abs(coarse - want),
      s"no convergence: fine $fine, coarse $coarse, exact $want")
  }
}
