package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Privacy, Tables}

/** Privacy-release semantics the mirrored oracle cannot independently
  * witness: the released set must be EXACTLY the rows whose QI cell
  * clears k (recomputed here by an independent in-memory census), and
  * the diversity flag must track the true distinct-sensitive count.
  */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val cust = Tables.customer(spark, TestSpark.sfDir)
    .collect().map(r => (r.getLong(0), r.getInt(2),
      r.getString(4), math.floor(r.getDouble(3) / Privacy.BandWidth).toLong))

  test("k-anonymity releases exactly the rows whose QI cell clears k") {
    val census = cust.groupBy(c => (c._2, c._3, c._4)).map { case (k, v) => k -> v.size }
    val expected = cust.filter(c => census((c._2, c._3, c._4)) >= Privacy.K)
      .map(_._1).toSet
    val released = SparkEntry.queries("q_k_anonymity")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(released.keySet == expected,
      s"released ${released.size}, expected ${expected.size}")
    // And each released row must carry its TRUE cell size (the
    // 1/grp_n re-identification bound), not just any value ≥ k.
    val byKey = cust.map(c => c._1 -> (c._2, c._3, c._4)).toMap
    released.foreach { case (ck, n) =>
      assert(n == census(byKey(ck)), s"custkey $ck grp_n $n")
    }
    assert(expected.size < cust.length, "fixture must exercise suppression")
  }

  test("l-diversity flag tracks the true distinct-sensitive count") {
    val orders = Tables.orders(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(1) -> r.getString(5))
    val byKey = cust.map(c => c._1 -> (c._2, c._3, c._4)).toMap
    val truth = orders.flatMap { case (ck, prio) => byKey.get(ck).map(_ -> prio) }
      .groupBy(_._1).map { case (k, v) =>
        k -> (v.size.toLong, v.map(_._2).distinct.size.toLong) }
    val got = SparkEntry.queries("q_l_diversity")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (k, (n, ns, div)) =>
      assert((n, ns) == truth(k), s"cell $k")
      assert(div == (ns >= Privacy.L), s"cell $k flag")
    }
    assert(got.values.exists(!_._3) && got.values.exists(_._3),
      "fixture must exercise both diverse and non-diverse cells")
  }
}
