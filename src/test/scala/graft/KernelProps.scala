package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.functions.GraftOps
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** ScalaCheck properties for the round-4 kernels — pure JVM (no Spark
  * jobs), so the generator budget can stay high.
  */
object KernelProps extends Properties("graft.kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(50)

  private val dim = 16
  private val vec: Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](dim, Gen.choose(-10.0, 10.0))
      .suchThat(_.exists(_ != 0.0))

  private def arr(v: Array[Double]) = new GenericArrayData(v)

  property("cosineLshSigs is invariant under positive scaling (direction-only)") =
    forAll(vec, Gen.choose(0.001, 1000.0)) { (v, c) =>
      val a = GraftOps.cosineLshSigs(arr(v), 8, 8, dim).toLongArray().toSeq
      val b = GraftOps.cosineLshSigs(arr(v.map(_ * c)), 8, 8, dim).toLongArray().toSeq
      a == b
    }

  property("cosineLshSigs is deterministic and sized nTables") =
    forAll(vec) { v =>
      val a = GraftOps.cosineLshSigs(arr(v), 12, 8, dim).toLongArray().toSeq
      val b = GraftOps.cosineLshSigs(arr(v), 12, 8, dim).toLongArray().toSeq
      a == b && a.length == 12
    }

  property("nearestCell maps each distinct centroid to its own index") =
    forAll(Gen.choose(2, 6).flatMap(k => Gen.containerOfN[List, Array[Double]](k, vec))) { cs =>
      val distinct = cs.map(_.toSeq).distinct.map(_.toArray)
      (distinct.length >= 2) ==> {
        val flat = distinct.flatten.toArray
        distinct.zipWithIndex.forall { case (c, i) =>
          GraftOps.nearestCell(arr(c), flat, distinct.length) == i
        }
      }
    }

  property("rollingFingerprint separates texts differing in one char (sensitivity)") =
    forAll(Gen.stringOfN(40, Gen.alphaLowerChar), Gen.choose(0, 39)) { (s, i) =>
      val flipped = s.updated(i, if (s(i) == 'a') 'b' else 'a')
      // Min-of-windows CAN coincide when the change misses every minimal
      // window, so assert only the cheap direction plus determinism.
      GraftOps.rollingFingerprint(s, 16) == GraftOps.rollingFingerprint(s, 16) &&
        (s == flipped || GraftOps.fnv1a64(s) != GraftOps.fnv1a64(flipped))
    }

  private val tokenGen: Gen[String] = Gen.choose(1, 8).flatMap(Gen.stringOfN(_, Gen.alphaLowerChar))
  private val tokensGen: Gen[List[String]] = Gen.choose(1, 30).flatMap(Gen.listOfN(_, tokenGen))

  property("simhash64 is invariant under token reordering (multiset hash)") =
    forAll(tokensGen, Gen.long) { (toks, seed) =>
      val rnd = new scala.util.Random(seed)
      GraftOps.simhash64(toks.mkString(" ")) ==
        GraftOps.simhash64(rnd.shuffle(toks).mkString(" "))
    }

  property("simhash64 hamming distance is a semi-metric (symmetric, self-zero)") =
    forAll(tokensGen, tokensGen) { (a, b) =>
      def h(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
      val (sa, sb) = (GraftOps.simhash64(a.mkString(" ")), GraftOps.simhash64(b.mkString(" ")))
      h(sa, sa) == 0 && h(sa, sb) == h(sb, sa)
    }

  property("simhash64 of a single repeated token keeps the token's hash sign pattern") =
    // One distinct token: every bit's vote has the same sign as the
    // token hash's bit, so the signature IS the token hash — repetition
    // count must not change it.
    forAll(tokenGen, Gen.choose(1, 10)) { (t, n) =>
      GraftOps.simhash64(List.fill(n)(t).mkString(" ")) == GraftOps.fnv1a64(t)
    }

  // ---- TopK.merge: the shared batch-Aggregator / streaming kernel ----

  private val item: Gen[(Double, Long)] =
    Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0L, 50L))
  private val items: Gen[List[(Double, Long)]] = Gen.listOf(item)

  private def ordered(s: Seq[(Double, Long)]): Boolean =
    s.sliding(2).forall {
      case Seq((v1, i1), (v2, i2)) => v1 > v2 || (v1 == v2 && i1 <= i2)
      case _ => true
    }

  property("TopK.merge is bounded, ordered, and a subset of its inputs") =
    forAll(items, items, Gen.choose(1, 8)) { (a, b, k) =>
      val m = graft.functions.TopK.merge(a, b, k)
      m.size <= k && ordered(m) && m.forall(x => a.contains(x) || b.contains(x))
    }

  property("TopK.merge is associative: merge(merge(a,b),c) == merge(a,merge(b,c))") =
    forAll(items, items, items, Gen.choose(1, 8)) { (a, b, c, k) =>
      val ab = graft.functions.TopK.merge(Nil, a ++ b, k)
      val bc = graft.functions.TopK.merge(Nil, b ++ c, k)
      graft.functions.TopK.merge(ab, c, k) == graft.functions.TopK.merge(a, bc, k)
    }

  property("TopK.merge ignores partitioning: any split of the input gives one answer") =
    forAll(items, Gen.choose(1, 8), Gen.choose(0, 100)) { (a, k, cut) =>
      val (x, y) = a.splitAt(if (a.isEmpty) 0 else cut % (a.size + 1))
      graft.functions.TopK.merge(
        graft.functions.TopK.merge(Nil, x, k), y, k) ==
        graft.functions.TopK.merge(Nil, a, k)
    }
}
