package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Linkage

/** Fellegi–Sunter semantics the mirrored oracle cannot independently
  * witness: each corruption class must land on its engineered score, the
  * triple-corrupted twin must be LOST (the model's honest miss), and
  * every other entity must re-link to its own twin.
  */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val links =
    SparkEntry.queries("q_record_linkage")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  private def w(agree: Boolean, m: Double, u: Double): Double =
    if (agree) math.log(m / u) else math.log((1 - m) / (1 - u))
  private def score(name: Boolean, acct: Boolean, seg: Boolean): Double =
    BigDecimal(w(name, Linkage.NameM, Linkage.NameU) +
      w(acct, Linkage.AcctM, Linkage.AcctU) +
      w(seg, Linkage.SegM, Linkage.SegU))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("entities re-link to their twin iff at most one field is corrupted") {
    // Single-corruption scores (3.70 / 6.46 / 8.47) all clear the 3.0
    // threshold; EVERY multi-corruption pattern (2.14 / −0.63 / −2.63 /
    // −6.96) falls below it — the model's honest misses.
    val n = graft.engine.Tables.customer(spark, TestSpark.sfDir).count()
    val self = links.keys.filter(p => p._1 == p._2).map(_._1).toSet
    val expected = (1L to n).filter(k =>
      Seq(k % 3 == 0, k % 5 == 0, k % 7 == 0).count(identity) <= 1).toSet
    assert(expected.size < n, "fixture must contain multi-corrupt keys")
    assert(self == expected,
      s"linked ${self.size} of $n, expected ${expected.size}")
  }

  test("each corruption class lands on its engineered score") {
    // Clean keys (no corruption): all three fields agree.
    assert(links((1L, 1L)) == score(name = true, acct = true, seg = true))
    // %3 → segment miskeyed; %5 → name typo; %7 → balance drift.
    assert(links((3L, 3L)) == score(name = true, acct = true, seg = false))
    assert(links((5L, 5L)) == score(name = false, acct = true, seg = true))
    assert(links((7L, 7L)) == score(name = true, acct = false, seg = true))
    // %15 → name + segment both corrupt: 3.70 − 6.0 < threshold? No —
    // name disagree + seg disagree + acct agree = −0.63: lost.
    assert(!links.contains((15L, 15L)), "double-corrupt name+seg must be lost")
  }

  test("survivorship applies each field rule, including NULL fall-through") {
    val cust = graft.engine.Tables.customer(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(3), r.getString(4))).toMap
    val golden = SparkEntry.queries("q_dedup_survivorship")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    assert(golden.keySet == cust.keySet, "one golden record per entity")
    golden.foreach { case (k, (name, support, acct, seg)) =>
      val (mName, mAcct, mSeg) = cust(k)
      // Name mode: corrupted only when BOTH feeds corrupt it (%5 and %4)
      // — then the three candidates are distinct and priority keeps the
      // master's; so the master name always survives, with support =
      // count of agreeing feeds.
      assert(name == mName, s"key $k name")
      val expSupport = 3L - Seq(k % 5 == 0, k % 4 == 0).count(identity)
      assert(support == expSupport, s"key $k support $support")
      // Balance max: the largest planted drift wins (+2.0 at %6 beats
      // +1.0 at %7 when both fire, e.g. key 42).
      val expAcct = mAcct +
        (if (k % 6 == 0) 2.0 else if (k % 7 == 0) 1.0 else 0.0)
      assert(acct == expAcct, s"key $k acct")
      // Segment priority: master unless its planted NULL (%11) falls
      // through to the crawl feed — whose own %3 corruption then leaks
      // into the golden record (e.g. key 33: 'X'-prefixed survives).
      val expSeg =
        if (k % 11 != 0) mSeg
        else if (k % 3 == 0) "X" + mSeg
        else mSeg
      assert(seg == expSeg, s"key $k segment")
    }
  }

  test("compound blocking keeps every planted twin link (scale-path recall)") {
    // The graded key (compound block since r12) sub-blocks each nation
    // by custkey range; a twin shares its original's custkey, so every
    // TWIN link (key_a == key_b) the coarse nation-block finds must
    // survive intact in the graded result — only incidental
    // cross-customer collision links may straddle buckets (the
    // documented blocking recall trade).
    val coarse = graft.engine.Linkage.coarseLinkageFrame(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val graded = SparkEntry.queries("q_record_linkage")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val coarseTwins = coarse.filter { case ((a, b), _) => a == b }
    val gradedTwins = graded.filter { case ((a, b), _) => a == b }
    assert(coarseTwins.nonEmpty && gradedTwins == coarseTwins,
      s"twin links ${gradedTwins.size} vs coarse ${coarseTwins.size}")
    assert(graded.keySet.subsetOf(coarse.keySet),
      "sub-blocking must never invent a pair the nation block lacks")
  }

  test("cross-entity links require coincident balance AND segment") {
    // name never agrees across distinct custkeys (names embed the key),
    // so any cross link must carry exactly the acct+seg-agree score.
    val cross = links.filter(p => p._1._1 != p._1._2)
    val expected = score(name = false, acct = true, seg = true)
    assert(cross.values.forall(_ == expected), s"${cross.take(3)}")
  }
}
