package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.functions._
import graft.engine.{Dedup, TextAnalysis}

/** Generated event row for the dedup-algebra properties (top-level so the
  * Dataset encoder codegen can reach it — a nested private case class
  * forces interpreter fallback).
  */
case class Ev(user_id: Long, event_type: String, ts: Long, event_id: Long, value: Double)

/** ScalaCheck properties (SURVEY.md §5.2) for the hash/sketch operators
  * that have no DuckDB oracle, and for the dedup algebra.
  * Runs under sbt's native ScalaCheck framework (no scalatest bridge).
  */
object DedupProps extends Properties("graft.dedup") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Spark-backed properties run few-but-real cases.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val token: Gen[String] = Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val tokens: Gen[List[String]] = Gen.nonEmptyListOf(token)

  private val events: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 4L)
      t <- Gen.oneOf("click", "view", "purchase")
      ts <- Gen.choose(0L, 50L)
      v <- Gen.choose(0, 1000).map(_ / 10.0)
    } yield (u, t, ts, v))
  } yield evs.zipWithIndex.map { case ((u, t, ts, v), i) => Ev(u, t, ts, i.toLong, v) }

  property("firstWins: one survivor per key, min (ts,id), subset, idempotent") = forAll(events) { evs =>
    val df = evs.toDF()
    val out = Dedup.firstWins(df, Seq("user_id", "event_type"), Seq("ts", "event_id"))
      .as[Ev].collect().toList
    val expected = evs.groupBy(e => (e.user_id, e.event_type))
      .values.map(_.minBy(e => (e.ts, e.event_id))).toSet
    val again = Dedup.firstWins(out.toDF(), Seq("user_id", "event_type"), Seq("ts", "event_id"))
      .as[Ev].collect().toSet
    Prop(out.toSet == expected) :| "survivors are the per-key (ts,id) minima" &&
      Prop(out.toSet.subsetOf(evs.toSet)) :| "output is a subset of input" &&
      Prop(again == out.toSet) :| "idempotent"
  }

  property("minhash: equal token SETS (any order/multiplicity) give equal signatures and bands") =
    forAll(tokens) { toks =>
      val variant = scala.util.Random.shuffle(toks ++ toks.take(toks.size / 2))
      val df = Seq((1L, toks.distinct), (2L, variant.distinct))
        .toDF("doc_id", "toks")
      val rows = Dedup.signatures(df)
        .select(array_join(col("minhash_sig"), ",").as("sig"), array_join(col("bands"), ",").as("b"))
        .collect()
      Prop(rows(0).getString(0) == rows(1).getString(0)) :| "signatures equal" &&
        Prop(rows(0).getString(1) == rows(1).getString(1)) :| "bands equal"
    }

  property("minhash: signature has NumHashes entries, bands NumBands") = forAll(tokens) { toks =>
    val row = Dedup.signatures(Seq((1L, toks.distinct)).toDF("doc_id", "toks"))
      .select(size(col("minhash_sig")), size(col("bands"))).collect()(0)
    row.getInt(0) == Dedup.NumHashes && row.getInt(1) == Dedup.NumBands
  }

  /** Generated corpora with PLANTED near-dups: both physical LSH shapes
    * must equal brute-force exact Jaccard ≥ 0.9 on arbitrary data, not
    * just the fixture. (A planted dup drops ~5% of tokens → J ≈ 0.95,
    * clear of both the threshold and the banding's 3e-12 miss odds.)
    */
  private val corpus: Gen[List[(Long, Seq[String])]] = for {
    nDocs <- Gen.choose(4, 10)
    bases <- Gen.listOfN(nDocs, Gen.listOfN(40, token).map(_.distinct.sorted)
      .suchThat(_.size >= 20))
    dupMask <- Gen.listOfN(nDocs, Gen.prob(0.5))
  } yield {
    val base = bases.zipWithIndex.map { case (t, i) => (i.toLong, t: Seq[String]) }
    val dups = base.zip(dupMask).collect { case ((id, t), true) =>
      (id + 1000L, t.drop(t.size / 20): Seq[String]) // J = (n-k)/n ≥ 0.9
    }
    base ++ dups
  }

  property("lshNearDupPairs, both shapes == brute-force exact Jaccard on generated corpora") =
    forAll(corpus) { docs =>
      val sigs = Dedup.signatures(docs.toDF("doc_id", "toks"))
      def run(shape: Dedup.LshShape): Set[(Long, Long)] =
        Dedup.lshNearDupPairs(sigs, "toks", 9, 10, 0.9, shape)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val brute = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        inter = ta.toSet.intersect(tb.toSet).size
        j = BigDecimal(inter.toDouble / (ta.size + tb.size - inter))
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        if j >= 0.9
      } yield (ia, ib)).toSet
      val broad = run(Dedup.Broadcast)
      val salted = run(Dedup.Salted(cap = 4))
      Prop(broad == brute) :| s"broadcast shape: got $broad want $brute" &&
        Prop(salted == brute) :| s"salted shape: got $salted want $brute"
    }

  // -------- pure-Scala hash properties (no Spark; default 100 cases) ------

  property("simhash64 is deterministic and order-sensitive-stable") = forAll { (s: String) =>
    TextAnalysis.simhash64(s) == TextAnalysis.simhash64(s)
  }

  property("simhash64 ignores extra whitespace between tokens") = forAll(tokens) { toks =>
    TextAnalysis.simhash64(toks.mkString(" ")) ==
      TextAnalysis.simhash64(toks.mkString("  ") + " ")
  }

  property("rollingFingerprint is deterministic; equal texts ⇒ equal fingerprints") =
    forAll { (s: String) =>
      TextAnalysis.rollingFingerprint(s) == TextAnalysis.rollingFingerprint(new String(s))
    }

  property("fnv1a64: differing hashes imply differing strings") =
    forAll(token, token) { (a, b) =>
      (TextAnalysis.fnv1a64(a) != TextAnalysis.fnv1a64(b)) ==> (a != b)
    }

  // ---- PassJoin banding (FuzzyJoin): the pigeonhole recall guarantee ----

  /** Apply up to d random single-char edits (insert/delete/substitute). */
  private def edits(s: String, d: Int): Gen[String] = {
    def step(cur: String): Gen[String] = for {
      op <- Gen.choose(0, 2)
      pos <- Gen.choose(0, math.max(cur.length - 1, 0))
      ch <- Gen.alphaLowerChar
    } yield op match {
      case 0 if cur.nonEmpty => cur.updated(math.min(pos, cur.length - 1), ch) // substitute
      case 1 => cur.take(pos) + ch + cur.drop(pos) // insert
      case _ if cur.length > 1 => cur.take(pos) + cur.drop(pos + 1) // delete
      case _ => cur
    }
    Gen.choose(0, d).flatMap { n =>
      (1 to n).foldLeft(Gen.const(s)) { (g, _) => g.flatMap(step) }
    }
  }

  property("PassJoin candidates contain every probe within dmax of a name (pigeonhole)") = {
    val dmax = 3
    // Lengths 1..20 COVER the short-name regime (nlen <= dmax), where the
    // segment pigeonhole is vacuous and the length-window branch must
    // carry recall.
    val name: Gen[String] = Gen.choose(1, 20).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
    forAll(Gen.listOfN(6, name.flatMap(n => edits(n, dmax).map(n -> _)))) { pairs =>
      val names = pairs.map(_._1).distinct.zipWithIndex
        .map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
      val probes = pairs.map(_._2).distinct.map(Tuple1(_)).toDF("probe")
      // Ground truth: every (probe, name) pair actually within dmax.
      val truth = names.crossJoin(probes)
        .where(levenshtein(col("probe"), col("name")) <= dmax)
        .select("probe", "id", "name")
      val cand = graft.engine.FuzzyJoin.candidates(names, probes, dmax)
      truth.except(cand).count() == 0L
    }
  }
}
