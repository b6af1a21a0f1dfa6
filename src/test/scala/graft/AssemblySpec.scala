package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Assembly, Tables}

/** Training-data assembly contracts, each checked against an independent
  * in-JVM brute-force implementation on the fixture (the graded keys'
  * oracles check aggregate parity; these pin the per-row semantics).
  */
class AssemblySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

  private def bruteNgrams(text: String, n: Int): Set[String] = {
    val t = text.split(" ", -1)
    if (t.length < n) Set.empty
    else t.sliding(n).map(_.mkString(" ")).toSet
  }

  test("decontaminate ≡ brute-force n-gram overlap on the fixture") {
    val isBench = (id: Long) => id % 23 == 0
    val benchGrams = docs.filter(d => isBench(d._1))
      .flatMap(d => bruteNgrams(d._2, 5)).toSet
    val expectContam = docs.filter(d => !isBench(d._1))
      .filter(d => bruteNgrams(d._2, 5).exists(benchGrams)).map(_._1).toSet

    val df = Tables.documents(spark, TestSpark.sfDir)
    val got = Assembly.contaminatedIds(
      df.where($"doc_id" % 23 =!= 0), df.where($"doc_id" % 23 === 0),
      "text", "doc_id", 5).as[Long].collect().toSet
    assert(got == expectContam && expectContam.nonEmpty,
      s"contaminated sets differ (got ${got.size}, want ${expectContam.size})")

    // The cleaned frame is exactly train minus the contaminated ids.
    val cleaned = Assembly.decontaminate(
      df.where($"doc_id" % 23 =!= 0), df.where($"doc_id" % 23 === 0))
      .select("doc_id").as[Long].collect().toSet
    val train = docs.map(_._1).filterNot(isBench).toSet
    assert(cleaned == train -- expectContam)
  }

  test("fuzzyDecontaminate ≡ brute-force exact token-set Jaccard vs the holdout") {
    val isBench = (id: Long) => id % 23 == 0
    val tokSets = docs.map { case (id, t) => id -> t.split(" ", -1).toSet }.toMap
    def jacc(a: Set[String], b: Set[String]): Double = {
      val inter = (a & b).size.toDouble
      // Same 6-decimal rounding as the engine's confirm.
      BigDecimal(inter / (a.size + b.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val bench = docs.collect { case (id, _) if isBench(id) => tokSets(id) }
    val expectContam = docs.collect {
      case (id, _) if !isBench(id) && bench.exists(b => jacc(tokSets(id), b) >= 0.9) => id
    }.toSet

    val df = Tables.documents(spark, TestSpark.sfDir)
    val cleaned = Assembly.fuzzyDecontaminate(
        df.where($"doc_id" % 23 =!= 0), df.where($"doc_id" % 23 === 0))
      .select("doc_id").as[Long].collect().toSet
    val train = docs.map(_._1).filterNot(isBench).toSet
    assert(expectContam.nonEmpty, "fixture must exercise fuzzy contamination")
    assert(cleaned == train -- expectContam,
      s"cleaned set differs (got ${cleaned.size}, want ${(train -- expectContam).size})")
  }

  test("shuffleShards is a deterministic permutation: pos is 1..n per shard, stable across runs") {
    def run() = Assembly.shuffleShards(
        Tables.documents(spark, TestSpark.sfDir).select("doc_id"), "doc_id", 8)
      .select($"shard", $"pos", $"doc_id").as[(Long, Long, Long)].collect().toSeq
    val a = run()
    assert(a.toSet == run().toSet, "shuffle order changed between runs")
    a.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq,
        "positions are not a contiguous 1..n permutation")
    }
    // Every doc appears exactly once across shards.
    assert(a.map(_._3).distinct.size == docs.size && a.size == docs.size)
  }

  test("orderHash is injective on the fixture ids (odd multiplier mod 2^31)") {
    val hs = Tables.documents(spark, TestSpark.sfDir)
      .select(Assembly.orderHash($"doc_id")).as[Long].collect()
    assert(hs.distinct.length == hs.length)
  }

  test("packChunks ≡ brute-force concat-and-chunk; chunk geometry holds") {
    val budget = 512L
    val base = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
    val got = Assembly.packChunks(base, "doc_id", "n_tokens", budget, 8)
      .select($"doc_id", $"n_tokens", $"shard", $"first_chunk", $"last_chunk")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    // Brute force: group by shard, sort by the same hash, running sum.
    def h(id: Long) = ((id & 0x7FFFFFFFL) * 2654435761L) % (1L << 31)
    val expect = got.map(r => (r._1, r._2)).groupBy { case (id, _) => h(id) % 8 }
      .flatMap { case (shard, rows) =>
        var cum = 0L
        rows.sortBy { case (id, _) => h(id) }.map { case (id, tok) =>
          cum += tok
          (id, tok, shard, (cum - tok) / budget, (cum - 1) / budget)
        }
      }.toSet
    assert(got.toSet == expect)
    // Geometry: a doc spans exactly the chunks its token interval covers,
    // so chunks_spanned ≤ tokens/budget + 1 and first ≤ last always.
    got.foreach { case (id, tok, _, fc, lc) =>
      assert(fc <= lc && lc - fc <= tok / budget + 1, s"doc $id bad span [$fc,$lc] tok=$tok")
    }
  }

  test("rebalanceUniform: dominant strata downsample toward total/k, small strata keep all, deterministic") {
    val df = Tables.documents(spark, TestSpark.sfDir)
    val perLang = df.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = perLang.values.sum
    val quota = total.toDouble / perLang.size
    val kept = Assembly.rebalanceUniform(df, "lang", "doc_id")
    val keptPerLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap

    perLang.foreach { case (lang, n) =>
      val k = keptPerLang.getOrElse(lang, 0L)
      if (n <= quota) assert(k == n, s"$lang under quota must keep all ($k of $n)")
      else assert(math.abs(k - quota) <= 4 * math.sqrt(quota),
        s"$lang kept $k, quota $quota — outside 4σ")
    }
    // Kept set is a subset of the corpus and deterministic.
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(docs.map(_._1).toSet))
    assert(ids == Assembly.rebalanceUniform(df, "lang", "doc_id")
      .select("doc_id").as[Long].collect().toSet)
  }

  test("chunkDocs: coverage, overlap, tail and short-doc edge cases vs brute force") {
    val cases = Seq(
      (1L, (1 to 5).map(i => s"t$i").mkString(" ")),     // shorter than window
      (2L, (1 to 8).map(i => s"t$i").mkString(" ")),     // exactly one window
      (3L, (1 to 9).map(i => s"t$i").mkString(" ")),     // window + 1 → 2 chunks
      (4L, (1 to 14).map(i => s"t$i").mkString(" ")),    // window + stride → tail = window
      (5L, (1 to 30).map(i => s"t$i").mkString(" ")))    // several chunks
    val (w, s) = (8, 6)
    val got = Assembly.chunkDocs(cases.toDF("doc_id", "text"), w, s)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    cases.foreach { case (id, text) =>
      val t = text.split(" ")
      val nc = (math.max(t.length - w, 0) + s - 1) / s + 1
      val exp = (0 until nc).map(i =>
        (id, i.toLong, math.min(t.length - i * s, w).toLong,
          t.slice(i * s, i * s + w).mkString(" ")))
      assert(got(id).toSeq == exp, s"doc $id")
      // Chunks tile the doc: first starts at 0, consecutive starts differ
      // by stride, last chunk reaches the final token.
      assert(got(id).last._2 * s + got(id).last._3 == t.length, s"doc $id tail")
    }
  }
}
