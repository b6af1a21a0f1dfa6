package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mirror-scale correctness for the keys the DuckDB oracle CANNOT reach
  * at ≈sf1 — the brute-force pair-CTE oracles are quadratic in DuckDB,
  * so `CORRECTNESS_x10_r11.json` excludes them. Their outputs still
  * satisfy two STRUCTURAL invariants on the ×10 mirror that an
  * incorrect engine would break, and both are checkable in Spark alone:
  *
  *  1. COPY DISJOINTNESS — the mirror's per-copy letter rotation makes
  *     cross-copy documents share essentially no token/shingle/n-gram,
  *     so every confirmed pair (Jaccard/containment ≥ τ) must have both
  *     endpoints in the SAME copy stride. One cross-copy pair = a
  *     similarity computed over the wrong documents (or ids corrupted
  *     in the pipeline).
  *
  *  2. EXACT ×N REPLICATION — the rotation is a 1:1 character map, so
  *     within-copy similarity structure is preserved EXACTLY and every
  *     exact (non-probabilistic) operator must emit exactly N× the 1×
  *     pair count. LSH keys redraw MinHash coin flips on rotated tokens
  *     (borderline pairs differ per copy), so they get a [1×, (N+1)×]
  *     band instead — the ScaleSmokeSpec contract, here enforced at
  *     sf0.1×10 ≈ sf1 instead of fixture scale.
  *
  * Run with the mirror already materialized (MakeMirror):
  *   MIRROR_SRC=/root/testdata/sf0.1 MIRROR_DIR=target/mirror_x10
  *   MIRROR_FACTOR=10. Prints one JSON line per key + a summary; exits
  *   1 on any violation.
  */
object MirrorInvariants {

  /** Pair-listing keys: (key, exact?). Exact ⇒ count must be exactly
    * factor × the 1× count; probabilistic ⇒ [1×, (factor+1)×] band.
    */
  val pairKeys: Seq[(String, Boolean)] = Seq(
    "q_neardup_pairs" -> true,
    "q_ngram_jaccard" -> true,
    // NOT exact, measured and explained (round 11): the graded key's
    // planted truncation slices the first half of the SORTED token set,
    // and rotation permutes sort order — each copy's planted doc is a
    // DIFFERENT half, so borderline planted↔relative pairs vary per
    // copy (sf0.1×10 census: copy 0 = 384 755 exactly = the 1× count —
    // engine exactness proven — copies 3–9 vary ±1%). The banded check
    // still excludes quadratic growth; cross-copy stays a hard zero.
    "q_containment_pairs" -> false,
    "q_sorted_neighborhood" -> false, // window composition shifts as copies interleave in sort order
    "q_neardup_lsh" -> false,
    "q_neardup_lsh_salted" -> false)

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("MIRROR_SRC", "/root/testdata/sf0.1")
    val dir = sys.env.getOrElse("MIRROR_DIR", "target/mirror_x10")
    val factor = sys.env.getOrElse("MIRROR_FACTOR", "10").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var fail = false

    def copyOf(c: String) = floor(col(c) / lit(ScaleSmoke.Stride))
    pairKeys.foreach { case (key, exact) =>
      val fn = SparkEntry.queries(key)
      val n1 = fn(spark, src).count()
      val m = fn(spark, dir)
      val (nN, cross) = {
        val agg = m.agg(count(lit(1)),
          count(when(copyOf("doc_a") =!= copyOf("doc_b"), 1))).head()
        (agg.getLong(0), agg.getLong(1))
      }
      val countOk = if (exact) nN == factor * n1
        else nN >= n1 && nN <= (factor + 1) * n1
      val ok = cross == 0 && countOk
      if (!ok) fail = true
      println(s"""{"key":"$key","exact":$exact,"n1":$n1,"nN":$nN,""" +
        s""""expected":${if (exact) (factor * n1).toString else s""""[${n1}, ${(factor + 1) * n1}]""""},""" +
        s""""cross_copy_pairs":$cross,"ok":$ok}""")
    }

    // q_substring_dedup: per-doc frame; rotation preserves token/span
    // structure exactly, so rows AND total span/removal mass are ×N.
    locally {
      val fn = SparkEntry.queries("q_substring_dedup")
      def stats(d: String) = {
        val r = fn(spark, d).agg(count(lit(1)),
          sum(col("n_spans")), sum(col("n_removed"))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val (r1, s1, x1) = stats(src)
      val (rN, sN, xN) = stats(dir)
      val ok = rN == factor * r1 && sN == factor * s1 && xN == factor * x1
      if (!ok) fail = true
      println(s"""{"key":"q_substring_dedup","exact":true,"rows":[$r1,$rN],""" +
        s""""span_mass":[$s1,$sN],"removed_mass":[$x1,$xN],"ok":$ok}""")
    }

    println(s"""{"mirror_invariants":{"src":"$src","dir":"$dir","factor":$factor,"pass":${!fail}}}""")
    spark.stop()
    if (fail) System.exit(1)
  }
}
