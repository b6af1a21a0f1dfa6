package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter 1969) — entity resolution
  * across STRUCTURED records, the dedup-family member the string/embedding
  * operators don't cover: two observations of the same real-world entity
  * rarely agree on every field, so identity is decided by a log-likelihood
  * score over per-field agreement patterns, not by any single key.
  *
  * Per field i with match/unmatch agreement probabilities (mᵢ, uᵢ):
  *   agree    → wᵢ = ln(mᵢ/uᵢ)            (positive evidence)
  *   disagree → wᵢ = ln((1−mᵢ)/(1−uᵢ))    (negative evidence)
  * and a pair links when Σwᵢ clears the decision threshold. The m/u
  * parameters here are FIXED model constants (in production they come
  * from EM over the match/unmatch mixtures — the estimation step is
  * orthogonal to the scoring operator and deliberately out of scope).
  *
  * Scale shape: candidate pairs come from BLOCKING on a stable key
  * (c_nationkey here) — the corpus never sees an all-pairs join, only
  * same-block pairs via one shuffle equi-join on the block key; a skewed
  * block (one giant nation) splits by the Dedup.Salted discipline. The
  * scoring itself is a map-only projection over the pair stream.
  *
  * The graded key plants a corrupted re-observation of every customer
  * (deterministic per-field corruptions keyed on c_custkey; the oracle
  * replants identically) and links original × twin. Weight margins are
  * engineered: the eight possible agreement-pattern scores are
  * {12.81, 8.47, 6.46, 3.70, 2.13, −0.63, −2.64, −7.0}, so the 3.0
  * threshold sits ≥ 0.7 from every attainable score — no decision rides
  * on the ~1-ulp libm divergence of ln between engines.
  */
object Linkage {
  type Q = (SparkSession, String) => DataFrame

  /** (m, u) per compared field. */
  val NameM = 0.9; val NameU = 0.001
  val AcctM = 0.85; val AcctU = 0.01
  val SegM = 0.95; val SegU = 0.2
  val Threshold = 3.0

  private def w(agree: Column, m: Double, u: Double): Column =
    when(agree, log(lit(m) / lit(u))).otherwise(log(lit(1 - m) / lit(1 - u)))

  /** The corrupted re-observation: every 5th name gets a typo, every 7th
    * balance drifts, every 3rd segment is miskeyed — overlapping, so some
    * twins carry multiple corruptions (a %105 key corrupts all three and
    * is correctly LOST by the model: score −7.0 — the realistic miss).
    */
  private[graft] def corruptedTwin(cust: DataFrame): DataFrame =
    cust.select(col("c_custkey"), col("c_nationkey"),
      when(col("c_custkey") % 5 === 0, concat(col("c_name"), lit("x")))
        .otherwise(col("c_name")).as("c_name"),
      when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(1.0))
        .otherwise(col("c_acctbal")).as("c_acctbal"),
      when(col("c_custkey") % 3 === 0, concat(lit("X"), col("c_mktsegment")))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"))

  /** Score all same-block (original, twin) pairs; emit links above the
    * threshold. Kept general over any two record frames sharing the
    * compared fields + block key.
    */
  def linkPairs(a: DataFrame, b: DataFrame, blockCol: String): DataFrame = {
    val left = a.select(col(blockCol),
      col("c_custkey").as("key_a"), col("c_name").as("name_a"),
      col("c_acctbal").as("acct_a"), col("c_mktsegment").as("seg_a"))
    val right = b.select(col(blockCol),
      col("c_custkey").as("key_b"), col("c_name").as("name_b"),
      col("c_acctbal").as("acct_b"), col("c_mktsegment").as("seg_b"))
    left.join(right, blockCol)
      .withColumn("score",
        w(col("name_a") === col("name_b"), NameM, NameU) +
          w(col("acct_a") === col("acct_b"), AcctM, AcctU) +
          w(col("seg_a") === col("seg_b"), SegM, SegU))
      .where(col("score") > Threshold)
      .select(col("key_a"), col("key_b"), round(col("score"), 6).as("score"))
  }

  /** GRADED key — the compound-block (scale-shaped) face, promoted in
    * round 12: candidate pairs come from blocking on
    * (c_nationkey, ⌊c_custkey / [[ScaleBlockSize]]⌋), so block COUNT
    * grows with the corpus while block SIZE stays bounded and the pair
    * stream is LINEAR in n — the shape that survives 100 TB. A
    * re-observed record shares its original's custkey, so every planted
    * twin stays co-blocked (recall on twins is exact — LinkageSpec pins
    * it against the coarse frame); only incidental cross-customer
    * acctbal-collision links whose keys straddle buckets are lost — the
    * standard blocking recall trade, mirrored exactly in the oracle's
    * join predicate. The nation-only coarse block survives as
    * [[coarseLinkageFrame]], a documented fixture shape (its pair
    * stream grows ×N² with corpus growth — measured ×400 at ×20).
    */
  val qRecordLinkage: Q = (s, d) =>
    scaledLinkageFrame(s, d).orderBy("key_a", "key_b")

  /** Fixture/demonstration face (NOT graded, NOT scale-shaped): blocks
    * on c_nationkey alone — fixed cardinality, so blocks grow with the
    * corpus and candidate pairs grow quadratically. Kept for
    * LinkageSpec's recall comparison and the ScaleSmoke quadratic
    * demonstration frame.
    */
  def coarseLinkageFrame(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    linkPairs(cust, corruptedTwin(cust), "c_nationkey")
      .orderBy("key_a", "key_b")
  }

  /** A second, independently-corrupted observation (the "import" feed)
    * plus a priority tag per source — the three-observation set
    * survivorship resolves. The master feed additionally PLANTS
    * missingness (every 11th segment NULL) so the source-priority rule
    * has to fall through, not just echo the master.
    */
  private[graft] def observations(cust: DataFrame): DataFrame = {
    val master = cust.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
      when(col("c_custkey") % 11 === 0, lit(null).cast("string"))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"),
      lit(1).as("prio"))
    val crawl = corruptedTwin(cust)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"), lit(2).as("prio"))
    val imported = cust.select(col("c_custkey"),
      when(col("c_custkey") % 4 === 0, concat(col("c_name"), lit("y")))
        .otherwise(col("c_name")).as("c_name"),
      when(col("c_custkey") % 6 === 0, col("c_acctbal") + lit(2.0))
        .otherwise(col("c_acctbal")).as("c_acctbal"),
      when(col("c_custkey") % 5 === 0, concat(lit("Y"), col("c_mktsegment")))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"),
      lit(3).as("prio"))
    master.unionByName(crawl).unionByName(imported)
  }

  /** Golden-record construction (survivorship) — the step AFTER linkage:
    * each entity cluster's observations collapse to one record under
    * per-field rules: name by MODE (ties → lowest source priority among
    * holders — fully deterministic with the 3-feed fan-in), balance by
    * MAX (recency proxy for monotone fields), segment by SOURCE PRIORITY
    * with NULL fall-through.
    *
    * Scale shape: ONE shuffle on the entity key, total. The observations
    * collect into a per-entity array BOUNDED by the source count (3 —
    * the one place collect_list is safe by construction), sorted by
    * priority in-row, and every field rule is then a scalar expression
    * over that array: no census join, no window, no second aggregate —
    * the two-aggregate + join formulation read the corpus 12× where this
    * reads each feed once. The mode logic is specialized to the 3-feed
    * contract (any 2-agreement wins, else the master), which IS the
    * generic (count DESC, priority) rule at fan-in 3 — the oracle keeps
    * the generic formulation and the hash gate pins the equivalence.
    */
  val qDedupSurvivorship: Q = (s, d) => {
    val obs = observations(Tables.customer(s, d))
    val chosen = "CASE WHEN o[1].c_name = o[2].c_name AND o[0].c_name <> o[1].c_name" +
      " THEN o[1].c_name ELSE o[0].c_name END"
    obs.groupBy(col("c_custkey"))
      .agg(array_sort(collect_list(struct(col("prio"), col("c_name"),
        col("c_acctbal"), col("c_mktsegment")))).as("o"))
      .selectExpr(
        "c_custkey",
        s"$chosen AS name",
        s"size(filter(o, x -> x.c_name = $chosen)) AS name_support",
        "greatest(o[0].c_acctbal, o[1].c_acctbal, o[2].c_acctbal) AS acctbal",
        "coalesce(o[0].c_mktsegment, o[1].c_mktsegment, o[2].c_mktsegment) AS mktsegment")
      .withColumn("name_support", col("name_support").cast("long"))
      .orderBy("c_custkey")
  }

  /** Compound-block candidate generation — the body behind the graded
    * [[qRecordLinkage]]: the nation block compounded with a
    * custkey-range bucket, so block COUNT grows with the corpus, block
    * SIZE stays bounded (~[[ScaleBlockSize]] candidates), and the pair
    * stream is linear (rows exactly ×N in the ×N mirror, wall ratio
    * 1.03 — SURVEY §19.1). This is why real linkage systems block on
    * growing-cardinality keys: postcode, phonetic code, name n-grams.
    */
  val ScaleBlockSize = 1000L
  def scaledLinkageFrame(s: SparkSession, d: String): DataFrame = {
    val withBlk = (df: DataFrame) => df.withColumn("__blk",
      struct(col("c_nationkey"), (col("c_custkey") / ScaleBlockSize)
        .cast("long").as("bucket")))
    val cust = Tables.customer(s, d)
    linkPairs(withBlk(cust), withBlk(corruptedTwin(cust)), "__blk")
  }

  val queries: Map[String, Q] = Map(
    "q_record_linkage" -> qRecordLinkage,
    "q_dedup_survivorship" -> qDedupSurvivorship
  )
}
