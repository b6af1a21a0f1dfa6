package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over corpus-derived graphs — the two staples a data
  * pipeline actually runs on its OWN artifacts rather than on an external
  * graph store: PageRank over the event-transition graph (which screen /
  * event type accumulates attention once transition structure, not raw
  * counts, decides) and triangle counting over the near-duplicate pair
  * graph (the density/clique metric that validates a dedup threshold —
  * a near-dup graph whose triangle mass explodes is template families,
  * not chance collisions).
  *
  * Scale shape, deliberately split in two:
  *   - corpus → graph is the only corpus-scale stage (one window shuffle
  *     on user_id for transitions; banded LSH candidate generation for
  *     near-dup edges — never all-pairs);
  *   - the iteration/enumeration then runs on the DERIVED graph: the
  *     transition graph is bounded by |event types|² (model-state sized,
  *     like Stats' ≤25-nation frame), while the triangle join shuffles on
  *     vertex keys with per-task fan-out bounded by the max clique size.
  *   [[pagerank]] itself is a plain DataFrame loop — on an UNBOUNDED node
  *   set (user-level graphs) the identical loop runs fully distributed;
  *   checkpoint cadence would then follow Dedup.nearDupComponents.
  */
object Graph {
  import Tables.events
  type Q = (SparkSession, String) => DataFrame

  val Damping = 0.85
  val PrIters = 10

  /** Weighted directed edge list of consecutive-event transitions,
    * (src, dst, n) — the same per-user (ts, event_id) total order as
    * EventAnalytics.qEventTransitions (deterministic: that key is unique).
    */
  private[graft] def transitionEdges(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).cast("double").as("n"))
  }

  /** PageRank with uniform teleport and uniform dangling redistribution:
    *   r₀(v) = 1/N;  r_{t+1}(v) = (1−d)/N + d·Σ_u r_t(u)·P(u,v)
    * where P rows sum to 1 — dangling nodes (no outgoing edges) get
    * explicit uniform edges to every node, so total rank mass is
    * conserved exactly (spec-asserted) instead of leaking per iteration.
    *
    * Determinism contract: each iteration's rank is rounded to 12
    * decimals IN BOTH ENGINES (the oracle unrolls the same iterations),
    * so float-summation-order noise (~1e-16 per ≤N-term sum) is absorbed
    * at every step instead of compounding across iterations — the same
    * discipline as the cosine keys' round-then-compare, applied per
    * iteration because the computation is iterative.
    *
    * `nodesIn` must carry a `node` column; N = |distinct nodes| is
    * counted on the driver — bounded model state by contract here
    * (event-type cardinality), NOT corpus-sized.
    */
  def pagerank(edgesIn: DataFrame, nodesIn: DataFrame,
      damping: Double = Damping, iters: Int = PrIters,
      bounded: Boolean = true): DataFrame = {
    // Materialize the |nodes|²-bounded edge list ONCE — it feeds three
    // plan branches (outflow totals, normalized edges, dangling
    // detection); unpinned, the corpus-scale window behind it would run
    // three times.
    // With `bounded = true` (the graded transition-graph key) the
    // |nodes|²-bounded frames ride ONE partition through the iteration
    // loop: at 32 shuffle partitions every tiny stage would otherwise
    // pay 32 task launches × iterations — pure overhead for ≤|types|²
    // rows. `bounded = false` is the UNBOUNDED-node-set mode (user- or
    // document-level graphs): natural partitioning, the same loop body,
    // every per-iteration materialization distributed — proven at 97M
    // nodes by tools/GraphScale's closed-form cycle probe.
    if (bounded) return pagerankBounded(edgesIn, nodesIn, damping, iters)
    def shape(df: DataFrame): DataFrame = df
    val edges = shape(edgesIn).localCheckpoint()
    val nodes = shape(nodesIn.select(col("node")).distinct()).localCheckpoint()
    val n = nodes.count().toDouble
    val outw = edges.groupBy(col("src")).agg(sum(col("n")).as("w"))
    val real = edges.join(outw, "src")
      .select(col("src"), col("dst"), (col("n") / col("w")).as("p"))
    val dangling = nodes
      .join(edges.select(col("src")).distinct(), col("node") === col("src"), "left_anti")
      .crossJoin(nodes.select(col("node").as("dst")))
      .select(col("node").as("src"), col("dst"), lit(1.0 / n).as("p"))
    // Row-stochastic transition frame — scanned once per iteration.
    val p = real.unionByName(dangling).localCheckpoint()
    var ranks = nodes.select(col("node"), round(lit(1.0 / n), 12).as("r"))
    var i = 0
    while (i < iters) {
      val contrib = ranks.join(p, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("r") * col("p")).as("m"))
        .select(col("dst").as("cnode"), col("m"))
      // Eager tiny materialization per iteration: keeps the loop's plan
      // depth constant (a 10-deep nested join/agg plan costs more in
      // analysis than these ≤|nodes|-row jobs cost to run) — the same
      // reason Dedup.nearDupComponents checkpoints every round.
      ranks = nodes.join(contrib, col("node") === col("cnode"), "left")
        .select(col("node"),
          round(lit((1 - damping) / n) +
            lit(damping) * coalesce(col("m"), lit(0.0)), 12).as("r"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }

  /** (r17) The bounded (model-state-sized graph) face of [[pagerank]] as
    * ONE driver loop: `bounded = true` means the node set is
    * model-state-sized BY CONTRACT (event-type cardinality — the old
    * form already counted N on the driver and coalesced every frame to
    * one partition), so the |types|²-bounded edge list is collected once
    * and the `iters` rounded iterations run driver-side — the
    * distributed rendering paid ~13 driver-synchronous tiny jobs (edges/
    * nodes/P checkpoints + one materialization per iteration) to move
    * ≤|types|²-row frames through full stage machinery. Arithmetic is
    * the contract's: same explicit dangling redistribution, same
    * per-iteration HALF_UP round-12 (java.math.BigDecimal — exactly
    * Spark's `round`), and the iteration contract above already absorbs
    * sum-order noise at every step, so the unbounded distributed face
    * stays bit-equal (GraphSpec pins bounded ≡ unbounded).
    */
  private def pagerankBounded(edgesIn: DataFrame, nodesIn: DataFrame,
      damping: Double, iters: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val spark = edgesIn.sparkSession
    def round12(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    val nodeType = nodesIn.schema("node").dataType
    val nodeRows: Array[Any] = nodesIn.select(col("node")).distinct()
      .collect().map(_.get(0))
    val n = nodeRows.length.toDouble
    val edgeRows = edgesIn.select(col("src"), col("dst"), col("n").cast("double"))
      .collect().map(r => (r.get(0), r.get(1), r.getDouble(2)))
    val outw = new java.util.HashMap[Any, Double]()
    edgeRows.foreach { case (s, _, w) => outw.merge(s, w, (a, b) => a + b) }
    val nodeSet = nodeRows.toSet
    val danglingSrcs = nodeRows.filterNot(outw.containsKey(_))
    var ranks: Map[Any, Double] = nodeRows.map(_ -> round12(1.0 / n)).toMap
    var i = 0
    while (i < iters) {
      val contrib = new java.util.HashMap[Any, Double]()
      edgeRows.foreach { case (s, dst, w) =>
        ranks.get(s).foreach { r =>
          contrib.merge(dst, r * (w / outw.get(s)), (a, b) => a + b)
        }
      }
      // Dangling nodes redistribute uniformly (the explicit 1/n edges).
      val danglingMass = danglingSrcs.iterator.map(ranks(_)).sum
      ranks = nodeRows.map { v =>
        val m = Option(contrib.get(v)).getOrElse(0.0) + danglingMass / n
        v -> round12((1 - damping) / n + damping * m)
      }.toMap
      i += 1
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.DoubleType, false)))
    val rows: java.util.List[Row] =
      nodeRows.map(v => Row(v, ranks(v))).toSeq.asJava
    spark.createDataFrame(rows, schema)
  }

  /** Graded PageRank over the event-transition type graph: (node, pr),
    * pr rounded to 8 decimals. Oracle: the identical 10 iterations
    * unrolled as SQL CTE stages with the same per-iteration rounding.
    */
  val qGraphPagerank: Q = (s, d) => {
    val ev = events(s, d)
    pagerank(transitionEdges(ev), ev.select(col("event_type").as("node")))
      .select(col("node"), round(col("r"), 8).as("pr"))
      .orderBy("node")
  }

  /** Jaccard threshold for the triangle graph — 0.97 keeps the near-dup
    * graph sparse enough that triangle enumeration is output-bounded
    * (sf0.1: 36k edges / 2.5M triangles vs 965k / 308M at the dedup
    * keys' 0.9), while still being served EXACTLY by the 0.9-tuned LSH
    * banding: pairs ≥ 0.97 are a subset of pairs ≥ 0.9, and band
    * collision probability is monotone in similarity, so the candidate
    * set that is exhaustive at 0.9 (q_minhash_recall pins zero misses)
    * is exhaustive a fortiori here.
    */
  val TriangleTau = 0.97

  /** Per-node triangle counts over an undirected edge list given as
    * (a, b) with a < b: enumerate wedges a→b→c (the id-orientation makes
    * each triangle appear exactly once as a < b < c), close them against
    * the edge list, then credit all three corners. Two equi-joins on
    * vertex keys — no all-pairs stage anywhere; per-task fan-out is
    * bounded by the max out-degree under the id orientation — fine for
    * near-uniform graphs, but a low-id HUB fans out to its whole
    * neighborhood (wedges ~ deg², the scale-killer
    * [[triangleCountsDegreeOriented]] exists for).
    */
  def triangleCounts(edgesIn: DataFrame): DataFrame = {
    // One artifact, three plan consumers.
    val e = edgesIn.select(col("a"), col("b")).localCheckpoint()
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    val closing = e.select(col("a").as("ca"), col("b").as("cb"))
    val tri = wedges
      .join(closing, col("a") === col("ca") && col("c") === col("cb"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Undirected edges (a, b) re-oriented low→high by (degree, id) rank —
    * the Schank–Wagner orientation: every out-neighbor of u outranks u,
    * so out-degree(u) ≤ √(2m) for ALL u (if out-degree(u) = k, each of
    * u's k higher-ranked out-neighbors has degree ≥ k, giving ≥ k²/2
    * edges ⇒ k ≤ √(2m)) — degree is carried on both endpoints so the
    * wedge stage can order dst pairs without another join.
    */
  private[graft] def orientByDegree(e: DataFrame): DataFrame = {
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "dega"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "degb"), "b")
    val aLower = col("dega") < col("degb") ||
      (col("dega") === col("degb") && col("a") < col("b"))
    withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("src"),
      when(aLower, col("b")).otherwise(col("a")).as("dst"),
      when(aLower, col("degb")).otherwise(col("dega")).as("dst_deg"))
  }

  /** Skew-proof triangle census: the (degree, id) re-orientation of
    * [[triangleCounts]]. Wedges form at the LOWEST-ranked corner of each
    * triangle — two out-edges (src→d1, src→d2) with rank(d1) < rank(d2)
    * — and close against the oriented edge (d1→d2), which exists with
    * exactly that orientation because rank ordering is total; each
    * triangle is therefore enumerated exactly once and per-node counts
    * equal the id-oriented form's (GraphSpec pins hash-equality on the
    * fixture graph and on planted corners).
    *
    * Scale contract: per-center wedge fan-out is bounded by
    * out-degree ≤ √(2m) REGARDLESS of the degree distribution — on a
    * planted hub/star graph the id-orientation's wedge stage grows
    * ~deg(hub)² while this form's stays linear in m (ScaleSmoke gates
    * the planted-skew frame at ×N). This is the form the graded key
    * runs; the id-oriented sibling remains for the invariance spec.
    */
  def triangleCountsDegreeOriented(edgesIn: DataFrame): DataFrame = {
    // One artifact, three plan consumers (wedge sides + closure).
    val o = orientByDegree(edgesIn.select(col("a"), col("b"))).localCheckpoint()
    val d1LowerThanD2 = col("e1.dst_deg") < col("e2.dst_deg") ||
      (col("e1.dst_deg") === col("e2.dst_deg") && col("e1.dst") < col("e2.dst"))
    val wedges = o.as("e1")
      .join(o.as("e2"), col("e1.src") === col("e2.src") && d1LowerThanD2)
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
    val closing = o.select(col("src").as("cv"), col("dst").as("cw"))
    val tri = wedges
      .join(closing, col("v") === col("cv") && col("w") === col("cw"))
      .select(col("u"), col("v"), col("w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Graded triangle census of the document near-dup graph at τ = 0.97:
    * (doc_id, n_triangles) for every document in ≥ 1 triangle. Edges come
    * from the SAME banded MinHash-LSH pipeline as q_neardup_lsh (exact
    * Jaccard confirm, so the edge set equals the brute-force oracle's).
    */
  val qGraphTriangles: Q = (s, d) => {
    val edges = Dedup.lshNearDupPairs(Dedup.minhashBands(s, d), "toks",
        97, 100, TriangleTau, Dedup.Broadcast, ordered = false)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    triangleCountsDegreeOriented(edges)
      .orderBy(desc("n_triangles"), col("doc_id"))
  }

  /** Planted-skew probe frame (ScaleSmoke-only, not graded): a hub
    * vertex (-1) adjacent to EVERY doc id plus the consecutive-id chain
    * (i, i+1) — so deg(hub) = n while every triangle (hub, i, i+1)
    * needs one chain edge, making the output linear in n. Under id
    * orientation the hub (lowest id) would center ~n²/2 wedges — the
    * star-graph blowup the degree orientation exists to kill: here the
    * hub outranks everything, every edge points INTO it, and wedges
    * form only at chain nodes (out-degree ≤ 3). ScaleSmoke gates the
    * ratio at ×N; the n² form would blow its budget by ~N.
    */
  def starTriangleFrame(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.documents(s, d).select(col("doc_id"))
    val star = ids.select(lit(-1L).as("a"), col("doc_id").as("b"))
    val chain = ids.as("l")
      .join(ids.as("r"), col("l.doc_id") + 1 === col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
    triangleCountsDegreeOriented(star.union(chain))
  }

  val queries: Map[String, Q] = Map(
    "q_graph_pagerank" -> qGraphPagerank,
    "q_graph_triangles" -> qGraphTriangles
  )
}
