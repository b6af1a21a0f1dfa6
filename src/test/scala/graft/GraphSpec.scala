package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Graph

/** Semantics the mirrored PageRank/triangle oracles cannot independently
  * witness (both sides share the iteration/enumeration shape): rank mass
  * must be conserved EXACTLY under dangling nodes, the stationary
  * ordering must reflect link structure (not raw degree), and triangle
  * credit must hit each corner of each triangle exactly once.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(rows: (String, String, Double)*) =
    rows.toDF("src", "dst", "n")
  private def nodes(ns: String*) = ns.toDF("node")

  test("pagerank conserves total rank mass to 1 with a dangling node") {
    // c has no outgoing edges — without explicit uniform dangling
    // redistribution its mass would leak every iteration and the total
    // would decay below 1.
    val r = Graph.pagerank(
      edges(("a", "b", 1.0), ("b", "c", 1.0)), nodes("a", "b", "c"))
      .select(sum(col("r"))).as[Double].head()
    assert(math.abs(r - 1.0) < 1e-9, s"rank mass $r != 1")
  }

  test("pagerank unbounded mode (natural partitioning) equals the bounded graded shape") {
    // bounded=false drops the model-state coalesce(1) and runs every
    // per-iteration materialization distributed — same loop body, so the
    // ranks must match the bounded form bit-for-bit (incl. the dangling
    // node's uniform redistribution). GraphScale proves this mode at 97M
    // nodes; this pins the two shapes against each other at fixture size.
    val e = edges(("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 3.0), ("c", "a", 1.0),
      ("d", "a", 2.0)) // e dangles nothing; add an isolated-ish feeder
    val ns = nodes("a", "b", "c", "d", "e") // e is dangling (no out-edges)
    val b = Graph.pagerank(e, ns).orderBy("node").collect().toSeq
    val u = Graph.pagerank(e, ns, bounded = false).orderBy("node").collect().toSeq
    assert(b == u)
  }

  test("pagerank ranks a pure sink above its feeders in a star graph") {
    // a, b, d all point at hub; hub is dangling (redistributes uniformly).
    val r = Graph.pagerank(
      edges(("a", "hub", 1.0), ("b", "hub", 1.0), ("d", "hub", 1.0)),
      nodes("a", "b", "d", "hub"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("a") && r("a") == r("b") && r("b") == r("d"),
      s"star ranks wrong: $r")
  }

  test("pagerank weights edges: a 9:1 outflow split ranks targets 9:1-ish") {
    // s splits outflow 90/10 between x and y; x must end well above y.
    val r = Graph.pagerank(
      edges(("s", "x", 9.0), ("s", "y", 1.0), ("x", "s", 1.0), ("y", "s", 1.0)),
      nodes("s", "x", "y"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("x") > 2 * r("y"), s"weighted split not reflected: $r")
  }

  test("triangle counts credit each corner of each triangle exactly once") {
    // K4 on {1,2,3,4}: 4 triangles, each node in exactly 3 of them.
    // The pendant edge (4,9) creates no triangle and node 9 must be absent.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L)).toDF("a", "b")
    val got = Graph.triangleCounts(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("pagerank over the streamed transition changelog equals the batch key") {
    // The online rendering: edges maintained by transitionStream's
    // per-user state (two-batch seam), the bounded iteration then runs
    // on the changelog aggregate — graph analytics fed by streaming
    // state rather than a corpus re-scan.
    import graft.streaming.Streams
    import graft.streaming.Streams.Event
    val fixture = graft.engine.Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val (b1, b2) = fixture.splitAt(fixture.size / 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](
      Streams.sessionConf(spark))
    val q = Streams.start(
      Streams.transitionStream(ms.toDS()).toDF(),
      Streams.MemoryStreamSink("pr_transition_stream",
        Some(java.nio.file.Files.createTempDirectory("graft-prs").toString)))
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val edges = spark.table("pr_transition_stream")
      .groupBy(col("from_type").as("src"), col("to_type").as("dst"))
      .agg(count(lit(1)).cast("double").as("n"))
    val nodes = graft.engine.Tables.events(spark, TestSpark.sfDir)
      .select(col("event_type").as("node"))
    val online = Graph.pagerank(edges, nodes)
      .select(col("node"), round(col("r"), 8).as("pr"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = SparkEntry.queries("q_graph_pagerank")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(online == batch, s"online $online vs batch $batch")
  }

  test("degree orientation is count-invariant vs id orientation (K4 + fixture graph)") {
    // Counts are a property of the undirected graph; the orientation only
    // decides WHERE wedges form. Pin equality on the planted K4+pendant
    // and on the real fixture near-dup graph.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L)).toDF("a", "b")
    val gotK4 = Graph.triangleCountsDegreeOriented(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotK4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $gotK4")
    val edges = graft.engine.Dedup.lshNearDupPairs(
        graft.engine.Dedup.minhashBands(spark, TestSpark.sfDir), "toks",
        97, 100, Graph.TriangleTau, graft.engine.Dedup.Broadcast)
      .select(col("doc_a").as("a"), col("doc_b").as("b")).localCheckpoint()
    val idOriented = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val degOriented = Graph.triangleCountsDegreeOriented(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idOriented == degOriented,
      s"orientation changed counts: ${idOriented.size} vs ${degOriented.size}")
    assert(degOriented.nonEmpty, "fixture graph must contain triangles")
  }

  test("planted star: degree orientation bounds wedge fan-out where id orientation explodes") {
    // Hub 0 adjacent to every leaf 1..n, chain (i, i+1) between leaves:
    // one triangle (0, i, i+1) per chain edge. Under id orientation the
    // hub (lowest id) centers C(n,2) wedges; under (degree, id) rank the
    // hub outranks everything, every edge points INTO it, and the max
    // out-degree — the per-task fan-out bound — stays ≤ √(2m).
    val n = 200L
    val star = (1L to n).map(i => (0L, i))
    val chain = (1L until n).map(i => (i, i + 1))
    val e = (star ++ chain).toDF("a", "b")
    val m = star.size + chain.size
    val maxOut = Graph.orientByDegree(e)
      .groupBy(col("src")).agg(count(lit(1)).as("out"))
      .agg(max(col("out"))).head().getLong(0)
    assert(maxOut <= math.ceil(math.sqrt(2.0 * m)).toLong,
      s"degree-oriented max out-degree $maxOut exceeds sqrt(2m)")
    // id orientation: the hub's out-degree IS n — the deg² wedge source.
    val counts = Graph.triangleCountsDegreeOriented(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(0L) == n - 1, s"hub must corner one triangle per chain edge: $counts")
    assert(counts == Graph.triangleCounts(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "star counts must be orientation-invariant")
  }

  test("graded triangle key matches brute-force exact-Jaccard on sf0.001") {
    val docs = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .localCheckpoint()
    val brute = docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (size(array_intersect(col("x.toks"), col("y.toks"))).cast("double") /
          size(array_union(col("x.toks"), col("y.toks")))).as("j"))
      .where(col("j") >= Graph.TriangleTau)
      .select(col("a"), col("b"))
    val expected = Graph.triangleCounts(brute)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q_graph_triangles")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"LSH-edge triangles differ from brute force")
  }
}
