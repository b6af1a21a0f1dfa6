package graft.engine

/** DuckDB-dialect oracle SQL, one entry per oracle-checkable key in
  * SparkEntry.queries. Written natively for DuckDB 1.0.0 (SURVEY.md G5) and
  * executed against views named after the fixture tables. Column aliases,
  * rounding, casts (BIGINT for integer-valued computed columns — DuckDB
  * sum(int) is HUGEINT), and ORDER BY (incl. NULLS placement; DuckDB
  * defaults to NULLS LAST on ASC, Spark to NULLS FIRST) mirror the Spark
  * queries exactly.
  *
  * Note: DuckDB reads the events.ts TIMESTAMP(NANOS) parquet column as
  * microsecond TIMESTAMP (truncating), which matches the engine's
  * `timestamp_micros(ts div 1000)` conversion bit-for-bit (FIXTURES.md).
  */
object Oracle {

  /** Shared by q_neardup_lsh and q_neardup_lsh_salted: the two keys are
    * the SAME logical operator in different physical shapes, so binding
    * one string makes the oracle identity structural — a threshold or
    * tokenization tweak cannot diverge them silently.
    */
  // Exact-cents money sums (q1PricingSummary's discipline): BIGINT cents
  // sums are order-free exact in both engines (DuckDB sums BIGINT into
  // HUGEINT). The round-2 happens in INTEGER space — (Σ+half) floor-div
  // scale (HALF_UP for positive sums) → exact cents → ÷100.0, an exact
  // double below 2⁵³ — because round(double, 2) of the divided sum is
  // not cross-engine stable past 2⁵³ (the ×97 gate measured a one-cent
  // sum_charge flip at a half-cent boundary: ulp(5·10¹⁷ µ$) = 64 µ$).
  // DuckDB `//` here ≡ Spark SQL `div` in qSqlFullQuery (positive sums,
  // so floor ≡ truncate); otherwise the texts are kept identical.
  private val Q1Sql = """
      SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
        (sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100 / 100.0 AS sum_disc_price,
        (sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) + 5000) // 10000 / 100.0 AS sum_charge,
        round(avg(l_quantity), 2) AS avg_qty,
        round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / count(*), 2) AS avg_price,
        round(sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*), 4) AS avg_disc,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  /** Shared by q_boilerplate_grams and q_boilerplate_delta: the
    * incremental snapshot+delta merge is graded against the identical
    * from-scratch census definition, so the additive-merge algebra
    * cannot diverge from the batch operator silently.
    */
  private val BoilerplateCensusSql = """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
        g AS (SELECT doc_id,
            unnest([array_to_string(t[i:i+4], ' ')
                    for i in generate_series(1, len(t) - 4)]) AS gram
          FROM toks WHERE len(t) >= 5)
      SELECT gram, count(DISTINCT doc_id)::BIGINT AS n_docs
      FROM g GROUP BY gram HAVING n_docs >= 3
      ORDER BY n_docs DESC, gram"""

  /** PageRank oracle: Graph.pagerank's 10 iterations UNROLLED as CTE
    * stages r1..r10, each rounding to 12 decimals exactly as the engine
    * does per iteration (drift is reset at every step, so the two
    * engines' float-summation-order noise never compounds). The
    * transition frame `p` carries explicit uniform dangling edges, the
    * same mass-conserving convention as the engine.
    */
  private val PagerankSql: String = {
    val base = """
      WITH seq AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS next_type
        FROM events),
        base AS (SELECT event_type AS src, next_type AS dst,
            CAST(count(*) AS DOUBLE) AS n
          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        nodes AS (SELECT DISTINCT event_type AS node FROM events),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS nN FROM nodes),
        outw AS (SELECT src, sum(n) AS w FROM base GROUP BY src),
        p AS (SELECT src, dst, n / w AS p FROM base JOIN outw USING (src)
          UNION ALL
          SELECT dang.node AS src, n2.node AS dst, 1.0 / nn.nN AS p
          FROM (SELECT node FROM nodes
                WHERE node NOT IN (SELECT src FROM base)) dang
            CROSS JOIN nodes n2 CROSS JOIN nn),
        r0 AS (SELECT node, round(1.0 / nn.nN, 12) AS r
          FROM nodes CROSS JOIN nn)"""
    val iters = (1 to graft.engine.Graph.PrIters).map { i =>
      s""",
        r$i AS (SELECT nd.node,
            round((1 - 0.85) / nn.nN + 0.85 * COALESCE(c.m, 0), 12) AS r
          FROM nodes nd CROSS JOIN nn
            LEFT JOIN (SELECT p.dst AS node, sum(pr.r * p.p) AS m
                       FROM r${i - 1} pr JOIN p ON pr.node = p.src
                       GROUP BY p.dst) c
            ON nd.node = c.node)"""
    }.mkString
    base + iters +
      s"\n      SELECT node, round(r, 8) AS pr FROM r${graft.engine.Graph.PrIters} ORDER BY node"
  }

  /** Shared by q_inverted_index and q_index_delta (structural identity —
    * see the map entries). Block width mirrors Index.BlockSize.
    */
  private val InvertedIndexSql = """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        tf AS (SELECT tok, doc_id, count(*)::BIGINT AS tf
          FROM toks GROUP BY 1, 2),
        blk AS (SELECT tok, CAST(floor(doc_id / 1024) AS BIGINT) AS block,
            count(*)::BIGINT AS n_docs,
            string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings,
            list(doc_id ORDER BY doc_id) AS ids
          FROM tf GROUP BY tok, block)
      SELECT tok, block, n_docs, postings,
        array_to_string([CASE WHEN i = 1 THEN ids[i]
                              ELSE ids[i] - ids[i - 1] END
                         for i in generate_series(1, len(ids))], ',') AS gaps
      FROM blk ORDER BY tok, block"""

  /** Shared by q_pca_covariance and q_pca_cov_delta (structural
    * identity — see the map entries). `+ 0` folds −0.0 → +0.0 (the
    * engine does the same; the harness row sort stringifies).
    */
  private val PcaCovarianceSql = """
      WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        sums AS (SELECT i, sum(v[i]) AS sx, CAST(count(*) AS DOUBLE) AS n
          FROM e, generate_series(1, 64) t(i) GROUP BY i),
        xy AS (SELECT i, j, sum(v[i] * v[j]) AS sxy
          FROM e, generate_series(1, 64) t(i), generate_series(1, 64) u(j)
          WHERE i <= j GROUP BY i, j)
      SELECT xy.i, xy.j,
        round((sxy - a.sx * b.sx / a.n) / (a.n - 1), 6) + 0 AS cov
      FROM xy JOIN sums a ON xy.i = a.i JOIN sums b ON xy.j = b.i
      ORDER BY xy.i, xy.j"""

  private val NeardupLshSql = """
      WITH docs AS (SELECT doc_id, list_distinct(string_split(text, ' ')) toks FROM documents),
        pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
          round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                len(list_distinct(list_concat(a.toks, b.toks))), 6) jaccard
        FROM docs a JOIN docs b ON a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.9
      ORDER BY doc_a, doc_b"""

  /** Exact global cosine top-15 over the shared planted ANN corpus
    * (Pq.plantedCorpus: 20 near-copies of query vector 7) — ONE oracle
    * definition for the three approximate-ANN keys whose soundness
    * arguments all require the identical corpus construction.
    */
  private val PlantedAnnTopK = """
      WITH base AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT v AS qv FROM base WHERE vec_id = 7),
        planted AS (SELECT 2000000 + j AS vec_id,
            list_transform(range(1, 65),
              i -> CASE WHEN i = (j % 64) + 1 THEN qv[i] * 1.05 + 0.01 ELSE qv[i] END) AS v
          FROM q, generate_series(1, 20) AS t(j)),
        corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        sims AS (SELECT vec_id,
            round(list_dot_product(v, qv) /
                  (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
          FROM corpus, q WHERE vec_id <> 7)
      SELECT vec_id, cos_sim FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 15"""

  /** Per-sample SQL terms for q_container_wds, expanded textually over
    * the sample index m ∈ {0, 1, 2} (s = 1 + doc_id%3 ≤ 3) — the same
    * cycle-split pixel/byte arithmetic as the PNG key, with per-sample
    * seed doc_id + 97m and dims (1 + (doc_id+m)%13, 1 + (doc_id+2m)%11).
    * Kept as Scala helpers so the three expansions cannot drift apart.
    */
  private def wdsGuard(m: Int, term: String): String =
    s"(CASE WHEN 1 + doc_id % 3 > $m THEN $term ELSE 0 END)"
  private def cycleSumSqlK(n: String, a: String, k: Int): String = {
    val full = k * (k - 1) / 2
    s"""(($n // $k) * $full
       + CASE WHEN $a + ($n % $k) <= $k
           THEN ($n % $k) * $a + (($n % $k) * (($n % $k) - 1)) // 2
           ELSE ($k - $a) * $a + (($k - $a) * (${k - 1} - $a)) // 2
                + ((($n % $k) - ($k - $a)) * (($n % $k) - ($k - $a) - 1)) // 2
         END)"""
  }
  private def cycleSumSql(n: String, a: String): String = cycleSumSqlK(n, a, 256)
  private def wdsPixelTerm(m: Int): String = {
    val w = s"(1 + (doc_id + $m) % 13)"
    val h = s"(1 + (doc_id + ${2 * m}) % 11)"
    wdsGuard(m, cycleSumSql(s"(3 * $w * $h)", s"((doc_id + ${97 * m}) % 256)"))
  }
  private def wdsTxtLenTerm(m: Int): String =
    wdsGuard(m, s"(20 + (doc_id + ${29 * m}) % 80)")
  /** Tar bytes of sample m: PNG entry = header + ceil((68 + raw)/512)
    * data blocks with raw = h(1+3w); txt entry = header + one block
    * (captions ≤ 99 bytes).
    */
  private def wdsTarTerm(m: Int): String = {
    val w = s"(1 + (doc_id + $m) % 13)"
    val h = s"(1 + (doc_id + ${2 * m}) % 11)"
    wdsGuard(m, s"(512 + 512 * ((68 + $h * (1 + 3 * $w) + 511) // 512) + 1024)")
  }
  private val WdsSql = s"""
      SELECT doc_id AS media_id,
        (2 * (1 + doc_id % 3))::INT AS n_entries,
        (1 + doc_id % 3)::INT AS n_samples,
        (1 + doc_id % 3)::INT AS n_png,
        (${(0 to 2).map(wdsPixelTerm).mkString(" + ")})::BIGINT AS pixel_sum,
        (${(0 to 2).map(wdsTxtLenTerm).mkString(" + ")})::BIGINT AS txt_bytes,
        ${cycleSumSql(s"(${(0 to 2).map(wdsTxtLenTerm).mkString(" + ")})", "(doc_id % 256)")}::BIGINT AS txt_sum,
        (${(0 to 2).map(wdsTarTerm).mkString(" + ")} + 1024)::BIGINT AS n_bytes
      FROM documents ORDER BY media_id"""

  val sql: Map[String, String] = Map(
    "q_scan_project" -> """
      SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber, l_quantity, l_shipdate
      FROM lineitem
      WHERE l_quantity >= 45 AND l_shipdate >= TIMESTAMP '2000-06-01'
      ORDER BY l_orderkey, l_linenumber""",

    "q_filter_predicates" -> """
      SELECT p_partkey, p_name, p_brand, p_type, p_size::BIGINT AS p_size,
        CASE WHEN p_retailprice > 1500 THEN 'premium'
             WHEN p_retailprice > 800 THEN 'mid' ELSE 'budget' END AS price_band
      FROM part
      WHERE p_type IN ('STANDARD','ECONOMY','PROMO') AND p_size BETWEEN 10 AND 40
        AND p_name LIKE '%a%' AND NOT (p_brand = 'Brand#99') AND p_retailprice IS NOT NULL
      ORDER BY p_partkey""",

    "q_project_expr" -> """
      SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
        round(l_extendedprice * (1 - l_discount), 4) AS net_price,
        round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
        CAST(trunc(l_quantity) AS BIGINT) AS qty_int,
        l_returnflag || '/' || l_linestatus AS flag_status
      FROM lineitem WHERE l_orderkey % 100 = 0
      ORDER BY l_orderkey, l_linenumber""",

    "q3_join_topk" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        (sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100 / 100.0 AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    // DECIMAL revenue accumulation — exact, order-free (the ×10-mirror
    // gate caught the double form drifting past round(2) at ≈sf1).
    "q5_5way_join" -> """
      SELECT r_name, n_name,
        round(sum(l_extendedprice::DECIMAL(18,2) *
          (1 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue,
        count(*) AS n_lines
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    // Same values whatever join order either cost model picks — the
    // reorder itself is pinned Spark-side in StatsSpec.
    "q_cbo_join_reorder" -> """
      SELECT n_name,
        round(sum(l_extendedprice::DECIMAL(18,2) *
          (1 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY n_name ORDER BY n_name""",

    "q_join_outer" -> """
      WITH c95 AS (SELECT o_custkey k, count(*) cnt95 FROM orders
                   WHERE year(o_orderdate) = 1995 GROUP BY 1),
           c96 AS (SELECT o_custkey k, count(*) cnt96 FROM orders
                   WHERE year(o_orderdate) = 1996 GROUP BY 1),
           f AS (SELECT coalesce(c95.k, c96.k) custkey, cnt95, cnt96
                 FROM c95 FULL OUTER JOIN c96 ON c95.k = c96.k)
      SELECT c_custkey, coalesce(cnt95, 0)::BIGINT AS orders_1995,
             coalesce(cnt96, 0)::BIGINT AS orders_1996
      FROM customer LEFT JOIN f ON c_custkey = custkey
      WHERE c_custkey <= 500 ORDER BY c_custkey""",

    "q_join_semi" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      ORDER BY c_custkey""",

    "q_join_anti" -> """
      SELECT c_custkey, c_name, c_nationkey::BIGINT AS c_nationkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q_join_range" -> """
      SELECT bucket, count(*) AS n_suppliers,
        round(sum(CAST(round(s_acctbal * 100) AS BIGINT)) / 100.0
              / count(s_acctbal), 2) AS avg_bal
      FROM supplier
      JOIN (VALUES ('negative', -100000.0, 0.0), ('low', 0.0, 2500.0),
                   ('mid', 2500.0, 5000.0), ('high', 5000.0, 7500.0),
                   ('top', 7500.0, 100000.0)) t(bucket, lo, hi)
        ON s_acctbal >= lo AND s_acctbal < hi
      GROUP BY bucket ORDER BY bucket""",

    // The bucketed rewrite is exact — identical semantics to
    // q_join_range, so the oracle is the same plain range join.
    "q_join_range_bucketed" -> """
      SELECT bucket, count(*) AS n_suppliers,
        round(sum(CAST(round(s_acctbal * 100) AS BIGINT)) / 100.0
              / count(s_acctbal), 2) AS avg_bal
      FROM supplier
      JOIN (VALUES ('negative', -100000.0, 0.0), ('low', 0.0, 2500.0),
                   ('mid', 2500.0, 5000.0), ('high', 5000.0, 7500.0),
                   ('top', 7500.0, 100000.0)) t(bucket, lo, hi)
        ON s_acctbal >= lo AND s_acctbal < hi
      GROUP BY bucket ORDER BY bucket""",

    "q_join_asof" -> """
      WITH p AS (SELECT event_id p_id, user_id p_user, ts p_ts FROM events
                 WHERE event_type = 'purchase'),
           c AS (SELECT event_id c_id, user_id c_user, ts c_ts FROM events
                 WHERE event_type = 'click'),
           j AS (SELECT p_id, p_user, p_ts, c_id, c_ts,
                   row_number() OVER (PARTITION BY p_id ORDER BY c_ts DESC, c_id DESC) rn
                 FROM p JOIN c ON p_user = c_user AND c_ts <= p_ts)
      SELECT p_id, p_user, p_ts, c_id AS asof_click_id, c_ts AS asof_click_ts
      FROM j WHERE rn = 1 ORDER BY p_id""",

    "q_join_interval" -> """
      SELECT l.event_id AS p_id, l.user_id, l.ts AS p_ts,
        r.event_id AS c_id, r.ts AS c_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') l
      JOIN (SELECT * FROM events WHERE event_type = 'click') r
        ON l.user_id = r.user_id
       AND r.ts >= l.ts - INTERVAL 30 MINUTE AND r.ts <= l.ts
      ORDER BY p_id, c_id""",

    "q_join_interval_outer" -> """
      SELECT l.event_id AS p_id, l.user_id, l.ts AS p_ts,
        r.event_id AS c_id, r.ts AS c_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') l
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        ON l.user_id = r.user_id
       AND r.ts >= l.ts - INTERVAL 30 MINUTE AND r.ts <= l.ts
      ORDER BY p_id, c_id""",

    // Shuffle-hash join (Relational.qJoinShuffleHash): the strategy is
    // plan-level only — the result must equal a plain join.
    "q_join_shuffle_hash" -> """
      SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
        round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS sum_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_join_cross" -> """
      SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""",

    "q1_pricing_summary" -> Q1Sql,

    // The SQL-surface twin of q1 — ONE bound string, so the "identical
    // by construction" oracle identity is structural, not copy-paste.
    "q_sql_full_query" -> Q1Sql,

    // DuckDB runs the same correlated-LATERAL text (both engines
    // decorrelate to a windowed top-k; values must agree exactly).
    "q_lateral_topk" -> """
      SELECT n.n_name, c.c_custkey, c.c_acctbal
      FROM nation n,
      LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2
      ) c
      ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey""",

    "q_agg_distinct" -> """
      SELECT l_returnflag,
        count(DISTINCT l_partkey) AS distinct_parts,
        count(DISTINCT l_suppkey) AS distinct_supps,
        round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty,
        count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_stats" -> """
      SELECT l_returnflag,
        round(stddev_samp(l_extendedprice), 2) AS sd_price,
        round(var_samp(l_quantity), 4) AS var_qty,
        round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
        round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_rollup" -> """
      SELECT r_name, n_name, count(*) AS n_customers,
        round(sum(c_acctbal::DECIMAL(18,2)), 2)::DOUBLE AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",

    "q_agg_cube" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q_agg_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority,
        CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        count(*) AS n,
        round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q_agg_collect" -> """
      SELECT r_name, array_to_string(list_sort(list(n_name)), ',') AS nations,
        count(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""",

    "q_agg_udaf" -> """
      SELECT l_returnflag,
        round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_price,
        count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // DuckDB has no width_bucket — the oracle mirrors Spark's bucket
    // arithmetic explicitly (floor(x/width)+1, under/overflow 0 and
    // n+1); identical IEEE doubles on both sides.
    "q_agg_histogram" -> """
      WITH b AS (SELECT o_totalprice,
          CASE WHEN o_totalprice < 0.0 THEN 0
               WHEN o_totalprice >= 500000.0 THEN 11
               ELSE CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1 END AS bucket
        FROM orders)
      SELECT bucket, round((bucket - 1) * 50000.0, 2) AS bucket_lo,
        count(*) AS n_orders,
        round(min(o_totalprice), 2) AS min_price,
        round(max(o_totalprice), 2) AS max_price
      FROM b GROUP BY bucket ORDER BY bucket""",

    // Ratio-to-report over the 25-row aggregate; the share divides two
    // independently-ordered sums — relative drift ~1e-15, far below the
    // 4-decimal grain on a percent.
    // DECIMAL revenue accumulation (order-free exact), double math only
    // after the sums — the ×10-mirror gate caught the double-sum form
    // drifting ~5e-3 across a round(2) boundary at ≈sf1 (round 11).
    "q_share_of_total" -> """
      WITH r AS (SELECT n_name,
          sum(o_totalprice::DECIMAL(18,2)) AS rev
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name)
      SELECT n_name, rev::DOUBLE AS revenue,
        round(rev::DOUBLE / (sum(rev) OVER ())::DOUBLE * 100.0, 4) AS share_pct
      FROM r ORDER BY n_name""",

    // The bounded top-k Aggregator ≡ the window row_number form — same
    // (value DESC, id ASC) total order; prices pass through unrounded
    // (no arithmetic on either side).
    "q_grouped_topk_agg" -> """
      WITH r AS (SELECT o_custkey, o_totalprice, o_orderkey,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) rn
        FROM orders)
      SELECT o_custkey, CAST(rn AS BIGINT) AS rank, o_totalprice, o_orderkey
      FROM r WHERE rn <= 3 ORDER BY o_custkey, rank""",

    // Bloom pre-filter is exact (the join removes false positives), so
    // the oracle is the plain quarter-filtered join.
    "q_bloom_prejoin" -> """
      SELECT o_orderpriority,
        round(sum(l_extendedprice::DECIMAL(18,2) *
          (1 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue,
        count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // Ordering value mirrors the engine's exact-integer composite — see
    // Relational.qAggMinmaxBy for why neither the raw double nor a
    // struct key is portable.
    "q_agg_minmax_by" -> """
      SELECT n_name,
        arg_max(s_name, CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) * 100000 + s_suppkey)
          AS richest_supplier,
        round(max(s_acctbal), 2) AS max_bal,
        arg_min(s_name, CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) * 100000 + s_suppkey)
          AS poorest_supplier,
        round(min(s_acctbal), 2) AS min_bal,
        count(*) AS n_suppliers
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",

    "q_resample" -> """
      WITH ev AS (SELECT user_id, ts, value FROM events WHERE user_id <= 20),
        b AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
                date_trunc('hour', max(ts)) AS h1 FROM ev GROUP BY user_id),
        grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
        hourly AS (SELECT user_id, date_trunc('hour', ts) AS hour,
                count(*) AS n_events, round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
              FROM ev GROUP BY user_id, hour)
      SELECT g.user_id, g.hour,
        coalesce(h.n_events, 0) AS n_events,
        coalesce(h.sum_value, 0) AS sum_value
      FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
      ORDER BY g.user_id, g.hour""",

    "q_window_rank" -> """
      WITH w AS (SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER win AS rn, rank() OVER win AS rk,
          dense_rank() OVER win AS drk, ntile(4) OVER win AS quartile
        FROM orders
        WINDOW win AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        rn, rk, drk, quartile
      FROM w WHERE rn <= 3 AND o_custkey <= 200 ORDER BY o_custkey, rn""",

    "q_window_analytic" -> """
      WITH w AS (SELECT user_id, event_id, value,
          lag(value, 1) OVER win AS prev_value,
          lead(value, 1) OVER win AS next_value,
          first_value(value) OVER winf AS fv, last_value(value) OVER winf AS lv
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id),
          winf AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      SELECT user_id, event_id, round(value, 2) AS value,
        round(coalesce(prev_value, 0), 2) AS prev_value,
        round(coalesce(next_value, 0), 2) AS next_value,
        round(fv, 2) AS first_value, round(lv, 2) AS last_value
      FROM w WHERE user_id <= 20 ORDER BY user_id, event_id""",

    "q_window_frame" -> """
      WITH w AS (SELECT o_custkey, o_orderkey, o_totalprice,
          sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend,
          avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
        FROM orders)
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        round(running_spend, 2) AS running_spend, round(moving_avg3, 4) AS moving_avg3
      FROM w WHERE o_custkey <= 50 ORDER BY o_custkey, o_orderkey""",

    "q_window_dist" -> """
      WITH w AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
          percent_rank() OVER win AS pr, cume_dist() OVER win AS cd
        FROM orders WHERE o_orderkey <= 1000
        WINDOW win AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
      SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice,
        round(pr, 6) AS pct_rank, round(cd, 6) AS cume
      FROM w ORDER BY o_orderkey""",

    "q_scalar_subquery" -> """
      SELECT c_custkey, c_name,
        (SELECT round(max(o_totalprice), 2) FROM orders o
         WHERE o.o_custkey = c.c_custkey) AS max_order
      FROM customer c WHERE c_custkey <= 300 ORDER BY c_custkey""",

    "q_sort_multi" -> """
      SELECT o_orderkey, o_custkey, nullif(o_orderstatus, 'P') AS status_or_null,
        round(o_totalprice, 2) AS total_price
      FROM orders WHERE o_orderkey <= 2000
      ORDER BY status_or_null NULLS FIRST, total_price DESC, o_orderkey""",

    "q_topk" -> """
      SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
        round(l_extendedprice, 2) AS price
      FROM lineitem ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 10""",

    "q_pivot" -> """
      SELECT user_id,
        count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
      FROM events GROUP BY user_id ORDER BY user_id""",

    "q_unpivot" -> """
      SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber, measure, value
      FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
      WHERE l_orderkey <= 500
      ORDER BY l_orderkey, l_linenumber, measure""",

    "q_union" -> """
      SELECT user_id AS active_user FROM events WHERE event_type = 'click'
      UNION
      SELECT user_id FROM events WHERE event_type = 'purchase'
      ORDER BY active_user""",

    "q_intersect" -> """
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
      ORDER BY user_id""",

    "q_except" -> """
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase'
      ORDER BY user_id""",

    "q_string_funcs" -> """
      SELECT p_partkey, upper(p_name) AS name_upper, length(p_name)::BIGINT AS name_len,
        substr(p_name, 1, 5) AS name_pre,
        regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        replace(p_name, ' ', '_') AS name_snake,
        p_brand || '-' || p_type AS brand_type,
        trim('  ' || p_name || '  ') AS name_trim,
        len(string_split(p_name, ' '))::BIGINT AS n_words
      FROM part ORDER BY p_partkey""",

    "q_date_funcs" -> """
      SELECT o_orderkey, year(o_orderdate)::BIGINT AS y, month(o_orderdate)::BIGINT AS m,
        day(o_orderdate)::BIGINT AS dom,
        date_trunc('month', o_orderdate) AS month_start,
        date_diff('day', o_orderdate::DATE, DATE '2002-01-01')::BIGINT AS days_to_2002,
        o_orderdate + INTERVAL 90 DAY AS due_ts
      FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey""",

    "q_math_funcs" -> """
      SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
        round(sqrt(l_extendedprice), 6) AS sqrt_price,
        round(ln(l_extendedprice), 6) AS ln_price,
        round(pow(1 + l_discount, 2), 6) AS pow_disc,
        ceil(l_extendedprice)::BIGINT AS ceil_price,
        floor(l_extendedprice)::BIGINT AS floor_price,
        round(abs(l_discount - 0.05), 4) AS abs_disc_diff,
        l_orderkey % 7 AS mod7
      FROM lineitem WHERE l_orderkey <= 500 ORDER BY l_orderkey, l_linenumber""",

    "q_array_funcs" -> """
      SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
        list_contains(string_split(text, ' '), 'spark') AS has_spark,
        array_to_string(list_sort(string_split(text, ' '))[1:3], ' ') AS first3_sorted,
        len(list_filter(string_split(text, ' '), t -> length(t) > 4))::BIGINT AS n_long_tokens,
        list_sum(list_transform(string_split(text, ' '), t -> length(t)))::BIGINT AS total_token_chars
      FROM documents ORDER BY doc_id""",

    "q_map_json" -> """
      SELECT event_type,
        sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        count(CASE WHEN json_extract_string(props, '$.k')::BIGINT > 50 THEN 1 END) AS n_k_gt_50,
        min(json_extract_string(props, '$.k')::BIGINT) AS min_k,
        max(json_extract_string(props, '$.k')::BIGINT) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_null_case" -> """
      SELECT o_orderkey,
        coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
        CASE WHEN o_totalprice > 300000 THEN 'big'
             WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS price_band,
        CASE WHEN o_orderpriority LIKE '1%' THEN 'urgent' ELSE 'normal' END AS urgency
      FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",

    "q_dedup_exact" -> """
      SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type""",

    // Set-normalized dedup groups: the key is the sorted-distinct token
    // STRING (computable in both engines), not an engine hash.
    "q_dedup_normalized" -> """
      WITH n AS (SELECT doc_id,
          list_aggr(list_sort(list_distinct(string_split(text, ' '))), 'string_agg', ' ') AS norm
        FROM documents)
      SELECT min(doc_id) AS first_doc_id, count(*) AS n_docs,
        CAST(len(any_value(norm)) AS INTEGER) AS n_norm_chars
      FROM n GROUP BY norm ORDER BY first_doc_id""",

    "q_dedup_first_wins" -> """
      WITH w AS (SELECT user_id, event_type, event_id, ts, value,
          row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) rn
        FROM events)
      SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts,
        round(value, 2) AS first_value
      FROM w WHERE rn = 1 ORDER BY user_id, event_type""",

    // Incremental merge ≡ the same two-stage shape (per-day partials
    // then merge) — equal to the direct aggregate by the merge algebra.
    // Partials are exact integer CENTS (r13): order-free in both stages,
    // so neither per-day partial order nor merge order can drift.
    "q_incremental_agg" -> """
      WITH p AS (SELECT CAST(ts AS DATE) AS day, event_type,
          count(*) AS c, sum(CAST(round(value * 100) AS BIGINT)) AS svc
        FROM events GROUP BY 1, 2)
      SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
        round(sum(svc) / 100.0, 2) AS sum_value,
        round(sum(svc) / 100.0 / sum(c), 4) AS avg_value
      FROM p
      WHERE day >= DATE '2024-01-08' AND day < DATE '2024-01-22'
      GROUP BY event_type ORDER BY event_type""",

    // Theta sketches are EXACT below 2^lgK=16384 retained entries
    // (Sketches.qSketchTheta scaladoc) — true at every fixture scale,
    // so the oracle is the exact set arithmetic.
    "q_sketch_theta" -> """
      SELECT 'both' AS key, CAST((SELECT count(*) FROM
          (SELECT user_id FROM events WHERE event_type = 'click'
           INTERSECT
           SELECT user_id FROM events WHERE event_type = 'purchase') t) AS BIGINT) AS est_users
      UNION ALL
      SELECT 'click', CAST(count(DISTINCT user_id) AS BIGINT)
        FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT 'either', CAST(count(DISTINCT user_id) AS BIGINT)
        FROM events WHERE event_type IN ('click', 'purchase')
      UNION ALL
      SELECT 'purchase', CAST(count(DISTINCT user_id) AS BIGINT)
        FROM events WHERE event_type = 'purchase'
      ORDER BY key""",

    // KLL check frame (Sketches.qSketchKllCheck): the exact interpolated
    // percentiles are recomputed here independently; the sketch-side
    // rank booleans are expected TRUE (the published ±1.65%·2 guarantee
    // band — a sketch outside it flips the boolean and fails the hash).
    "q_sketch_kll_check" -> """
      SELECT CAST(0.5 AS DOUBLE) AS quantile,
        round(quantile_cont(l_quantity, 0.5), 6) AS exact_value,
        TRUE AS rank_ok FROM lineitem
      UNION ALL
      SELECT CAST(0.9 AS DOUBLE), round(quantile_cont(l_quantity, 0.9), 6),
        TRUE FROM lineitem
      UNION ALL
      SELECT CAST(0.99 AS DOUBLE), round(quantile_cont(l_quantity, 0.99), 6),
        TRUE FROM lineitem
      ORDER BY quantile""",

    // HLL check frame (Sketches.qSketchHllCheck): slice counts and exact
    // distinct users recomputed independently; the ±3% estimate boolean
    // is expected TRUE.
    "q_sketch_hll_check" -> """
      SELECT event_type,
        count(DISTINCT CAST(ts AS DATE))::BIGINT AS n_slices,
        count(DISTINCT user_id)::BIGINT AS exact_users,
        TRUE AS est_ok
      FROM events GROUP BY event_type ORDER BY event_type""",

    // approx_count_distinct check frame (Relational.qAggApproxCheck):
    // exact distincts recomputed independently; the 2x-rsd booleans are
    // expected TRUE.
    "q_agg_approx_check" -> """
      SELECT l_returnflag,
        count(DISTINCT l_partkey)::BIGINT AS exact_parts,
        count(DISTINCT l_orderkey)::BIGINT AS exact_orders,
        TRUE AS parts_ok, TRUE AS orders_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Count-min check frame (Sketches.qSketchCmsCheck): exact counts
    // recomputed independently; the one-sided guarantee booleans are
    // expected TRUE.
    "q_sketch_cms_check" -> """
      SELECT event_type, count(*)::BIGINT AS exact_count,
        TRUE AS lower_ok, TRUE AS upper_ok
      FROM events GROUP BY event_type ORDER BY event_type""",

    // MinHash band-recall check (Dedup.qMinhashRecall): n_exact is the
    // independent blocked brute-force pair count (same CTE discipline as
    // q_neardup_pairs); n_missed = 0 is the banding-recall claim — at
    // J >= 0.9 under 16x2 banding a true pair misses every band with
    // probability <= 3e-12, so the expectation is exact.
    "q_minhash_recall" -> """
      WITH docs AS (SELECT doc_id, lang, CAST(n_chars // 64 AS BIGINT) lb,
          list_distinct(string_split(text, ' ')) toks FROM documents),
        pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
          len(list_intersect(a.toks, b.toks)) * 1.0 /
          len(list_distinct(list_concat(a.toks, b.toks))) j
        FROM docs a JOIN docs b
          ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
      SELECT count(*)::BIGINT AS n_exact, CAST(0 AS BIGINT) AS n_missed,
        TRUE AS recall_ok
      FROM pairs WHERE j >= 0.9""",

    // Byte-BPE check frame (Bpe.qBpeRoundtripCheck): the utf8 byte
    // length is recomputed independently; the merges-only-shrink and
    // decode∘encode = id booleans are expected TRUE.
    "q_bpe_roundtrip_check" -> """
      SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
        TRUE AS ids_le_bytes, TRUE AS roundtrip_ok
      FROM documents ORDER BY doc_id""",

    // Multimodal check frame (Multimodal.qMultimodalCheck): kind and
    // payload byte length recomputed independently (payload = utf8 text
    // bytes, kind = lang); the stub-decode range booleans are expected
    // TRUE.
    "q_multimodal_check" -> """
      SELECT doc_id AS media_id, lang AS kind,
        octet_length(encode(text))::BIGINT AS n_bytes,
        TRUE AS dims_ok, TRUE AS frames_ok
      FROM documents ORDER BY media_id""",

    // Real-parser closed loop (Multimodal.qMultimodalReal): the engine
    // GENERATES a BMP/WAV/PPM payload per doc_id and parses it back with
    // the real byte parsers; here every column is predicted from the
    // same doc_id formulas — byte sizes included (BMP row stride padded
    // to 4 bytes; PPM header length varies with the dimension digits).
    "q_multimodal_real" -> """
      SELECT doc_id AS media_id,
        CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'ppm' END AS format,
        (CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 37 WHEN 1 THEN 0 ELSE 1 + doc_id % 41 END)::INT AS width,
        (CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 29 WHEN 1 THEN 0 ELSE 1 + doc_id % 31 END)::INT AS height,
        (CASE doc_id % 3 WHEN 1 THEN 1 + doc_id % 2 ELSE 3 END)::INT AS n_channels,
        (CASE doc_id % 3 WHEN 1 THEN 8000 + (doc_id % 4) * 4000 ELSE 0 END)::INT AS sample_rate,
        (CASE doc_id % 3 WHEN 1 THEN 100 + doc_id % 400 ELSE 0 END)::BIGINT AS n_samples,
        (CASE doc_id % 3 WHEN 1 THEN ((100 + doc_id % 400) * 1000) // (8000 + (doc_id % 4) * 4000)
          ELSE 0 END)::BIGINT AS duration_ms,
        (CASE doc_id % 3
          WHEN 0 THEN 54 + ((3 * (1 + doc_id % 37) + 3) // 4) * 4 * (1 + doc_id % 29)
          WHEN 1 THEN 44 + (100 + doc_id % 400) * (1 + doc_id % 2) * 2
          ELSE 9 + length((1 + doc_id % 41)::VARCHAR) + length((1 + doc_id % 31)::VARCHAR)
            + 3 * (1 + doc_id % 41) * (1 + doc_id % 31)
        END)::BIGINT AS n_bytes
      FROM documents ORDER BY media_id""",

    // PNG closed loop (Multimodal.qMultimodalPng): the engine generates
    // an RGB PNG per doc_id (all five row filters, stored-deflate IDAT)
    // and decodes it with the real CRC-walk + Inflater + unfilter
    // pipeline; here every column is predicted arithmetically. n_bytes =
    // 8 sig + 25 IHDR + 12 IDAT framing + zlib(2 + raw + 5*ceil(raw/
    // 65535) + 4) + 12 IEND with raw = h*(1+3w). pixel_sum: pixels are
    // (doc_id + i) mod 256 over n = 3wh bytes — (n div 256) full cycles
    // of 32640 plus a tail that starts at a = doc_id mod 256 and may
    // wrap once: split at 256 - a.
    "q_multimodal_png" -> """
      WITH px AS (
        SELECT doc_id,
          (1 + doc_id % 21)::INT AS w,
          (1 + doc_id % 17)::INT AS h,
          3 * (1 + doc_id % 21) * (1 + doc_id % 17) AS n,
          doc_id % 256 AS a
        FROM documents
      )
      SELECT doc_id AS media_id, 'png' AS format, w AS width, h AS height,
        3::INT AS n_channels,
        (57 + 2 + (h * (1 + 3 * w)) + 5 * ((h * (1 + 3 * w) + 65534) // 65535) + 4)::BIGINT AS n_bytes,
        ((n // 256) * 32640
         + CASE WHEN a + (n % 256) <= 256
             THEN (n % 256) * a + ((n % 256) * ((n % 256) - 1)) // 2
             ELSE (256 - a) * a + ((256 - a) * (255 - a)) // 2
                  + (((n % 256) - (256 - a)) * ((n % 256) - (256 - a) - 1)) // 2
           END)::BIGINT AS pixel_sum
      FROM px ORDER BY media_id""",

    // GIF closed loop (Multimodal.qMultimodalGif): the engine generates
    // a GIF per doc_id (literal-framed LZW, per-segment clear codes) and
    // decodes it with the real container-walk + LZW dictionary decoder;
    // here every column is predicted arithmetically. n_bytes = 794 fixed
    // bytes (header 6 + LSD 7 + GCT 768 + descriptor 10 + min-code 1 +
    // terminator 1 + trailer 1) + d + ceil(d/255) sub-block framing with
    // d = ceil(9·codes/8), codes = ceil(n/254) + n + 1, n = w·h.
    // index_sum: indices are (doc_id + i) mod 256 — same cycle-split
    // arithmetic as the PNG pixel_sum.
    "q_multimodal_gif" -> """
      WITH px AS (
        SELECT doc_id,
          (1 + doc_id % 19)::INT AS w,
          (1 + doc_id % 23)::INT AS h,
          (1 + doc_id % 19) * (1 + doc_id % 23) AS n,
          doc_id % 256 AS a
        FROM documents
      ), sz AS (
        SELECT doc_id, w, h, n, a,
          (9 * ((n + 253) // 254 + n + 1) + 7) // 8 AS d
        FROM px
      )
      SELECT doc_id AS media_id, 'gif' AS format, w AS width, h AS height,
        (794 + d + (d + 254) // 255)::BIGINT AS n_bytes,
        ((n // 256) * 32640
         + CASE WHEN a + (n % 256) <= 256
             THEN (n % 256) * a + ((n % 256) * ((n % 256) - 1)) // 2
             ELSE (256 - a) * a + ((256 - a) * (255 - a)) // 2
                  + (((n % 256) - (256 - a)) * ((n % 256) - (256 - a) - 1)) // 2
           END)::BIGINT AS index_sum
      FROM sz ORDER BY media_id""",

    // FLAC closed loop (Multimodal.qMultimodalFlac): the engine
    // generates a FLAC stream per doc_id (fixed order-1 subframes over
    // per-channel ramps base_c + i, constant +1 residuals at rice
    // parameter 0) and decodes it with the real rice + predictor
    // pipeline; here every column is predicted arithmetically. n_bytes =
    // 42 header (magic 4 + block header 4 + STREAMINFO 34) +
    // ceil((64 frame-header bits + C·(34 + 3(n−1)) subframe bits)/8) +
    // 2 CRC-16 bytes. sample_sum = Σ_c [ n·base_c + n(n−1)/2 ] with
    // base_c = ((doc_id + 37c) mod 200) − 100.
    "q_multimodal_flac" -> """
      WITH px AS (
        SELECT doc_id,
          (1 + doc_id % 2)::INT AS c,
          (8000 + (doc_id % 4) * 4000)::INT AS sr,
          (100 + doc_id % 400)::BIGINT AS n,
          (doc_id % 200) - 100 AS b0,
          ((doc_id + 37) % 200) - 100 AS b1
        FROM documents
      )
      SELECT doc_id AS media_id, 'flac' AS format, c AS n_channels,
        sr AS sample_rate, n AS n_samples,
        (n * 1000 // sr)::BIGINT AS duration_ms,
        (42 + (64 + c * (34 + 3 * (n - 1)) + 7) // 8 + 2)::BIGINT AS n_bytes,
        (n * b0 + n * (n - 1) // 2
         + CASE WHEN c = 2 THEN n * b1 + n * (n - 1) // 2 ELSE 0 END)::BIGINT AS sample_sum
      FROM px ORDER BY media_id""",

    // JPEG closed loop (Multimodal.qMultimodalJpeg): the engine
    // generates a baseline JPEG per doc_id (DC-only flat blocks, quant
    // 8, Annex K tables — exact integer decode by construction) and
    // decodes it with the real Huffman + dequant + IDCT pipeline; here
    // the decoded pixel sum is 64 * sum_b (doc_id + b) mod 256 over
    // n = (w/8)*(h/8) blocks — the same cycle-split arithmetic as the
    // PNG/GIF keys, scaled by the 64 pixels of each flat block.
    "q_multimodal_jpeg" -> """
      WITH px AS (
        SELECT doc_id,
          (8 * (1 + doc_id % 12))::INT AS w,
          (8 * (1 + doc_id % 10))::INT AS h,
          (1 + doc_id % 12) * (1 + doc_id % 10) AS n,
          doc_id % 256 AS a
        FROM documents
      )
      SELECT doc_id AS media_id, 'jpeg' AS format, w AS width, h AS height,
        1::INT AS n_channels,
        (64 * ((n // 256) * 32640
         + CASE WHEN a + (n % 256) <= 256
             THEN (n % 256) * a + ((n % 256) * ((n % 256) - 1)) // 2
             ELSE (256 - a) * a + ((256 - a) * (255 - a)) // 2
                  + (((n % 256) - (256 - a)) * ((n % 256) - (256 - a) - 1)) // 2
           END))::BIGINT AS pixel_sum
      FROM px ORDER BY media_id""",

    // Progressive JPEG closed loop (Multimodal.qMultimodalJpegProg):
    // SOF2, three scans (DC successive approximation + EOBn AC band),
    // decoded by the real coefficient-accumulating pipeline; flat
    // DC-only blocks keep the decode exact, so the pixel sum is the
    // same cycle-split arithmetic as the baseline JPEG key over
    // n = (w/8)*(h/8) blocks.
    "q_multimodal_jpeg_prog" -> """
      WITH px AS (
        SELECT doc_id,
          (8 * (1 + doc_id % 11))::INT AS w,
          (8 * (1 + doc_id % 8))::INT AS h,
          (1 + doc_id % 11) * (1 + doc_id % 8) AS n,
          doc_id % 256 AS a
        FROM documents
      )
      SELECT doc_id AS media_id, 'jpeg' AS format, w AS width, h AS height,
        1::INT AS n_channels,
        (64 * ((n // 256) * 32640
         + CASE WHEN a + (n % 256) <= 256
             THEN (n % 256) * a + ((n % 256) * ((n % 256) - 1)) // 2
             ELSE (256 - a) * a + ((256 - a) * (255 - a)) // 2
                  + (((n % 256) - (256 - a)) * ((n % 256) - (256 - a) - 1)) // 2
           END))::BIGINT AS pixel_sum
      FROM px ORDER BY media_id""",

    // Video (AVI/MJPEG) closed loop (Multimodal.qMultimodalVideo): the
    // engine generates an AVI per doc_id (nf flat DC-only MJPEG frames
    // at 25 fps) and decodes it with the real RIFF walk + per-frame
    // JPEG pipeline; here every column is predicted arithmetically.
    // pixel_sum = 64 * blocks * sum_f (doc_id+f) mod 256 with nf <= 3,
    // so only the wrap-split tail of the cycle formula applies.
    "q_multimodal_video" -> """
      WITH px AS (
        SELECT doc_id,
          (8 * (1 + doc_id % 9))::INT AS w,
          (8 * (1 + doc_id % 7))::INT AS h,
          (1 + doc_id % 9) * (1 + doc_id % 7) AS nb,
          (1 + doc_id % 3)::BIGINT AS nf,
          doc_id % 256 AS a
        FROM documents
      )
      SELECT doc_id AS media_id, 'avi' AS format, w AS width, h AS height,
        1::INT AS n_channels, nf AS n_frames,
        (nf * 40)::BIGINT AS duration_ms,
        (64 * nb *
         CASE WHEN a + nf <= 256
           THEN nf * a + (nf * (nf - 1)) // 2
           ELSE (256 - a) * a + ((256 - a) * (255 - a)) // 2
                + ((nf - (256 - a)) * (nf - (256 - a) - 1)) // 2
         END)::BIGINT AS pixel_sum
      FROM px ORDER BY media_id""",

    // Multi-member gzip closed loop (Containers.qContainerGzip): the
    // engine generates k = 1 + id%4 stored-deflate gzip members (member
    // m holds 50 + (id+17m) mod 200 bytes) and walks them back with the
    // real header/Inflater/CRC-32/ISIZE pipeline; every column is
    // predicted here. Member size = 23 + L (10 hdr + 5 stored-block
    // framing + L + 8 trailer); content bytes are one (doc_id + i) mod
    // 256 run across members, so byte_sum is the same cycle-split
    // arithmetic as the PNG/GIF/JPEG keys.
    "q_container_gzip" -> s"""
      WITH px AS (
        SELECT doc_id, (1 + doc_id % 4)::INT AS k, doc_id % 256 AS a
        FROM documents
      ), sz AS (
        SELECT doc_id, k, a,
          (list_sum(list_transform(range(k), m -> 50 + (doc_id + 17 * m) % 200)))::BIGINT AS n
        FROM px
      )
      SELECT doc_id AS media_id, 'gzip' AS format, k AS n_members,
        n AS raw_bytes,
        ${cycleSumSql("n", "a")}::BIGINT AS byte_sum,
        (23 * k + n)::BIGINT AS n_bytes
      FROM sz ORDER BY media_id""",

    // WebDataset tar closed loop (Containers.qContainerTar): the engine
    // generates s = 1 + id%5 samples, each a .txt member of
    // 10 + (id+31m) mod 100 bytes and a .bin member of 400 + (id+53m)
    // mod 300 bytes (straddling the 1-vs-2 data-block boundary), and
    // walks the archive back with the real checksum-verified ustar
    // parser; n_samples is the basename-key grouping. Per sample the
    // archive holds 1536 bytes (txt header+block, bin header) + 512 *
    // ceil(Lb/512) data blocks; + 1024 terminator. Content bytes are
    // one (doc_id + i) mod 256 run across members.
    "q_container_tar" -> s"""
      WITH px AS (
        SELECT doc_id, (1 + doc_id % 5)::INT AS s, doc_id % 256 AS a
        FROM documents
      ), sz AS (
        SELECT doc_id, s, a,
          (list_sum(list_transform(range(s), m ->
            10 + (doc_id + 31 * m) % 100 + 400 + (doc_id + 53 * m) % 300)))::BIGINT AS n,
          (list_sum(list_transform(range(s), m ->
            1536 + 512 * ((400 + (doc_id + 53 * m) % 300 + 511) // 512))))::BIGINT AS arch
        FROM px
      )
      SELECT doc_id AS media_id, 'tar' AS format, (2 * s)::INT AS n_entries,
        s AS n_samples, n AS data_bytes,
        ${cycleSumSql("n", "a")}::BIGINT AS byte_sum,
        (arch + 1024)::BIGINT AS n_bytes
      FROM sz ORDER BY media_id""",

    // WARC closed loop (Containers.qContainerWarc): the engine generates
    // the Common Crawl layout — an optional warcinfo record (id even)
    // plus r = 1 + id%3 response records of body length 30 + (id+41m)
    // mod 120, EACH its own gzip member — and walks it back with the
    // real gzip-member + WARC/1.0 + HTTP parse. Header text lengths are
    // doc_id-invariant (19-digit zero-padded record ids), so the member
    // sizes are constants verified by ContainersSpec: response member =
    // 291 + B (23 gzip + 268 header/separator overhead), warcinfo
    // member = 189. Body bytes are one (doc_id + i) mod 256 run across
    // records.
    "q_container_warc" -> s"""
      WITH px AS (
        SELECT doc_id, (1 + doc_id % 3)::INT AS r,
          (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS info,
          doc_id % 256 AS a
        FROM documents
      ), sz AS (
        SELECT doc_id, r, info, a,
          (list_sum(list_transform(range(r), m -> 30 + (doc_id + 41 * m) % 120)))::BIGINT AS n
        FROM px
      )
      SELECT doc_id AS media_id, 'warc' AS format, (r + info)::INT AS n_records,
        r AS n_responses, n AS body_bytes,
        ${cycleSumSql("n", "a")}::BIGINT AS body_sum,
        (info * 189 + r * 291 + n)::BIGINT AS n_bytes
      FROM sz ORDER BY media_id""",

    // Shard ingest closed loop (Containers.qContainerShards): the engine
    // writes REAL .warc.gz shard files (docs grouped by doc_id mod 64,
    // concatenated per-doc payloads — member concatenation is valid
    // gzip), reads them back through Spark's binaryFile source, and
    // parses every record; here each per-shard aggregate is the SUM of
    // the q_container_warc per-doc closed forms grouped the same way.
    "q_container_shards" -> s"""
      WITH px AS (
        SELECT doc_id, doc_id % 64 AS shard,
          (1 + doc_id % 3)::BIGINT AS r,
          (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS info,
          doc_id % 256 AS a
        FROM documents
      ), sz AS (
        SELECT doc_id, shard, r, info, a,
          (list_sum(list_transform(range(r), m -> 30 + (doc_id + 41 * m) % 120)))::BIGINT AS n
        FROM px
      ), per_doc AS (
        SELECT shard, r + info AS recs, r, n,
          ${cycleSumSql("n", "a")} AS bsum,
          (info * 189 + r * 291 + n) AS bytes
        FROM sz
      )
      SELECT shard, sum(recs)::BIGINT AS n_records, sum(r)::BIGINT AS n_responses,
        sum(n)::BIGINT AS body_bytes, sum(bsum)::BIGINT AS body_sum,
        sum(bytes)::BIGINT AS n_bytes
      FROM per_doc GROUP BY shard ORDER BY shard""",

    // graft-warc connector loop (Containers.qWarcSource): the same
    // distributed shard write read back through the batch DSv2
    // connector and aggregated declaratively. Per-doc closed forms are
    // q_container_warc's; Content-Length constants (response = 65-byte
    // HTTP head + body, warcinfo = 17) are pinned by ContainersSpec
    // against the writer THROUGH the parser.
    "q_warc_source" -> s"""
      WITH px AS (
        SELECT doc_id, doc_id % 64 AS shard,
          (1 + doc_id % 3)::BIGINT AS r,
          (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS info,
          doc_id % 256 AS a
        FROM documents
      ), sz AS (
        SELECT doc_id, shard, r, info, a,
          (list_sum(list_transform(range(r), m -> 30 + (doc_id + 41 * m) % 120)))::BIGINT AS n
        FROM px
      ), per_doc AS (
        SELECT shard, r + info AS recs, r, n,
          ${cycleSumSql("n", "a")} AS bsum,
          (info * 17 + r * 65 + n) AS content
        FROM sz
      )
      SELECT shard, sum(recs)::BIGINT AS n_records, sum(r)::BIGINT AS n_responses,
        sum(n)::BIGINT AS body_bytes, sum(bsum)::BIGINT AS body_sum,
        sum(content)::BIGINT AS content_bytes
      FROM per_doc GROUP BY shard ORDER BY shard""",

    // Multimodal WebDataset closed loop (Containers.qContainerWds): tar
    // shards of real PNG + caption samples, the PNGs decoded by the real
    // Inflater pipeline; every column predicted from the per-sample
    // closed forms (built by the wds* helpers above so the m=0..2
    // expansions cannot drift apart).
    "q_container_wds" -> WdsSql,

    // ZIP closed loop (Containers.qContainerZip): the engine generates
    // e = 1 + id%4 members named %06d.txt (10-byte names), member m
    // holding L = 40 + (id+23m) mod 180 content bytes, deflate-framed
    // (csize = L + 5, single stored block) when id+m is even, stored
    // otherwise — and walks the archive back with the real EOCD/central-
    // directory/local-header/Inflater/CRC pipeline. Per member the
    // archive holds 40 + csize local bytes + 56 central bytes; + 22
    // EOCD. Content bytes are one (doc_id + i) mod 256 run.
    "q_container_zip" -> s"""
      WITH px AS (
        SELECT doc_id, (1 + doc_id % 4)::INT AS e, doc_id % 256 AS a
        FROM documents
      ), sz AS (
        SELECT doc_id, e, a,
          (list_sum(list_transform(range(e), m -> 40 + (doc_id + 23 * m) % 180)))::BIGINT AS n,
          (list_sum(list_transform(range(e), m ->
            CASE WHEN (doc_id + m) % 2 = 0 THEN 1 ELSE 0 END)))::BIGINT AS ndef
        FROM px
      )
      SELECT doc_id AS media_id, 'zip' AS format, e AS n_entries,
        ndef::INT AS n_deflated, n AS raw_bytes,
        ${cycleSumSql("n", "a")}::BIGINT AS byte_sum,
        (n + 5 * ndef + 96 * e + 22)::BIGINT AS n_bytes
      FROM sz ORDER BY media_id""",

    // .jsonl.zst closed loop (Containers.qContainerZst): r = 1 + id%5
    // REALLY-zstd-compressed JSON lines, text of line m = 20 + (id+13m)
    // mod 60 lowercase letters continuing one 'a' + (id+i) mod 26 run;
    // after the real decompress + from_json parse the per-doc aggregates
    // are all closed-form (char_sum is the 26-cycle split of the run
    // plus 97 per char). Compressed size is real zstd — ungraded.
    "q_container_zst" -> s"""
      WITH px AS (
        SELECT doc_id, (1 + doc_id % 5)::INT AS r, doc_id % 26 AS a
        FROM documents
      ), sz AS (
        SELECT doc_id, r, a,
          (list_sum(list_transform(range(r), m -> 20 + (doc_id + 13 * m) % 60)))::BIGINT AS t
        FROM px
      )
      SELECT doc_id AS media_id, r::BIGINT AS n_lines, r::BIGINT AS id_ok,
        (r * (r - 1) // 2)::BIGINT AS seq_sum, t AS text_chars,
        (97 * t + ${cycleSumSqlK("t", "a", 26)})::BIGINT AS char_sum,
        'zstd' AS codec
      FROM sz ORDER BY media_id""",

    // Sniff-and-parse loop (Containers.qContainerSniff): doc_id picks
    // one of the seven container formats, the payload is generated for
    // real, detectContainer must classify it from bytes alone (warc via
    // the two-stage gzip+content sniff), and the detected parser must
    // accept it.
    "q_container_sniff" -> """
      SELECT doc_id AS media_id,
        CASE doc_id % 7 WHEN 0 THEN 'gzip' WHEN 1 THEN 'tar' WHEN 2 THEN 'warc'
          WHEN 3 THEN 'zip' WHEN 4 THEN 'zstd' WHEN 5 THEN 'xz' ELSE 'lz4' END AS format,
        TRUE AS parse_ok
      FROM documents ORDER BY media_id""",

    // Multi-codec round trip (Containers.qContainerCodecs): codec =
    // id mod 3 in {zstd, lz4, xz}; L = 300 + id mod 500 bytes of the
    // (doc_id + i) mod 256 run, really compressed and streamed back.
    "q_container_codecs" -> s"""
      SELECT doc_id AS media_id,
        CASE doc_id % 3 WHEN 0 THEN 'zstd' WHEN 1 THEN 'lz4' ELSE 'xz' END AS codec,
        (300 + doc_id % 500)::BIGINT AS raw_len,
        ${cycleSumSql("(300 + doc_id % 500)", "(doc_id % 256)")}::BIGINT AS byte_sum,
        TRUE AS roundtrip_ok
      FROM documents ORDER BY media_id""",

    // Frame-sampling check twin (Multimodal.qMultimodalFramesCheck):
    // every document yields exactly one media row (index 0 always
    // sampled); the stride/bytes/dims invariants are expected TRUE.
    "q_multimodal_frames_check" -> """
      SELECT doc_id AS media_id,
        TRUE AS stride_ok, TRUE AS bytes_ok, TRUE AS dims_ok
      FROM documents ORDER BY media_id""",

    // BPE mixture check twin (Bpe.qBpeMixtureCheck): per-language doc
    // census recomputed from raw parquet; conservation booleans TRUE.
    "q_bpe_mixture_check" -> """
      SELECT lang, count(*)::BIGINT AS n_orig,
        TRUE AS kept_bounds_ok, TRUE AS tok_bounds_ok,
        TRUE AS keep_all_coherent
      FROM documents GROUP BY lang ORDER BY lang""",

    // SimHash check frame (Dedup.qSimhashCheck): the planted copy→
    // original pair list is replanted here identically; the
    // banded-pipeline-collision and UDF≡expression booleans are
    // expected TRUE.
    "q_simhash_check" -> """
      SELECT doc_id + 100000 AS doc_a, doc_id AS doc_b,
        TRUE AS pair_found, TRUE AS udf_expr_agree
      FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_a""",

    // Rolling-fingerprint check frame (TextAnalysis.qFingerprintCheck):
    // same planted pair list; the equal-text ⇒ equal-fingerprint
    // boolean is expected TRUE.
    "q_fingerprint_check" -> """
      SELECT doc_id + 100000 AS doc_a, doc_id AS doc_b, TRUE AS fp_match
      FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_a""",

    // approx_percentile check frame (Relational.qApproxQuantileCheck):
    // exact interpolated percentiles recomputed independently; the
    // rank-interval booleans (±2/accuracy) are expected TRUE.
    "q_approx_quantile_check" -> """
      SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.5), 6) AS exact_p50,
        round(quantile_cont(l_quantity, 0.9), 6) AS exact_p90,
        TRUE AS p50_ok, TRUE AS p90_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Boilerplate census (TextClean.qBoilerplateGrams): exact
    // cross-document 5-gram document frequencies — DuckDB's list
    // comprehension over the token array is the independent n-gram
    // formulation of the Spark transform(sequence(...))+explode.
    "q_boilerplate_grams" -> BoilerplateCensusSql,

    // Incremental census maintenance (TextClean.qBoilerplateDelta):
    // SAME oracle string as q_boilerplate_grams by construction — the
    // snapshot-census + delta-census additive merge must hash-match the
    // from-scratch batch census (the shared-oracle structural-identity
    // discipline of q_neardup_lsh/_salted).
    "q_boilerplate_delta" -> BoilerplateCensusSql,

    // Overlapping context chunking (Assembly.qDocChunks): 32-token
    // windows every 24 tokens, shorter tail, one whole-doc chunk for
    // short docs — pure integer arithmetic, so the chunk set is exact
    // in both engines.
    "q_doc_chunks" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        d AS (SELECT doc_id, t, len(t) AS l FROM toks),
        e AS (SELECT doc_id, t, l,
            unnest(generate_series(0, (greatest(l - 32, 0) + 23) // 24)) AS i
          FROM d)
      SELECT doc_id, i::BIGINT AS chunk_idx,
        least(l - i * 24, 32)::BIGINT AS n_tokens,
        array_to_string(t[i*24+1 : i*24+32], ' ') AS chunk_text
      FROM e ORDER BY doc_id, chunk_idx""",

    // Boilerplate strip report (TextClean.qBoilerplateStrip): per-lang
    // gram/boilerplate accounting with the integer 20% flag threshold.
    "q_boilerplate_strip" -> """
      WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') t FROM documents),
        g AS (SELECT doc_id, lang,
            unnest([array_to_string(t[i:i+4], ' ')
                    for i in generate_series(1, len(t) - 4)]) AS gram
          FROM toks WHERE len(t) >= 5),
        census AS (SELECT gram FROM g GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2),
        perdoc AS (SELECT d.doc_id, d.lang, count(*) AS n_grams,
            count(c.gram) AS n_hits
          FROM g d LEFT JOIN census c USING (gram) GROUP BY d.doc_id, d.lang)
      SELECT lang, count(*)::BIGINT AS n_docs,
        sum(n_grams)::BIGINT AS n_grams, sum(n_hits)::BIGINT AS n_boiler,
        count(*) FILTER (5 * n_hits >= n_grams)::BIGINT AS n_flagged
      FROM perdoc GROUP BY lang ORDER BY lang""",

    // Exact novelty tier: NOT EXISTS on the shared normalized key.
    "q_delta_new_docs" -> """
      WITH n AS (SELECT doc_id,
          list_aggr(list_sort(list_distinct(string_split(text, ' '))), 'string_agg', ' ') AS norm
        FROM documents),
        c AS (SELECT norm FROM n WHERE doc_id % 8 <> 0),
        dl AS (SELECT doc_id, norm FROM n WHERE doc_id % 8 = 0)
      SELECT doc_id FROM dl
      WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.norm = dl.norm)
      ORDER BY doc_id""",

    // Same integer edit-distance semantics in both engines.
    "q_fuzzy_match" -> """
      WITH probes(probe) AS (VALUES ('smal ring'), ('red wdget'),
          ('blu bolt'), ('hot gearz'), ('grean gizmo')),
        dd AS (SELECT probe, p_partkey, p_name,
            levenshtein(probe, p_name) AS dist
          FROM part, probes),
        r AS (SELECT *, row_number() OVER (PARTITION BY probe
            ORDER BY dist, p_partkey) rn FROM dd)
      SELECT probe, CAST(rn AS BIGINT) AS rank, p_name,
        CAST(dist AS BIGINT) AS dist
      FROM r WHERE rn <= 3 ORDER BY probe, rank""",

    // Same exact contract as q_fuzzy_match — the engine answers it with
    // the PassJoin-banded candidate core + bounded TopKAgg (the
    // many-probe 100 TB shape) instead of the probe broadcast; equality
    // of the two paths is exactly what the shared oracle grades.
    "q_fuzzy_match_scaled" -> """
      WITH probes(probe) AS (VALUES ('smal ring'), ('red wdget'),
          ('blu bolt'), ('hot gearz'), ('grean gizmo')),
        dd AS (SELECT probe, p_partkey, p_name,
            levenshtein(probe, p_name) AS dist
          FROM part, probes),
        r AS (SELECT *, row_number() OVER (PARTITION BY probe
            ORDER BY dist, p_partkey) rn FROM dd)
      SELECT probe, CAST(rn AS BIGINT) AS rank, p_name,
        CAST(dist AS BIGINT) AS dist
      FROM r WHERE rn <= 3 ORDER BY probe, rank""",

    // Latest-wins (KTable / log-compaction view): first_wins reversed.
    "q_dedup_latest" -> """
      WITH w AS (SELECT user_id, event_type, event_id, ts, value,
          row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) rn
        FROM events)
      SELECT user_id, event_type, event_id AS last_event_id, ts AS last_ts,
        round(value, 2) AS last_value
      FROM w WHERE rn = 1 ORDER BY user_id, event_type""",

    // MERGE/upsert: latest-wins over the union of the two halves' own
    // latest-wins snapshots. Delta timestamps are strictly later than
    // corpus ones (disjoint halves), so no cross-half ties exist and the
    // plain row_number total order decides identically in both engines.
    "q_merge_upsert" -> """
      WITH c AS (SELECT user_id, event_type, event_id, ts, value,
          row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) rn
        FROM events WHERE ts < TIMESTAMP '2024-01-15'),
        dl AS (SELECT user_id, event_type, event_id, ts, value,
          row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-15'
          AND event_type IN ('click', 'purchase')),
        u AS (SELECT user_id, event_type, event_id, ts, value FROM c WHERE rn = 1
          UNION ALL
          SELECT user_id, event_type, event_id, ts, value FROM dl WHERE rn = 1),
        m AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) rn2 FROM u)
      SELECT user_id, event_type, event_id AS cur_event_id, ts AS cur_ts,
        round(value, 2) AS cur_value
      FROM m WHERE rn2 = 1 ORDER BY user_id, event_type""",

    // Tombstone merge: the q_merge_upsert shape where every fifth user's
    // delta records are deletes — winning tombstones remove their key
    // from the snapshot; corpus rows under untouched types survive.
    "q_merge_tombstone" -> """
      WITH c AS (SELECT user_id, event_type, event_id, ts, value,
          FALSE AS deleted,
          row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) rn
        FROM events WHERE ts < TIMESTAMP '2024-01-15'),
        dl AS (SELECT user_id, event_type, event_id, ts, value,
          (user_id % 5 = 0) AS deleted,
          row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-15'
          AND event_type IN ('click', 'purchase')),
        u AS (SELECT user_id, event_type, event_id, ts, value, deleted
          FROM c WHERE rn = 1
          UNION ALL
          SELECT user_id, event_type, event_id, ts, value, deleted
          FROM dl WHERE rn = 1),
        m AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) rn2 FROM u)
      SELECT user_id, event_type, event_id AS cur_event_id, ts AS cur_ts,
        round(value, 2) AS cur_value
      FROM m WHERE rn2 = 1 AND NOT deleted ORDER BY user_id, event_type""",

    // SCD2 history (History.qScd2Merge): the Spark side builds the
    // history INCREMENTALLY (first half derived, second half merged);
    // the oracle derives it one-shot over the full log. Equality means
    // the merge path is indistinguishable from never having split.
    "q_scd2_merge" -> """
      WITH ordered AS (SELECT user_id, event_type, ts,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events),
        changes AS (SELECT user_id, event_type, ts AS valid_from
          FROM ordered WHERE prev IS NULL OR prev <> event_type),
        hist AS (SELECT user_id, event_type, valid_from,
          lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
            AS valid_to
        FROM changes)
      SELECT user_id, event_type, valid_from, valid_to,
        (valid_to IS NULL) AS is_current
      FROM hist ORDER BY user_id, valid_from""",

    // Point-in-time lookup over the same history: each user's segment
    // as of Jan 20 (interval covering the instant).
    "q_scd2_asof" -> """
      WITH ordered AS (SELECT user_id, event_type, ts,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events),
        changes AS (SELECT user_id, event_type, ts AS valid_from
          FROM ordered WHERE prev IS NULL OR prev <> event_type),
        hist AS (SELECT user_id, event_type, valid_from,
          lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
            AS valid_to
        FROM changes)
      SELECT user_id, event_type, valid_from, (valid_to IS NULL) AS is_current
      FROM hist
      WHERE valid_from <= TIMESTAMP '2024-01-20'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-20')
      ORDER BY user_id""",

    // PII redaction: same augmented text, same patterns (common
    // Java-regex/RE2 subset), 'g' flag for replace-all to match Spark.
    "q_pii_redact" -> """
      WITH aug AS (SELECT lang,
          text ||
          CASE WHEN doc_id % 3 = 0
            THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.com soon'
            ELSE '' END ||
          CASE WHEN doc_id % 3 = 1
            THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
            ELSE '' END ||
          CASE WHEN doc_id % 4 = 0
            THEN ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.77 today'
            ELSE '' END AS t
        FROM documents),
        red AS (SELECT lang, t,
          regexp_replace(regexp_replace(regexp_replace(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS r
        FROM aug)
      SELECT lang, count(*) AS n_docs,
        CAST(count(CASE WHEN r <> t THEN 1 END) AS BIGINT) AS n_redacted,
        CAST(sum(len(t) - len(r)) AS BIGINT) AS len_delta,
        CAST(sum(len(regexp_extract_all(r, '<EMAIL>'))) AS BIGINT) AS n_emails,
        CAST(sum(len(regexp_extract_all(r, '<PHONE>'))) AS BIGINT) AS n_phones,
        CAST(sum(len(regexp_extract_all(r, '<IP>'))) AS BIGINT) AS n_ips
      FROM red GROUP BY lang ORDER BY lang""",

    // Benchmark decontamination (Assembly.qDecontaminate): holdout =
    // doc_id%23=0, word 5-grams; range() is end-exclusive so the last
    // start index is len(t)-5+1 → range(1, len(t)-3); list_slice is
    // 1-based inclusive so [i, i+4] is 5 tokens. sum(BIGINT) is HUGEINT
    // in DuckDB — cast back for the schema compare.
    "q_decontaminate" -> """
      WITH d AS (SELECT doc_id, lang, doc_id % 23 = 0 AS is_bench,
          string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, is_bench,
            unnest(list_transform(range(1, len(t) - 3), i ->
              array_to_string(list_slice(t, i, i + 4), ' '))) AS gram
          FROM d WHERE len(t) >= 5),
        bg AS (SELECT DISTINCT gram FROM g WHERE is_bench),
        c AS (SELECT DISTINCT doc_id FROM g
          WHERE NOT is_bench AND gram IN (SELECT gram FROM bg))
      SELECT lang, count(*)::BIGINT AS n_train,
        count(c.doc_id)::BIGINT AS n_contaminated,
        (count(*) - count(c.doc_id))::BIGINT AS n_clean,
        CAST(coalesce(sum(CASE WHEN c.doc_id IS NOT NULL THEN d.doc_id END), 0)
          AS BIGINT) AS contam_checksum
      FROM d LEFT JOIN c ON d.doc_id = c.doc_id
      WHERE NOT d.is_bench GROUP BY lang ORDER BY lang""",

    // Assembly pipeline capstone (Assembly.qPipelineAssembly): the same
    // four stages as CTEs — normalized first-wins dedup, 5-gram
    // decontamination vs the RAW holdout, uniform rebalance with rates
    // over the post-decontamination counts, Knuth shard/order hash.
    "q_pipeline_assembly" -> """
      WITH d0 AS (SELECT doc_id, lang, text,
          array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
            AS norm FROM documents),
        dd AS (SELECT doc_id, lang, text FROM (
            SELECT *, row_number() OVER (PARTITION BY norm ORDER BY doc_id) rn
            FROM d0) WHERE rn = 1),
        train AS (SELECT * FROM dd WHERE doc_id % 23 <> 0),
        bench AS (SELECT * FROM documents WHERE doc_id % 23 = 0),
        tg AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 3), i ->
              array_to_string(list_slice(t, i, i + 4), ' '))) AS gram
          FROM (SELECT doc_id, string_split(text, ' ') AS t FROM train)
          WHERE len(t) >= 5),
        bg AS (SELECT DISTINCT unnest(list_transform(range(1, len(t) - 3), i ->
              array_to_string(list_slice(t, i, i + 4), ' '))) AS gram
          FROM (SELECT string_split(text, ' ') AS t FROM bench)
          WHERE len(t) >= 5),
        contam AS (SELECT DISTINCT doc_id FROM tg
          WHERE gram IN (SELECT gram FROM bg)),
        clean AS (SELECT * FROM train
          WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
        s AS (SELECT lang, count(*)::BIGINT AS n FROM clean GROUP BY lang),
        t AS (SELECT count(*)::BIGINT AS tot,
          count(DISTINCT lang)::BIGINT AS k FROM clean),
        r AS (SELECT lang, least(1.0, (CAST(tot AS DOUBLE) / k) / n) AS rate
          FROM s, t),
        bal AS (SELECT c.doc_id, c.text FROM clean c JOIN r ON c.lang = r.lang
          WHERE ((c.doc_id & 2147483647) * 2654435761) % 1048576
            < r.rate * 1048576),
        sh AS (SELECT doc_id,
            len(string_split(text, ' '))::BIGINT AS n_tokens,
            ((doc_id & 2147483647) * 2654435761) % 2147483648 AS h FROM bal),
        p AS (SELECT h % 8 AS shard, n_tokens, doc_id,
            CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h) AS BIGINT)
              AS pos FROM sh)
      SELECT shard, count(*)::BIGINT AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        CAST(sum(pos::HUGEINT * doc_id) % 2305843009213693951 AS BIGINT)
          AS order_checksum
      FROM p GROUP BY shard ORDER BY shard""",

    // Fuzzy decontamination (Assembly.qDecontaminateFuzzy): exact
    // train × bench all-pairs token-set Jaccard — sound vs the engine's
    // banded candidates for q_neardup_delta's reason (per-pair band-miss
    // ~3e-12 at J >= 0.9; the confirm is exact and rounds to 6 decimals
    // in both engines before the threshold).
    "q_decontaminate_fuzzy" -> """
      WITH d AS (SELECT doc_id, lang, doc_id % 23 = 0 AS is_bench,
          list_distinct(string_split(text, ' ')) AS toks FROM documents),
        b AS (SELECT doc_id, toks FROM d WHERE is_bench AND len(toks) > 0),
        t AS (SELECT doc_id, toks FROM d WHERE NOT is_bench AND len(toks) > 0),
        c AS (SELECT DISTINCT t.doc_id FROM t CROSS JOIN b
          WHERE round(len(list_intersect(t.toks, b.toks)) * 1.0 /
            len(list_distinct(list_concat(t.toks, b.toks))), 6) >= 0.9)
      SELECT lang, count(*)::BIGINT AS n_train,
        count(c.doc_id)::BIGINT AS n_contaminated,
        (count(*) - count(c.doc_id))::BIGINT AS n_clean,
        CAST(coalesce(sum(CASE WHEN c.doc_id IS NOT NULL THEN d.doc_id END), 0)
          AS BIGINT) AS contam_checksum
      FROM d LEFT JOIN c ON d.doc_id = c.doc_id
      WHERE NOT d.is_bench GROUP BY lang ORDER BY lang""",

    // Deterministic shuffle into 8 shards (Assembly.qShardAssign): the
    // Knuth order hash is a bijection mod 2^31 (odd multiplier), so
    // ORDER BY h is a total order and the pos*doc_id checksum pins the
    // whole permutation. Same 31-bit mask contract as q_sample_*.
    "q_shard_assign" -> """
      WITH t AS (SELECT doc_id,
          len(string_split(text, ' '))::BIGINT AS n_tokens,
          ((doc_id & 2147483647) * 2654435761) % 2147483648 AS h
        FROM documents),
        s AS (SELECT doc_id, n_tokens, h, h % 8 AS shard,
          CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h) AS BIGINT) AS pos
        FROM t)
      SELECT shard, count(*)::BIGINT AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        arg_min(doc_id, h) AS first_doc,
        CAST(sum(pos::HUGEINT * doc_id) % 2305843009213693951 AS BIGINT)
          AS order_checksum
      FROM s GROUP BY shard ORDER BY shard""",

    // Concat-and-chunk packing (Assembly.qSeqPacking): running token sum
    // per shard in shuffled (hash) order, 512-token cuts; // is integer
    // division, matching Spark's `div`.
    // Token-budget selection: the oracle is the DIRECT flat prefix sum
    // over (quality DESC, doc_id) — the engine's bucketed two-phase
    // decomposition must reproduce it exactly (quality rounded to its
    // 4-decimal grain BEFORE ordering, G2/G4).
    "q_budget_select" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        q AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
            round(least(len(l) / 100.0, 1.0) *
              (1.0 - len(list_filter(l, x -> x IN ('the','a','of','and'))) * 1.0 / len(l)),
              4) AS quality
          FROM t),
        c AS (SELECT doc_id, quality, n_tokens,
            CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
          FROM q)
      SELECT doc_id, quality, n_tokens, cum_tokens
      FROM c WHERE cum_tokens <= 15000 ORDER BY doc_id""",

    "q_seq_packing" -> """
      WITH t AS (SELECT doc_id,
          len(string_split(text, ' '))::BIGINT AS n_tokens,
          ((doc_id & 2147483647) * 2654435761) % 2147483648 AS h
        FROM documents),
        c AS (SELECT h % 8 AS shard, n_tokens,
          sum(n_tokens) OVER (PARTITION BY h % 8 ORDER BY h
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM t),
        f AS (SELECT shard, n_tokens,
          (cum - n_tokens) // 512 AS fc, (cum - 1) // 512 AS lc FROM c)
      SELECT shard, count(*)::BIGINT AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        (max(lc) + 1)::BIGINT AS n_chunks,
        count(CASE WHEN fc <> lc THEN 1 END)::BIGINT AS n_split_docs,
        CAST(sum(n_tokens) - max(lc) * 512 AS BIGINT) AS tail_fill
      FROM f GROUP BY shard ORDER BY shard""",

    // Uniform mixture rebalance (Assembly.qMixtureSample): rate =
    // least(1, (total/k)/n_lang) in EXACTLY this association order —
    // both engines evaluate the same IEEE-754 double expression — and
    // membership is the shared Knuth bucket threshold (Resolution 2^20).
    "q_mixture_sample" -> """
      WITH s AS (SELECT lang, count(*)::BIGINT AS n_lang
          FROM documents GROUP BY lang),
        t AS (SELECT count(*)::BIGINT AS n_total,
          count(DISTINCT lang)::BIGINT AS n_langs FROM documents),
        r AS (SELECT lang,
          least(1.0, (CAST(n_total AS DOUBLE) / n_langs) / n_lang) AS rate
          FROM s, t),
        k AS (SELECT d.lang, d.doc_id,
          ((d.doc_id & 2147483647) * 2654435761) % 1048576 < r.rate * 1048576
            AS keep
        FROM documents d JOIN r ON d.lang = r.lang)
      SELECT lang, count(*)::BIGINT AS n_orig,
        count(CASE WHEN keep THEN 1 END)::BIGINT AS n_kept,
        CAST(coalesce(sum(CASE WHEN keep THEN doc_id END), 0) AS BIGINT)
          AS kept_checksum
      FROM k GROUP BY lang ORDER BY lang""",

    // Column profile (Profile.qProfileCorpus): one UNION ALL branch per
    // column re-derives the exact long-form profile.
    "q_profile_corpus" -> """
      SELECT * FROM (
        SELECT 'doc_id' AS col_name, count(*)::BIGINT AS n_rows,
          (count(*) - count(doc_id))::BIGINT AS n_null,
          count(DISTINCT doc_id)::BIGINT AS n_distinct FROM documents
        UNION ALL
        SELECT 'lang', count(*)::BIGINT, (count(*) - count(lang))::BIGINT,
          count(DISTINCT lang)::BIGINT FROM documents
        UNION ALL
        SELECT 'source', count(*)::BIGINT, (count(*) - count(source))::BIGINT,
          count(DISTINCT source)::BIGINT FROM documents
        UNION ALL
        SELECT 'text', count(*)::BIGINT, (count(*) - count(text))::BIGINT,
          count(DISTINCT text)::BIGINT FROM documents
        UNION ALL
        SELECT 'n_chars', count(*)::BIGINT, (count(*) - count(n_chars))::BIGINT,
          count(DISTINCT n_chars)::BIGINT FROM documents)
      ORDER BY col_name""",

    // DQ gate (Profile.qDqChecks): same planted defects, same CASE
    // precedence (null wins over 'xx' when a doc_id hits both mods).
    "q_dq_checks" -> """
      WITH v AS (
        SELECT * FROM documents
        UNION ALL SELECT * FROM documents WHERE doc_id % 37 = 1),
      m AS (SELECT doc_id,
          CASE WHEN doc_id % 41 = 2 THEN NULL
               WHEN doc_id % 47 = 5 THEN 'xx' ELSE lang END AS lang,
          text,
          CASE WHEN doc_id % 43 = 3 THEN n_chars + 1 ELSE n_chars END AS n_chars
        FROM v),
      r AS (
        SELECT 'lang_not_null' AS rule,
          count(CASE WHEN lang IS NULL THEN 1 END)::BIGINT AS n_violations FROM m
        UNION ALL SELECT 'doc_id_unique',
          (count(doc_id) - count(DISTINCT doc_id))::BIGINT FROM m
        UNION ALL SELECT 'lang_in_domain',
          count(CASE WHEN lang IS NOT NULL
            AND lang NOT IN ('de','en','es','fr','zh') THEN 1 END)::BIGINT FROM m
        UNION ALL SELECT 'n_chars_consistent',
          count(CASE WHEN n_chars <> length(text) THEN 1 END)::BIGINT FROM m
        UNION ALL SELECT 'text_nonempty',
          count(CASE WHEN length(text) = 0 THEN 1 END)::BIGINT FROM m)
      SELECT rule, n_violations, n_violations = 0 AS passed
      FROM r ORDER BY rule""",

    // Robust outliers (Profile.qOutlierMad): median/MAD interpolation
    // is a single arithmetic op on sorted values — bit-identical across
    // engines — so the unrounded threshold compare is deterministic.
    // Same literal association order as the Spark side: (3.0·1.4826)·mad.
    "q_outlier_mad" -> """
      WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1),
      dev AS (SELECT e.event_type, e.value, m.med,
          abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)),
      mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1)
      SELECT d.event_type,
        round(max(d.med), 6) AS median_value,
        round(max(a.mad), 6) AS mad_value,
        count(*)::BIGINT AS n_rows,
        sum(CASE WHEN abs(d.value - d.med) > 3.0 * 1.4826 * a.mad
          THEN 1 ELSE 0 END)::BIGINT AS n_outliers
      FROM dev d JOIN mad a USING (event_type)
      GROUP BY d.event_type ORDER BY d.event_type""",

    // Exact percentiles (Relational.qAggPercentileExact): quantile_cont
    // interpolates at rank q·(n−1) like Spark's percentile; round-6
    // absorbs double association noise on the integral-valued column.
    "q_agg_percentile_exact" -> """
      SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        round(quantile_cont(l_quantity, 0.5), 6) AS median,
        round(quantile_cont(l_quantity, 0.95), 6) AS p95,
        count(*)::BIGINT AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Token-weighted mixture (Assembly.qMixtureTokens): rate =
    // least(1, (Σtok/k)/tok_s) in EXACTLY the engine's association
    // order; membership is the shared Knuth bucket threshold.
    "q_mixture_tokens" -> """
      WITH t AS (SELECT doc_id, lang,
          len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
        s AS (SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS w FROM t GROUP BY lang),
        g AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS totw,
          count(DISTINCT lang)::BIGINT AS k FROM t),
        r AS (SELECT lang, least(1.0, totw / CAST(k AS DOUBLE) / w) AS rate
          FROM s, g),
        m AS (SELECT t.lang, t.doc_id, t.n_tokens,
          ((t.doc_id & 2147483647) * 2654435761) % 1048576 < r.rate * 1048576
            AS keep
        FROM t JOIN r ON t.lang = r.lang)
      SELECT lang, count(*)::BIGINT AS n_orig,
        CAST(sum(n_tokens) AS BIGINT) AS tok_orig,
        count(CASE WHEN keep THEN 1 END)::BIGINT AS n_kept,
        CAST(coalesce(sum(CASE WHEN keep THEN n_tokens END), 0) AS BIGINT)
          AS tok_kept,
        CAST(coalesce(sum(CASE WHEN keep THEN doc_id END), 0) AS BIGINT)
          AS kept_checksum
      FROM m GROUP BY lang ORDER BY lang""",

    // Per-group deterministic sample (Sampling.qSamplePerGroup): the 5
    // smallest Knuth-bucket hashes per language, row-level.
    "q_sample_pergroup" -> """
      WITH h AS (SELECT lang, doc_id,
          ((doc_id & 2147483647) * 2654435761) % 1048576 AS b FROM documents),
        r AS (SELECT lang, doc_id,
          CAST(row_number() OVER (PARTITION BY lang ORDER BY b, doc_id)
            AS BIGINT) AS sample_rank
        FROM h)
      SELECT lang, sample_rank, doc_id FROM r WHERE sample_rank <= 5
      ORDER BY lang, sample_rank""",

    // Canonical survivor per normalized dup group: longest text, tie →
    // lowest doc_id; norm key identical to q_dedup_normalized's.
    "q_dedup_keep_best" -> """
      WITH n AS (SELECT doc_id, n_chars,
          list_aggr(list_sort(list_distinct(string_split(text, ' '))), 'string_agg', ' ') AS norm
        FROM documents),
        r AS (SELECT doc_id, n_chars,
          count(*) OVER (PARTITION BY norm) AS n_dups,
          row_number() OVER (PARTITION BY norm ORDER BY n_chars DESC, doc_id) AS rn
        FROM n)
      SELECT doc_id, n_chars, n_dups FROM r WHERE rn = 1 ORDER BY doc_id""",

    "q_dedup_windowed" -> """
      WITH w AS (SELECT event_type, user_id,
          row_number() OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)
                             ORDER BY ts, event_id) rn
        FROM events)
      SELECT event_type, count(*) AS n_survivors, count(DISTINCT user_id) AS n_users
      FROM w WHERE rn = 1 GROUP BY event_type ORDER BY event_type""",

    "q_dedup_docs" -> """
      SELECT lang, count(*) AS n_docs, count(DISTINCT text) AS n_distinct_texts,
        (count(*) - count(DISTINCT text))::BIGINT AS n_dup_docs
      FROM documents GROUP BY lang ORDER BY lang""",

    "q_neardup_pairs" -> """
      WITH docs AS (SELECT doc_id, lang, CAST(n_chars // 64 AS BIGINT) lb,
          list_distinct(string_split(text, ' ')) toks FROM documents),
        pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
          round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                len(list_distinct(list_concat(a.toks, b.toks))), 6) jaccard
        FROM docs a JOIN docs b
          ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.9
      ORDER BY doc_a, doc_b""",

    // Ordered funnel within a 24h per-step horizon: earliest view, the
    // earliest click strictly after it, the earliest purchase strictly
    // after that — stepwise min-after-join CTEs, the same op sequence
    // the engine runs.
    "q_funnel" -> """
      WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(s1.t1) AS t1, min(e.ts) AS t2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1
            AND e.ts <= s1.t1 + INTERVAL 24 HOURS
          GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            AND e.ts <= s2.t2 + INTERVAL 24 HOURS
          GROUP BY e.user_id),
        j AS (SELECT s1.user_id, s2.t2, s3.t3
          FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id)
      SELECT count(*) AS n_view, count(t2) AS n_click, count(t3) AS n_purchase,
        round(count(t2) * 1.0 / count(*), 6) AS view_to_click,
        round(count(t3) * 1.0 / greatest(count(t2), 1), 6) AS click_to_purchase
      FROM j""",

    // DAU/WAU stickiness: distinct actives per day and per trailing
    // 7 days (the fan-out-then-distinct formulation — distinct cannot
    // ride a sliding frame), report days restricted to active days.
    "q_dau_wau" -> """
      WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        days AS (SELECT DISTINCT day FROM a),
        dau AS (SELECT day, count(*) AS dau FROM a GROUP BY day),
        f AS (SELECT DISTINCT a.user_id, d.day
          FROM a JOIN days d ON d.day BETWEEN a.day AND a.day + 6),
        wau AS (SELECT day, count(*) AS wau FROM f GROUP BY day)
      SELECT dau.day, dau.dau, wau.wau,
        round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
      FROM dau JOIN wau ON dau.day = wau.day ORDER BY dau.day""",

    // Event-transition matrix: lead over the per-user (ts, event_id)
    // total order (unique key — deterministic), counts per type pair,
    // destination share of the source's outflow.
    "q_event_transitions" -> """
      WITH seq AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS next_type
        FROM events),
        t AS (SELECT event_type AS from_type, next_type AS to_type,
            count(*) AS n
          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n::BIGINT AS n,
        round(CAST(n AS DOUBLE) /
          CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
      FROM t ORDER BY from_type, to_type""",

    // Cohort retention triangle: first-seen day per user, distinct
    // (user, day-offset) activity within 14 days, counted per cell.
    "q_cohort_retention" -> """
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        c AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
        o AS (SELECT DISTINCT c.cohort_day, ev.user_id,
            datediff('day', c.cohort_day, ev.day) AS day_offset
          FROM ev JOIN c ON ev.user_id = c.user_id
          WHERE datediff('day', c.cohort_day, ev.day) <= 14)
      SELECT cohort_day, day_offset, count(*) AS n_users
      FROM o GROUP BY cohort_day, day_offset
      ORDER BY cohort_day, day_offset""",

    // Sorted-neighborhood dedup: rank within (lang, source) by (text,
    // doc_id), candidate pairs are 1..3 ranks apart, jaccard ≥ 0.9
    // confirms. doc_a is always the LOWER-RANK doc (sort-order identity,
    // deterministic via the doc_id tiebreak).
    "q_sorted_neighborhood" -> """
      WITH r AS (SELECT doc_id, lang, source,
          row_number() OVER (PARTITION BY lang, source ORDER BY text, doc_id) rn,
          list_distinct(string_split(text, ' ')) toks FROM documents),
        p AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
            round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                  len(list_distinct(list_concat(a.toks, b.toks))), 6) jaccard
          FROM r a JOIN r b ON a.lang = b.lang AND a.source = b.source
            AND b.rn - a.rn BETWEEN 1 AND 3)
      SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.9
      ORDER BY doc_a, doc_b""",

    // Exact-substring span dedup (SpanDedup.scala): fixed-L = 8 token
    // grams, duplicated = present in ≥ 2 distinct docs, ALL occurrences
    // excised, overlapping-or-adjacent intervals merged. Positions here
    // are 1-based (DuckDB slices); the engine's 0-based positions never
    // surface in the output. kept_text coalesces to '' for fully-excised
    // docs (string_agg over zero rows is NULL; Spark's array_join of an
    // empty array is '').
    "q_substring_dedup" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        g AS (SELECT doc_id, toks,
            unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS start FROM t),
        occ AS (SELECT doc_id, start,
            array_to_string(toks[start:start+7], ' ') AS gram FROM g),
        dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        hits AS (SELECT occ.doc_id, occ.start, occ.start + 7 AS e
          FROM occ JOIN dup USING (gram)),
        m AS (SELECT doc_id, start, e,
            CASE WHEN start > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY start
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
            THEN 1 ELSE 0 END AS is_new
          FROM hits),
        sp AS (SELECT doc_id, span_id, min(start) AS s, max(e) AS e
          FROM (SELECT m.*, sum(is_new) OVER (PARTITION BY doc_id ORDER BY start) AS span_id FROM m)
          GROUP BY doc_id, span_id),
        agg AS (SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS n_removed
          FROM sp GROUP BY doc_id),
        cov AS (SELECT DISTINCT doc_id, unnest(generate_series(s, e)) AS p FROM sp),
        pos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS p FROM t),
        kept AS (SELECT pos.doc_id, pos.p, pos.toks[pos.p] AS tok
          FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
          WHERE cov.p IS NULL),
        kt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS kept_text
          FROM kept GROUP BY doc_id)
      SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
        coalesce(agg.n_spans, 0)::BIGINT AS n_spans,
        coalesce(agg.n_removed, 0)::BIGINT AS n_removed,
        coalesce(kt.kept_text, '') AS kept_text
      FROM t LEFT JOIN agg USING (doc_id) LEFT JOIN kt USING (doc_id)
      ORDER BY doc_id""",

    // Blocked semantic (lang, len-bucket) — LSH banding is non-selective
    // on trigram sets (see Dedup.qNgramJaccard), so blocking IS the
    // operator definition and the oracle blocks identically. The band
    // quick-reject inside the implementation misses a qualifying pair
    // with probability ≤ 8.5e-8 (documented, accepted vs this oracle).
    "q_ngram_jaccard" -> """
      WITH docs AS (SELECT doc_id, lang, CAST(n_chars // 64 AS BIGINT) lb,
          list_distinct(list_transform(range(1, len(text) - 1), i -> substr(text, i, 3))) grams
        FROM documents WHERE len(text) >= 3),
        pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
          round(len(list_intersect(a.grams, b.grams)) * 1.0 /
                len(list_distinct(list_concat(a.grams, b.grams))), 6) jaccard
        FROM docs a JOIN docs b
          ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8
      ORDER BY doc_a, doc_b""",

    "q_token_count" -> """
      SELECT doc_id,
        len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS n_alpha_runs,
        len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_digit_runs,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))::BIGINT AS n_bpe_pieces
      FROM documents ORDER BY doc_id""",

    "q_neardup_lsh" -> NeardupLshSql,

    // Same logical result as q_neardup_lsh — only the physical shape
    // differs (salted sort-merge band join + co-partitioned confirms,
    // zero broadcasts), so the oracle IS the same string.
    "q_neardup_lsh_salted" -> NeardupLshSql,

    // Connected components of the near-dup graph: per-doc min label over
    // the transitive closure (recursive CTE) — an independent fixpoint
    // formulation of the engine's iterative min-label propagation.
    "q_neardup_components" -> """
      WITH RECURSIVE docs AS (SELECT doc_id, list_distinct(string_split(text, ' ')) toks FROM documents),
        p AS (SELECT a.doc_id doc_a, b.doc_id doc_b
          FROM docs a JOIN docs b ON a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.9),
        e AS (SELECT doc_a s, doc_b d FROM p UNION ALL SELECT doc_b, doc_a FROM p),
        reach(doc, lbl) AS (
          SELECT s, s FROM e
          UNION
          SELECT e.s, reach.lbl FROM e JOIN reach ON reach.doc = e.d)
      SELECT doc AS doc_id, min(lbl) AS component
      FROM reach GROUP BY doc ORDER BY doc_id""",

    // Resolution = the components CTE extended with singleton self-labels
    // (documents LEFT JOIN reach-labels) and a group-size rollup.
    "q_neardup_resolve" -> """
      WITH RECURSIVE docs AS (SELECT doc_id, list_distinct(string_split(text, ' ')) toks FROM documents),
        p AS (SELECT a.doc_id doc_a, b.doc_id doc_b
          FROM docs a JOIN docs b ON a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.9),
        e AS (SELECT doc_a s, doc_b d FROM p UNION ALL SELECT doc_b, doc_a FROM p),
        reach(doc, lbl) AS (
          SELECT s, s FROM e
          UNION
          SELECT e.s, reach.lbl FROM e JOIN reach ON reach.doc = e.d),
        lbl AS (SELECT doc AS doc_id, min(lbl) AS canonical FROM reach GROUP BY doc),
        lab AS (SELECT d.doc_id, coalesce(l.canonical, d.doc_id) AS canonical
          FROM documents d LEFT JOIN lbl l USING (doc_id))
      SELECT canonical, count(*) AS group_size
      FROM lab GROUP BY canonical ORDER BY canonical""",

    "q_cosine_topk" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        sims AS (SELECT vec_id,
          round(list_dot_product(v, qv) /
                (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        FROM e, q WHERE vec_id <> 0)
      SELECT vec_id, cos_sim FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 10""",

    "q_ann_ivf" -> """
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT label AS q_label, v AS qv FROM e WHERE vec_id = 0)
      SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
        round(list_dot_product(v, qv) /
              (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
      FROM e, q WHERE e.label = q.q_label AND e.vec_id <> 0
      ORDER BY cos_sim DESC, vec_id LIMIT 10""",

    // Exact global cosine top-15: the trained-IVF query probes ALL k
    // cells (nprobe = k ≡ brute force, spec-pinned), so the end-to-end
    // train → assign → probe → re-rank path must reproduce the global
    // answer exactly; cell ids themselves are engine model state and are
    // not part of the graded output.
    "q_ann_ivf_trained" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        sims AS (SELECT vec_id,
            round(list_dot_product(v, qv) /
                  (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
          FROM e, q WHERE vec_id <> 7)
      SELECT vec_id, cos_sim FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 15""",

    // Incremental-index key: the engine trains on 80% of the corpus and
    // APPENDS the rest via assignDelta (no retrain), then searches with
    // nprobe = k ≡ exact — so the grown index must reproduce the exact
    // global cosine top-15 over the FULL corpus; any vector lost by the
    // append path (dropped delta row, id collision, wrong cell join)
    // breaks the hash.
    "q_ann_delta" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        sims AS (SELECT vec_id,
            round(list_dot_product(v, qv) /
                  (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
          FROM e, q WHERE vec_id <> 7)
      SELECT vec_id, cos_sim FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 15""",

    // Exact global cosine top-15 over the planted corpus (20 near-copies
    // of query vector 7): the engine probes only nprobe=2 of 8 trained
    // cells, but the copies provably share the query's cell (they sit in
    // a tiny L2 ball around it), so the under-probed search must still
    // reproduce the exact global answer — grading the APPROXIMATE path.
    "q_ann_ivf_partial" -> PlantedAnnTopK,

    // PQ ANN over the SAME planted corpus as q_ann_ivf_partial: the
    // exact re-rank + the planted margin (cos 0.999 copies vs 0.60
    // background, far beyond quantization error) make the approximate
    // path provably exact here, so the exact global top-15 is a sound
    // oracle (PqSpec additionally pins ADC recall of every copy).
    "q_ann_pq" -> PlantedAnnTopK,

    // IVF-PQ over the same planted corpus: probed cells provably hold
    // the copies (q_ann_ivf_partial containment argument) and the exact
    // re-rank + planted margin make the approximate path exact here.
    "q_ann_ivfpq" -> PlantedAnnTopK,

    // Exact all-pairs cosine over the SAME planted-near-dup corpus the
    // engine query constructs (every 10th vector duplicated with its
    // first component ×1.1) — the LSH path's band-miss probability is
    // ~1e-22 per qualifying pair at this threshold (CosineLsh scaladoc),
    // so exact comparison is sound.
    "q_cosine_neardup" -> """
      WITH base AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        planted AS (SELECT vec_id + 1000000 AS vec_id,
            list_transform(range(1, 65), i -> CASE WHEN i = 1 THEN v[i] * 1.1 ELSE v[i] END) AS v
          FROM base WHERE vec_id % 10 = 0),
        corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        pairs AS (SELECT a.vec_id vec_a, b.vec_id vec_b,
            round(list_dot_product(a.v, b.v) /
                  (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) cos_sim
          FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, cos_sim FROM pairs WHERE cos_sim >= 0.99
      ORDER BY vec_a, vec_b""",

    // Embedding-cluster resolution: recursive-CTE transitive closure over
    // the exact all-pairs ≥0.99 cosine edge list on the SAME planted
    // corpus — the independent fixpoint formulation the iterative
    // min-label loop is checked against (the q_neardup_resolve pattern,
    // on vectors).
    "q_cosine_resolve" -> """
      WITH RECURSIVE base AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        planted AS (SELECT vec_id + 1000000 AS vec_id,
            list_transform(range(1, 65), i -> CASE WHEN i = 1 THEN v[i] * 1.1 ELSE v[i] END) AS v
          FROM base WHERE vec_id % 10 = 0),
        corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        p AS (SELECT a.vec_id va, b.vec_id vb
          FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.99),
        e AS (SELECT va s, vb d FROM p UNION ALL SELECT vb, va FROM p),
        reach(vv, lbl) AS (
          SELECT s, s FROM e
          UNION
          SELECT e.s, reach.lbl FROM e JOIN reach ON reach.vv = e.d),
        lbl AS (SELECT vv, min(lbl) AS canonical FROM reach GROUP BY vv),
        lab AS (SELECT c.vec_id, coalesce(l.canonical, c.vec_id) AS canonical
          FROM corpus c LEFT JOIN lbl l ON l.vv = c.vec_id)
      SELECT canonical, count(*) AS group_size
      FROM lab GROUP BY canonical ORDER BY canonical""",

    "q_similarity_join" -> """
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
        pairs AS (SELECT a.vec_id vec_a, b.vec_id vec_b, CAST(a.label AS BIGINT) AS label,
          round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) cos_sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, label, cos_sim FROM pairs WHERE cos_sim >= 0.4
      ORDER BY vec_a, vec_b""",

    // SQL-registered native functions ≡ their relational meaning:
    // graft_dot(v,v) = list_dot_product on doubles (q_vector_norm's
    // established precision pattern), intersect_size(s,s) = |s|.
    "q_sql_registered" -> """
      SELECT e.vec_id,
        round(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sq_norm,
        CAST(len(list_distinct(string_split(d.text, ' '))) AS BIGINT) AS n_distinct_tokens
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      ORDER BY e.vec_id""",

    // `+ 0.0` mirrors the engine's negative-zero normalization (DuckDB's
    // round keeps -0.0's sign bit, Spark's HALF_UP round does not).
    "q_vector_norm" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) l2, v[1] f FROM e)
      SELECT vec_id, round(l2, 6) AS l2_norm,
        round(f / l2, 6) + 0.0 AS first_component
      FROM n ORDER BY vec_id""",

    // Planted-PII corpus (every 10th doc leaks email+phone, every 15th
    // IP+SSN — identical construction in TextClean.plantedPii); counts on
    // the raw text, placeholders substituted in the same order
    // (email, ip, ssn, phone). Patterns stay in the RE2∩Java subset so
    // both engines read them identically.
    // Canonical-URL dedup: DuckDB's regexp_replace is first-match-only
    // (no 'g') while Spark's is global — safe HERE because every
    // canonicalization pattern is anchored (^ or $), so first == all.
    "q_url_dedup" -> """
      WITH u AS (SELECT doc_id,
          CASE WHEN doc_id % 4 = 0 THEN 'https://Example.COM/a/b?utm=1'
               WHEN doc_id % 4 = 1 THEN 'http://example.com/a/b/'
               WHEN doc_id % 4 = 2 THEN 'https://example.com/a/b#frag'
               ELSE 'https://crawl.example.org/doc/' || doc_id END AS url
        FROM documents),
        x AS (SELECT doc_id,
            regexp_replace(regexp_replace(url, '^https?://', ''),
              '[?#].*$', '') AS x
          FROM u),
        c AS (SELECT doc_id,
            lower(regexp_extract(x, '^[^/]+')) ||
              regexp_replace(regexp_replace(x, '^[^/]+', ''), '/+$', '')
              AS canon_url
          FROM x)
      SELECT canon_url, count(*)::BIGINT AS n_docs, min(doc_id) AS keeper
      FROM c GROUP BY canon_url ORDER BY canon_url""",

    "q_pii_scrub" -> """
      WITH docs AS (SELECT doc_id,
          text || CASE WHEN doc_id % 10 = 0
              THEN ' contact jane.doe@example.com or 555-867-5309 today' ELSE '' END
               || CASE WHEN doc_id % 15 = 0
              THEN ' host 192.168.10.42 owner 123-45-6789' ELSE '' END AS text
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssns,
        CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
          '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS scrubbed
      FROM docs ORDER BY doc_id""",

    // Planted-markup corpus (every 7th doc wrapped in html); tag strip,
    // entity table in the same order, whitespace renormalized — both
    // engines run the literally-identical pipeline.
    "q_html_strip" -> """
      WITH docs AS (SELECT doc_id,
          CASE WHEN doc_id % 7 = 0
            THEN '<html><body><p class="x">' || text ||
                 '</p><div>footer &amp; nav</div></body></html>'
            ELSE text END AS text
        FROM documents),
      s AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_raw,
          trim(regexp_replace(
            replace(replace(replace(replace(replace(
              regexp_replace(text, '<[^>]*>', ' ', 'g'),
              '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&nbsp;', ' '),
            '\s+', ' ', 'g')) AS clean
        FROM docs)
      SELECT doc_id, n_raw, CAST(length(clean) AS BIGINT) AS n_clean, clean
      FROM s ORDER BY doc_id""",

    // Planted-URL corpus; DuckDB's regexp_extract_all returns full
    // matches (group 0) where the engine wraps the pattern in an explicit
    // group-1 — same strings either way.
    "q_url_census" -> """
      WITH docs AS (SELECT doc_id,
          text || CASE WHEN doc_id % 5 = 0
              THEN ' see https://example.com/a/b and http://data.example.org/x'
            WHEN doc_id % 5 = 1 THEN ' via https://example.com/c'
            ELSE '' END AS text
        FROM documents),
      urls AS (SELECT unnest(regexp_extract_all(text,
          'https?://[A-Za-z0-9.-]+(/[A-Za-z0-9._/%-]*)?')) AS url FROM docs),
      hosts AS (SELECT regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS host FROM urls)
      SELECT host, count(*) AS n_urls FROM hosts GROUP BY host ORDER BY host""",

    "q_text_stats" -> """
      SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars,
        round(avg(len(string_split(text, ' '))), 2) AS avg_tokens
      FROM documents GROUP BY lang ORDER BY lang""",

    "q_token_topk" -> """
      SELECT token, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token ORDER BY cnt DESC, token LIMIT 20""",

    "q_text_quality" -> """
      WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') toks FROM documents),
        q AS (SELECT doc_id, n_chars, len(toks)::DOUBLE n_tokens,
          len(list_filter(toks, x -> x IN ('the','a','of','and')))::DOUBLE n_stop,
          len(list_distinct(toks))::DOUBLE n_uniq FROM t)
      SELECT doc_id, n_tokens::BIGINT AS n_tokens,
        round(n_chars / n_tokens, 4) AS avg_token_len,
        round(n_stop / n_tokens, 4) AS stopword_ratio,
        round(n_uniq / n_tokens, 4) AS lexical_diversity,
        round(least(n_tokens / 100.0, 1.0) * (1.0 - n_stop / n_tokens), 4) AS quality_score
      FROM q ORDER BY doc_id""",

    "q_lang_id" -> """
      WITH g AS (SELECT lang,
          CASE WHEN contains(' ' || text || ' ', ' der ') OR contains(' ' || text || ' ', ' und ')
                 OR contains(' ' || text || ' ', ' die ') THEN 'de'
               WHEN contains(' ' || text || ' ', ' le ') OR contains(' ' || text || ' ', ' et ')
                 OR contains(' ' || text || ' ', ' la ') THEN 'fr'
               WHEN contains(' ' || text || ' ', ' el ') OR contains(' ' || text || ' ', ' los ')
                 OR contains(' ' || text || ' ', ' es ') THEN 'es'
               ELSE 'en' END guess
        FROM documents)
      SELECT lang, guess, count(*) AS n FROM g GROUP BY lang, guess ORDER BY lang, guess""",

    "q_multimodal_features" -> """
      SELECT doc_id, octet_length(encode(text))::BIGINT AS blob_len,
        substr(text, 1, 16) AS head_preview, lang
      FROM documents ORDER BY doc_id""",

    "q_tumbling_window" -> """
      SELECT date_trunc('hour', ts) AS window_start, event_type,
        count(*) AS n, round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "q_sliding_window" -> """
      WITH ex AS (SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL (k * 15) MINUTE AS window_start,
          event_type, value
        FROM events, range(4) t(k))
      SELECT window_start, event_type, count(*) AS n, round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
      FROM ex GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "q_sessionize" -> """
      WITH l AS (SELECT user_id, event_id, ts, value,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_ts
        FROM events),
        f AS (SELECT user_id, event_id, ts, value,
          CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END new_session
        FROM l),
        s AS (SELECT user_id, ts, value,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) session_id
        FROM f)
      SELECT user_id, session_id::BIGINT AS session_id, min(ts) AS session_start,
        max(ts) AS session_end, count(*) AS n_events, round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
      FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""",

    // Deterministic hash-mod stratified sampling: membership is pure
    // integer arithmetic (Knuth multiplicative bucket vs quota×2^20 —
    // scaling by a power of two is EXACT double math), so both engines
    // make the identical keep/drop decision per row. Rates cast to
    // DOUBLE because DuckDB types bare 0.5 literals DECIMAL.
    "q_sample_stratified" -> """
      WITH rates(event_type, rate) AS (VALUES
          ('purchase', 1.0::DOUBLE), ('click', 0.5::DOUBLE), ('view', 0.25::DOUBLE),
          ('signup', 0.1::DOUBLE), ('error', 0.05::DOUBLE))
      SELECT e.event_id, e.user_id, e.event_type
      FROM events e JOIN rates r USING (event_type)
      WHERE ((e.event_id & 2147483647) * 2654435761) % 1048576 < r.rate * 1048576
      ORDER BY event_id""",

    // The CSV/JSON round-trip keys aggregate a re-read text copy of the
    // events slice; the oracle aggregates the parquet original — equal
    // iff the text round trip is lossless (timestamps at micro
    // precision, shortest-repr doubles).
    "q_source_csv" -> """
      SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value, max(ts) AS max_ts
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_source_json" -> """
      SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value, max(ts) AS max_ts
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_source_orc" -> """
      SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value, max(ts) AS max_ts
      FROM events GROUP BY event_type ORDER BY event_type""",

    // Compaction rewrites rows bit-exactly — oracle is the plain
    // parquet aggregate.
    "q_compact_roundtrip" -> """
      SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value, max(ts) AS max_ts
      FROM events GROUP BY event_type ORDER BY event_type""",

    // Orphan vacuum (Sources.qVacuumOrphans): the two committed batches
    // tile the full slice, so the oracle is the plain aggregate — it
    // only matches if the orphan's duplicate rows were swept (count(*)
    // and sum(value) would both inflate) and nothing else was touched.
    "q_vacuum_orphans" -> """
      SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value, max(ts) AS max_ts
      FROM events GROUP BY event_type ORDER BY event_type""",

    // Snapshot diff (Sources.qSnapshotDiff): the oracle re-derives v2
    // from v1 with the same planted deletes/updates/inserts and diffs
    // ALL partitions — equal to the engine's pruned two-phase diff iff
    // phase-1 pruning drops only genuinely unchanged partitions. The
    // checksum is the shared Knuth order hash times length(text).
    "q_snapshot_diff" -> """
      WITH v1 AS (SELECT doc_id, doc_id % 16 AS part, text FROM documents),
        v2 AS (
          SELECT doc_id, part,
            CASE WHEN doc_id % 4 = 1 THEN text || ' v2' ELSE text END AS text
          FROM v1 WHERE doc_id % 8 <> 2
          UNION ALL
          SELECT doc_id + 400000 AS doc_id, part, text FROM v1
          WHERE doc_id % 16 = 6),
        c1 AS (SELECT part, doc_id,
            ((doc_id & 2147483647) * 2654435761) % 2147483648 * length(text) AS ck
          FROM v1),
        c2 AS (SELECT part, doc_id,
            ((doc_id & 2147483647) * 2654435761) % 2147483648 * length(text) AS ck
          FROM v2),
        d AS (SELECT coalesce(a.part, b.part) AS part,
            coalesce(a.doc_id, b.doc_id) AS doc_id,
            CASE WHEN a.doc_id IS NULL THEN 'added'
                 WHEN b.doc_id IS NULL THEN 'removed'
                 WHEN a.ck <> b.ck THEN 'changed' END AS status
          FROM c1 a FULL OUTER JOIN c2 b
            ON a.part = b.part AND a.doc_id = b.doc_id)
      SELECT part, status, count(*)::BIGINT AS n,
        CAST(sum(((doc_id & 2147483647) * 2654435761) % 2147483648)
          AS BIGINT) AS id_checksum
      FROM d WHERE status IS NOT NULL
      GROUP BY part, status ORDER BY part, status""",

    // Predicate delete: the engine's partition-rewriting store must
    // equal the fixture with the predicate negated.
    "q_delete_where" -> """
      SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value, max(ts) AS max_ts
      FROM events WHERE NOT (user_id % 7 = 0)
      GROUP BY event_type ORDER BY event_type""",

    // Retention sweep: surviving days only.
    "q_retention_sweep" -> """
      SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value, max(ts) AS max_ts
      FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-10'
      GROUP BY event_type ORDER BY event_type""",

    // Dirty-source keys: the engine reads a text copy with 7 planted
    // corrupt lines under PERMISSIVE quarantine and aggregates the clean
    // split; equal to the parquet aggregate (+ the planted count as a
    // literal) iff exactly the dirt quarantines and no clean row is lost
    // or altered (Sources.dirtyCsvLines / dirtyJsonLines).
    "q_source_dirty_csv" -> """
      SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value, max(ts) AS max_ts,
        CAST(7 AS BIGINT) AS n_quarantined
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_source_dirty_json" -> """
      SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value, max(ts) AS max_ts,
        CAST(7 AS BIGINT) AS n_quarantined
      FROM events GROUP BY event_type ORDER BY event_type""",

    // Bucketed-layout round trip: the engine joins two bucketed tables
    // shuffle-free and aggregates; the oracle runs the same join+agg
    // over the parquet fixture.
    "q_bucketed_join" -> """
      WITH ev AS (SELECT event_id, user_id, event_type, value FROM events),
        agg AS (SELECT user_id, count(*) AS n_events FROM ev GROUP BY user_id)
      SELECT event_type, count(*) AS n_rows,
        sum(a.n_events)::BIGINT AS sum_n_events,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
      FROM ev e JOIN agg a USING (user_id)
      GROUP BY event_type ORDER BY event_type""",

    // Partitioned-layout round trip: the engine aggregates a pruned read
    // of a lang-partitioned copy; the oracle aggregates the unpartitioned
    // fixture with the same WHERE — equal iff the layout preserves rows
    // and pruning sees exactly the filtered slice.
    // Z-order round trip is row-preserving, so the oracle is the same
    // two-dimension-filtered aggregate over the fixture.
    "q_zorder_scan" -> """
      SELECT event_type, count(*) AS n_events,
        round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
      FROM events
      WHERE user_id BETWEEN 10 AND 20
        AND date_part('day', ts) BETWEEN 5 AND 10
      GROUP BY event_type ORDER BY event_type""",

    // Sorted-layout round trip is row-preserving, so the oracle is the
    // same month aggregate over the unsorted fixture.
    "q_sorted_scan" -> """
      SELECT o_orderpriority, count(*) AS n_orders,
        round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS sum_price,
        min(o_orderkey) AS min_orderkey
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o_orderdate AS DATE) < DATE '1996-02-01'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // Schema evolution: old-batch rows (even doc_id, written without
    // lang) surface under the explicit default; new-batch rows keep
    // their real lang.
    "q_schema_evolution" -> """
      WITH u AS (
        SELECT doc_id, n_chars, NULL AS lang FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, n_chars, lang FROM documents WHERE doc_id % 2 <> 0)
      SELECT coalesce(lang, 'pre_v2') AS lang, count(*) AS n_docs,
        sum(n_chars)::BIGINT AS sum_chars,
        min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      FROM u GROUP BY 1 ORDER BY 1""",

    "q_partition_pruned" -> """
      SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      FROM documents WHERE lang IN ('de', 'fr')
      GROUP BY lang ORDER BY lang""",

    // Spearman via per-value midranks (window over the tiny distinct
    // dictionary, not the data) — mirrors the engine's no-global-sort
    // formulation exactly.
    "q_corr_spearman" -> """
      WITH q AS (SELECT l_quantity v, count(*) n FROM lineitem GROUP BY 1),
        qr AS (SELECT v, sum(n) OVER (ORDER BY v) - (n - 1) / 2.0 AS r FROM q),
        dd AS (SELECT l_discount v, count(*) n FROM lineitem GROUP BY 1),
        dr AS (SELECT v, sum(n) OVER (ORDER BY v) - (n - 1) / 2.0 AS r FROM dd)
      SELECT round(corr(qr.r, dr.r), 6) AS spearman_qty_discount, count(*) AS n_rows
      FROM lineitem l
      JOIN qr ON l.l_quantity = qr.v
      JOIN dr ON l.l_discount = dr.v""",

    // One UNION ALL arm per profiled column; values match the engine's
    // single-pass Expand-aggregate because each statistic is the same
    // scalar regardless of how many scans produce it.
    "q_profile" -> """
      WITH s AS (SELECT count(*) AS n_rows,
          count(l_quantity) q_nn, count(DISTINCT l_quantity) q_nd,
            round(min(l_quantity), 4) q_min, round(max(l_quantity), 4) q_max,
            round(avg(l_quantity), 4) q_avg,
          count(l_extendedprice) p_nn, count(DISTINCT l_extendedprice) p_nd,
            round(min(l_extendedprice), 4) p_min, round(max(l_extendedprice), 4) p_max,
            round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                  / count(l_extendedprice), 4) p_avg,
          count(l_discount) d_nn, count(DISTINCT l_discount) d_nd,
            round(min(l_discount), 4) d_min, round(max(l_discount), 4) d_max,
            round(sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0
                  / count(l_discount), 4) d_avg,
          count(l_tax) t_nn, count(DISTINCT l_tax) t_nd,
            round(min(l_tax), 4) t_min, round(max(l_tax), 4) t_max,
            round(sum(CAST(round(l_tax * 100) AS BIGINT)) / 100.0
                  / count(l_tax), 4) t_avg
        FROM lineitem)
      SELECT 'l_discount' AS "column", n_rows, d_nn AS n_nonnull, d_nd AS n_distinct,
        d_min AS min_value, d_max AS max_value, d_avg AS avg_value FROM s
      UNION ALL SELECT 'l_extendedprice', n_rows, p_nn, p_nd, p_min, p_max, p_avg FROM s
      UNION ALL SELECT 'l_quantity', n_rows, q_nn, q_nd, q_min, q_max, q_avg FROM s
      UNION ALL SELECT 'l_tax', n_rows, t_nn, t_nd, t_min, t_max, t_avg FROM s
      ORDER BY "column"""",

    // Delta-vs-snapshot near-dup: exact delta × corpus all-pairs Jaccard
    // over the identically-constructed delta (re-labeled copies + a
    // synthetic disjoint-vocabulary slice).
    "q_neardup_delta" -> """
      WITH corpus AS (SELECT doc_id, list_distinct(string_split(text, ' ')) toks FROM documents),
        delta AS (
          SELECT doc_id + 100000 AS doc_id, list_distinct(string_split(text, ' ')) toks
          FROM documents WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id + 200000 AS doc_id,
            list_distinct(string_split(
              'zzz unique synthetic content ' || CAST(doc_id + 200000 AS VARCHAR), ' ')) toks
          FROM documents WHERE doc_id % 10 = 3),
        pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
            round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                  len(list_distinct(list_concat(a.toks, b.toks))), 6) jaccard
          FROM delta a CROSS JOIN corpus b)
      SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.9
      ORDER BY doc_a, doc_b""",

    // Directional containment |A∩B|/|A| >= 0.9: exact all-pairs — sound
    // vs the engine's prefix-filtered candidates because prefix recall
    // is exact by pigeonhole (Dedup.containmentPairs scaladoc).
    "q_containment_pairs" -> """
      WITH t AS (SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) toks
                 FROM documents WHERE doc_id % 8 = 0),
        planted AS (SELECT doc_id + 300000 AS doc_id,
            toks[1:(len(toks) + 1) // 2] AS toks FROM t),
        corpus AS (SELECT * FROM t UNION ALL SELECT * FROM planted),
        nz AS (SELECT * FROM corpus WHERE len(toks) > 0),
        pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
            len(list_intersect(a.toks, b.toks)) inter, len(a.toks) na
          FROM nz a JOIN nz b ON a.doc_id <> b.doc_id)
      SELECT doc_a, doc_b, round(inter * 1.0 / na, 6) AS containment
      FROM pairs WHERE inter * 10 >= na * 9
      ORDER BY doc_a, doc_b""",

    // TF-IDF: tf * ln(N/df) rounded to 6 BEFORE ordering (G2 — libm ulp
    // drift far below the rounding grain), ties cut by (doc_id, term).
    "q_tfidf_topk" -> """
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tt GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id, term, tf, df,
        round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
      FROM tf JOIN df USING (term), n
      ORDER BY tfidf DESC, doc_id, term LIMIT 20""",

    // Corpus-unigram-LM mean NLL via the entropy trick (ln N − Σ tf·ln cf
    // / n — single trailing division, identical op sequence both engines).
    "q_lm_score" -> """
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tt GROUP BY doc_id, term),
        cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
        n AS (SELECT sum(cf) AS n_total FROM cf)
      SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
        round(ln(n_total) - sum(tf * ln(cf)) / sum(tf), 6) AS nll
      FROM tf JOIN cf USING (term), n
      GROUP BY doc_id, n_total ORDER BY doc_id""",

    // Shannon entropy via ln N − Σ c·ln c / N (single trailing division
    // — identical op sequence in both engines, drift ≪ round-6).
    "q_token_entropy" -> """
      WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
        c AS (SELECT lang, term, count(*) AS c FROM t WHERE term <> '' GROUP BY lang, term)
      SELECT lang, sum(c)::BIGINT AS n_tokens, count(*) AS n_terms,
        round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
      FROM c GROUP BY lang ORDER BY lang""",

    // Intra-doc repetition: the oracle recomputes the per-doc census
    // relationally (unnest + group) — same values as Spark's map-only
    // array math; top/bigram shares are exact-division doubles rounded
    // to the shared 4-decimal grain (G2).
    "q_repetition" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
          WHERE len(string_split(text, ' ')) >= 2),
        tok AS (SELECT doc_id, unnest(l) AS tk FROM t),
        cnt AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk),
        top AS (SELECT doc_id, max(c) AS mx FROM cnt GROUP BY doc_id),
        bg AS (SELECT doc_id,
            unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS b
          FROM t),
        bgs AS (SELECT doc_id, count(*) AS nb, count(DISTINCT b) AS ub FROM bg GROUP BY doc_id)
      SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tokens,
        round(top.mx * 1.0 / len(t.l), 4) AS top_token_share,
        round(1.0 - bgs.ub * 1.0 / bgs.nb, 4) AS dup_bigram_share
      FROM t JOIN top USING (doc_id) JOIN bgs USING (doc_id)
      ORDER BY doc_id""",

    "q_bigram_topk" -> """
      WITH t AS (SELECT string_split(text, ' ') l FROM documents),
        b AS (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
          FROM t)
      SELECT bigram, count(*) AS cnt FROM b
      GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""",

    // Salted two-phase collect ≡ the plain ordered per-key list.
    // Salted join is exact by construction — oracle is the plain join.
    "q_skew_join" -> """
      WITH dim AS (SELECT event_type, count(DISTINCT user_id) AS n_type_users
        FROM events GROUP BY 1)
      SELECT e.event_type, count(*) AS n_events,
        -- exact integer cents, mirroring the engine's Relational.sumValue2
        -- (a raw double sum can drift at half-cent boundaries once the
        -- aggregate spans enough partitions — r13 ADVICE item)
        round(sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0, 2) AS sum_value,
        max(d.n_type_users) AS n_type_users
      FROM events e JOIN dim d USING (event_type)
      GROUP BY e.event_type ORDER BY e.event_type""",

    // The AQE-split probe: a planted power-law key (top value ~half of
    // all rows); runtime skew mitigation, like salting, must be
    // invisible in the result — the oracle is the plain join on the
    // same derived key (log2 exact at powers of two in both engines).
    "q_skew_join_aqe" -> """
      WITH e AS (SELECT event_id, user_id, value,
          CAST(floor(log2(1 + (event_id % 1024))) AS BIGINT) AS zipf_key
        FROM events),
        dim AS (SELECT CAST(range AS BIGINT) AS zipf_key,
          CAST(power(2.0, range) AS BIGINT) AS key_weight FROM range(0, 11))
      SELECT e.zipf_key, count(*) AS n_events,
        round(sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0, 2) AS sum_value,
        max(d.key_weight) AS key_weight
      FROM e JOIN dim d USING (zipf_key)
      GROUP BY e.zipf_key ORDER BY e.zipf_key""",

    "q_skew_collect" -> """
      SELECT event_type, count(*) AS n_events,
        array_to_string(list(event_id ORDER BY event_id), ',') AS ids
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_user_sequences" -> """
      SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
        array_to_string(list(event_type ORDER BY ts, event_id), ' ') AS sequence
      FROM events GROUP BY user_id, CAST(ts AS DATE)
      ORDER BY user_id, day""",

    // Int8 scalar quantization: codes via FLOOR (round() is half-up in
    // Spark/Java but half-even in DuckDB — a .5-boundary trap), cast
    // AFTER floor (DuckDB's double→int cast rounds, Spark's truncates).
    // The code expression repeats inside errs so both engines evaluate
    // the identical double op sequence.
    "q_embed_quantize" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        m AS (SELECT vec_id, v, list_min(v) mn, list_max(v) mx FROM e),
        c AS (SELECT vec_id, mn, mx,
            list_transform(v, x -> CAST(CASE WHEN mx = mn THEN 0.0
              ELSE least(floor((x - mn) * 255.0 / (mx - mn)), 255.0) END AS BIGINT)) AS codes,
            list_transform(v, x -> x - (mn + (CASE WHEN mx = mn THEN 0.0
              ELSE least(floor((x - mn) * 255.0 / (mx - mn)), 255.0) END + 0.5)
              * (mx - mn) / 255.0)) AS errs
          FROM m)
      SELECT vec_id, array_to_string(codes, ',') AS codes,
        round(mn, 6) AS qmin, round(mx, 6) AS qmax,
        round(sqrt(list_dot_product(errs, errs)), 6) AS recon_err
      FROM c ORDER BY vec_id""",

    // Same hash-bucket arithmetic as q_sample_stratified; cumulative
    // thresholds 0.8/0.9 of 2^20 (exact double scaling).
    "q_train_test_split" -> """
      WITH s AS (SELECT lang, n_chars, doc_id,
          CASE WHEN ((doc_id & 2147483647) * 2654435761) % 1048576 < 0.8 * 1048576 THEN 'train'
               WHEN ((doc_id & 2147483647) * 2654435761) % 1048576 < 0.9 * 1048576 THEN 'valid'
               ELSE 'test' END AS split
        FROM documents)
      SELECT lang, split, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      FROM s GROUP BY lang, split ORDER BY lang, split""",

    // Curation composition: integer-only quality gate (>=5 tokens,
    // 10*n_uniq >= 3*n_tokens), then distinct normalized-token-string
    // counting among survivors — the same normKey q_dedup_normalized
    // grades.
    "q_curation_pipeline" -> """
      WITH t AS (SELECT lang, doc_id,
          len(string_split(text, ' ')) AS n_tokens,
          len(list_distinct(string_split(text, ' '))) AS n_uniq,
          list_aggr(list_sort(list_distinct(string_split(text, ' '))), 'string_agg', ' ') AS norm
        FROM documents),
        f AS (SELECT lang, n_tokens >= 5 AND 10 * n_uniq >= 3 * n_tokens AS ok, norm FROM t)
      SELECT lang, count(*) AS n_raw,
        count(CASE WHEN ok THEN 1 END) AS n_quality,
        count(DISTINCT CASE WHEN ok THEN norm END) AS n_unique
      FROM f GROUP BY lang ORDER BY lang""",

    // Distributed covariance accumulation graded exact: DuckDB
    // recomputes Σxy / Σx / n independently over the raw embeddings.
    "q_agg_regression" -> """
      SELECT l_returnflag, count(*)::BIGINT AS n,
        round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_pca_covariance" -> PcaCovarianceSql,
    // SAME oracle string — the snapshot+delta moment-frame merge must
    // hash-match the from-scratch covariance (structural identity).
    "q_pca_cov_delta" -> PcaCovarianceSql,

    // Norm preservation through the engine's FULL eigenbasis: DuckDB
    // computes ‖v‖² from the raw parquet; the engine row is Σ over the
    // 64 projected coordinates squared — equal only if the Jacobi basis
    // is orthonormal and complete (rotation round-off ~1e-13 ≪ 1e-6).
    "q_pca_check" -> """
      SELECT vec_id,
        round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6)
          AS norm2
      FROM embeddings ORDER BY vec_id""",

    // Fellegi–Sunter linkage: weights appear as the same literal
    // arithmetic (ln(0.9 / 0.001), ln((1 - 0.9) / (1 - 0.001)), ...) so
    // both engines evaluate identical double expressions up to ~1 ulp of
    // libm ln — and the eight attainable pattern scores sit ≥ 0.7 from
    // the 3.0 threshold, so no link decision can ride on that ulp.
    // Round 12: the graded key is the COMPOUND block (nation +
    // custkey//1000 bucket — the linear-scale face); the extra join
    // predicate mirrors Linkage.scaledLinkageFrame's bucket exactly
    // (DuckDB // is integer floor division ≡ Spark's (x/1000)::long
    // truncation for the positive keys).
    "q_record_linkage" -> """
      WITH twin AS (SELECT c_custkey, c_nationkey,
          CASE WHEN c_custkey % 5 = 0 THEN c_name || 'x'
               ELSE c_name END AS c_name,
          CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1.0
               ELSE c_acctbal END AS c_acctbal,
          CASE WHEN c_custkey % 3 = 0 THEN 'X' || c_mktsegment
               ELSE c_mktsegment END AS c_mktsegment
        FROM customer),
        p AS (SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
            (CASE WHEN a.c_name = b.c_name THEN ln(0.9 / 0.001)
                  ELSE ln((1 - 0.9) / (1 - 0.001)) END
             + CASE WHEN a.c_acctbal = b.c_acctbal THEN ln(0.85 / 0.01)
                    ELSE ln((1 - 0.85) / (1 - 0.01)) END
             + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN ln(0.95 / 0.2)
                    ELSE ln((1 - 0.95) / (1 - 0.2)) END) AS score
          FROM customer a JOIN twin b ON a.c_nationkey = b.c_nationkey
            AND (a.c_custkey // 1000) = (b.c_custkey // 1000))
      SELECT key_a, key_b, round(score, 6) AS score
      FROM p WHERE score > 3.0
      ORDER BY key_a, key_b""",

    // Survivorship: the three observation feeds replanted verbatim
    // (master with planted NULL segments, the linkage twin, a second
    // independent corruption), then the same per-field rules — name by
    // mode with (count DESC, min-priority, lexicographic) tie-break,
    // balance by max, segment by source-priority NULL fall-through.
    "q_dedup_survivorship" -> """
      WITH master AS (SELECT c_custkey, c_name, c_acctbal,
          CASE WHEN c_custkey % 11 = 0 THEN NULL
               ELSE c_mktsegment END AS c_mktsegment, 1 AS prio
        FROM customer),
        crawl AS (SELECT c_custkey,
          CASE WHEN c_custkey % 5 = 0 THEN c_name || 'x' ELSE c_name END,
          CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1.0 ELSE c_acctbal END,
          CASE WHEN c_custkey % 3 = 0 THEN 'X' || c_mktsegment ELSE c_mktsegment END,
          2 FROM customer),
        imp AS (SELECT c_custkey,
          CASE WHEN c_custkey % 4 = 0 THEN c_name || 'y' ELSE c_name END,
          CASE WHEN c_custkey % 6 = 0 THEN c_acctbal + 2.0 ELSE c_acctbal END,
          CASE WHEN c_custkey % 5 = 0 THEN 'Y' || c_mktsegment ELSE c_mktsegment END,
          3 FROM customer),
        obs AS (SELECT * FROM master UNION ALL SELECT * FROM crawl
                UNION ALL SELECT * FROM imp),
        nm AS (SELECT c_custkey, c_name, count(*) AS cnt, min(prio) AS mp
          FROM obs GROUP BY 1, 2),
        pick AS (SELECT c_custkey, c_name AS name, cnt AS name_support,
            row_number() OVER (PARTITION BY c_custkey
              ORDER BY cnt DESC, mp, c_name) AS rn
          FROM nm),
        f AS (SELECT c_custkey, max(c_acctbal) AS acctbal,
            coalesce(max(CASE WHEN prio = 1 THEN c_mktsegment END),
                     max(CASE WHEN prio = 2 THEN c_mktsegment END),
                     max(CASE WHEN prio = 3 THEN c_mktsegment END)) AS mktsegment
          FROM obs GROUP BY 1)
      SELECT p.c_custkey, name, name_support, acctbal, mktsegment
      FROM pick p JOIN f USING (c_custkey)
      WHERE rn = 1 ORDER BY c_custkey""",

    "q_graph_pagerank" -> PagerankSql,

    // SemDeDup graded END-TO-END, clustering included: the oracle
    // replants the near-copy corpus, re-runs the id-order-seeded Lloyd
    // update with the same 9-decimal centroid rounding, re-assigns with
    // the same Σ(v[i]−c[i])² distance (ties → lowest cell), and
    // re-derives every keep/prune decision at τ = 0.8 — so a drifting
    // centroid, a flipped assignment, or a wrong dominator all fail the
    // hash gate (τ sits in the measured empty band 0.61…≈1, so no
    // decision rides on float noise). r13: mirrors the engine's salted
    // subcell cap (census nsub = ceil(members/64), subcell = vec_id mod
    // 10^12 mod nsub, dominator search within (cell, subcell)) — the
    // fix that makes the fixed-k face's pair work linear; planted pairs
    // are congruent mod the offset so stay co-located.
    "q_semdedup" -> """
      WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        corpus AS (
          SELECT vec_id, v FROM base
          UNION ALL
          SELECT 1000000000000 + vec_id AS vec_id,
            list_transform(v, x -> x * 1.02 + 0.001) AS v
          FROM base WHERE vec_id % 25 = 0),
        seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
          FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 8)),
        -- list_transform(range)+list_sum is the same ascending-index
        -- ordered double fold as the generate_series subquery it
        -- replaced (verified bit-identical over every (vector, seed)
        -- pair at sf0.01), WITHOUT the dependent-join row explosion:
        -- the subquery form materialized corpus x cells x 64 rows,
        -- which at the x970 mirror (~1B rows) exhausted the box's temp
        -- disk (r14) - the list form stays one row per (vector, cell).
        d0 AS (SELECT c.vec_id, s.cell,
            list_sum(list_transform(range(1, 65),
              i -> (c.v[i] - s.cv[i]) * (c.v[i] - s.cv[i]))) AS d2
          FROM corpus c CROSS JOIN seeds s),
        a0 AS (SELECT vec_id, cell FROM d0
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1),
        c1 AS (SELECT cell, list(m ORDER BY i) AS cv FROM (
            SELECT a0.cell, t.i, round(avg(c.v[t.i]), 9) AS m
            FROM a0 JOIN corpus c USING (vec_id),
              generate_series(1, 64) t(i)
            GROUP BY a0.cell, t.i) GROUP BY cell),
        d1 AS (SELECT c.vec_id, s.cell,
            list_sum(list_transform(range(1, 65),
              i -> (c.v[i] - s.cv[i]) * (c.v[i] - s.cv[i]))) AS d2
          FROM corpus c CROSS JOIN c1 s),
        a1 AS (SELECT vec_id, cell::BIGINT AS cell FROM d1
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1),
        census AS (SELECT cell, CAST(ceil(count(*) / 64.0) AS BIGINT) AS nsub
          FROM a1 GROUP BY cell),
        a2 AS (SELECT a1.vec_id, a1.cell,
            (a1.vec_id % 1000000000000) % nsub AS subcell
          FROM a1 JOIN census USING (cell)),
        pairs AS (SELECT x.vec_id AS i, y.vec_id AS j
          FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.subcell = y.subcell
            AND y.vec_id < x.vec_id
            JOIN corpus cx ON cx.vec_id = x.vec_id
            JOIN corpus cy ON cy.vec_id = y.vec_id
          WHERE list_dot_product(cx.v, cy.v) /
              (sqrt(list_dot_product(cx.v, cx.v)) *
               sqrt(list_dot_product(cy.v, cy.v))) >= 0.8),
        reps AS (SELECT i AS vec_id, min(j) AS rep FROM pairs GROUP BY i)
      SELECT a1.vec_id, a1.cell, reps.rep, reps.rep IS NOT NULL AS pruned
      FROM a1 LEFT JOIN reps USING (vec_id)
      ORDER BY a1.vec_id""",

    // GRADED scaled SemDeDup (flat, r12): same replication contract as
    // q_semdedup but k ∝ n — k = greatest(8, ceil(n/64)) computed from
    // the same corpus both engines build (64 = 2⁶ so n/64.0 is exact),
    // seeds = the k smallest vec_ids, one 9-decimal-rounded Lloyd
    // update, argmin with ties to the lowest cell. The engine assigns
    // via the map-only NearestCell codegen argmin whose ascending-index
    // Σ(v[i]−c[i])² loop is the same ordered fold as this SQL's
    // generate_series sum — identical double arithmetic, so cell ids
    // match bit-for-bit, and τ = 0.8 keeps prune decisions in the
    // planted-vs-natural empty band as before.
    "q_semdedup_scaled" -> """
      WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        corpus AS (
          SELECT vec_id, v FROM base
          UNION ALL
          SELECT 1000000000000 + vec_id AS vec_id,
            list_transform(v, x -> x * 1.02 + 0.001) AS v
          FROM base WHERE vec_id % 25 = 0),
        kk AS (SELECT greatest(8, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS k
          FROM corpus),
        seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
          FROM corpus CROSS JOIN kk QUALIFY cell < k),
        d0 AS (SELECT c.vec_id, s.cell,
            list_sum(list_transform(range(1, 65),
              i -> (c.v[i] - s.cv[i]) * (c.v[i] - s.cv[i]))) AS d2
          FROM corpus c CROSS JOIN seeds s),
        a0 AS (SELECT vec_id, cell FROM d0
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1),
        c1 AS (SELECT cell, list(m ORDER BY i) AS cv FROM (
            SELECT a0.cell, t.i, round(avg(c.v[t.i]), 9) AS m
            FROM a0 JOIN corpus c USING (vec_id),
              generate_series(1, 64) t(i)
            GROUP BY a0.cell, t.i) GROUP BY cell),
        d1 AS (SELECT c.vec_id, s.cell,
            list_sum(list_transform(range(1, 65),
              i -> (c.v[i] - s.cv[i]) * (c.v[i] - s.cv[i]))) AS d2
          FROM corpus c CROSS JOIN c1 s),
        a1 AS (SELECT vec_id, cell::BIGINT AS cell FROM d1
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1),
        pairs AS (SELECT x.vec_id AS i, y.vec_id AS j
          FROM a1 x JOIN a1 y ON x.cell = y.cell AND y.vec_id < x.vec_id
            JOIN corpus cx ON cx.vec_id = x.vec_id
            JOIN corpus cy ON cy.vec_id = y.vec_id
          WHERE list_dot_product(cx.v, cy.v) /
              (sqrt(list_dot_product(cx.v, cx.v)) *
               sqrt(list_dot_product(cy.v, cy.v))) >= 0.8),
        reps AS (SELECT i AS vec_id, min(j) AS rep FROM pairs GROUP BY i)
      SELECT a1.vec_id, a1.cell, reps.rep, reps.rep IS NOT NULL AS pruned
      FROM a1 LEFT JOIN reps USING (vec_id)
      ORDER BY a1.vec_id""",

    // GRADED scaled SemDeDup (two-level, r12): k1 = ceil(sqrt(k)) coarse
    // cells via the flat deterministic clustering above, then k2 =
    // ceil(k/k1) sub-cells PER coarse cell — sub-seeds are the k2
    // smallest vec_ids of each coarse cell, one 9-decimal-rounded sub
    // Lloyd update, sub-assignment ties to the lowest sub. Combined
    // cell = ccell·k2 + sub. Missing (ccell, sub) cells after the
    // update are symmetric (neither engine carries forward), so no
    // special-casing. Division k/k1 is forced DOUBLE to mirror Scala's
    // k.toDouble / k1; sqrt/ceil on these small ints are exact.
    "q_semdedup_scaled2" -> """
      WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        corpus AS (
          SELECT vec_id, v FROM base
          UNION ALL
          SELECT 1000000000000 + vec_id AS vec_id,
            list_transform(v, x -> x * 1.02 + 0.001) AS v
          FROM base WHERE vec_id % 25 = 0),
        kk0 AS (SELECT greatest(8, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS k
          FROM corpus),
        kk AS (SELECT k, CAST(ceil(sqrt(k)) AS BIGINT) AS k1,
            CAST(ceil(CAST(k AS DOUBLE) / CAST(ceil(sqrt(k)) AS BIGINT))
              AS BIGINT) AS k2
          FROM kk0),
        cseeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ccell,
            v AS cv
          FROM corpus CROSS JOIN kk QUALIFY ccell < k1),
        cd0 AS (SELECT c.vec_id, s.ccell,
            list_sum(list_transform(range(1, 65),
              i -> (c.v[i] - s.cv[i]) * (c.v[i] - s.cv[i]))) AS d2
          FROM corpus c CROSS JOIN cseeds s),
        ca0 AS (SELECT vec_id, ccell FROM cd0
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, ccell) = 1),
        cc1 AS (SELECT ccell, list(m ORDER BY i) AS cv FROM (
            SELECT ca0.ccell, t.i, round(avg(c.v[t.i]), 9) AS m
            FROM ca0 JOIN corpus c USING (vec_id),
              generate_series(1, 64) t(i)
            GROUP BY ca0.ccell, t.i) GROUP BY ccell),
        cd1 AS (SELECT c.vec_id, s.ccell,
            list_sum(list_transform(range(1, 65),
              i -> (c.v[i] - s.cv[i]) * (c.v[i] - s.cv[i]))) AS d2
          FROM corpus c CROSS JOIN cc1 s),
        wc AS (SELECT ca1.vec_id, ca1.ccell, c.v
          FROM (SELECT vec_id, ccell FROM cd1
            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, ccell) = 1) ca1
          JOIN corpus c USING (vec_id)),
        sseeds AS (SELECT ccell,
            row_number() OVER (PARTITION BY ccell ORDER BY vec_id) - 1 AS sub,
            v AS cv
          FROM wc CROSS JOIN kk QUALIFY sub < k2),
        sd0 AS (SELECT w.vec_id, w.ccell, s.sub,
            list_sum(list_transform(range(1, 65),
              i -> (w.v[i] - s.cv[i]) * (w.v[i] - s.cv[i]))) AS d2
          FROM wc w JOIN sseeds s ON w.ccell = s.ccell),
        sa0 AS (SELECT vec_id, ccell, sub FROM sd0
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, sub) = 1),
        sc1 AS (SELECT ccell, sub, list(m ORDER BY i) AS cv FROM (
            SELECT sa0.ccell, sa0.sub, t.i, round(avg(w.v[t.i]), 9) AS m
            FROM sa0 JOIN wc w USING (vec_id),
              generate_series(1, 64) t(i)
            GROUP BY sa0.ccell, sa0.sub, t.i) GROUP BY ccell, sub),
        sd1 AS (SELECT w.vec_id, w.ccell, s.sub,
            list_sum(list_transform(range(1, 65),
              i -> (w.v[i] - s.cv[i]) * (w.v[i] - s.cv[i]))) AS d2
          FROM wc w JOIN sc1 s ON w.ccell = s.ccell),
        sa1 AS (SELECT vec_id, ccell, sub FROM sd1
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, sub) = 1),
        cells AS (SELECT vec_id,
            CAST(ccell * k2 + sub AS BIGINT) AS cell
          FROM sa1 CROSS JOIN kk),
        pairs AS (SELECT x.vec_id AS i, y.vec_id AS j
          FROM cells x JOIN cells y ON x.cell = y.cell AND y.vec_id < x.vec_id
            JOIN corpus cx ON cx.vec_id = x.vec_id
            JOIN corpus cy ON cy.vec_id = y.vec_id
          WHERE list_dot_product(cx.v, cy.v) /
              (sqrt(list_dot_product(cx.v, cx.v)) *
               sqrt(list_dot_product(cy.v, cy.v))) >= 0.8),
        reps AS (SELECT i AS vec_id, min(j) AS rep FROM pairs GROUP BY i)
      SELECT cells.vec_id, cells.cell, reps.rep, reps.rep IS NOT NULL AS pruned
      FROM cells LEFT JOIN reps USING (vec_id)
      ORDER BY cells.vec_id""",

    "q_inverted_index" -> InvertedIndexSql,
    // SAME oracle string as q_inverted_index by construction — the
    // snapshot+delta additive merge must hash-match the from-scratch
    // index exactly (the q_boilerplate_delta structural-identity
    // discipline).
    "q_index_delta" -> InvertedIndexSql,

    "q_phrase_search" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        h AS (SELECT doc_id,
            CAST(len([i for i in generate_series(1, len(t) - 1)
                      if t[i] = 'spark' AND t[i + 1] = 'join']) AS BIGINT)
              AS n_hits
          FROM t)
      SELECT doc_id, n_hits FROM h WHERE n_hits > 0 ORDER BY doc_id""",

    "q_index_lookup" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
          FROM toks WHERE tok IN ('dup', 'join') GROUP BY 1, 2)
      SELECT doc_id, sum(tf)::BIGINT AS total_tf
      FROM tf GROUP BY doc_id HAVING count(DISTINCT tok) = 2
      ORDER BY doc_id""",

    // BM25 mirrored literally: constants appear as the same arithmetic
    // ((1.2 + 1), (1 - 0.75)) so both engines evaluate identical double
    // expressions; ordering is on the ROUNDED score (ties → doc_id), so
    // the top-10 cut cannot depend on sub-1e-6 float noise.
    "q_bm25_topk" -> """
      WITH dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
          FROM documents),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS nn, avg(dl) AS avgdl FROM dl),
        toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
          FROM toks WHERE tok IN ('dup', 'spark', 'join') GROUP BY 1, 2),
        df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
        sc AS (SELECT tf.doc_id,
            ln(1.0 + (nn - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1)) /
              (tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / avgdl)) AS s
          FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats)
      SELECT doc_id, round(sum(s), 6) AS score
      FROM sc GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 10""",

    // Reciprocal-rank fusion: both branches replayed independently (the
    // BM25 CTE chain verbatim from q_bm25_topk, the cosine chain from
    // q_cosine_topk), each cut to depth 20 on (rounded score DESC, id)
    // BEFORE ranks are assigned — mirroring the engine's TakeOrdered-
    // then-rank order so rank numbers agree even at the cut boundary.
    // Absent ranks are 0, divisions forced to DOUBLE (1.0 alone is
    // DECIMAL in DuckDB).
    "q_hybrid_rrf" -> """
      WITH dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
          FROM documents),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS nn, avg(dl) AS avgdl FROM dl),
        toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
          FROM toks WHERE tok IN ('dup', 'spark', 'join') GROUP BY 1, 2),
        df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
        sc AS (SELECT tf.doc_id,
            ln(1.0 + (nn - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1)) /
              (tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / avgdl)) AS s
          FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats),
        lexs AS (SELECT doc_id, round(sum(s), 6) AS score FROM sc
          WHERE doc_id <> 0 GROUP BY doc_id),
        lex AS (SELECT doc_id,
            CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
          FROM (SELECT * FROM lexs ORDER BY score DESC, doc_id LIMIT 20)),
        e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        sims AS (SELECT vec_id AS doc_id,
            round(list_dot_product(v, qv) /
              (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
          FROM e, q WHERE vec_id <> 0),
        dense AS (SELECT doc_id,
            CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS dense_rank
          FROM (SELECT * FROM sims ORDER BY cos_sim DESC, doc_id LIMIT 20))
      SELECT doc_id,
        coalesce(lex_rank, 0) AS lex_rank,
        coalesce(dense_rank, 0) AS dense_rank,
        round(CASE WHEN coalesce(lex_rank, 0) > 0
                THEN CAST(1 AS DOUBLE) / (60 + lex_rank) ELSE CAST(0 AS DOUBLE) END +
              CASE WHEN coalesce(dense_rank, 0) > 0
                THEN CAST(1 AS DOUBLE) / (60 + dense_rank) ELSE CAST(0 AS DOUBLE) END, 6)
          AS rrf_score
      FROM lex FULL OUTER JOIN dense USING (doc_id)
      ORDER BY rrf_score DESC, doc_id LIMIT 15""",

    // Triangle census of the near-dup graph at τ = 0.97: the oracle
    // recomputes the exact-Jaccard edge list brute-force (a < b), closes
    // wedges a→b→c against it, and credits all three corners — the
    // engine's banded-LSH edge generation must therefore be exhaustive
    // at 0.97 (it is a fortiori, per the q_minhash_recall argument).
    "q_graph_triangles" -> """
      WITH docs AS (SELECT doc_id, list_distinct(string_split(text, ' ')) toks FROM documents),
        p AS (SELECT a.doc_id a, b.doc_id b,
            len(list_intersect(a.toks, b.toks)) * 1.0 /
            len(list_distinct(list_concat(a.toks, b.toks))) j
          FROM docs a JOIN docs b ON a.doc_id < b.doc_id),
        e AS (SELECT a, b FROM p WHERE j >= 0.97),
        tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
          FROM e e1 JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b),
        corners AS (SELECT unnest([a, b, c]) AS doc_id FROM tri)
      SELECT doc_id, count(*)::BIGINT AS n_triangles
      FROM corners GROUP BY doc_id
      ORDER BY n_triangles DESC, doc_id""",

    // Batched k-NN: every 50th vector as query, exact cosine top-10 per
    // query (the window-rank form — the engine's bounded TopKAgg must
    // agree with it exactly under the (rounded sim DESC, id) order).
    "q_knn_batch" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e
          WHERE vec_id % 50 = 0 AND vec_id < 1600),
        sims AS (SELECT q_id, vec_id,
            round(list_dot_product(v, qv) /
              (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)
              AS cos_sim
          FROM e, q WHERE vec_id <> q_id),
        ranked AS (SELECT q_id, vec_id, cos_sim,
            CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
          FROM sims)
      SELECT q_id, rank, vec_id, cos_sim FROM ranked WHERE rank <= 10
      ORDER BY q_id, rank""",

    // Jaro-Winkler linkage: the corrupted feed replanted verbatim
    // (one-char deletion at p_partkey % len), scored by DuckDB's OWN
    // jaro_winkler_similarity — which therefore cross-validates the
    // engine's codegen'd comparator on every fixture pair.
    "q_fuzzy_linkage" -> """
      WITH feed AS (SELECT p_partkey AS f_key, p_brand,
          substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER))
            || substr(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2)
            AS f_name
        FROM part),
        cand AS (SELECT f.f_key, c.p_partkey,
            round(jaro_winkler_similarity(f.f_name, c.p_name), 6) AS score
          FROM feed f JOIN part c USING (p_brand)),
        ranked AS (SELECT f_key, p_partkey AS match_key, score,
            row_number() OVER (PARTITION BY f_key
              ORDER BY score DESC, p_partkey) AS rn
          FROM cand)
      SELECT f_key, match_key, score FROM ranked
      WHERE rn = 1 AND score >= 0.85 ORDER BY f_key""",

    // Threshold similarity self-join: the oracle runs WITHOUT the
    // engine's length-pruning optimizer rule — the hash match is the
    // proof the injected bound never drops a qualifying pair.
    "q_jw_threshold_join" -> """
      SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
        round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.92
      ORDER BY a_key, b_key""",

    // k-anonymity under the suppression model: DuckDB's floor() returns
    // DOUBLE, so the band is cast back to BIGINT to match Spark's
    // integral floor; the census window and the release share one pass.
    "q_k_anonymity" -> """
      WITH q AS (SELECT c_custkey, c_nationkey, c_mktsegment,
          CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band
        FROM customer),
        g AS (SELECT c_custkey, c_nationkey, c_mktsegment, band,
            count(*) OVER (PARTITION BY c_nationkey, c_mktsegment, band) AS grp_n
          FROM q)
      SELECT c_custkey, c_nationkey, c_mktsegment, band, grp_n
      FROM g WHERE grp_n >= 5 ORDER BY c_custkey""",

    // Last-touch attribution: per purchase, the latest view/click by the
    // same user within the trailing 7 days, ties to the higher event_id.
    "q_attribution" -> """
      WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts
          FROM events WHERE event_type = 'purchase'),
        t AS (SELECT user_id, event_id AS touch_id,
            event_type AS touch_type, ts AS t_ts
          FROM events WHERE event_type IN ('view', 'click')),
        j AS (SELECT p.purchase_id, p.user_id, t.touch_id, t.touch_type,
            t.t_ts, p.p_ts,
            row_number() OVER (PARTITION BY p.purchase_id
              ORDER BY t.t_ts DESC, t.touch_id DESC) AS rn
          FROM p JOIN t ON p.user_id = t.user_id
            AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY)
      SELECT purchase_id, user_id, touch_id, touch_type, t_ts, p_ts
      FROM j WHERE rn = 1 ORDER BY purchase_id""",

    // Retention curve: the triangle normalized by the offset-0 cell
    // (every user is active on their own first day, so it IS the
    // cohort size).
    "q_retention_curve" -> """
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        c AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
        o AS (SELECT DISTINCT c.cohort_day, ev.user_id,
            datediff('day', c.cohort_day, ev.day) AS day_offset
          FROM ev JOIN c ON ev.user_id = c.user_id
          WHERE datediff('day', c.cohort_day, ev.day) <= 14),
        tri AS (SELECT cohort_day, day_offset, count(*) AS n_users
          FROM o GROUP BY cohort_day, day_offset),
        sz AS (SELECT cohort_day, n_users AS cohort_size FROM tri
          WHERE day_offset = 0)
      SELECT t.cohort_day, t.day_offset, t.n_users, s.cohort_size,
        round(CAST(t.n_users AS DOUBLE) / s.cohort_size, 6) AS retention
      FROM tri t JOIN sz s ON t.cohort_day = s.cohort_day
      ORDER BY t.cohort_day, t.day_offset""",

    "q_attribution_linear" -> """
      WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts
          FROM events WHERE event_type = 'purchase'),
        t AS (SELECT user_id, event_id AS touch_id,
            event_type AS touch_type, ts AS t_ts
          FROM events WHERE event_type IN ('view', 'click')),
        j AS (SELECT p.purchase_id, p.user_id, t.touch_id, t.touch_type
          FROM p JOIN t ON p.user_id = t.user_id
            AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
        c AS (SELECT purchase_id, count(*) AS n_touches FROM j GROUP BY 1)
      SELECT j.purchase_id, j.user_id, j.touch_id, j.touch_type,
        c.n_touches, round(CAST(1 AS DOUBLE) / c.n_touches, 6) AS credit
      FROM j JOIN c USING (purchase_id)
      ORDER BY j.purchase_id, j.touch_id""",

    "q_fd_violations" -> """
      SELECT p_brand, count(*) AS n_rows,
        count(DISTINCT p_name) AS n_names,
        min(p_name) AS witness_min, max(p_name) AS witness_max,
        count(DISTINCT p_name) > 1 AS violated
      FROM part GROUP BY p_brand ORDER BY p_brand""",

    // Benford audit: first digit from the INTEGER-CENTS string (no
    // double formatting), expected shares interpolated from the
    // engine's Scala log10 constants (the EWMA literal discipline).
    "q_benford" -> s"""
      WITH digits AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0)
            AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
          FROM orders WHERE o_totalprice > 0),
        counts AS (SELECT digit, count(*) AS n FROM digits GROUP BY digit),
        t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM counts),
        e(digit, expd0) AS (VALUES ${Profile.BenfordExp
          .map { case (k, v) => s"($k, $v)" }.mkString(", ")}),
        ed AS (SELECT digit, CAST(expd0 AS DOUBLE) AS expd FROM e)
      SELECT c.digit, c.n,
        round(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
        round(e.expd, 6) AS expected,
        round((CAST(c.n AS DOUBLE) / t.total - e.expd) *
              (CAST(c.n AS DOUBLE) / t.total - e.expd) / e.expd, 6) AS chi2_term
      FROM counts c CROSS JOIN t JOIN ed e ON c.digit = e.digit
      ORDER BY c.digit""",

    // Equi-depth histogram: the winsorize fence discipline ×9, bucket
    // by comparison count on identical rounded fences.
    "q_histogram_equidepth" -> s"""
      WITH f AS (SELECT l_returnflag,
          ${(1 to 9).map(i =>
            s"round(quantile_cont(l_extendedprice, 0.$i), 2) AS f$i")
            .mkString(",\n          ")}
        FROM lineitem GROUP BY 1),
        j AS (SELECT l.l_returnflag,
            1 + ${(1 to 9).map(i =>
              s"(CASE WHEN l.l_extendedprice > f.f$i THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS bucket
          FROM lineitem l JOIN f USING (l_returnflag))
      SELECT l_returnflag, bucket, count(*) AS n
      FROM j GROUP BY 1, 2 ORDER BY 1, 2""",

    // Winsorization: fences are exact interpolated percentiles rounded
    // to the data's 2-decimal width (quantile_cont ↔ percentile, the
    // q_agg_percentile_exact pairing); the winsorized sum accumulates in
    // DECIMAL (exact, order-independent) and casts once to DOUBLE.
    "q_winsorize" -> """
      WITH f AS (SELECT l_returnflag,
          round(quantile_cont(l_extendedprice, 0.05), 2) AS lo,
          round(quantile_cont(l_extendedprice, 0.95), 2) AS hi
        FROM lineitem GROUP BY 1),
        j AS (SELECT l.l_returnflag, l.l_extendedprice AS x, f.lo, f.hi
          FROM lineitem l JOIN f USING (l_returnflag))
      SELECT l_returnflag, count(*) AS n,
        CAST(sum(CASE WHEN x < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        CAST(sum(CASE WHEN x > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        min(lo) AS lo, min(hi) AS hi,
        CAST(sum(CAST(least(greatest(x, lo), hi) AS DECIMAL(28,2))) AS DOUBLE)
          AS sum_winsorized
      FROM j GROUP BY 1 ORDER BY 1""",

    // Truncated EWMA: fixed-point 1e-8 integer weights interpolated from
    // the engine's constant, so the convolution accumulates EXACTLY in
    // BIGINT (order-independent — double accumulation strayed 1 ulp
    // across round-6 at sf0.1) and divides by the scale once.
    "q_ewma" -> s"""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
          count(*) AS n FROM events GROUP BY 1, 2),
        w(k, w) AS (VALUES ${EventAnalytics.EwmaWeightsFixed.zipWithIndex
          .map { case (wt, k) => s"($k, $wt)" }.mkString(", ")}),
        fan AS (SELECT d.event_type, d.day + CAST(w.k AS INTEGER) AS day,
            d.n * w.w AS c
          FROM daily d CROSS JOIN w),
        sm AS (SELECT event_type, day,
            round(CAST(sum(c) AS DOUBLE) / 100000000.0, 6) AS ewma
          FROM fan GROUP BY 1, 2)
      SELECT d.event_type, d.day, d.n, s.ewma
      FROM daily d JOIN sm s ON d.event_type = s.event_type AND d.day = s.day
      ORDER BY d.event_type, d.day""",

    // Anomaly days: same smoothing chain, then each day vs the LAGGED
    // EWMA — the ratio divides already-rounded values, so the ±20 % flag
    // is ulp-proof by construction.
    "q_anomaly_days" -> s"""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
          count(*) AS n FROM events GROUP BY 1, 2),
        w(k, w) AS (VALUES ${EventAnalytics.EwmaWeightsFixed.zipWithIndex
          .map { case (wt, k) => s"($k, $wt)" }.mkString(", ")}),
        fan AS (SELECT d.event_type, d.day + CAST(w.k AS INTEGER) AS day,
            d.n * w.w AS c
          FROM daily d CROSS JOIN w),
        sm AS (SELECT event_type, day,
            round(CAST(sum(c) AS DOUBLE) / 100000000.0, 6) AS ewma
          FROM fan GROUP BY 1, 2),
        j AS (SELECT d.event_type, d.day, d.n, s.ewma,
            lag(s.ewma) OVER (PARTITION BY d.event_type ORDER BY d.day)
              AS ewma_prev
          FROM daily d JOIN sm s ON d.event_type = s.event_type AND d.day = s.day)
      SELECT event_type, day, n, ewma, ewma_prev,
        round(n / ewma_prev, 6) AS ratio,
        round(n / ewma_prev, 6) > 1.2 OR round(n / ewma_prev, 6) < 0.8
          AS anomaly
      FROM j WHERE ewma_prev IS NOT NULL
      ORDER BY event_type, day""",

    "q_l_diversity" -> """
      WITH q AS (SELECT c_custkey, c_nationkey, c_mktsegment,
          CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band
        FROM customer),
        j AS (SELECT q.c_nationkey, q.c_mktsegment, q.band, o.o_orderpriority
          FROM q JOIN orders o ON o.o_custkey = q.c_custkey)
      SELECT c_nationkey, c_mktsegment, band,
        count(*) AS n_orders,
        count(DISTINCT o_orderpriority) AS n_sensitive,
        count(DISTINCT o_orderpriority) >= 3 AS diverse
      FROM j GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3"""
  )
}
