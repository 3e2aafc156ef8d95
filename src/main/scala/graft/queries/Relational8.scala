package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.LineageCut.CutOps

/** Round-8 product-analytics layer: conversion funnels, cohort retention,
  * bounded k-core peeling, and Holt linear-trend forecasting — the
  * event-stream readouts a data platform runs daily over the same tables
  * the training pipeline curates.
  *
  * Numeric discipline is the package standard: everything below is
  * INTEGER arithmetic end to end (epoch microseconds, day/week indices,
  * parts-per-million ratios with integer division, micro-unit smoothing
  * states with floor division by powers of two), so every query sits on
  * the DuckDB hash oracle with no tolerance. Division semantics are kept
  * portable by construction: Spark `div` truncates and DuckDB `//`
  * floors, so `div` operands are non-negative everywhere; the one signed
  * recurrence (Holt's trend) floors EXPLICITLY on both engines
  * (floorDiv / floor(x / 2^k), exact in doubles below 2^53).
  */
object Relational8 {

  // ---------------------------------------------------------------------
  // CONVERSION FUNNEL — ordered steps view -> qualified click -> qualified
  // purchase, each within a 48 h window of the previous step's FIRST
  // completion (the standard product-analytics semantic: min-timestamp
  // per step, strictly sequential). Distribution shape at 100 TB: one
  // filtered aggregation per step, each joined user-to-user with the
  // previous step's (small, per-user) table — three shuffles on user_id,
  // and AQE broadcasts the shrinking step tables as the funnel narrows.
  // ---------------------------------------------------------------------

  private val FunnelWindowUs = 48L * 3600L * 1000000L

  val qEventsFunnel: Q = (s, d) => {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      col("value"), unix_micros(col("ts")).as("t"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("t")).as("t1"))
    val c = ev.filter(col("event_type") === "click" && col("value") >= 30.0)
      .join(v, Seq("user_id"))
      .filter(col("t") >= col("t1") && col("t") <= col("t1") + lit(FunnelWindowUs))
      .groupBy("user_id").agg(min(col("t")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase" && col("value") >= 60.0)
      .join(c, Seq("user_id"))
      .filter(col("t") >= col("t2") && col("t") <= col("t2") + lit(FunnelWindowUs))
      .groupBy("user_id").agg(min(col("t")).as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase"))))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        expr("n_click * 1000000 div greatest(n_view, 1)").as("conv1_ppm"),
        expr("n_purchase * 1000000 div greatest(n_click, 1)").as("conv2_ppm"))
  }

  val qEventsFunnelSql: String = s"""
    WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS t FROM events),
    v AS (SELECT user_id, min(t) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT ev.user_id, min(t) AS t2 FROM ev JOIN v USING (user_id)
          WHERE event_type = 'click' AND value >= 30.0
            AND t >= t1 AND t <= t1 + $FunnelWindowUs GROUP BY 1),
    p AS (SELECT ev.user_id, min(t) AS t3 FROM ev JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND value >= 60.0
            AND t >= t2 AND t <= t2 + $FunnelWindowUs GROUP BY 1)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase,
           CAST((SELECT COUNT(*) FROM c) * 1000000 //
                GREATEST((SELECT COUNT(*) FROM v), 1) AS BIGINT) AS conv1_ppm,
           CAST((SELECT COUNT(*) FROM p) * 1000000 //
                GREATEST((SELECT COUNT(*) FROM c), 1) AS BIGINT) AS conv2_ppm"""

  // ---------------------------------------------------------------------
  // COHORT RETENTION — users grouped by first-activity week; one row per
  // (cohort, week offset) with active-user counts and retention ppm.
  // Shape at 100 TB: first-touch per user (one groupBy), distinct
  // (user, week) activity (map-side combinable), one join back on
  // user_id, one final small aggregation — no window over raw events.
  // ---------------------------------------------------------------------

  val qEventsRetention: Q = (s, d) => {
    // greatest(.., 0) before the div: Spark `div` truncates toward zero
    // while DuckDB `//` floors, so a (hypothetical) pre-epoch event would
    // diverge (0 vs -1); clamping on BOTH sides makes the week index
    // engine-independent for any data range, not just this corpus
    val wk = events(s, d).select(col("user_id"),
      expr("greatest(datediff(to_date(ts), date'2024-01-01'), 0) div 7")
        .cast("long").as("wk"))
    val first = wk.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    val act = wk.distinct()
      .join(first, Seq("user_id"))
      .select(col("cohort"), (col("wk") - col("cohort")).as("offset"))
      .groupBy("cohort", "offset").agg(count(lit(1)).as("n_active"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    act.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("cohort_size"), col("n_active"),
        expr("n_active * 1000000 div cohort_size").as("retention_ppm"))
      .orderBy("cohort", "offset")
  }

  val qEventsRetentionSql: String = """
    WITH wk AS (
      SELECT user_id,
             CAST(GREATEST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)), 0) // 7 AS BIGINT) AS wk
      FROM events),
    f AS (SELECT user_id, min(wk) AS cohort FROM wk GROUP BY 1),
    act AS (
      SELECT cohort, wk - cohort AS "offset", CAST(COUNT(*) AS BIGINT) AS n_active
      FROM (SELECT DISTINCT user_id, wk FROM wk) a JOIN f USING (user_id)
      GROUP BY 1, 2),
    sz AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1)
    SELECT cohort, "offset", cohort_size, n_active,
           CAST(n_active * 1000000 // cohort_size AS BIGINT) AS retention_ppm
    FROM act JOIN sz USING (cohort)
    ORDER BY cohort, "offset""""

  // ---------------------------------------------------------------------
  // BOUNDED K-CORE PEELING — 8 rounds toward the k-core of the bipartite
  // customer<->supplier trade graph (the graph_pagerank node space), with
  // k anchored scale-free at 1.5x the exact LOWER-MEDIAN degree (the mean
  // is useless here: the bipartite sides differ ~15x in degree, so the
  // mean sits between the bulks and peels nothing or everything). Every
  // round drops nodes of degree < k and re-induces; the output is the
  // whole cascade — one row per round with survivor counts — so the
  // oracle certifies the full trajectory, stabilized or collapsed.
  // Shape at 100 TB: per round one groupBy(degree) + two semi-join-like
  // equi joins on the shrinking node set, lineage-cut per round (the
  // pagerank discipline); the median runs over the aggregated
  // degree-frequency table (driver-tiny by construction).
  // ---------------------------------------------------------------------

  val qGraphKcore: Q = (s, d) => {
    val e0 = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    // pre-partition + sort by a: round 1's degree groupBy and semi join
    // reuse the one exchange (checkpoint preserves both — guide §2.4)
    val sym = e0.unionAll(e0.select(col("b").as("a"), col("a").as("b")))
      .repartition(s.sessionState.conf.numShufflePartitions, col("a"))
      .sortWithinPartitions("a").lineageCut
    val dg = sym.groupBy(col("a")).agg(count(lit(1)).as("dg"))
    val half = dg.agg(expr("(count(1) + 1) div 2").as("half"))
    val kdf = dg.groupBy(col("dg")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(half))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("dg"))))
      .filter(col("cum") >= col("half"))
      .agg(min(col("dg")).as("m"))
      .select(expr("(15 * m) div 10").as("k"))
    // Peel until the FIXPOINT, then pad: survivor sets only shrink, so an
    // unchanged count means an unchanged set, which makes every later
    // round provably identical — re-running the joins would compute the
    // same rows at full shuffle cost (at sf0.1 the core stabilizes in
    // round 1; 7 redundant re-inductions were ~5s of pure waste, and at
    // 100 TB they'd be 7 redundant shuffle rounds). Each round is already
    // materialized by its lineage cut, so the stability probe is a cheap
    // count over checkpointed blocks, not an extra computation.
    var cur = sym
    val rows = Vector.newBuilder[(Long, Long, Long)]
    var r = 1
    var prevNodes = -1L
    var stable: Option[(Long, Long)] = None
    while (r <= 8 && stable.isEmpty) {
      // LAZY cuts: the per-round counts below materialize both
      // checkpoints — two jobs per round instead of four (the counts
      // were already needed; the dedicated materialization jobs were not)
      val nodes = cur.groupBy(col("a")).agg(count(lit(1)).as("dgr"))
        .crossJoin(broadcast(kdf)).filter(col("dgr") >= col("k"))
        .select(col("a").as("n")).lineageCutLazy
      cur = cur
        .join(nodes.select(col("n").as("a")), Seq("a"))
        .join(nodes.select(col("n").as("b")), Seq("b"))
        .select(col("a"), col("b")).lineageCutLazy
      val nEdges = cur.count() / 2 // materializes cur AND nodes
      val nNodes = nodes.count()
      rows += ((r.toLong, nNodes, nEdges))
      if (nNodes == prevNodes) stable = Some((nNodes, nEdges))
      prevNodes = nNodes
      r += 1
    }
    stable.foreach { case (n, e) => while (r <= 8) { rows += ((r.toLong, n, e)); r += 1 } }
    val s2 = s
    import s2.implicits._
    rows.result().toDF("round", "n_nodes", "n_edges").coalesce(1).orderBy("round")
  }

  val qGraphKcoreSql: String = {
    val head = """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    sym AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
    dg AS MATERIALIZED (SELECT a AS n, COUNT(*) AS dg FROM sym GROUP BY 1),
    med AS MATERIALIZED (
      SELECT min(dg) AS m FROM (
        SELECT dg, SUM(c) OVER (ORDER BY dg) AS cum,
               (SELECT (COUNT(*) + 1) // 2 FROM dg) AS half
        FROM (SELECT dg, COUNT(*) AS c FROM dg GROUP BY 1)) WHERE cum >= half),
    kk AS MATERIALIZED (SELECT (15 * m) // 10 AS k FROM med)"""
    val peels = (1 to 8).map { i =>
      val prev = if (i == 1) "sym" else s"e${i - 1}"
      s""",
    n$i AS MATERIALIZED (
      SELECT a AS n FROM $prev GROUP BY a HAVING COUNT(*) >= (SELECT k FROM kk)),
    e$i AS MATERIALIZED (
      SELECT s.a, s.b FROM $prev s JOIN n$i x ON s.a = x.n JOIN n$i y ON s.b = y.n)"""
    }.mkString
    val rows = (1 to 8).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS round,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM n$i) AS n_nodes,
         (SELECT CAST(COUNT(*) // 2 AS BIGINT) FROM e$i) AS n_edges"""
    }.mkString("\n    UNION ALL ")
    s"$head$peels\n    $rows\n    ORDER BY round"
  }

  // ---------------------------------------------------------------------
  // HOLT LINEAR-TREND SMOOTHING — double exponential smoothing over the
  // daily event-count series, alpha = 1/4 and beta = 1/8 (powers of two,
  // so both engines floor-divide exactly), states in integer micro-units:
  //   l_t = floor((x_t*1e6 + 3*(l + b)) / 4),  b_t = floor((l_t - l + 7*b) / 8)
  // The recurrence is inherently sequential, but its INPUT is the
  // aggregated daily series — one map-side-combined groupBy(day) makes it
  // driver-tiny by construction (one row per day), and the fold runs in a
  // single sorted partition (the rank-window discipline: sequential work
  // only ever on aggregated-tiny tables). Forecast h steps = l + h*b.
  // ---------------------------------------------------------------------

  val qEventsHolt: Q = (s, d) => {
    import s.implicits._
    val daily = events(s, d)
      .groupBy(expr("datediff(to_date(ts), date'2024-01-01')").cast("long").as("day"))
      .agg(count(lit(1)).as("x"))
    daily.select(col("day"), col("x")).as[(Long, Long)]
      .repartition(1).sortWithinPartitions("day")
      .mapPartitions { it =>
        var l = 0L; var b = 0L; var n = 0L
        for ((_, x) <- it) {
          val xm = x * 1000000L
          if (n == 0L) { l = xm; b = 0L }
          else {
            val prevL = l
            l = Math.floorDiv(xm + 3L * (l + b), 4L)
            b = Math.floorDiv((l - prevL) + 7L * b, 8L)
          }
          n += 1L
        }
        Iterator((n, l, b, l + b, l + 7L * b))
      }
      .toDF("n_days", "level_micro", "trend_micro", "forecast1_micro", "forecast7_micro")
  }

  val qEventsHoltSql: String = """
    WITH RECURSIVE d AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
             COUNT(*) AS x
      FROM events GROUP BY 1),
    r AS (SELECT x, row_number() OVER (ORDER BY day) AS i FROM d),
    h AS (
      SELECT 1 AS i, (SELECT x * 1000000 FROM r WHERE i = 1) AS l,
             CAST(0 AS BIGINT) AS b
      UNION ALL
      SELECT h.i + 1,
             CAST(floor((r.x * 1000000 + 3 * (h.l + h.b)) / 4.0) AS BIGINT),
             CAST(floor((CAST(floor((r.x * 1000000 + 3 * (h.l + h.b)) / 4.0) AS BIGINT)
                         - h.l + 7 * h.b) / 8.0) AS BIGINT)
      FROM h JOIN r ON r.i = h.i + 1)
    SELECT CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_days,
           l AS level_micro, b AS trend_micro,
           l + b AS forecast1_micro, l + 7 * b AS forecast7_micro
    FROM h WHERE i = (SELECT COUNT(*) FROM r)"""

  // ---------------------------------------------------------------------
  // INT8 EMBEDDING QUANTIZATION + RECALL AUDIT — the vector-store
  // compression trade-off as a query: symmetric scalar quantization
  // (one global scale = corpus max |x|, q = clamp(round(x·127/scale)))
  // then integer-dot-product top-k against the quantized probe, scored
  // for recall@20 against the exact float baseline. Everything after the
  // scale aggregation is INTEGER arithmetic, so rankings and recall are
  // bit-portable; the scale itself is a max (exact in floats). Shape at
  // 100 TB: one max pass, one scan for int8 scoring (TakeOrdered top-k,
  // no full-table shuffle), the float baseline the same — recall audits
  // run at full corpus without a collect.
  // ---------------------------------------------------------------------

  val qEmbeddingInt8Recall: Q = (s, d) => {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val scale = e.agg(max(array_max(transform(col("embedding"),
      x => abs(x.cast("double"))))).as("max_abs"))
    def q8(x: Column, maxAbs: Column): Column =
      greatest(lit(-127L), least(lit(127L),
        floor(x * 127.0 / maxAbs + 0.5).cast("long")))
    val scored = e.crossJoin(broadcast(scale)).select(col("vec_id"),
      aggregate(
        zip_with(
          transform(col("embedding"), x => q8(x.cast("double"), col("max_abs"))),
          transform(typedLit(Pipeline.annQuery), x => q8(x, col("max_abs"))),
          (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as("score"))
    val int8Top = scored.orderBy(col("score").desc, col("vec_id")).limit(20)
    val floatTop = graft.functions.Vectors
      .bruteForceTopK(embeddings(s, d), "vec_id", "embedding", Pipeline.annQuery, 20)
      .select(col("vec_id"))
    int8Top.join(floatTop, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_overlap"))
      .crossJoin(broadcast(int8Top.orderBy(col("score").desc, col("vec_id")).limit(1)
        .select(col("vec_id").as("top_int8_id"), col("score").as("top_int8_score"))))
      .select(col("n_overlap"),
        expr("n_overlap * 1000000 div 20").as("recall_ppm"),
        col("top_int8_id"), col("top_int8_score"))
  }

  val qEmbeddingInt8RecallSql: String = {
    val q = Pipeline.annQuery.map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
    s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    s AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS max_abs FROM e),
    q AS (
      SELECT vec_id,
             list_transform(v, x -> GREATEST(-127, LEAST(127,
               CAST(floor(x * 127.0 / max_abs + 0.5) AS BIGINT)))) AS qv
      FROM e, s),
    qq AS (
      SELECT list_transform($q, x -> GREATEST(-127, LEAST(127,
               CAST(floor(x * 127.0 / max_abs + 0.5) AS BIGINT)))) AS qv
      FROM s),
    sc AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
               i -> q.qv[i] * qq.qv[i])) AS BIGINT) AS score
      FROM q, qq),
    i8 AS (SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 20),
    fl AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               list_dot_product(v, $q) /
               GREATEST(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product($q, $q)),
                        1e-300) AS cos
        FROM e ORDER BY cos DESC, vec_id LIMIT 20) t),
    ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap
           FROM i8 WHERE vec_id IN (SELECT vec_id FROM fl)),
    tp AS (SELECT vec_id AS top_int8_id, score AS top_int8_score
           FROM i8 ORDER BY score DESC, vec_id LIMIT 1)
    SELECT n_overlap, CAST(n_overlap * 1000000 // 20 AS BIGINT) AS recall_ppm,
           top_int8_id, top_int8_score
    FROM ov, tp"""
  }

  // ---------------------------------------------------------------------
  // LINK PREDICTION on the customer co-purchase graph — customers are
  // adjacent when their common-distinct-part count reaches the exact
  // 99.9th-percentile pair weight (the supplier graph is complete on
  // this corpus, and any FIXED floor is wrong at some scale — the
  // percentile keeps the projection sparse at every SF, the graph_kcore
  // anchoring discipline; the percentile runs over the aggregated
  // weight histogram, driver-tiny by construction).
  // For every NON-adjacent pair closed by at least one wedge, score by
  // common-neighbor count and the resource-allocation index (sum over
  // common neighbors of 1/deg, in integer ppm — Adamic–Adar's log is
  // transcendental, RA is exact). Shape at 100 TB: a posting-list join
  // on partkey builds the weighted projection (pair volume bounded by
  // per-part customer counts, the dedup_minhash posting discipline),
  // wedge enumeration through the center join, one groupBy per candidate
  // pair, an anti join against the edge set, top-10.
  // ---------------------------------------------------------------------

  val qGraphLinkpred: Q = (s, d) => {
    // explicit exchange on the posting key p: the self-join's two sides
    // reuse it, and the CPU-heavy pair-expansion stage is exempt from
    // AQE's byte-based coalescing (it ran on 5 tasks — r19 profile)
    val cp = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
      .repartition(s.sessionState.conf.numShufflePartitions, col("p"))
    val pw = cp.as("x").join(cp.as("y"),
        col("x.p") === col("y.p") && col("x.c") < col("y.c"))
      .groupBy(col("x.c").as("a"), col("y.c").as("b"))
      .agg(count(lit(1)).as("w")).lineageCut
    val total = pw.agg(expr("cast(ceil(0.999 * cast(count(1) as double)) as bigint)").as("thr"))
    val wf = pw.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("w"))))
      .filter(col("cum") >= col("thr"))
      .agg(min(col("w")).as("wf"))
    val und = pw.crossJoin(broadcast(wf)).filter(col("w") >= col("wf"))
      .select(col("a"), col("b"))
    // pre-partition + sort by the wedge-center key a: the checkpoint
    // preserves both, so the self-join's two sides and the degree
    // aggregation all reuse ONE exchange/sort (guide §2.4)
    val sym = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .repartition(s.sessionState.conf.numShufflePartitions, col("a"))
      .sortWithinPartitions("a").lineageCut
    val deg = sym.groupBy(col("a").as("c")).agg(count(lit(1)).as("dg"))
    val wedges = sym.as("e1").join(sym.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(col("e1.a").as("c"), col("e1.b").as("u"), col("e2.b").as("v"))
    val cand = wedges.join(deg, Seq("c"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"), sum(expr("1000000 div dg")).as("ra_ppm"))
    cand.join(und.select(col("a").as("u"), col("b").as("v")), Seq("u", "v"), "left_anti")
      .orderBy(col("cn").desc, col("ra_ppm").desc, col("u"), col("v"))
      .limit(10)
      .select(col("u"), col("v"), col("cn"), col("ra_ppm"))
  }

  val qGraphLinkpredSql: String = """
    WITH cp AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    pw AS MATERIALIZED (
      SELECT x.c AS a, y.c AS b, COUNT(*) AS w
      FROM cp x JOIN cp y ON x.p = y.p AND x.c < y.c GROUP BY 1, 2),
    fl AS MATERIALIZED (
      SELECT min(w) AS wf FROM (
        SELECT w, SUM(cnt) OVER (ORDER BY w) AS cum,
               (SELECT CAST(ceil(0.999 * CAST(COUNT(*) AS DOUBLE)) AS BIGINT) FROM pw) AS thr
        FROM (SELECT w, COUNT(*) AS cnt FROM pw GROUP BY 1)) WHERE cum >= thr),
    und AS MATERIALIZED (SELECT a, b FROM pw, fl WHERE w >= wf),
    sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
    dg AS (SELECT a AS c, CAST(COUNT(*) AS BIGINT) AS dg FROM sym GROUP BY 1),
    w AS (
      SELECT e1.a AS c, e1.b AS u, e2.b AS v
      FROM sym e1 JOIN sym e2 ON e1.a = e2.a AND e1.b < e2.b),
    cand AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
             CAST(SUM(1000000 // dg) AS BIGINT) AS ra_ppm
      FROM w JOIN dg USING (c) GROUP BY 1, 2),
    non AS (
      SELECT cand.* FROM cand
      LEFT JOIN und ON und.a = cand.u AND und.b = cand.v
      WHERE und.a IS NULL)
    SELECT u, v, cn, ra_ppm FROM non
    ORDER BY cn DESC, ra_ppm DESC, u, v LIMIT 10"""

  // ---------------------------------------------------------------------
  // PATH MINING — top event-type trigrams along each user's event-time
  // path (the "what do users do next" readout). One window pass
  // partitioned by user (lead x2 over (ts, event_id) order — parallel per
  // user, no global sort), one count per path, top-10. Ties break on the
  // path string in both engines.
  // ---------------------------------------------------------------------

  val qWindowFunnelPaths: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(10)
  }

  val qWindowFunnelPathsSql: String = """
    WITH s AS (
      SELECT event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10"""

  // ---------------------------------------------------------------------
  // RFM SEGMENTATION — recency (days since last event, against the
  // corpus max date), frequency (event count), monetary (purchase cents,
  // exact decimal), each cut into VALUE-BASED quartiles: the three
  // boundary values come from the exact lower-quantile of each metric's
  // grouped-count histogram (the graph_kcore cum-sum machinery — the
  // HISTOGRAM is driver-tiny; a rank window over the per-USER table
  // would be a single-partition sort at a billion users), and every user
  // buckets by comparison against the broadcast thresholds. Ties share a
  // bucket by construction — deterministic in both engines with no
  // order-dependent tiling.
  // ---------------------------------------------------------------------

  val qEventsRfm: Q = (s, d) => {
    val ev = events(s, d)
    val mx = ev.agg(max(to_date(col("ts"))).as("mxd"))
    val rfm = ev.groupBy("user_id").agg(
        max(to_date(col("ts"))).as("last_d"),
        count(lit(1)).as("freq"),
        sum(when(col("event_type") === "purchase",
          (col("value").cast("decimal(18,2)") * 100).cast("long")).otherwise(0L))
          .as("mon_cents"))
      .crossJoin(broadcast(mx))
      .select(col("user_id"), datediff(col("mxd"), col("last_d")).cast("long").as("rec"),
        col("freq"), col("mon_cents"))
      .lineageCut // three histogram passes + the bucket pass re-read it
    // exact lower-quantile thresholds t1<=t2<=t3 from the metric's value
    // histogram: tk = smallest v with cumulative count >= ceil(k*n/4).
    // Safe ONLY for domain-bounded metrics (recency in days, per-user
    // event counts): the unpartitioned window's input is the distinct-
    // value histogram, which stays small at any user count.
    def quartiles(metric: String): org.apache.spark.sql.DataFrame = {
      val n = rfm.agg(count(lit(1)).as("n"))
      rfm.groupBy(col(metric).as("v")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n))
        .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("v"))))
        .select(
          min(when(col("cum") * 4 >= col("n"), col("v"))).as(s"${metric}_t1"),
          min(when(col("cum") * 4 >= col("n") * 2, col("v"))).as(s"${metric}_t2"),
          min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as(s"${metric}_t3"))
    }
    // Two-pass EXACT quartiles for metrics whose distinct-value count
    // grows with the user population (mon_cents is a per-user SUM — its
    // value histogram is ~n_users rows, and a global-window cum-sum over
    // it is a single-task sort at a billion users). Pass 1: fixed-width
    // bucket histogram (O(range/width) rows) locates each threshold's
    // winning bucket and the exact count below it. Pass 2: per winning
    // bucket, a cum-sum over that bucket's distinct values only (≤ width
    // rows) refines to the exact threshold — identical to the one-pass
    // definition because no qualifying value can precede the winning
    // bucket and one must exist inside it.
    def quartilesBucketed(metric: String, width: Long): org.apache.spark.sql.DataFrame = {
      // bucket on greatest(metric,0): Spark `div` truncates toward zero
      // while DuckDB `//` floors, so a negative value would land in
      // different buckets engine-to-engine. The clamp pins both to the
      // same bucket (and is monotone non-decreasing in the metric, so
      // bucket ranges stay ordered and the two-pass refinement argument
      // is unchanged — bucket 0 simply covers (-inf, width)).
      val n = rfm.agg(count(lit(1)).as("n"))
      val bcum = rfm.groupBy(expr(s"greatest($metric, 0L) div $width").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("bcum", sum(col("cnt")).over(Window.orderBy(col("b"))))
        .crossJoin(broadcast(n))
      val pass1 = bcum.agg(
        max(col("n")).as("n"),
        (1 to 3).flatMap { k =>
          Seq(
            min(when(col("bcum") * 4 >= col("n") * k, col("b"))).as(s"b$k"),
            coalesce(max(when(col("bcum") * 4 < col("n") * k, col("bcum"))), lit(0L))
              .as(s"below$k"))
        }: _*)
      // one refinement pass for all three thresholds: keep only rows in a
      // winning bucket, cum-sum per bucket (window PARTITIONED by bucket —
      // ≤ 3 partitions of ≤ width distinct values each), then each
      // threshold reads its own bucket's refined cum
      val refined = rfm.crossJoin(broadcast(pass1))
        .withColumn("b", expr(s"greatest($metric, 0L) div $width"))
        .filter(col("b") === col("b1") || col("b") === col("b2") || col("b") === col("b3"))
        .groupBy(col("b"), col(metric).as("v"), col("n"),
          col("b1"), col("below1"), col("b2"), col("below2"), col("b3"), col("below3"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum_in",
          sum(col("cnt")).over(Window.partitionBy(col("b")).orderBy(col("v"))))
      val ts = (1 to 3).map { k =>
        min(when(col("b") === col(s"b$k") &&
          (col(s"below$k") + col("cum_in")) * 4 >= col("n") * k,
          col("v"))).as(s"${metric}_t$k")
      }
      refined.agg(ts.head, ts.tail: _*)
    }
    // ascending quartile 1..4; recency: low = best = 1; freq/monetary:
    // high = best = 1, so flip the ascending index
    def ascQ(c: Column, pre: String): Column =
      lit(1L) + (c > col(s"${pre}_t1")).cast("long") +
        (c > col(s"${pre}_t2")).cast("long") + (c > col(s"${pre}_t3")).cast("long")
    val seg = rfm
      .crossJoin(broadcast(quartiles("rec")))
      .crossJoin(broadcast(quartiles("freq")))
      .crossJoin(broadcast(quartilesBucketed("mon_cents", 65536L)))
      .select(col("mon_cents"),
        ascQ(col("rec"), "rec").as("r_q"),
        (lit(5L) - ascQ(col("freq"), "freq")).as("f_q"),
        (lit(5L) - ascQ(col("mon_cents"), "mon_cents")).as("m_q"))
    seg.groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"), sum(col("mon_cents")).as("seg_cents"))
      .orderBy("r_q", "f_q", "m_q")
  }

  val qEventsRfmSql: String = {
    def qtile(metric: String) = s"""
      SELECT min(CASE WHEN cum * 4 >= n THEN v END) AS ${metric}_t1,
             min(CASE WHEN cum * 4 >= n * 2 THEN v END) AS ${metric}_t2,
             min(CASE WHEN cum * 4 >= n * 3 THEN v END) AS ${metric}_t3
      FROM (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
                   (SELECT COUNT(*) FROM rfm) AS n
            FROM (SELECT $metric AS v, COUNT(*) AS cnt FROM rfm GROUP BY 1))"""
    // mirror of quartilesBucketed: bucket histogram pass + per-winning-
    // bucket refinement (same integer arithmetic, provably equal to the
    // one-pass definition)
    def qtileBucketed(metric: String, width: Long) = s"""
    bhm AS MATERIALIZED (
      SELECT b, cnt, SUM(cnt) OVER (ORDER BY b) AS bcum,
             (SELECT COUNT(*) FROM rfm) AS n
      FROM (SELECT greatest($metric, 0) // $width AS b, COUNT(*) AS cnt
            FROM rfm GROUP BY 1)),
    p1m AS MATERIALIZED (
      SELECT MAX(n) AS n,
             MIN(CASE WHEN bcum * 4 >= n THEN b END) AS b1,
             COALESCE(MAX(CASE WHEN bcum * 4 < n THEN bcum END), 0) AS below1,
             MIN(CASE WHEN bcum * 4 >= n * 2 THEN b END) AS b2,
             COALESCE(MAX(CASE WHEN bcum * 4 < n * 2 THEN bcum END), 0) AS below2,
             MIN(CASE WHEN bcum * 4 >= n * 3 THEN b END) AS b3,
             COALESCE(MAX(CASE WHEN bcum * 4 < n * 3 THEN bcum END), 0) AS below3
      FROM bhm),
    refm AS (
      SELECT b, v, cnt, n, b1, below1, b2, below2, b3, below3,
             SUM(cnt) OVER (PARTITION BY b ORDER BY v) AS cum_in
      FROM (SELECT greatest($metric, 0) // $width AS b, $metric AS v, COUNT(*) AS cnt,
                   p1m.n, p1m.b1, p1m.below1, p1m.b2, p1m.below2,
                   p1m.b3, p1m.below3
            FROM rfm, p1m
            WHERE greatest($metric, 0) // $width IN (p1m.b1, p1m.b2, p1m.b3)
            GROUP BY ALL)),
    qm AS (
      SELECT MIN(CASE WHEN b = b1 AND (below1 + cum_in) * 4 >= n
                      THEN v END) AS ${metric}_t1,
             MIN(CASE WHEN b = b2 AND (below2 + cum_in) * 4 >= n * 2
                      THEN v END) AS ${metric}_t2,
             MIN(CASE WHEN b = b3 AND (below3 + cum_in) * 4 >= n * 3
                      THEN v END) AS ${metric}_t3
      FROM refm)"""
    s"""
    WITH rfm AS MATERIALIZED (
      SELECT user_id,
             CAST(date_diff('day', CAST(max(ts) AS DATE),
                  (SELECT CAST(max(ts) AS DATE) FROM events)) AS BIGINT) AS rec,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS mon_cents
      FROM events GROUP BY 1),
    qr AS (${qtile("rec")}),
    qf AS (${qtile("freq")}),
    ${qtileBucketed("mon_cents", 65536L)},
    seg AS (
      SELECT mon_cents,
             1 + CAST(rec > rec_t1 AS BIGINT) + CAST(rec > rec_t2 AS BIGINT)
               + CAST(rec > rec_t3 AS BIGINT) AS r_q,
             5 - (1 + CAST(freq > freq_t1 AS BIGINT) + CAST(freq > freq_t2 AS BIGINT)
               + CAST(freq > freq_t3 AS BIGINT)) AS f_q,
             5 - (1 + CAST(mon_cents > mon_cents_t1 AS BIGINT)
               + CAST(mon_cents > mon_cents_t2 AS BIGINT)
               + CAST(mon_cents > mon_cents_t3 AS BIGINT)) AS m_q
      FROM rfm, qr, qf, qm)
    SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(mon_cents) AS BIGINT) AS seg_cents
    FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
  }

  // ---------------------------------------------------------------------
  // READABILITY SCORING — Flesch reading ease per document in integer
  // ppm (vowel-group syllable heuristic; words/sentences via the same
  // regex class semantics in Java and RE2), aggregated per language. The
  // quality-scoring signal curation recipes gate on, with no float in
  // sight: score_ppm = 206835000 − 1015·wps_ppm div 1000 −
  // 84600·spw_ppm div 1000, every div on non-negative operands.
  // ---------------------------------------------------------------------

  val qTextReadability: Q = (s, d) =>
    documents(s, d)
      .select(col("lang"),
        expr("size(split(trim(text), '\\\\s+'))").cast("long").as("words"),
        greatest(expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"), lit(1L))
          .as("sents"),
        expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))").cast("long")
          .as("sylls"))
      .select(col("lang"),
        expr("""206835000L - (1015L * (words * 1000000L div greatest(sents, 1))) div 1000L -
          (84600L * (sylls * 1000000L div greatest(words, 1))) div 1000L""").as("flesch_ppm"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        // sum can be negative: floor in double (same IEEE division both
        // engines) rather than div (truncates) vs // (floors) divergence
        expr("cast(floor(cast(sum(flesch_ppm) as double) / count(1)) as bigint)")
          .as("avg_flesch_ppm"),
        sum(when(col("flesch_ppm") > 60000000L, 1L).otherwise(0L)).as("n_easy"))
      .orderBy("lang")

  val qTextReadabilitySql: String = """
    WITH f AS (
      SELECT lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS words,
             GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS sylls
      FROM documents),
    sc AS (
      SELECT lang,
             206835000 - (1015 * (words * 1000000 // GREATEST(sents, 1))) // 1000 -
             (84600 * (sylls * 1000000 // GREATEST(words, 1))) // 1000 AS flesch_ppm
      FROM f)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(floor(CAST(SUM(flesch_ppm) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_flesch_ppm,
           CAST(SUM(CASE WHEN flesch_ppm > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_easy
    FROM sc GROUP BY 1 ORDER BY 1"""

  val queries: Map[String, Q] = Map(
    "window_funnel_paths"   -> qWindowFunnelPaths,
    "events_rfm"            -> qEventsRfm,
    "text_readability"      -> qTextReadability,
    "events_funnel"         -> qEventsFunnel,
    "events_retention"      -> qEventsRetention,
    "graph_kcore"           -> qGraphKcore,
    "events_holt"           -> qEventsHolt,
    "embedding_int8_recall" -> qEmbeddingInt8Recall,
    "graph_linkpred"        -> qGraphLinkpred)

  val oracleSql: Map[String, String] = Map(
    "window_funnel_paths"   -> qWindowFunnelPathsSql,
    "events_rfm"            -> qEventsRfmSql,
    "text_readability"      -> qTextReadabilitySql,
    "events_funnel"         -> qEventsFunnelSql,
    "events_retention"      -> qEventsRetentionSql,
    "graph_kcore"           -> qGraphKcoreSql,
    "events_holt"           -> qEventsHoltSql,
    "embedding_int8_recall" -> qEmbeddingInt8RecallSql,
    "graph_linkpred"        -> qGraphLinkpredSql)
}
