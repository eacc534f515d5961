"""Iterative / recursive query shapes, as explicit DataFrame loops.

Spark 4 added native WITH RECURSIVE (exercised by
``q_sql_recursive_cte`` in misc_q.py); this module keeps the explicit
re-expression — a bounded driver loop of DataFrame joins, one join per
hierarchy LEVEL (not per row) — which is how recursive CTEs execute on
MPP engines anyway (each recursion step is a distributed join) and
which gives per-round control the SQL form lacks (checkpointing,
convergence observation, path compression). Depth is logarithmic in
the key domain here, so the loop is O(log n) joins at any scale.

The time-series gap-fill is the other classically-missing operator:
resample to a dense daily spine (``sequence`` + explode — generated, not
shuffled), left-join the observed days, then forward-fill with
``last(ignorenulls)`` over an ordered window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_etl_project_spark.queries import query
from mini_etl_project_spark.queries.helpers import dsum, sql_dsum
from mini_etl_project_spark.session import load_table

# -- recursive hierarchy traversal ----------------------------------------
# Synthetic org-chart over customer keys: parent(k) = k div 10, roots are
# k < 10 — a forest with depth ~log10(max key). The oracle is a real
# WITH RECURSIVE; our engine iterates level-by-level joins until the
# frontier empties (checked per-iteration, so depth needn't be known).

_HIER_ORACLE = """
WITH RECURSIVE h AS (
  SELECT c_custkey AS id, c_custkey AS root, CAST(0 AS INTEGER) AS depth
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, h.root, h.depth + 1
  FROM customer c JOIN h ON h.id = c.c_custkey // 10
  WHERE c.c_custkey >= 10
)
SELECT depth, COUNT(*) AS n_nodes, CAST(SUM(root) AS BIGINT) AS sum_roots
FROM h GROUP BY depth ORDER BY depth
"""


@query("q_hierarchy_levels", _HIER_ORACLE)
def q_hierarchy_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    nodes = c.select(
        F.col("c_custkey").alias("id"),
        F.expr("c_custkey div 10").alias("parent"),
    )
    frontier = (
        nodes.filter(F.col("id") < 10)
        .select("id", F.col("id").alias("root"), F.lit(0).alias("depth"))
        .localCheckpoint(eager=True)
    )
    children = nodes.filter(F.col("id") >= 10)
    levels = [frontier]
    while True:
        nxt = (
            children.join(
                frontier.select(F.col("id").alias("parent"), "root", "depth"),
                "parent",
            )
            .select("id", "root", (F.col("depth") + 1).alias("depth"))
            # Cut the lineage each level: without this, level d's plan
            # re-derives levels 0..d-1 (quadratic work), the same reason
            # connected-components checkpoints (operators/dedup.py).
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return (
        out.groupBy("depth")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("root").cast("bigint").alias("sum_roots"),
        )
        .orderBy("depth")
    )


# -- time-series resample + gap-fill ---------------------------------------
# Sparse series: high-value purchase events (45 events over 23 of 30
# days at sf0.01 — real gaps to fill). The
# dense day spine comes from sequence(min, max) — generated in-plan from
# one 1-row aggregate, no collect, no shuffle of the spine itself.

_GAPFILL_ORACLE = f"""
WITH obs AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         {sql_dsum('value', 'sum_value')}
  FROM events
  WHERE event_type = 'purchase' AND value > 180.0
  GROUP BY 1
), bounds AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM obs
), spine AS (
  SELECT CAST(s.d AS DATE) AS day
  FROM bounds, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) s(d)
)
SELECT spine.day,
       COALESCE(obs.n_events, 0) AS n_events,
       LAST_VALUE(obs.sum_value IGNORE NULLS) OVER (
         ORDER BY spine.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
FROM spine LEFT JOIN obs ON spine.day = obs.day
"""


@query("q_ts_gapfill", _GAPFILL_ORACLE)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 180.0))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )
    bounds = obs.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    # BOUNDED-INPUT INVARIANT: unpartitioned window over the per-day
    # aggregate spine only (cardinality = calendar days) — never put this
    # on raw rows; see q_window_range_frame and
    # test_round3.py::test_unpartitioned_windows_sit_on_aggregates.
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(obs, "day", "left")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("ffill_value"),
        )
    )


# -- X23+ PageRank: fixed-iteration numeric graph algorithm ----------------
# Trade graph: supplier-nation → customer-nation edges mined from
# lineitem⋈orders. Every per-node contribution sum is decimal-exact, the
# base/damping arithmetic is written identically on both sides, and the
# iteration count is fixed — so the oracle unrolls the same 3 rounds in
# SQL and the DOUBLE ranks match bit-for-bit. (operators/graph.py)

_PR_EDGES_SQL = """
  SELECT DISTINCT ns.n_name AS src, nc.n_name AS dst
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  WHERE ns.n_name <> nc.n_name
"""


def _pr_iter_sql(prev: str, cur: str) -> str:
    # Every literal cast to DOUBLE: DuckDB otherwise parses 0.85/1.0 as
    # DECIMAL and carries exact-decimal arithmetic through the recurrence,
    # while Spark (and the Python-computed base literal) work in doubles —
    # 1-0.85 is 0.15 exactly in decimal but 0.15000000000000002 in binary.
    return f"""{cur} AS (
  SELECT nodes.node,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
         + CAST(0.85 AS DOUBLE) * COALESCE(s.insum, CAST(0 AS DOUBLE)) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(CAST(r.rank / d.outdeg AS DECIMAL(38,10))) AS DOUBLE)
             AS insum
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg d ON e.src = d.node
    GROUP BY e.dst) s ON nodes.node = s.node)"""


_PAGERANK_ORACLE = f"""
WITH edges AS ({_PR_EDGES_SQL}),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes),
{_pr_iter_sql('r0', 'i1')},
{_pr_iter_sql('i1', 'i2')},
{_pr_iter_sql('i2', 'i3')}
SELECT node, rank FROM i3
"""


# -- dangling-mass PageRank: the textbook (mass-conserving) variant --------
# Same trade graph DAG-ified by name order (src < dst): the lexicographic
# maximum nation then has no out-edges, so dangling nodes exist
# STRUCTURALLY — the redistribution term is live on any data generation,
# not by luck of the fixture. Oracle unrolls the identical recurrence
# with the per-round dangling-mass scalar as its own CTE.

_PRD_EDGES_SQL = _PR_EDGES_SQL + "    AND ns.n_name < nc.n_name\n"


def _prd_iter_sql(prev: str, cur: str, dm: str) -> str:
    return f"""{dm} AS (
  SELECT CAST(COALESCE(SUM(CAST(r.rank AS DECIMAL(38,10))), 0) AS DOUBLE)
           AS dm
  FROM {prev} r LEFT JOIN deg d ON r.node = d.node
  WHERE d.node IS NULL),
{cur} AS (
  SELECT nodes.node,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
         + CAST(0.85 AS DOUBLE)
           * (COALESCE(s.insum, CAST(0 AS DOUBLE))
              + (SELECT dm FROM {dm}) / (SELECT n FROM nn)) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(CAST(r.rank / d.outdeg AS DECIMAL(38,10))) AS DOUBLE)
             AS insum
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg d ON e.src = d.node
    GROUP BY e.dst) s ON nodes.node = s.node)"""


_PAGERANK_DANGLING_ORACLE = f"""
WITH edges AS ({_PRD_EDGES_SQL}),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes),
{_prd_iter_sql('r0', 'i1', 'dm1')},
{_prd_iter_sql('i1', 'i2', 'dm2')},
{_prd_iter_sql('i2', 'i3', 'dm3')}
SELECT node, rank FROM i3
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("src")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("dst")
    )
    return (
        l.join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


@query("q_graph_pagerank_dangling", _PAGERANK_DANGLING_ORACLE)
def q_graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.graph import pagerank_dangling

    # Materialize the 5-way-join edge list once (see q_graph_ppr).
    edges = (
        _trade_edges(spark, sf_dir)
        .filter(F.col("src") < F.col("dst"))
        .localCheckpoint(eager=True)
    )
    return pagerank_dangling(edges, iterations=3)


@query("q_graph_pagerank", _PAGERANK_ORACLE)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.graph import pagerank

    return pagerank(
        _trade_edges(spark, sf_dir).localCheckpoint(eager=True),
        iterations=3,
    )


# -- triangle counting ------------------------------------------------------
# The standard graph-motif primitive, in its distributed-join form:
# canonicalize each undirected edge to (lo, hi), then two self-joins
# enumerate (a<b<c) wedges and close them — per-edge work bounded by
# degree, no adjacency matrix. Per-node counts = how many triangles each
# vertex participates in (each triangle credits all three).

_TRIANGLE_ORACLE = f"""
WITH raw AS ({_PR_EDGES_SQL}),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM raw),
tri AS (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM e e1
  JOIN e e2 ON e2.lo = e1.hi
  JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
member AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT node, COUNT(*) AS n_triangles
FROM member GROUP BY node
"""


@query("q_graph_triangles", _TRIANGLE_ORACLE)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _trade_edges(spark, sf_dir)
    e = (
        raw.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
        # bounded canonical edge set with three join-side consumers —
        # checkpoint so the multi-join _trade_edges subtree runs once
        # (round-9 audit: 108 parquet scans in the final plan)
        .localCheckpoint(eager=True)
    )
    e1 = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    e3 = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    member = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return member.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


# -- Label propagation (community detection, 3 synchronous rounds) ----------
#
# Min-label propagation over the bipartite customer—supplier trade graph
# (distinct (cust, supp) pairs from orders x lineitem; node ids disjoint
# via 2k / 2k+1). Each round every node takes the min of its own and its
# neighbors' labels — a keyed join + groupBy per round, the same
# shuffle-bounded shape as the connected-components operator
# (operators/dedup.py) but with a FIXED round count so the oracle can
# replay it as unrolled SQL. localCheckpoint between rounds cuts lineage
# the way a long-running 100 TB iteration must.

_LP_ROUNDS = 3


def _label_prop_oracle() -> str:
    parts = [
        """
WITH e0 AS (
  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE l.l_linenumber = 1 AND l.l_quantity <= 3),
edges AS (
  SELECT u AS src, v AS dst FROM e0
  UNION ALL SELECT v, u FROM e0),
l0 AS (
  SELECT DISTINCT src AS id, src AS lbl FROM edges)"""
    ]
    for k in range(1, _LP_ROUNDS + 1):
        parts.append(
            f""",
l{k} AS (
  SELECT l.id, LEAST(l.lbl, COALESCE(MIN(ln.lbl), l.lbl)) AS lbl
  FROM l{k - 1} l
  LEFT JOIN edges e ON e.src = l.id
  LEFT JOIN l{k - 1} ln ON ln.id = e.dst
  GROUP BY l.id, l.lbl)"""
        )
    parts.append(
        f"""
SELECT lbl AS label, COUNT(*) AS n_nodes
FROM l{_LP_ROUNDS} GROUP BY lbl"""
    )
    return "".join(parts)


@query("q_graph_label_prop", _label_prop_oracle())
def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(
            li.filter(
                (F.col("l_linenumber") == 1) & (F.col("l_quantity") <= 3)
            ),
            o.o_orderkey == li.l_orderkey,
        )
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    edges = e0.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(e0.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("lbl")
    )
    for _ in range(_LP_ROUNDS):
        neigh = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("lbl").alias("nlbl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nlbl").alias("nl"))
        )
        labels = (
            labels.join(
                neigh.select(F.col("src").alias("id"), "nl"), "id", "left"
            )
            .select(
                "id",
                F.least("lbl", F.coalesce("nl", "lbl")).alias("lbl"),
            )
            .localCheckpoint()
        )
    return labels.groupBy(F.col("lbl").alias("label")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


# -- Degree statistics of the trade graph -----------------------------------
#
# Per-side degree distribution of the customer—supplier bipartite graph:
# node degree via one keyed groupBy, then a bounded degree histogram.
# The standard first look at any production graph (skew detection for
# the iterative operators that follow it).

_DEGREE_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
cdeg AS (SELECT cust, COUNT(*) AS deg FROM e0 GROUP BY cust),
sdeg AS (SELECT supp, COUNT(*) AS deg FROM e0 GROUP BY supp)
SELECT 'customer' AS side, deg, COUNT(*) AS n_nodes
FROM cdeg GROUP BY deg
UNION ALL
SELECT 'supplier', deg, COUNT(*) FROM sdeg GROUP BY deg
"""


@query("q_graph_degree_stats", _DEGREE_ORACLE)
def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )

    def hist(df: DataFrame, key: str, side: str) -> DataFrame:
        deg = df.groupBy(key).agg(F.count("*").alias("deg"))
        return deg.groupBy("deg").agg(F.count("*").alias("n_nodes")).select(
            F.lit(side).alias("side"), "deg", "n_nodes"
        )

    return hist(e0, "cust", "customer").unionByName(
        hist(e0, "supp", "supplier")
    )


# -- X155 multi-source BFS shortest hops -----------------------------------
#
# Frontier BFS over the undirected bipartite customer—supplier trade graph
# (edge when a supplier supplied a line of a customer's order), rooted at
# supplier 1.  Spark runs the distributed frontier expansion
# (operators/graph.py::bfs_distances); the oracle is DuckDB's native
# WITH RECURSIVE — two entirely different evaluation strategies that must
# agree on every (node, dist).  Customers are offset into a disjoint id
# space (+1_000_000) so one BIGINT node column covers both sides.

_BFS_CAP = 6

_BFS_ORACLE = f"""
WITH RECURSIVE ed AS (
  SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
e AS (
  SELECT s AS u, 1000000 + c AS v FROM ed
  UNION ALL
  SELECT 1000000 + c AS u, s AS v FROM ed),
bfs(node, d) AS (
  SELECT CAST(1 AS BIGINT) AS node, 0 AS d
  UNION
  SELECT e.v, bfs.d + 1
  FROM bfs JOIN e ON e.u = bfs.node
  WHERE bfs.d < {_BFS_CAP}
)
SELECT CASE WHEN node >= 1000000 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       CAST(CASE WHEN node >= 1000000 THEN node - 1000000 ELSE node END
         AS BIGINT) AS node_id,
       CAST(MIN(d) AS BIGINT) AS dist
FROM bfs GROUP BY 1, 2
"""


@query("q_graph_bfs_dist", _BFS_ORACLE)
def q_graph_bfs_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.graph import bfs_distances

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ed = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    e = ed.select(
        F.col("s").alias("u"), (F.lit(1000000) + F.col("c")).alias("v")
    ).unionByName(
        ed.select(
            (F.lit(1000000) + F.col("c")).alias("u"), F.col("s").alias("v")
        )
    )
    sources = spark.range(1, 2).select(F.col("id").alias("node"))
    dist = bfs_distances(e, sources, max_hops=_BFS_CAP)
    return dist.select(
        F.when(F.col("node") >= 1000000, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.when(F.col("node") >= 1000000, F.col("node") - 1000000)
        .otherwise(F.col("node"))
        .cast("bigint")
        .alias("node_id"),
        F.col("d").cast("bigint").alias("dist"),
    )


# -- X192 k-core decomposition (3 peeling rounds) --------------------------
#
# Iterative graph peeling: repeatedly delete nodes of degree < k until
# the k-core remains.  Three synchronous rounds unroll in the oracle
# (kmeans-style); Spark runs the same rounds as a loop of keyed
# degree-aggregate + semi-join — each round one shuffle, lineage cut by
# localCheckpoint.  The graph is the bipartite customer—supplier trade
# graph (same node encoding as BFS above): customer degrees spread from
# 1 to ~100, so k=10 peels a real fraction each round AND the removals
# CASCADE onto supplier degrees — the behavior k-core exists to expose.
# Output = surviving nodes with their final within-core degree.

_KCORE_K = 10
_KCORE_ROUNDS = 3

_KCORE_EDGES_SQL = """
  SELECT DISTINCT l.l_suppkey AS a, 1000000 + o.o_custkey AS b
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


def _kcore_oracle() -> str:
    parts = [
        f"""
WITH e0 AS ({_KCORE_EDGES_SQL})"""
    ]
    prev = "e0"
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f""",
d{r} AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
  GROUP BY node),
keep{r} AS (SELECT node FROM d{r} WHERE deg >= {_KCORE_K}),
e{r} AS (
  SELECT e.a, e.b FROM {prev} e
  JOIN keep{r} ka ON e.a = ka.node
  JOIN keep{r} kb ON e.b = kb.node)"""
        )
        prev = f"e{r}"
    parts.append(
        f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
FROM (SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
GROUP BY node"""
    )
    return "".join(parts)


@query("q_graph_kcore", _kcore_oracle())
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("a"),
            (F.lit(1000000) + F.col("o_custkey")).alias("b"),
        )
        .distinct()
    )
    for _ in range(_KCORE_ROUNDS):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )


# -- X224 link prediction (common neighbors / Jaccard / Adamic-Adar) -------
#
# Classic graph link-prediction scores for NON-adjacent node pairs of the
# undirected trade graph: common-neighbor count, Jaccard =
# |N(a)∩N(b)| / |N(a)∪N(b)| in ppm fixed point, and a log-free
# Adamic-Adar variant Σ_z 10⁶ DIV deg(z) (resource allocation index,
# integer-exact — the ln-based weighting would hash-drift across libm
# versions). Plan shape: candidate pairs come from the two-hop join
# THROUGH shared neighbors (never all-pairs), adjacency is removed with
# an anti join, degrees broadcast. On big graphs the two-hop join is the
# standard hub bottleneck and would be capped per node; the trade graph
# is nation-level so every stage is bounded. The dense trade graph is
# first SPARSIFIED by a deterministic edge-hash filter (keep ~1/3 of
# edges) — at fuller scale factors every nation pair trades, and a
# complete graph has no links left to predict.

_LINKPRED_ORACLE = f"""
WITH dir AS ({_PR_EDGES_SQL}),
edges0 AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM dir GROUP BY 1, 2),
edges AS (
  SELECT a, b FROM edges0
  WHERE CAST(('0x' || substr(md5(a || '|' || b), 1, 15)) AS BIGINT)
          % 3 = 0),
nbr AS (
  SELECT a AS node, b AS nb FROM edges
  UNION ALL
  SELECT b AS node, a AS nb FROM edges),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM nbr GROUP BY node),
cand AS (
  SELECT x.node AS u, y.node AS v, x.nb AS z
  FROM nbr x JOIN nbr y ON x.nb = y.nb AND x.node < y.node),
open_pairs AS (
  SELECT c.u, c.v, c.z FROM cand c
  LEFT JOIN edges e ON e.a = c.u AND e.b = c.v
  WHERE e.a IS NULL),
scored AS (
  SELECT u, v,
         CAST(COUNT(*) AS BIGINT) AS cn,
         CAST(SUM(1000000 // dz.d) AS BIGINT) AS ra_ppm
  FROM open_pairs o JOIN deg dz ON dz.node = o.z
  GROUP BY u, v)
SELECT s.u, s.v, s.cn,
       CAST(s.cn * 1000000 // (du.d + dv.d - s.cn) AS BIGINT)
         AS jaccard_ppm,
       s.ra_ppm
FROM scored s
JOIN deg du ON du.node = s.u
JOIN deg dv ON dv.node = s.v
"""


@query("q_graph_link_predict", _LINKPRED_ORACLE)
def q_graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _trade_edges(spark, sf_dir)
    edges = (
        raw.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .filter(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", "a", "b")), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            % 3
            == 0
        )
        # bounded nation-pair edge set with 4 consumers (two nbr
        # branches, the anti-join, deg) — checkpoint so the multi-join
        # _trade_edges subtree runs once (round-9 scan audit: the final
        # plan re-derived it into 132 parquet scans)
        .localCheckpoint(eager=True)
    )
    nbr = edges.select(
        F.col("a").alias("node"), F.col("b").alias("nb")
    ).unionAll(edges.select(F.col("b").alias("node"), F.col("a").alias("nb")))
    deg = nbr.groupBy("node").agg(F.count("*").cast("bigint").alias("d"))
    x = nbr.select(F.col("node").alias("u"), F.col("nb").alias("z"))
    y = nbr.select(F.col("node").alias("v"), F.col("nb").alias("z"))
    cand = x.join(y, "z").filter(F.col("u") < F.col("v"))
    open_pairs = cand.join(
        edges,
        (edges["a"] == cand["u"]) & (edges["b"] == cand["v"]),
        "left_anti",
    )
    dz = deg.select(F.col("node").alias("z"), F.col("d").alias("dz"))
    scored = (
        open_pairs.join(F.broadcast(dz), "z")
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("bigint").alias("cn"),
            F.sum(F.expr("1000000 DIV dz")).cast("bigint").alias("ra_ppm"),
        )
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    return (
        scored.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            "cn",
            F.expr("cn * 1000000 DIV (du + dv - cn)")
            .cast("bigint")
            .alias("jaccard_ppm"),
            "ra_ppm",
        )
    )


# -- X235 personalized PageRank (seed-teleport proximity ranking) -----------
#
# Random-walk-with-restart proximity to a seed node over the DAG-ified
# trade graph (same edges as the dangling variant, so dangling mass is
# structurally live and must be routed to the seed). The seed is the
# lexicographic minimum node — a deterministic bounded scalar in both
# engines. Oracle unrolls the identical recurrence with DECIMAL partial
# sums; all double literals are CAST so DuckDB does not carry exact
# decimals where Spark computes binary doubles.


def _ppr_iter_sql(prev: str, cur: str, dm: str) -> str:
    return f"""{dm} AS (
  SELECT CAST(COALESCE(SUM(CAST(r.rank AS DECIMAL(38,10))), 0) AS DOUBLE)
           AS dm
  FROM {prev} r LEFT JOIN deg d ON r.node = d.node
  WHERE d.node IS NULL),
{cur} AS (
  SELECT nodes.node,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           * (CASE WHEN nodes.node = (SELECT s FROM seed)
                   THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
         + CAST(0.85 AS DOUBLE)
           * (COALESCE(s.insum, CAST(0 AS DOUBLE))
              + (SELECT dm FROM {dm})
                * (CASE WHEN nodes.node = (SELECT s FROM seed)
                        THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END))
           AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(CAST(r.rank / d.outdeg AS DECIMAL(38,10))) AS DOUBLE)
             AS insum
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg d ON e.src = d.node
    GROUP BY e.dst) s ON nodes.node = s.node)"""


_PPR_ORACLE = f"""
WITH edges AS ({_PRD_EDGES_SQL}),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
seed AS (SELECT MIN(node) AS s FROM nodes),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (
  SELECT node,
         CASE WHEN node = (SELECT s FROM seed)
              THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS rank
  FROM nodes),
{_ppr_iter_sql('r0', 'i1', 'dm1')},
{_ppr_iter_sql('i1', 'i2', 'dm2')},
{_ppr_iter_sql('i2', 'i3', 'dm3')}
SELECT node, rank FROM i3
"""


@query("q_graph_ppr", _PPR_ORACLE)
def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.graph import personalized_pagerank

    # The edge list is a 5-way join; every PPR round references it several
    # times (contribs, outdeg, dangling anti-join). localCheckpoint
    # materializes it ONCE so iterations reuse the 25-row result instead
    # of replaying the join lineage ~10× (measured 26 s → ~3 s at sf0.1).
    edges = (
        _trade_edges(spark, sf_dir)
        .filter(F.col("src") < F.col("dst"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed = nodes.agg(F.min("node")).collect()[0][0]  # bounded scalar
    return personalized_pagerank(edges, seed, iterations=3)


# -- X247 functional-graph cycle detection (pointer doubling) ---------------
#
# Every node has ONE successor (succ(v) = (7v + 3) mod n over the
# supplier key space); classify each node as on-cycle vs tail and name
# its cycle. The scale pattern is POINTER DOUBLING with a carried min:
#   s_{2k}(v) = s_k(s_k(v));  m_{2k}(v) = min(m_k(v), m_k(s_k(v)))
# so ⌈log₂ 2n⌉ keyed self-joins compose the walk to depth D ≥ 2n —
# logarithmic rounds where the naive walk is O(n), the parallel
# list-ranking trick. After D steps every walk has entered its cycle and
# the carried min has seen the WHOLE cycle, hence:
#   land(v) = s_D(v) is on a cycle; on-cycle ⟺ v ∈ image(s_D);
#   cycle_id(v) = m_D(land(v)) (min member of the cycle v drains into).
# The oracle replays the same walk as a LINEAR recursive CTE carrying
# the path min — fine at oracle scale, wrong at cluster scale; the
# log-depth plan is the point. The two sides run DIFFERENT depths
# (Spark 2^(rounds−1), oracle 2^rounds) and still agree because the
# OUTPUT is depth-invariant for any D ≥ n: land(v) moves around its
# cycle as D grows, but image(s_D), and the cycle-min looked up at the
# landing node, are properties of the cycle itself.

_CYCLE_ORACLE = """
WITH nodes AS (SELECT s_suppkey AS v FROM supplier),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
dd AS (
  SELECT CAST(POWER(2, CEIL(LOG2(2 * n))) AS BIGINT) AS d FROM nn),
succ AS (SELECT v, (7 * v + 3) % (SELECT n FROM nn) AS s FROM nodes),
walk AS (
  WITH RECURSIVE w(v, cur, pmin, step) AS (
    SELECT v, v, v, 0 FROM nodes
    UNION ALL
    SELECT w.v, s.s, LEAST(w.pmin, s.s), w.step + 1
    FROM w JOIN succ s ON s.v = w.cur
    WHERE w.step < (SELECT d FROM dd))
  SELECT v, cur AS land, pmin
  FROM w WHERE step = (SELECT d FROM dd)),
img AS (SELECT DISTINCT land AS v FROM walk)
SELECT w.v,
       w.v IN (SELECT v FROM img) AS is_on_cycle,
       CAST(w2.pmin AS BIGINT) AS cycle_id
FROM walk w JOIN walk w2 ON w2.v = w.land
"""


@query("q_graph_cycle_detect", _CYCLE_ORACLE)
def q_graph_cycle_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    sup = load_table(spark, sf_dir, "supplier")
    nodes = sup.select(F.col("s_suppkey").alias("v"))
    n = nodes.count()  # bounded scalar (drives the round count)
    rounds = max(1, math.ceil(math.log2(2 * n)))
    succ = nodes.select("v", ((7 * F.col("v") + 3) % n).alias("s"))
    # state: v → (s = k-step successor, m = min over first k successors)
    state = succ.select("v", "s", F.col("s").alias("m"))
    for _ in range(rounds - 1):
        hop = state.select(
            F.col("v").alias("hv"),
            F.col("s").alias("hs"),
            F.col("m").alias("hm"),
        )
        state = (
            state.join(hop, state["s"] == hop["hv"])
            .select(
                "v",
                F.col("hs").alias("s"),
                F.least(F.col("m"), F.col("hm")).alias("m"),
            )
            .localCheckpoint(eager=True)
        )
    walk = state.select("v", F.col("s").alias("land"), F.col("m").alias("pmin"))
    img = walk.select(F.col("land").alias("iv")).distinct()
    on_cycle = (
        walk.join(img, walk["v"] == img["iv"], "left")
        .select("v", "land", F.col("iv").isNotNull().alias("is_on_cycle"))
    )
    cyc = walk.select(F.col("v").alias("cv"), F.col("pmin").alias("cycle_id"))
    return (
        on_cycle.join(cyc, F.col("land") == F.col("cv"))
        .select("v", "is_on_cycle", F.col("cycle_id").cast("bigint"))
    )


# -- X261 degree assortativity ---------------------------------------------
#
# Newman's degree-assortativity coefficient: the Pearson correlation of
# endpoint degrees over edges (both directions, so the estimator is the
# standard undirected one). Degrees are one keyed aggregate; the edge ×
# degree joins broadcast the bounded degree table; the correlation
# reduces to the 6 integer moments in the mirrored double tree. Edges =
# the trade graph, hash-SPARSIFIED exactly as X224 does — at fuller SFs
# every nation pair trades and a complete graph has zero degree variance
# (the coefficient degenerates to 0/0).

_ASSORT_ORACLE = f"""
WITH dir AS ({_PR_EDGES_SQL}),
edges0 AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM dir GROUP BY 1, 2),
edges AS (
  SELECT a, b FROM edges0
  WHERE CAST(('0x' || substr(md5(a || '|' || b), 1, 15)) AS BIGINT)
          % 3 = 0),
und AS (
  SELECT a, b FROM edges
  UNION ALL SELECT b, a FROM edges),
deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d
        FROM und GROUP BY a),
pairs AS (
  SELECT da.d AS x, db.d AS y
  FROM und e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
  FROM pairs)
SELECT CAST(n AS BIGINT) AS n_edge_ends,
       (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
         / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n))
         AS assortativity
FROM m
"""


@query("q_graph_assortativity", _ASSORT_ORACLE)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    dir_edges = _trade_edges(spark, sf_dir)
    edges0 = dir_edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    keep = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", "a", "b")), 1, 15), 16, 10
        ).cast("bigint")
        % 3
        == 0
    )
    edges = edges0.filter(keep).localCheckpoint(eager=True)
    und = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    da = deg.select(F.col("node").alias("na"), F.col("d").alias("x"))
    db = deg.select(F.col("node").alias("nb"), F.col("d").alias("y"))
    pairs = (
        und.join(F.broadcast(da), und["a"] == F.col("na"))
        .join(F.broadcast(db), und["b"] == F.col("nb"))
        .select("x", "y")
    )
    m = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cxy = sxy - sx * sy / n
    cxx = sxx - sx * sx / n
    cyy = syy - sy * sy / n
    return m.select(
        n.cast("bigint").alias("n_edge_ends"),
        (cxy / F.sqrt(cxx * cyy)).alias("assortativity"),
    )


# -- X263 local clustering coefficient -------------------------------------
#
# Per-node clustering coefficient on the sparsified trade graph:
# cc(v) = 2·T(v)·10⁶ DIV (d(v)·(d(v)−1)) in exact ppm. Triangles per
# node come from the ordered wedge join (the X48 shape — each triangle
# counted once, then credited to all three corners); degrees are one
# keyed aggregate. Both joins are on the bounded sparsified edge set;
# at web scale the wedge join is capped per hub exactly as X224 notes.

_CLUSTER_COEFF_ORACLE = f"""
WITH dir AS ({_PR_EDGES_SQL}),
edges0 AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM dir GROUP BY 1, 2),
edges AS (
  SELECT a, b FROM edges0
  WHERE CAST(('0x' || substr(md5(a || '|' || b), 1, 15)) AS BIGINT)
          % 3 = 0),
und AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY a),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
corner AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri),
tcount AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t
           FROM corner GROUP BY node)
SELECT d.node, d.d AS degree,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN d.d >= 2
                 THEN 2 * COALESCE(t.t, 0) * 1000000 // (d.d * (d.d - 1))
                 ELSE 0 END AS BIGINT) AS cc_ppm
FROM deg d LEFT JOIN tcount t ON t.node = d.node
"""


@query("q_graph_clustering_coeff", _CLUSTER_COEFF_ORACLE)
def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    dir_edges = _trade_edges(spark, sf_dir)
    edges0 = dir_edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    keep = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", "a", "b")), 1, 15), 16, 10
        ).cast("bigint")
        % 3
        == 0
    )
    edges = edges0.filter(keep).localCheckpoint(eager=True)
    und = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    e1 = edges.select("a", "b")
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corner = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    tcount = corner.groupBy("node").agg(
        F.count("*").cast("bigint").alias("t")
    )
    return (
        deg.join(tcount, "node", "left")
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.when(
                F.col("d") >= 2,
                F.expr("2 * COALESCE(t, 0) * 1000000 DIV (d * (d - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("cc_ppm"),
        )
    )


# -- X285 weighted single-source shortest paths ----------------------------
#
# Bellman-Ford on the nation trade graph with deterministic portable edge
# weights (1 + md5-hash % 9): six relaxation rounds, each one
# broadcast-join of the ≤|V|-row distance frontier against the
# checkpointed edge list plus a keyed min — the classic Pregel step as
# pure DataFrame ops. Spark and the oracle unroll the SAME number of
# rounds, so the result is pinned even if 6 rounds were not yet the fixed
# point (they are here: the trade graph's hop-diameter is ≤ 3). The
# source is data-derived (MIN over edge sources) so the query is
# non-degenerate at every scale factor — the sf0.001 fixture has no
# NATION_0 supplier. All arithmetic is BIGINT; no floats anywhere.

_SSSP_ROUNDS = 6

_SSSP_W_SQL = (
    "1 + (CAST(('0x' || substr(md5(src || '>' || dst), 1, 15)) AS BIGINT)"
    " % 9)"
)


def _sssp_round_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM {prev} d JOIN edges e ON e.src = d.node) u
  GROUP BY node)"""


_SSSP_ORACLE = (
    f"""
WITH trade AS ({_PR_EDGES_SQL}),
edges AS (SELECT src, dst, {_SSSP_W_SQL} AS w FROM trade),
d0 AS (SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS dist FROM edges),
"""
    + ",\n".join(
        _sssp_round_sql(f"d{i}", f"d{i + 1}") for i in range(_SSSP_ROUNDS)
    )
    + f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{_SSSP_ROUNDS}
"""
)


@query("q_graph_sssp", _SSSP_ORACLE)
def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.queries.sampling_q import hash60

    edges = (
        _trade_edges(spark, sf_dir)
        .select(
            "src",
            "dst",
            (
                F.lit(1)
                + hash60(F.concat_ws(">", F.col("src"), F.col("dst"))) % 9
            ).alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    dist = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    for _ in range(_SSSP_ROUNDS):
        relax = (
            F.broadcast(dist)
            .join(edges, dist["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            # r12: dist is referenced TWICE per round (broadcast probe +
            # union leg), so the un-checkpointed plan doubled per round —
            # 2^6 replays of every earlier relaxation (measured 22.6 s at
            # sf0.01 for a ≤25-node distance table). Per-round eager
            # checkpoint of the BOUNDED dist table caps the plan at one
            # round (same values — r9 iterative-lineage rule): 1.7 s.
            .localCheckpoint(eager=True)
        )
    return dist.select("node", F.col("dist").cast("bigint").alias("dist"))


# -- X311 DAG topological layering (longest-path levels) -------------------
#
# Scheduling depth for a DAG: layer(v) = longest chain ending at v = the
# wave a topological executor would run v in. The graph is the doubling/
# tripling DAG on part keys (u -> 2u, u -> 3u while in range) — every
# node except 2-3-smooth-free keys has multiple ancestors, so this is a
# real DAG, not a tree. Spark runs the generic max-plus frontier
# relaxation (operators/graph.py::longest_path_layers); the oracle takes
# a COMPLETELY different route — the closed form layer(v) = v2(v)+v3(v)
# (each relaxation step strips exactly one factor of 2 or 3), summed as
# pure divisibility CASE terms — so agreement cross-checks the iterative
# algorithm against independent number theory, not a replay of itself.

_TOPO_ORACLE = (
    "WITH lay AS (\n"
    "  SELECT p_partkey AS v,\n"
    "         CAST("
    + " + ".join(
        f"CASE WHEN p_partkey % {2**a} = 0 THEN 1 ELSE 0 END"
        for a in range(1, 31)
    )
    + "\n        + "
    + " + ".join(
        f"CASE WHEN p_partkey % {3**b} = 0 THEN 1 ELSE 0 END"
        for b in range(1, 20)
    )
    + " AS BIGINT) AS layer\n"
    "  FROM part WHERE p_partkey > 0)\n"
    "SELECT layer, CAST(COUNT(*) AS BIGINT) AS n_nodes,\n"
    "       CAST(MIN(v) AS BIGINT) AS min_v, CAST(MAX(v) AS BIGINT) AS max_v\n"
    "FROM lay GROUP BY layer ORDER BY layer"
)


@query("q_graph_topo_layers", _TOPO_ORACLE)
def q_graph_topo_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.graph import longest_path_layers

    # key 0 is excluded: 0*2 = 0 is a self-loop, which breaks the DAG
    # contract (and the closed form) — both sides drop it.
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") > 0)
    keys = part.select(F.col("p_partkey").alias("node"))
    k2 = part.select(F.col("p_partkey").alias("k2"))
    edges = (
        keys.join(k2, F.col("k2") == F.col("node") * 2)
        .select(F.col("node").alias("u"), F.col("k2").alias("v"))
        .unionByName(
            keys.join(k2, F.col("k2") == F.col("node") * 3).select(
                F.col("node").alias("u"), F.col("k2").alias("v")
            )
        )
    )
    lay = longest_path_layers(edges, keys)
    return (
        lay.groupBy(F.col("l").cast("bigint").alias("layer"))
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.min("node").cast("bigint").alias("min_v"),
            F.max("node").cast("bigint").alias("max_v"),
        )
        .orderBy("layer")
    )


# -- X338: connected components (the dedup-cluster fixpoint operator) ------
# operators/dedup.connected_components (min-label propagation with PATH
# COMPRESSION, observe-based convergence, localCheckpoint per round) has
# powered grid-DBSCAN and ER-blocking since round 4 but never had its own
# oracle row. Here it runs to fixpoint over a planted CHAIN+BRIDGE graph
# (chains are the worst case compression exists for), and the DuckDB
# oracle computes true components via a recursive reachability closure —
# so convergence itself, not a fixed round count, is what's checked.

_CC_ORACLE = """
WITH RECURSIVE ids AS (
  SELECT doc_id AS i FROM documents WHERE doc_id < 60),
e0 AS (
  -- chains of 5: i -> i+1 unless i ends a chain; bridges i -> 2i
  SELECT i AS a, i + 1 AS b FROM ids WHERE i % 5 <> 4
  UNION ALL
  SELECT i, 2 * i FROM ids WHERE 2 * i < 60 AND i % 9 = 3),
edges AS (
  SELECT a AS src, b AS dst FROM e0
  UNION SELECT b, a FROM e0),
reach AS (
  SELECT src AS id, src AS v FROM edges
  UNION
  SELECT r.id, e.dst AS v FROM reach r JOIN edges e ON e.src = r.v),
comp AS (SELECT id, MIN(v) AS component FROM reach GROUP BY id)
SELECT component, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM comp GROUP BY component
"""


@query("q_graph_connected_components", _CC_ORACLE)
def q_graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.dedup import connected_components

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select(F.col("doc_id").alias("i"))
    )
    chain = ids.filter(F.col("i") % 5 != 4).select(
        F.col("i").alias("id_a"), (F.col("i") + 1).alias("id_b")
    )
    bridge = ids.filter((2 * F.col("i") < 60) & (F.col("i") % 9 == 3)).select(
        F.col("i").alias("id_a"), (2 * F.col("i")).alias("id_b")
    )
    comp = connected_components(chain.unionByName(bridge))
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


# -- X339: HITS hubs & authorities (2 power-iteration rounds) --------------
# Kleinberg's HITS over the directed supplier→customer trade graph: each
# round sets a(v) = Σ h(u) over in-edges, h(u) = Σ a(v) over out-edges,
# then L1-normalizes both (sum-normalization avoids sqrt entirely; all
# sums ride the exact-decimal accumulator so round order can't leak).
# Fixed 2 rounds, oracle-unrolled like the PageRank family.

_HITS_EDGES_SQL = """
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey <> c.c_nationkey AND l.l_linenumber = 1
"""


DEC38 = "decimal(38,12)"


def _hits_round_sql(prev_h: str, prev_a: str, cur_h: str, cur_a: str) -> str:
    return f"""{cur_a}_raw AS (
  SELECT e.dst AS node,
         CAST(SUM(CAST(h.score AS DECIMAL(38,12))) AS DOUBLE) AS s
  FROM edges e JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst),
{cur_a} AS (
  SELECT node, s / (SELECT CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE)
                    FROM {cur_a}_raw) AS score
  FROM {cur_a}_raw),
{cur_h}_raw AS (
  SELECT e.src AS node,
         CAST(SUM(CAST(a.score AS DECIMAL(38,12))) AS DOUBLE) AS s
  FROM edges e JOIN {cur_a} a ON a.node = e.dst GROUP BY e.src),
{cur_h} AS (
  SELECT node, s / (SELECT CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE)
                    FROM {cur_h}_raw) AS score
  FROM {cur_h}_raw)"""


_HITS_ORACLE = f"""
WITH edges AS ({_HITS_EDGES_SQL}),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT node, CAST(1 AS DOUBLE) AS score FROM nodes),
{_hits_round_sql('h0', 'a0', 'h1', 'a1')},
{_hits_round_sql('h1', 'a1', 'h2', 'a2')}
SELECT h2.node, h2.score AS hub, a2.score AS authority
FROM h2 JOIN a2 ON a2.node = h2.node
"""


@query("q_graph_hits", _HITS_ORACLE)
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linenumber") == 1
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    edges = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # 4-way join runs once, not per round
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = nodes.withColumn("score", F.lit(1.0))

    def l1_normalize(df: DataFrame) -> DataFrame:
        tot = df.agg(
            F.sum(F.col("s").cast(DEC38)).cast("double").alias("t")
        )
        return df.crossJoin(F.broadcast(tot)).select(
            "node", (F.col("s") / F.col("t")).alias("score")
        )

    a = None
    for _ in range(2):
        a = l1_normalize(
            edges.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("score").cast(DEC38)).cast("double").alias("s"))
        )
        h = l1_normalize(
            edges.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("score").cast(DEC38)).cast("double").alias("s"))
        )
    return h.select("node", F.col("score").alias("hub")).join(
        a.select("node", F.col("score").alias("authority")), "node"
    )



# -- X368 harmonic closeness / eccentricity on the nation trade graph ------
#
# All-pairs shortest paths on a BOUNDED derived graph: the 25 nations,
# connected where the (supplier-nation, customer-nation) trade revenue is
# above the all-pairs average — the heavy, distributed part of the plan is
# deriving those pair revenues from the fact tables (one keyed shuffle);
# the BFS closure then runs over a ≤25-node edge list (bounded by
# construction, like the rest of the nation-graph family). Harmonic
# centrality (sum of 1/d in floor-ppm) is the standard
# disconnection-tolerant closeness; eccentricity capped at 6 hops matches
# the oracle's recursion bound exactly.

_CLOSENESS_CAP = 6

_CLOSENESS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT LEAST(s.s_nationkey, c.c_nationkey) AS a,
         GREATEST(s.s_nationkey, c.c_nationkey) AS b,
         SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
             AS BIGINT)) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2),
tot AS (SELECT COUNT(*) AS np, SUM(cents) AS tc FROM pairs),
kept AS (SELECT a, b FROM pairs, tot WHERE cents * np > tc),
e AS (SELECT a AS u, b AS v FROM kept
      UNION ALL SELECT b AS u, a AS v FROM kept),
reach AS (
  SELECT u AS src, v AS node, 1 AS d FROM e
  UNION
  SELECT r.src, e.v, r.d + 1
  FROM reach r JOIN e ON e.u = r.node
  WHERE r.d < {_CLOSENESS_CAP}),
md AS (SELECT src, node, MIN(d) AS d FROM reach
       WHERE node <> src GROUP BY src, node)
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(MAX(d) AS BIGINT) AS ecc,
       CAST(SUM(1000000 // d) AS BIGINT) AS harmonic_ppm
FROM md JOIN nation n ON n.n_nationkey = md.src
GROUP BY n.n_name
"""


@query("q_graph_harmonic_closeness", _CLOSENESS_ORACLE)
def q_graph_harmonic_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    pairs = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            )
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("a", "b")
        .agg(F.sum("cents").alias("cents"))
    )
    tot = pairs.agg(
        F.count(F.lit(1)).alias("np"), F.sum("cents").alias("tc")
    )
    kept = (
        pairs.crossJoin(F.broadcast(tot))
        .filter(F.col("cents") * F.col("np") > F.col("tc"))
        .select("a", "b")
    )
    e = (
        kept.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(
            kept.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        .localCheckpoint(eager=True)  # bounded: ≤ 25·24 directed edges
    )
    step = e.select(F.col("u").alias("eu"), F.col("v").alias("ev"))
    dist = e.select(
        F.col("u").alias("src"), F.col("v").alias("node"),
        F.lit(1).alias("d"),
    ).localCheckpoint(eager=True)
    frontier = dist
    for k in range(2, _CLOSENESS_CAP + 1):
        frontier = (
            frontier.join(step, frontier["node"] == F.col("eu"))
            .select(
                frontier["src"],
                F.col("ev").alias("node"),
                F.lit(k).alias("d"),
            )
            .distinct()
            .filter(F.col("node") != F.col("src"))
            .join(dist.select("src", "node"), ["src", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(frontier).localCheckpoint(eager=True)
    nation = load_table(spark, sf_dir, "nation")
    return (
        dist.groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            F.max("d").cast("bigint").alias("ecc"),
            F.sum(F.expr("1000000 div d")).cast("bigint")
            .alias("harmonic_ppm"),
        )
        .join(
            F.broadcast(nation),
            F.col("src") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"), "n_reached", "ecc",
            "harmonic_ppm",
        )
    )


# -- X411 GNN-style neighbor aggregation (bipartite message passing) --------
#
# One GraphSAGE-style layer over the customer-part purchase bipartite
# graph: each part's feature is its global mean order quantity, and
# each customer aggregates the features of the parts they bought — a
# 2-hop "what do buyers of what I buy look like" embedding, the shape
# every distributed GNN layer reduces to (gather -> aggregate ->
# scatter as joins + keyed groupBys). Portability: part means are
# quantized to EXACT integer ppm (1e6 * sum DIV n — float means would
# accumulate order-dependently across the second hop), so the
# customer-level aggregate sums integers and divides ONCE. Plan: two
# shuffles on the natural keys (partkey, then custkey), map-side
# combine on both; the probe-side custkey filter prunes the second
# aggregate but leaves the global part features intact.

_NEIGH_CUST = 500

_NEIGH_ORACLE = f"""
WITH e AS (
  SELECT o.o_custkey AS ck, l.l_partkey AS pk,
         CAST(ROUND(l.l_quantity) AS BIGINT) AS q
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
pf AS (
  SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_p,
         (1000000 * CAST(SUM(q) AS BIGINT)) // COUNT(*) AS mean_qty_ppm
  FROM e GROUP BY pk),
c AS (
  SELECT e.ck, CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(SUM(e.q) AS BIGINT) AS own_qty,
         CAST(SUM(pf.mean_qty_ppm) AS BIGINT) AS hop2_ppm_sum
  FROM e JOIN pf ON pf.pk = e.pk
  WHERE e.ck <= {_NEIGH_CUST}
  GROUP BY e.ck)
SELECT ck, n_edges,
       CAST(own_qty AS DOUBLE) / n_edges AS hop1_mean_qty,
       CAST(hop2_ppm_sum AS DOUBLE) / (n_edges * 1000000.0)
         AS hop2_mean_qty
FROM c
"""


@query("q_graph_neighbor_agg", _NEIGH_ORACLE)
def q_graph_neighbor_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    e = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("ck"),
        F.col("l_partkey").alias("pk"),
        F.round("l_quantity").cast("bigint").alias("q"),
    )
    pf = e.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_p"),
        F.expr(
            "(1000000 * CAST(SUM(q) AS BIGINT)) DIV COUNT(*)"
        ).alias("mean_qty_ppm"),
    )
    c = (
        e.filter(F.col("ck") <= _NEIGH_CUST)
        .join(pf, "pk")
        .groupBy("ck")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.sum("q").cast("bigint").alias("own_qty"),
            F.sum("mean_qty_ppm").cast("bigint").alias("hop2_ppm_sum"),
        )
    )
    return c.select(
        "ck",
        "n_edges",
        (F.col("own_qty").cast("double") / F.col("n_edges")).alias(
            "hop1_mean_qty"
        ),
        (
            F.col("hop2_ppm_sum").cast("double")
            / (F.col("n_edges") * F.lit(1000000.0))
        ).alias("hop2_mean_qty"),
    )


# -- X460 eigenvector centrality (integer power iteration) -------------------
#
# The prestige read-out PageRank approximates with teleportation removed:
# v_{t+1} = A v_t over the UNDIRECTED trade graph. Portability comes from
# staying in exact integers: v_0 = 1 for every node and NO per-round
# normalization — values grow like (max degree)^t, which for the ≤25-node
# nation graph over 4 rounds stays far inside BIGINT — and only the final
# read-out quantizes to ppm of the max (floor DIV, smallest-name
# tie-break irrelevant since max is a scalar). Each round is one
# edges⋈labels join + keyed sum — identical shape to the PageRank
# operator; the oracle unrolls the same four rounds as chained CTEs.

_EIG_ROUNDS = 4

_EIG_EDGES_SQL = f"""
  SELECT src, dst FROM ({_PR_EDGES_SQL})
  UNION
  SELECT dst, src FROM ({_PR_EDGES_SQL})
"""


def _eig_iter_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT e.dst AS node, CAST(SUM(p.v) AS BIGINT) AS v
  FROM eedges e JOIN {prev} p ON p.node = e.src
  GROUP BY e.dst)"""


_EIG_ORACLE = f"""
WITH eedges AS ({_EIG_EDGES_SQL}),
nodes AS (SELECT DISTINCT src AS node FROM eedges),
v0 AS (SELECT node, CAST(1 AS BIGINT) AS v FROM nodes),
{_eig_iter_sql('v0', 'v1')},
{_eig_iter_sql('v1', 'v2')},
{_eig_iter_sql('v2', 'v3')},
{_eig_iter_sql('v3', 'v4')},
mx AS (SELECT MAX(v) AS m FROM v4)
SELECT v4.node, v4.v AS score_raw,
       CAST(v4.v * 1000000 // mx.m AS BIGINT) AS score_ppm
FROM v4, mx
"""


@query("q_graph_eigenvector", _EIG_ORACLE)
def q_graph_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    directed = _trade_edges(spark, sf_dir)
    edges = (
        directed.unionByName(
            directed.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)  # 4 consumers: one per round
    )
    v = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("v", F.lit(1).cast("bigint"))
    )
    for _ in range(_EIG_ROUNDS):
        v = (
            edges.join(v, edges["src"] == v["node"])
            .groupBy(edges["dst"].alias("node"))
            .agg(F.sum("v").cast("bigint").alias("v"))
        )
    mx = v.agg(F.max("v").alias("m"))
    return v.crossJoin(F.broadcast(mx)).select(
        "node",
        F.col("v").alias("score_raw"),
        F.expr("CAST(v * 1000000 DIV m AS BIGINT)").alias("score_ppm"),
    )


# -- X479 graph modularity of a node partition ---------------------------------
#
# Newman modularity of the REGION partition over the undirected trade
# graph: Q = Σ_c [e_c/m − (deg_c/2m)²] — "is trade region-assortative?".
# Everything is exact integers: m (undirected edge count), e_c
# (intra-community edges), deg_c (community degree sums), and the
# per-community numerator q_num_c = 4·m·e_c − deg_c² over the common
# denominator 4m², with Q assembled by one division. The partition is a
# dimension join (nation→region), the graph the same bounded trade
# edges as PageRank/eigenvector.

_MODULARITY_ORACLE = f"""
WITH eedges AS (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({_PR_EDGES_SQL})),
part AS (
  SELECT n.n_name AS node, r.r_name AS community
  FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM eedges),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT lo AS node FROM eedges UNION ALL SELECT hi FROM eedges)
  GROUP BY node),
cdeg AS (
  SELECT p.community, CAST(SUM(deg.d) AS BIGINT) AS deg_sum
  FROM deg JOIN part p ON p.node = deg.node
  GROUP BY p.community),
cin AS (
  SELECT pl.community, CAST(COUNT(*) AS BIGINT) AS e_in
  FROM eedges e
  JOIN part pl ON pl.node = e.lo
  JOIN part ph ON ph.node = e.hi
  WHERE pl.community = ph.community
  GROUP BY pl.community)
SELECT cdeg.community,
       COALESCE(cin.e_in, 0) AS e_in,
       cdeg.deg_sum,
       CAST(4 * m.m * COALESCE(cin.e_in, 0)
            - cdeg.deg_sum * cdeg.deg_sum AS BIGINT) AS q_num,
       CAST(4 * m.m * m.m AS BIGINT) AS q_den
FROM cdeg LEFT JOIN cin ON cin.community = cdeg.community, m
"""


@query("q_graph_modularity", _MODULARITY_ORACLE)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    directed = _trade_edges(spark, sf_dir)
    e = (
        directed.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # m, deg, and cin all consume it
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    part = n.join(
        r, n["n_regionkey"] == r["r_regionkey"]
    ).select(F.col("n_name").alias("node"), F.col("r_name").alias("community"))
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    cdeg = deg.join(F.broadcast(part), "node").groupBy("community").agg(
        F.sum("d").cast("bigint").alias("deg_sum")
    )
    pl = part.select(F.col("node").alias("lo"), F.col("community").alias("cl"))
    ph = part.select(F.col("node").alias("hi"), F.col("community").alias("ch"))
    cin = (
        e.join(F.broadcast(pl), "lo")
        .join(F.broadcast(ph), "hi")
        .filter(F.col("cl") == F.col("ch"))
        .groupBy(F.col("cl").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    return (
        cdeg.join(cin, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
            "deg_sum",
            (
                4 * F.col("m") * F.coalesce("e_in", F.lit(0))
                - F.col("deg_sum") * F.col("deg_sum")
            )
            .cast("bigint")
            .alias("q_num"),
            (4 * F.col("m") * F.col("m")).cast("bigint").alias("q_den"),
        )
    )
