"""Iterative graph algorithms as unrolled DataFrame plans (X23 family).

``pagerank`` — the canonical iterative numeric algorithm — as a chain of
join + decimal-exact aggregation rounds. Complements the label-propagation
connected components in ``operators/dedup.py``: that one iterates to
convergence with lineage cuts; this one runs a fixed iteration count, so
the whole computation is ONE declarative plan (no checkpoints needed at
small depth) and — because every per-node contribution sum goes through
the order-independent DECIMAL accumulator — bit-reproducible under any
partitioning and by any engine that unrolls the same recurrence.

At 100 TB: each iteration costs one shuffle on dst (contribution agg) and
a broadcast-or-shuffle join of ranks onto edges. For deep iteration counts
add ``localCheckpoint`` every ~5 rounds (as connected components does) to
bound lineage; the fixed 3-iteration shape used by the oracle query keeps
the plan shallow on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (28,10) not (38,10): Spark types decimal(38,10) additions as (38,9)
# under allowPrecisionLoss, silently rounding partial sums — the same
# pitfall functions/vectors.py documents. At (28,10) the sum widens
# losslessly; DuckDB oracles keep DECIMAL(38,10), whose per-term rounding
# at scale 10 is identical.
_DEC = "decimal(28,10)"


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an edge list (dedup'd by caller), returning
    ``(node, rank)``.

    Semantics: uniform init 1/N; per round
    ``r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/outdeg(u)``.
    Nodes without out-edges leak mass (standard simplification — no
    dangling-mass redistribution), nodes without in-edges settle at
    ``(1-d)/N``. N is the count of distinct endpoint nodes; it is the one
    driver-side scalar (a tiny count job), inlined as a literal so every
    iteration stays a pure plan.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    base = (1 - damping) / n_nodes
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["e_src"] == ranks["node"])
            .join(outdeg.withColumnRenamed("node", "d_node"),
                  F.col("e_src") == F.col("d_node"))
            .select(
                F.col("e_dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        insum = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast(_DEC)).cast("double").alias("insum")
        )
        ranks = (
            nodes.join(insum, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("insum"), F.lit(0.0))
                ).alias("rank"),
            )
            # r12: per-round eager checkpoint of the BOUNDED rank table
            # (|nodes| rows) — without it every round re-executes all
            # prior rounds' edge joins once more per reference (plan
            # growth; r9 iterative-lineage rule). Same values.
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_dangling(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Textbook PageRank: like :func:`pagerank` but the rank mass of
    dangling nodes (no out-edges) is redistributed uniformly each round
    instead of leaking —
    ``r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + DM/N)`` with
    ``DM = Σ_{outdeg(u)=0} r(u)``, so total rank stays 1.

    The dangling mass is a one-row aggregate subplan cross-joined
    (broadcast — it is a single row) into each round's rank update: the
    whole computation remains ONE declarative plan with no driver-side
    collects beyond the N scalar. Per round that adds one anti-join agg
    over the rank table (N rows, not edges), negligible next to the
    edge-shuffle; the decimal accumulator keeps both sums
    order-independent, so the unrolled oracle matches bit-for-bit.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    base = (1 - damping) / n_nodes
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        dm = (
            ranks.join(outdeg, "node", "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast(_DEC)).cast("double"), F.lit(0.0)
                ).alias("dm")
            )
        )
        contribs = (
            e.join(ranks, e["e_src"] == ranks["node"])
            .join(outdeg.withColumnRenamed("node", "d_node"),
                  F.col("e_src") == F.col("d_node"))
            .select(
                F.col("e_dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        insum = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast(_DEC)).cast("double").alias("insum")
        )
        ranks = (
            nodes.join(insum, "node", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("insum"), F.lit(0.0))
                        + F.col("dm") / F.lit(n_nodes)
                    )
                ).alias("rank"),
            )
            # r12: ranks is referenced TWICE per round (dangling-mass agg
            # + contribs join), so an un-checkpointed plan doubles per
            # round; eager checkpoint of the bounded rank table caps it.
            .localCheckpoint(eager=True)
        )
    return ranks


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Multi-source BFS shortest hop counts, frontier-style (X155).

    ``edges`` is a DIRECTED edge list (pass both directions for an
    undirected graph); ``sources`` is a one-column ``node`` DataFrame of
    BFS roots (distance 0).  Returns ``(node, d)`` for every node
    reachable within ``max_hops``.

    Scale posture: the textbook distributed frontier expansion — each
    round is one keyed equi-join (frontier × edges), a distinct, and a
    LEFT ANTI join against the visited set; no per-node driver loop, no
    collect, and ``localCheckpoint`` after each round cuts the growing
    lineage so round k's plan does not replay rounds 1..k-1.  Rounds are
    fixed (``max_hops``), so there is no driver-side emptiness probe; an
    empty frontier makes the remaining rounds no-op map jobs.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    visited = sources.select("node", F.lit(0).alias("d")).localCheckpoint(
        eager=True
    )
    frontier = visited.select("node")
    for r in range(1, max_hops + 1):
        cand = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
        )
        new = cand.join(visited, "node", "left_anti").select(
            "node", F.lit(r).alias("d")
        )
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return visited


def personalized_pagerank(
    edges: DataFrame,
    seed: str,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns to ``seed`` instead of
    spreading uniformly —
    ``r'(v) = (1-d)·[v = seed] + d·(Σ_{u→v} r(u)/outdeg(u) + DM·[v = seed])``
    with dangling mass DM also routed to the seed, so total rank stays 1
    and ranks measure proximity to the seed node.

    Same scale posture as :func:`pagerank_dangling`: per round one keyed
    edge-shuffle plus a one-row broadcast aggregate; DECIMAL partial sums
    keep every contribution order-independent so the unrolled relational
    oracle reproduces the recurrence bit-for-bit.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    base = 1 - damping
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    is_seed = F.when(F.col("node") == seed, F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = nodes.select("node", is_seed.alias("rank"))
    for _ in range(iterations):
        dm = ranks.join(outdeg, "node", "left_anti").agg(
            F.coalesce(
                F.sum(F.col("rank").cast(_DEC)).cast("double"), F.lit(0.0)
            ).alias("dm")
        )
        contribs = (
            e.join(ranks, e["e_src"] == ranks["node"])
            .join(
                outdeg.withColumnRenamed("node", "d_node"),
                F.col("e_src") == F.col("d_node"),
            )
            .select(
                F.col("e_dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        insum = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast(_DEC)).cast("double").alias("insum")
        )
        ranks = (
            nodes.join(insum, "node", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    F.lit(base) * is_seed
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("insum"), F.lit(0.0))
                        + F.col("dm") * is_seed
                    )
                ).alias("rank"),
            )
            # r12: same double-reference-per-round argument as
            # pagerank_dangling — checkpoint the bounded rank table.
            .localCheckpoint(eager=True)
        )
    return ranks


def longest_path_layers(
    edges: DataFrame,
    nodes: DataFrame,
    max_rounds: int = 40,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """DAG topological layering: layer(v) = longest path from any source
    (node with no incoming edge), i.e. the level a topological scheduler
    would run v at (X311).

    Max-plus frontier relaxation: start every node at layer 0; each round
    pushes ``layer+1`` across out-edges of the IMPROVED nodes only, takes
    the per-node max, and stops when a round improves nothing.  Layers
    only grow and are bounded by the longest path, so termination is the
    DAG depth, not the node count.  Same scale posture as
    :func:`bfs_distances`: keyed joins + keyed max-aggregates, frontier
    shrinks to the still-improving set, ``localCheckpoint`` cuts lineage
    per round; the one driver-side emptiness probe per round is how the
    data-dependent depth is detected (DAG depth rounds total).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    lay = nodes.select("node", F.lit(0).alias("l")).localCheckpoint(eager=True)
    frontier = lay
    converged = False
    for _ in range(max_rounds):
        cand = (
            frontier.join(e, frontier["node"] == e["u"])
            .groupBy(F.col("v").alias("node"))
            .agg((F.max("l") + 1).alias("cl"))
        )
        merged = lay.join(cand, "node", "left").localCheckpoint(eager=True)
        improved = merged.filter(
            F.col("cl").isNotNull() & (F.col("cl") > F.col("l"))
        )
        if improved.isEmpty():
            converged = True
            break
        lay = merged.select(
            "node",
            F.greatest("l", F.coalesce("cl", F.lit(0))).alias("l"),
        ).localCheckpoint(eager=True)
        frontier = improved.select("node", F.col("cl").alias("l"))
    if not converged:
        # Still relaxing after max_rounds: either the input has a cycle
        # (layers would grow forever — it is not a DAG) or its depth
        # exceeds the round budget. Returning the partial layers would be
        # silently wrong, so fail loudly instead.
        raise ValueError(
            f"longest_path_layers did not converge within {max_rounds} "
            "rounds: the edge set has a cycle (not a DAG) or its depth "
            "exceeds max_rounds — raise max_rounds for deeper DAGs"
        )
    return lay
