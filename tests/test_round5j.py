"""Invariant tests for round-5 session-6 batch J: topological layering
on a hand-built DAG, embedding-audit census laws, and conformal
order-statistic recompute."""

from __future__ import annotations

import math
from collections import Counter

SF = "/root/testdata/sf0.001"


def test_longest_path_layers_hand_dag(spark):
    from mini_etl_project_spark.operators.graph import longest_path_layers

    # diamond with a tail: 1->2, 1->3, 2->4, 3->4, 4->5 ; 6 isolated
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], "u long, v long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "node long")
    lay = {r["node"]: r["l"] for r in longest_path_layers(edges, nodes).collect()}
    assert lay == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3, 6: 0}


def test_topo_layers_closed_form(spark):
    from mini_etl_project_spark.queries.iterative_q import q_graph_topo_layers
    from mini_etl_project_spark.session import load_table

    out = {r["layer"]: r for r in q_graph_topo_layers(spark, SF).collect()}
    keys = [
        r["p_partkey"]
        for r in load_table(spark, SF, "part").collect()
        if r["p_partkey"] > 0
    ]

    def nu(v: int, p: int) -> int:
        c = 0
        while v % p == 0:
            v //= p
            c += 1
        return c

    expect = Counter(nu(v, 2) + nu(v, 3) for v in keys)
    assert {k: r["n_nodes"] for k, r in out.items()} == dict(expect)


def test_embedding_audit_census_laws(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_embedding_audit
    from mini_etl_project_spark.session import load_table

    rows = q_ml_embedding_audit(spark, SF).collect()
    assert len(rows) == 64
    n_vec = load_table(spark, SF, "embeddings").count()
    for r in rows:
        assert r["n"] == n_vec
        assert 0 <= r["n_zero"] <= r["n"]
        assert r["min_micro"] <= r["max_micro"]
    # every vector dominates exactly one dimension
    assert sum(r["n_dominant"] for r in rows) == n_vec
    # spot-check dominance on a few vectors
    emb = load_table(spark, SF, "embeddings").limit(5).collect()
    dom_by_dim = {r["dim"]: r["n_dominant"] for r in rows}
    for e in emb:
        am = [abs(round(float(x) * 1_000_000)) for x in e["embedding"]]
        d = am.index(max(am))
        assert dom_by_dim[d] >= 1


def test_conformal_order_statistic_and_coverage(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_conformal_interval
    from mini_etl_project_spark.session import load_table

    rows = {r["pri"]: r for r in q_ml_conformal_interval(spark, SF).collect()}
    orders = load_table(spark, SF, "orders").collect()
    by_pri = {}
    for o in orders:
        by_pri.setdefault(o["o_orderpriority"], []).append(o)
    for pri, r in rows.items():
        grp = by_pri[pri]
        train = [o for o in grp if o["o_orderkey"] % 3 == 0]
        calib = [o for o in grp if o["o_orderkey"] % 3 == 1]
        cents = lambda o: round(o["o_totalprice"] * 100)  # noqa: E731
        pred = sum(cents(o) for o in train) // len(train)
        res = sorted(abs(cents(o) - pred) for o in calib)
        k = math.ceil((len(res) + 1) * 0.9)
        assert r["n_cal"] == len(res)
        assert r["kth"] == k
        assert r["q_hat"] == res[k - 1]
        # finite-sample conformal guarantee holds in expectation at 90%;
        # allow 4-sigma binomial slack for this one concrete split
        slack = 4 * math.sqrt(0.9 * 0.1 / r["n_test"])
        assert r["coverage_ppm"] >= int((0.9 - slack) * 1_000_000)
        assert r["n_covered"] <= r["n_test"]
