"""CC round-count experiment on a CHAIN-shaped dup graph at 100x.

VERDICT r9 ask #5: the group-min broadcast cut the CC fixpoint from 14
to 5 rounds at sf0.1 but TIED at 100x because that corpus's dup graph
is clique-shaped (identical copies -> all-pairs buckets), which already
converges in ~3 rounds. Chains are the adversarial topology — label
information crawls one hop per naive round — and barriers dominate at
cluster scale, so the round count IS the scale cost.

The 100x corpus (/tmp/sfx10, make_scale_data.py) duplicates each sf0.1
embedding 100x with ids shifted by i*OFFSET. Planting edges between
CONSECUTIVE copies of each base vector turns every dup group into a
path of length 100 (a "chain-dup corpus": same vectors SemDeDup would
pair up, adversarial pair topology), at the exact node/edge scale the
100x SemDeDup CC phase would see if its near-dup graph were chains.

Usage: python tools/cc_chain_experiment.py [sfx10_dir] [copies]
Prints one JSON line per variant: {"group_min": bool, "rounds": n,
"wall_sec": s, "components": c, "nodes": n}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mini_etl_project_spark.operators.dedup import connected_components
from mini_etl_project_spark.session import get_spark, load_table

OFFSET = 10_000_000_000  # make_scale_data.py key shift


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("cc_chain")
    emb = load_table(spark, src, "embeddings").select("vec_id")
    # copy index i = vec_id // OFFSET; base id = vec_id % OFFSET.
    # Chain edge: copy i -> copy i+1 of the same base vector.
    ids = emb.select(
        (F.col("vec_id") % F.lit(OFFSET)).alias("base"),
        (F.col("vec_id") / F.lit(OFFSET)).cast("long").alias("copy"),
        F.col("vec_id"),
    )
    pairs = (
        ids.filter(F.col("copy") < copies - 1)
        .select(
            F.col("vec_id").alias("id_a"),
            (F.col("vec_id") + F.lit(OFFSET)).alias("id_b"),
        )
        .localCheckpoint(eager=True)
    )
    n_edges = pairs.count()
    print(f"# chain edges: {n_edges}", file=sys.stderr)
    variants = [
        {"group_min": True, "compress": True},   # production
        {"group_min": False, "compress": True},  # compression only
        {"group_min": True, "compress": False},  # group-min only
        {"group_min": False, "compress": False}, # naive neighbor-min
    ]
    for kw in variants:
        stats: dict = {}
        t0 = time.time()
        labels = connected_components(pairs, max_iter=120, stats=stats, **kw)
        comps = labels.select("component").distinct().count()
        nodes = labels.count()
        print(
            json.dumps(
                {
                    **kw,
                    "rounds": stats.get("rounds"),
                    "wall_sec": round(time.time() - t0, 2),
                    "components": comps,
                    "nodes": nodes,
                    "edges": n_edges,
                }
            )
        )


if __name__ == "__main__":
    main()
