"""Fixed-point distributed k-means (Lloyd iterations) over an embedding
column — iterative ML expressed as pure DataFrame plans, with every
iteration exactly reproducible across engines and partitionings.

Portability design: float k-means is not reproducible (distance sums and
centroid means depend on accumulation order), so this variant quantizes
coordinates to integer milli-units (``round(x*1000)``) and keeps centroids
in integer micro-units (``floor(1000*S/n)``). All distances are then exact
int64 arithmetic — argmin ties break on centroid id — and a DuckDB oracle
can replay the iterations bit-for-bit (see ``queries/ml_q.py``).

Scale posture: the centroid side is k rows of 64-long arrays — broadcast
by construction. Each iteration is one broadcast cross-join (N×k rows,
distance folded in array order JVM-side via zip_with/aggregate — exact
because the operands are integers), one argmin aggregate, and one keyed
re-aggregation for the new centroids. Nothing is ever collected; the only
driver-side state is the loop counter. MLlib's KMeans (used by the IVF
index) remains the float production path; this operator is the
engine-portable, auditable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_points(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, varr): micro-unit int64 coordinate arrays (milli-quantized
    coordinates × 1000, so they share the centroid scale)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            # explicit double BEFORE the multiply: float32×int stays
            # float32 in some engines, and a value like 0.3195f*1000
            # snaps to exactly 319.5 in float32 (ulp ~3e-5) — rounding
            # the wrong way vs the double product. Both engines must
            # widen first.
            lambda e: F.round(e.cast("double") * 1000).cast("bigint") * 1000,
        ).alias("varr"),
    )


def _sq_dist(a, b):
    # exact int64 fold in array order
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + d,
    )


def _assign(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, cid, dist): nearest centroid per point, ties to smaller cid."""
    scored = pts.crossJoin(F.broadcast(cents)).select(
        "id", "cid", _sq_dist(F.col("varr"), F.col("carr")).alias("dist")
    )
    best = scored.groupBy("id").agg(
        F.min(F.struct("dist", "cid")).alias("best")
    )
    return best.select(
        "id", F.col("best.cid").alias("cid"), F.col("best.dist").alias("dist")
    )


def _recompute(pts: DataFrame, assign: DataFrame, cents: DataFrame) -> DataFrame:
    """New centroid arrays: floor(1000 * sum(milli)/n) per (cid, dim);
    clusters that lost every member keep their previous centroid."""
    member_dims = (
        assign.join(pts, "id")
        .select("cid", F.posexplode("varr").alias("i", "vmic"))
        # micro → milli is exact (micro is milli*1000 by construction)
        .withColumn("x", (F.col("vmic") / 1000).cast("bigint"))
    )
    dims = member_dims.groupBy("cid", "i").agg(
        F.floor(F.sum("x") * 1000 / F.count("*")).alias("c")
    )
    new = dims.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))),
            lambda s: s["c"],
        ).alias("carr_new")
    )
    return cents.join(new, "cid", "left").select(
        "cid", F.coalesce("carr_new", "carr").alias("carr")
    )


def lloyd_fixed_point(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd iterations from the deterministic seed
    (centroids = the points with the k smallest ids). Returns
    ``(assignment, centroids)`` where assignment is (id, cid, dist) under
    the FINAL centroids.
    """
    pts = quantize_points(df, id_col, vec_col).persist()
    cents = pts.filter(F.col("id") < k).select(
        F.col("id").cast("int").alias("cid"), F.col("varr").alias("carr")
    )
    assign = None
    for _ in range(iters):
        assign = _assign(pts, cents)
        # k rows of 64 ints: checkpointing per round keeps each iteration
        # a single pass instead of re-deriving the whole lineage (the
        # same cut connected_components uses).
        cents = _recompute(pts, assign, cents).localCheckpoint(eager=True)
    # final assignment against the updated centroids
    assign = _assign(pts, cents)
    return assign, cents
