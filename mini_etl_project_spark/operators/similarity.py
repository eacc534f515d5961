"""Similarity search over embedding columns (X3 exact, X4 approximate).

- ``topk_exact``: brute-force cosine top-k — the small-SF oracle and the
  recall yardstick. Query set × corpus via broadcast join (queries are few;
  never materialize corpus×corpus), exact-decimal cosine, window top-k.
- ``RandomHyperplaneLSH``: the scale path. Deterministic md5-derived
  hyperplanes (no RNG state to ship), sign-bit bucket per table; top-k is
  computed only within matching buckets across L tables. Sub-linear
  candidate sets at 100 TB, tunable recall via (bits, tables).
- ``ml_brp_lsh``: the spark.ml BucketedRandomProjectionLSH equivalent
  (Euclidean), kept as the library-native alternative.
"""

from __future__ import annotations

from mini_etl_project_spark.functions.memo import jvm_memo as _jvm_memo

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mini_etl_project_spark.functions.vectors import (
    cosine_exact,
    dot_exact,
    dot_sign_nonneg,
    sqnorm_exact,
)


def topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    prefilter_margin: float | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector (self excluded).

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k,
    deterministic tie-break on neighbor id.

    ``prefilter_margin`` (r12, guide §1.2 "per-task work"): the
    exact-decimal dot product is ~10× a double fold per term (boxed
    BigDecimal adds), and ranking needs it only near the cut. With a
    margin set, a plain double-fold cosine ranks every pair cheaply
    first and the exact-decimal rescore runs ONLY on pairs within
    ``margin`` of the k-th approximate score. Lossless by the same
    argument as ``dot_sign_nonneg``: |exact − double| per pair is
    bounded by the decimal quantization (64 · 5e-11 = 3.2e-9) over the
    norm product plus ~1 ulp of double accumulation, so with margin ≫
    2·bound no pair outside the margin can reach the exact top-k, and
    every pair that could tie at the boundary is inside it
    (strict-inequality argument — tie-breaks never cross the margin).
    NULL-ness is identical on both paths (same norm-product
    denominator), and if a query has fewer than k non-null approx
    scores the filter keeps ALL its rows.

    Default OFF after a measured A/B at sf0.1 (2 000 × 10 pairs,
    OPTIMIZATION_r12.md): once the corpus scan is widened the decimal
    scoring parallelizes across the pre-exchange map side and the
    prefilter's two extra window passes cost more than they save
    (0.56 s plain vs 0.92 s prefiltered). It becomes the right call when
    per-query candidate counts grow so the decimal CPU dominates the
    window bookkeeping — i.e. corpus ≫ cores × (window cost / decimal
    saving), the 100 TB corpus-scan regime.
    """
    from mini_etl_project_spark.session import ensure_parallelism

    # The scoring projection sits BELOW the window exchange, so its
    # parallelism is the corpus scan's — a single-row-group embeddings
    # file would otherwise run every decimal dot in ONE task (measured
    # 1.35 s → 0.56 s at sf0.1 from this alone; no-op at scale).
    corpus = ensure_parallelism(corpus)
    # Hoist each side's norm to one computation per VECTOR — inlining
    # cosine_exact would recompute both norms per (query, neighbor) pair,
    # tripling the array work (measured ~35 % of the query).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(sqnorm_exact(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(sqnorm_exact(vec_col)).alias("c_norm"),
    )
    denom = F.col("q_norm") * F.col("c_norm")
    pairs = c.join(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    if prefilter_margin is not None:
        dd = F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.col("c_vec"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        wa = Window.partitionBy("query_id").orderBy(
            F.desc_nulls_last("__approx"), "neighbor_id"
        )
        ranked = pairs.withColumn(
            "__approx", F.when(denom != 0, dd / denom)
        ).withColumn("__ar", F.row_number().over(wa))
        kth = F.max(F.when(F.col("__ar") == k, F.col("__approx"))).over(
            Window.partitionBy("query_id")
        )
        pairs = (
            ranked.withColumn("__kth", kth)
            .filter(
                F.col("__kth").isNull()
                | (F.col("__approx") >= F.col("__kth") - F.lit(prefilter_margin))
            )
            .drop("__approx", "__ar", "__kth")
        )
    scored = pairs.withColumn(
        "cosine",
        F.when(denom != 0, dot_exact("q_vec", "c_vec") / denom),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane(dim: int, table: int, bit: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes.

    Components are derived per (table, bit, dim-index) from md5, mapped to
    [-1, 1). Deterministic across runs/machines — the signature of a
    vector never depends on which executor computed it.
    """
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"rhp:{table}:{bit}:{d}".encode()).digest()
        v = int.from_bytes(h[:8], "big")
        out.append(v / 2**63 - 1.0)
    return out


@_jvm_memo
def _bucket_expr_cached(
    dim: int, bits: int, table: int, exact_sign: bool, vec_col: str
):
    """JVM-lifetime cache of the per-table bucket expression — the
    hyperplanes are md5-derived from (dim, table, bit) alone, so the
    tree is identical for every LSH instance with these parameters."""
    probe = RandomHyperplaneLSH.__new__(RandomHyperplaneLSH)
    probe.dim, probe.bits, probe.tables = dim, bits, table + 1
    probe.exact_sign = exact_sign
    probe._planes = {
        (table, b): _hyperplane(dim, table, b) for b in range(bits)
    }
    return probe._bucket_build(vec_col, table)


class RandomHyperplaneLSH:
    """Sign-random-projection LSH for cosine similarity (X4).

    P[bucket match per bit] = 1 − θ/π; with ``bits`` per table and
    ``tables`` independent tables, near neighbors collide w.h.p. while
    the corpus shards into ~2^bits buckets per table.
    """

    def __init__(
        self, dim: int, bits: int = 8, tables: int = 4, exact_sign: bool = False
    ) -> None:
        self.dim, self.bits, self.tables = dim, bits, tables
        #: exact_sign=True routes the sign-bit dot product through the
        #: order-independent decimal accumulator (functions/vectors.py)
        #: instead of sequential double adds. Marginally slower, but the
        #: bucket of a vector is then bit-reproducible by ANY engine that
        #: follows the md5 derivation — which makes the whole ANN pipeline
        #: oracle-checkable in SQL (q_sim_lsh_topk) and partitioning-proof
        #: even for dots within one ulp of zero.
        self.exact_sign = exact_sign
        # hyperplanes as literal arrays in the plan: tiny (tables×bits×dim)
        self._planes = {
            (t, b): _hyperplane(dim, t, b)
            for t in range(tables)
            for b in range(bits)
        }

    def bucket(self, vec_col, table: int):
        """Bucket id (bigint) of a vector in one table: packed sign bits.

        String-named columns hit a JVM-lifetime expression cache (r12):
        the tree is ~(bits × 3 higher-order folds) of py4j construction
        — measured 3.3 s per ``add_buckets`` call at (4 tables, 4 bits,
        exact_sign) — and is fully determined by
        (dim, bits, table, exact_sign, vec_col).
        """
        if isinstance(vec_col, str):
            return _bucket_expr_cached(
                self.dim, self.bits, table, self.exact_sign, vec_col
            )
        return self._bucket_build(vec_col, table)

    def _bucket_build(self, vec_col, table: int):
        vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        acc = F.lit(0).cast("bigint")
        for b in range(self.bits):
            # ONE array Literal node, not CreateArray over 64 child
            # literals — the bucketing expression tree is compiled per
            # plan, and at tables×bits×64 children the analyzer/codegen
            # cost dominated small-SF runtime (measured: 64× smaller
            # tree ≈ 2-3 s less cold-plan latency at sf0.1).
            plane = F.lit(self._planes[(table, b)])
            if self.exact_sign:
                # Sign-only decision: double fold with an exact-decimal
                # fallback inside ±1e-6 of zero — bit-identical to the
                # pure decimal fold (see dot_sign_nonneg), ~10× cheaper
                # on the bucketing hot path.
                nonneg = dot_sign_nonneg(vec, plane)
            else:
                dot = F.aggregate(
                    F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                nonneg = dot >= 0
            acc = acc + F.when(nonneg, F.lit(2**b).cast("bigint")).otherwise(0)
        return acc

    def add_buckets(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """One row per (row, table) with its bucket id."""
        tables = F.explode(
            F.array(*[F.lit(t) for t in range(self.tables)])
        ).alias("table")
        out = df.select("*", tables)
        # CASE over the table index — when-branches evaluate lazily, so
        # each row computes exactly one table's bit signature
        expr = F.lit(None).cast("bigint")
        for t in range(self.tables):
            expr = F.when(F.col("table") == t, self.bucket(vec_col, t)).otherwise(expr)
        return out.withColumn("bucket", expr)

    def topk(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
    ) -> DataFrame:
        """ANN top-k: exact cosine, but only within shared LSH buckets."""
        # Candidate generation dedups (query_id, neighbor_id) PAIRS ONLY —
        # never shuffle or hash the 64-float payload arrays through the
        # distinct; vectors and per-vector norms are joined back after.
        # This is the 100 TB shape: the wide payload crosses the wire once.
        cb = self.add_buckets(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
            "c_vec",
        ).select("table", "bucket", "neighbor_id")
        qb = self.add_buckets(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
            "q_vec",
        ).select("table", "bucket", "query_id")
        cand = (
            cb.join(qb, ["table", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
        )
        q_full = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.sqrt(sqnorm_exact(vec_col)).alias("q_norm"),
        )
        c_full = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.sqrt(sqnorm_exact(vec_col)).alias("c_norm"),
        )
        denom = F.col("q_norm") * F.col("c_norm")
        scored = (
            cand.join(F.broadcast(q_full), "query_id")
            .join(c_full, "neighbor_id")
            .withColumn(
                "cosine", F.when(denom != 0, dot_exact("q_vec", "c_vec") / denom)
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )


class IVFIndex:
    """IVF-style ANN (X4 second scale path): k-means coarse quantization,
    then exact search within the ``nprobe`` closest cells.

    At 100 TB the corpus is written partitioned by ``cell`` so a query
    touches only ``nprobe`` partitions (partition pruning at the scan).
    Seeded KMeans keeps centroid assignment reproducible for a fixed
    corpus + partitioning.
    """

    def __init__(self, n_cells: int = 16, nprobe: int = 4, seed: int = 42) -> None:
        self.n_cells, self.nprobe, self.seed = n_cells, nprobe, seed
        self._model = None

    def fit(self, corpus: DataFrame, vec_col: str = "embedding") -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
        self._model = KMeans(
            k=self.n_cells, seed=self.seed, featuresCol="features"
        ).fit(feats)
        return self

    def _assign(self, df: DataFrame, vec_col: str, out: str) -> DataFrame:
        from pyspark.ml.functions import array_to_vector

        assigned = self._model.transform(
            df.withColumn("features", array_to_vector(F.col(vec_col)))
        )
        return assigned.withColumnRenamed("prediction", out).drop("features")

    def topk(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
    ) -> DataFrame:
        """Exact cosine top-k within each query's ``nprobe`` nearest cells."""
        import numpy as np

        c = self._assign(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
            ),
            "c_vec",
            "cell",
        )
        # close over plain Python values only — capturing `self` would drag
        # the unpicklable JVM-backed KMeans model into the UDF closure
        centers = [list(map(float, ctr)) for ctr in self._model.clusterCenters()]
        nprobe = self.nprobe

        @F.pandas_udf("array<int>")
        def probe_cells(vecs):
            import pandas as pd

            ctrs = np.array(centers)
            out = []
            for v in vecs:
                d = ((ctrs - np.asarray(v, dtype="float64")) ** 2).sum(axis=1)
                out.append(np.argsort(d, kind="stable")[:nprobe].astype("int32"))
            return pd.Series(out)

        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ).withColumn("cell", F.explode(probe_cells(F.col("q_vec"))))
        cand = c.join(F.broadcast(q), "cell").filter(
            F.col("query_id") != F.col("neighbor_id")
        )
        scored = cand.withColumn("cosine", cosine_exact("q_vec", "c_vec"))
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )


    # -- the 100 TB layout: corpus on disk partitioned by cell -------------

    def write_partitioned(
        self,
        corpus: DataFrame,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """Materialize the corpus partitioned by ``cell`` — the layout that
        makes a query touch only its ``nprobe`` cells' files."""
        c = self._assign(
            corpus.select(F.col(id_col), F.col(vec_col)), vec_col, "cell"
        )
        c.write.mode("overwrite").partitionBy("cell").parquet(path)

    def probe_cells_local(self, vec: list[float]) -> list[int]:
        """Driver-side nprobe-nearest cells for one query vector (query
        batches at serving time are tiny; the corpus is what's at scale)."""
        import numpy as np

        ctrs = np.array([list(map(float, c)) for c in self._model.clusterCenters()])
        d = ((ctrs - np.asarray(vec, dtype="float64")) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d, kind="stable")[: self.nprobe]]

    def topk_partitioned(
        self,
        spark,
        path: str,
        queries: list[tuple],
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
    ) -> DataFrame:
        """Exact top-k against a cell-partitioned corpus: the ``cell IN
        (...)`` predicate is a PARTITION filter, so the scan reads only the
        probed cells' files — demonstrated by plan assertion in
        tests/test_scale_posture.py::test_ivf_partition_pruning.

        ``queries``: [(query_id, vector)] — small, shipped as literals.
        """
        probe = {qid: self.probe_cells_local(vec) for qid, vec in queries}
        all_cells = sorted({c for cells in probe.values() for c in cells})
        scan = spark.read.parquet(path).filter(F.col("cell").isin(all_cells))
        qdf = spark.createDataFrame(
            [(qid, list(map(float, vec)), probe[qid]) for qid, vec in queries],
            "query_id long, q_vec array<double>, q_cells array<int>",
        )
        cand = (
            scan.withColumnRenamed(id_col, "neighbor_id")
            .withColumnRenamed(vec_col, "c_vec")
            .join(
                F.broadcast(qdf),
                F.array_contains(F.col("q_cells"), F.col("cell")),
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
        scored = cand.withColumn("cosine", cosine_exact("q_vec", "c_vec"))
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )


class PQIndex:
    """Product quantization (X4 third scale path — the memory-bound one).

    A D-dim float vector (D×8 bytes) compresses to ``m`` one-byte-ish
    codes: the vector is split into ``m`` subvectors, each mapped to its
    nearest centroid in a per-subspace codebook of ``k_codes`` entries
    (trained with seeded Lloyd's iterations on a bounded sample). Search
    uses ADC (asymmetric distance computation): per query, an m×k_codes
    lookup table of partial squared L2 distances is built once, and each
    corpus row's approximate distance is ``sum_j LUT[j][code_j]`` — a pure
    table-lookup scan, no float math per dimension.

    Why this is the 100 TB shape: the scan reads the CODES column
    (m bytes/row) instead of the embedding (D×8 bytes/row) — a 64×
    I/O + memory reduction at (D=64, m=8) — and the ADC sum runs
    JVM-side via ``F.aggregate`` over the broadcast LUT, whole-stage
    codegen'd, no Python in the per-row path. ``rerank`` re-scores the
    top ADC candidates with exact distances (the standard two-stage
    recipe) so recall approaches exact search while the exact pass
    touches only candidates.

    Training is driver-side numpy on ≤ ``sample`` vectors — codebook size
    is O(m·k_codes·D/m) floats regardless of corpus scale, and a bounded
    sample is how FAISS-style systems train too.
    """

    def __init__(
        self,
        m: int = 16,
        k_codes: int = 64,
        seed: int = 42,
        iters: int = 10,
        sample: int = 4096,
    ) -> None:
        self.m, self.k_codes, self.seed, self.iters = m, k_codes, seed, iters
        self.sample = sample
        self._codebooks = None  # list[np.ndarray k_codes × D/m]

    def fit(
        self, corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> "PQIndex":
        import numpy as np

        rows = (
            corpus.select(F.col(id_col), F.col(vec_col))
            .sort(id_col)  # deterministic sample for a fixed corpus
            .limit(self.sample)
            .collect()
        )
        X = np.array([r[1] for r in rows], dtype="float64")
        d = X.shape[1]
        if d % self.m:
            raise ValueError(f"dim {d} not divisible by m={self.m}")
        # A codebook can't have more entries than training vectors.
        self.k_codes = min(self.k_codes, len(X))
        sub = d // self.m
        self._codebooks = []
        for j in range(self.m):
            Xj = X[:, j * sub : (j + 1) * sub]
            rng = np.random.RandomState(self.seed + j)
            centers = Xj[rng.choice(len(Xj), size=self.k_codes, replace=False)].copy()
            for _ in range(self.iters):
                dist = ((Xj[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
                assign = dist.argmin(axis=1)
                for c in range(self.k_codes):
                    mask = assign == c
                    if mask.any():
                        centers[c] = Xj[mask].mean(axis=0)
            self._codebooks.append(centers)
        return self

    def encode(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Add a ``codes`` column (array<int>, length m) — the distributed
        Arrow-batched compression pass; the codebooks ship in the closure
        (m·k_codes·D/m floats, tiny)."""
        import numpy as np

        books = [b.copy() for b in self._codebooks]
        sub = books[0].shape[1]
        m = self.m

        @F.pandas_udf("array<int>")
        def pq_encode(vecs):
            import pandas as pd

            out = []
            for v in vecs:
                x = np.asarray(v, dtype="float64")
                code = [
                    int(
                        (((x[j * sub : (j + 1) * sub] - books[j]) ** 2).sum(axis=1))
                        .argmin()
                    )
                    for j in range(m)
                ]
                out.append(code)
            return pd.Series(out)

        return df.withColumn("codes", pq_encode(F.col(vec_col)))

    def _lut(self, vec) -> list[float]:
        """Flat m·k_codes LUT of partial squared distances for one query."""
        import numpy as np

        x = np.asarray(vec, dtype="float64")
        sub = self._codebooks[0].shape[1]
        flat: list[float] = []
        for j in range(self.m):
            q = x[j * sub : (j + 1) * sub]
            flat.extend(float(v) for v in ((self._codebooks[j] - q) ** 2).sum(axis=1))
        return flat

    def topk(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
        rerank: int = 0,
    ) -> DataFrame:
        """ANN top-k by ADC over PQ codes; ``rerank > 0`` re-scores that
        many ADC candidates per query with exact L2 (two-stage search).

        Output: (query_id, neighbor_id, approx_dist, rank) — or exact
        ``dist`` instead of ``approx_dist`` when reranking.
        """
        codes = self.encode(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
            vec_col,
        ).select("neighbor_id", "codes")
        # Query batches are small at serving time; LUTs are built driver-
        # side and broadcast (same posture as topk_partitioned above).
        q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
        kc = self.k_codes
        qdf = F.broadcast(
            corpus.sparkSession.createDataFrame(
                [(int(r[0]), self._lut(r[1])) for r in q_rows],
                "query_id long, lut array<double>",
            )
        )
        adc = (
            codes.join(qdf)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn(
                "approx_dist",
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(self.m - 1)),
                    F.lit(0.0),
                    lambda acc, j: acc
                    + F.element_at(
                        F.col("lut"), (j * kc + F.element_at(F.col("codes"), j + 1) + 1)
                    ),
                ),
            )
            .select("query_id", "neighbor_id", "approx_dist")
        )
        w = Window.partitionBy("query_id").orderBy("approx_dist", "neighbor_id")
        if not rerank:
            return (
                adc.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "approx_dist", "rank")
            )
        cand = (
            adc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= rerank)
            .select("query_id", "neighbor_id")
        )
        q_full = F.broadcast(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("q_vec"),
                sqnorm_exact(vec_col).alias("q_sq"),
            )
        )
        c_full = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            sqnorm_exact(vec_col).alias("c_sq"),
        )
        # ||q−c||² = ||q||² − 2·q·c + ||c||², every term an exact-decimal
        # sum — bit-deterministic under any partitioning (and matchable by
        # a SQL oracle computing the same three sums).
        exact = (
            cand.join(q_full, "query_id")
            .join(c_full, "neighbor_id")
            .withColumn(
                "dist",
                (F.col("q_sq") - F.lit(2.0) * dot_exact("q_vec", "c_vec"))
                + F.col("c_sq"),
            )
        )
        w2 = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
        return (
            exact.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dist", "rank")
        )


def ml_brp_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_length: float = 2.0,
    num_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """spark.ml BucketedRandomProjectionLSH (Euclidean) top-k via
    approxSimilarityJoin — library-native X4 alternative."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("cid"), array_to_vector(F.col(vec_col)).alias("features")
    )
    q = queries.select(
        F.col(id_col).alias("qid"), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    ).fit(c)
    joined = (
        model.approxSimilarityJoin(q, c, float("inf"), distCol="dist")
        .select(
            F.col("datasetA.qid").alias("query_id"),
            F.col("datasetB.cid").alias("neighbor_id"),
            F.col("dist"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
