"""Manifest-based snapshot table format — Delta/Iceberg-style semantics
(atomic commits, snapshot isolation, time travel, optimistic concurrency,
vacuum) in pure PySpark + parquet, no external jars.

Layout::

    <root>/data/<uuid>.parquet          immutable data files
    <root>/_manifests/v%08d.json        file list + schema per version
    <root>/_LATEST                      pointer to the current version

Why this shape scales:

- A manifest is the COMPLETE file list for its version, so readers plan
  a scan from one small JSON read — no directory listing of the (at
  100 TB, enormous) data tree, and no torn reads: a reader that loaded
  manifest vN keeps a consistent snapshot even while writers commit
  vN+1, because data files are immutable and never rewritten in place.
- Commits are O(1) metadata: stage data files, then create the next
  manifest with an exclusive create (``open(..., 'x')``) — two writers
  racing to commit the same version collide on that create and exactly
  one wins (optimistic concurrency). On an object store the equivalent
  primitive is a conditional PUT (if-none-match), as used by Delta's
  commit protocol on S3/GCS.
- ``vacuum`` deletes files unreachable from the retained manifests —
  the same contract as ``VACUUM`` in Delta.
- Additive SCHEMA EVOLUTION: each manifest carries the table schema;
  reads apply it explicitly, so parquet files written before a column
  existed surface NULL for it (Delta's ``mergeSchema`` semantics)
  without any footer merging at read time.
- ``compact`` (OPTIMIZE): bin-packs small data files into fewer large
  ones and commits the rewrite as a new version — a metadata swap with
  zero logical change, so the change feed for that commit is empty.
- CHANGE FEED: every commit records which staged files carry NEW OR
  CHANGED rows (``change_files``); ``read_changes`` unions them across
  a version range. ``merge`` stages its updated/inserted rows apart
  from the copied-over rows, so the feed is exact, not approximate.

This is a faithful miniature, not a toy: append/overwrite, readers of
old versions unaffected by later commits, concurrent-commit conflict,
and time travel are all real and tested (tests/test_sources.py).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StringType, StructField, StructType


class CommitConflict(Exception):
    """Another writer committed this version first — retry on latest."""


class SchemaMismatch(Exception):
    """Append schema differs from the table schema and merge_schema=False."""


def _union_schema(base: StructType, new: StructType) -> StructType:
    """Additive evolution: keep base field order, append new fields as
    nullable. A same-named field must keep its type (no in-place type
    changes — that is a rewrite, not an evolution)."""
    by_name = {f.name: f for f in base.fields}
    for f in new.fields:
        old = by_name.get(f.name)
        if old is not None and old.dataType != f.dataType:
            raise SchemaMismatch(
                f"column {f.name!r}: table has {old.dataType.simpleString()}, "
                f"append has {f.dataType.simpleString()}"
            )
    added = [
        StructField(f.name, f.dataType, nullable=True)
        for f in new.fields
        if f.name not in by_name
    ]
    return StructType(list(base.fields) + added)


class SnapshotTable:
    def __init__(self, root: str) -> None:
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifests")
        self._pending_meta: dict = {}

    # -- creation ----------------------------------------------------------

    @classmethod
    def create(cls, root: str) -> "SnapshotTable":
        t = cls(root)
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.manifest_dir, exist_ok=True)
        return t

    # -- metadata ----------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"v{version:08d}.json")

    def latest_version(self) -> int:
        """0 = empty table (no commits yet)."""
        try:
            with open(os.path.join(self.root, "_LATEST")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    # -- named refs (tags) -------------------------------------------------
    #
    # Iceberg-style tags: an immutable name -> version pointer, stored as
    # one small json. Tags survive compaction (they pin a manifest, and
    # compaction never deletes manifests) but a tagged version's data
    # files can be reclaimed by vacuum — vacuum refuses to drop versions
    # that are tag targets for exactly that reason.

    def _tags_path(self) -> str:
        return os.path.join(self.root, "_TAGS.json")

    def tags(self) -> dict[str, int]:
        try:
            with open(self._tags_path()) as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {}

    def tag(self, name: str, version: int | None = None) -> int:
        """Create an immutable tag at ``version`` (default: latest).
        Re-tagging an existing name to a different version raises."""
        v = self.latest_version() if version is None else version
        if v < 1 or v > self.latest_version():
            raise ValueError(f"cannot tag nonexistent version {v}")
        t = self.tags()
        if name in t and t[name] != v:
            raise ValueError(
                f"tag {name!r} already points at v{t[name]} (tags are immutable)"
            )
        t[name] = v
        tmp = self._tags_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(t, f)
        os.replace(tmp, self._tags_path())
        return v

    def read_tag(self, spark: SparkSession, name: str) -> DataFrame:
        t = self.tags()
        if name not in t:
            raise ValueError(f"unknown tag: {name!r}")
        return self.read(spark, version=t[name])

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    # -- write path --------------------------------------------------------

    def _stage(self, df: DataFrame) -> list[str]:
        """Write df's rows as immutable data files; return their names.

        Timestamps are written as TIMESTAMP_MICROS (not Spark's default
        INT96): INT96 carries NO parquet min/max statistics, which would
        silently disable file skipping on every time column.
        """
        spark = df.sparkSession
        prev_tt = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        tmp = os.path.join(self.root, f"_staging_{uuid.uuid4().hex}")
        try:
            df.write.mode("overwrite").parquet(tmp)
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev_tt)
        names = []
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet"):
                name = f"{uuid.uuid4().hex}.parquet"
                os.replace(os.path.join(tmp, f), os.path.join(self.data_dir, name))
                names.append(name)
        shutil.rmtree(tmp)
        return names

    def _collect_stats(self, names: list[str], cols: list[str]) -> dict:
        """Per-file min/max for ``cols`` from the parquet FOOTERS (pyarrow
        metadata — no Spark job, no data read). The manifest carries them
        so reads can skip whole files, Delta/Iceberg data-skipping style."""
        import pyarrow.parquet as pq

        out: dict[str, dict] = {}
        for name in names:
            md = pq.ParquetFile(os.path.join(self.data_dir, name)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            per_col = {}
            for c in cols:
                if c not in idx:
                    continue
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        mins = []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    lo, hi = min(mins), max(maxs)
                    # datetime stats → epoch µs so the manifest stays
                    # plain JSON and comparisons are integer-exact
                    if hasattr(lo, "timestamp"):
                        lo = int(lo.timestamp() * 1_000_000)
                        hi = int(hi.timestamp() * 1_000_000)
                    per_col[c] = [lo, hi]
            out[name] = per_col
        return out

    def _commit(
        self,
        files: list[str],
        schema_json: str,
        base_version: int,
        op: str = "append",
        change_files: list[str] | None = None,
    ) -> int:
        """Atomically publish ``files`` as version ``base_version + 1``.

        The exclusive manifest create is the commit point: it fails if a
        concurrent writer already claimed the version (→ CommitConflict,
        nothing published, staged files are unreferenced garbage for
        vacuum). The _LATEST pointer is advisory fast-path state and is
        written via rename AFTER the commit point.

        ``change_files`` is the commit's CHANGE-FEED payload: exactly the
        staged files that carry new or changed rows (empty for a
        compaction — a physical rewrite with no logical change).
        """
        version = base_version + 1
        manifest = {
            "version": version,
            "files": files,
            "schema": schema_json,
            "op": op,
            "change_files": [] if change_files is None else change_files,
        }
        if self._pending_meta:
            manifest.update(self._pending_meta)
            self._pending_meta = {}
        # Carry per-file skipping metadata forward on EVERY commit: data
        # files are immutable and rewrites always stage fresh names, so a
        # surviving file's stats/bloom entries stay valid verbatim. Without
        # this, any commit that didn't recompute them (plain append,
        # delete, merge, compact, ...) would silently stop pruning on
        # carried-over files. Freshly computed pending entries win.
        if base_version:
            prev = self._read_manifest(base_version)
            surviving = set(files)
            for key in ("stats", "blooms"):
                carried = {
                    f: v
                    for f, v in prev.get(key, {}).items()
                    if f in surviving
                }
                merged = {**carried, **manifest.get(key, {})}
                if merged:
                    manifest[key] = merged
        try:
            with open(self._manifest_path(version), "x") as f:
                json.dump(manifest, f)
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} already committed by another writer"
            ) from e
        tmp = os.path.join(self.root, f"_latest_{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.root, "_LATEST"))
        return version

    def schema(self, version: int | None = None) -> StructType:
        v = self.latest_version() if version is None else version
        return StructType.fromJson(json.loads(self._read_manifest(v)["schema"]))

    #: per-file bloom index geometry (bits per filter / probes per value).
    #: m/k chosen for ~1 % FP at ≤200 distinct keys per file; the filter
    #: is stored SPARSE (sorted set-bit list) so manifests stay small.
    BLOOM_M = 2048
    BLOOM_K = 3

    #: Bloom-indexable Spark types. The portability contract hashes the
    #: engine-side CAST(col AS STRING) against a driver-side ``str(value)``
    #: — those renderings agree ONLY for strings and integral types.
    #: Booleans ('true' vs 'True'), doubles (scientific notation),
    #: decimals, and timestamps (fractional-second formatting) all render
    #: differently, which would turn the "zero false negatives" guarantee
    #: into silent false pruning — so they are rejected at index time.
    BLOOM_TYPES = ("string", "tinyint", "smallint", "int", "bigint")

    def _collect_blooms(
        self, spark: SparkSession, names: list[str], cols: list[str]
    ) -> dict:
        """Per-file bloom filters for ``cols`` in ONE Spark job (grouped
        by ``input_file_name`` — never a job per file). Hash family is
        the repo's portable md5 scheme, so any engine (and the driver's
        Python lookup) derives identical bit positions. Columns absent
        from the appended frame (schema evolution) are skipped — those
        files stay conservatively unindexed, mirroring ``_collect_stats``.
        NULL values are never indexed; ``bloom_eq`` lookups therefore
        cannot prune on NULL (see ``plan_files``)."""
        import pyspark.sql.functions as F

        paths = [os.path.join(self.data_dir, n) for n in names]
        df = (
            spark.read.parquet(*paths)
            .withColumn(
                "__file",
                F.element_at(F.split(F.input_file_name(), "/"), -1),
            )
        )
        dtypes = dict(df.dtypes)
        bad = {
            c: dtypes[c]
            for c in cols
            if c in dtypes and dtypes[c] not in self.BLOOM_TYPES
        }
        if bad:
            raise TypeError(
                f"bloom_cols must be string or integral (got {bad}); other "
                "types render differently in Spark's CAST-to-string vs the "
                "driver-side lookup hash and would cause false pruning"
            )
        out: dict[str, dict] = {n: {} for n in names}
        for c in (c for c in cols if c in dtypes):
            pos = F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.col(c).cast("string"),
                                        F.lit(f"|bloom{k}"),
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("bigint")
                        % self.BLOOM_M
                    )
                    for k in range(self.BLOOM_K)
                ]
            )
            rows = (
                df.select("__file", F.explode(pos).alias("p"))
                .groupBy("__file")
                .agg(F.collect_set("p").alias("bits"))
                .collect()
            )
            for r in rows:
                out[r["__file"]][c] = sorted(int(b) for b in r["bits"])
        return out

    @classmethod
    def _bloom_positions(cls, value) -> list[int]:
        """Driver-side twin of the Spark-side hash family."""
        import hashlib

        return [
            int(
                hashlib.md5(
                    f"{value}|bloom{k}".encode()
                ).hexdigest()[:15],
                16,
            )
            % cls.BLOOM_M
            for k in range(cls.BLOOM_K)
        ]

    def append(
        self,
        df: DataFrame,
        stats_cols: list[str] | None = None,
        merge_schema: bool = False,
        cluster_by: str | None = None,
        n_files: int = 8,
        bloom_cols: list[str] | None = None,
    ) -> int:
        """Append rows. With ``merge_schema=True`` new columns evolve the
        table schema additively (old files read back NULL for them); with
        the default, a shape mismatch is an error, never silent data loss.

        ``cluster_by`` is a SQL expression (e.g. ``"month(ts)"``,
        ``"day(ts)"``) — Iceberg-style HIDDEN PARTITIONING: the staged
        files are range-clustered on the transform (repartitionByRange +
        sortWithinPartitions), so their footer min/max on the SOURCE
        column are tight and ``read(where=...)`` skips them without the
        query ever naming the transform.  The spec is recorded on the
        COMMIT, not the table: later appends may use a different
        transform (partition-spec EVOLUTION) — old files keep their
        layout, reads prune both generations through the same stats.
        """
        from pyspark.sql import functions as _F

        base = self.latest_version()
        prev_m = self._read_manifest(base) if base else {}
        prev = prev_m.get("files", [])
        schema = df.schema
        if base:
            table_schema = self.schema(base)
            if [(f.name, f.dataType) for f in schema.fields] != [
                (f.name, f.dataType) for f in table_schema.fields
            ]:
                if not merge_schema:
                    raise SchemaMismatch(
                        "append schema differs from table schema; pass "
                        "merge_schema=True for additive evolution"
                    )
                schema = _union_schema(table_schema, df.schema)
        if cluster_by is not None:
            df = df.repartitionByRange(
                n_files, _F.expr(cluster_by)
            ).sortWithinPartitions(_F.expr(cluster_by))
            self._pending_meta = {
                **self._pending_meta,
                "spec": {"cluster_by": cluster_by, "n_files": n_files},
            }
        staged = self._stage(df)
        # Only the NEW files' entries are computed here; _commit carries
        # the previous manifest's stats/blooms forward for surviving files.
        if stats_cols:
            self._pending_meta = {
                **self._pending_meta,
                "stats": self._collect_stats(staged, stats_cols),
            }
        if bloom_cols:
            self._pending_meta = {
                **self._pending_meta,
                "blooms": self._collect_blooms(
                    df.sparkSession, staged, bloom_cols
                ),
            }
        return self._commit(
            prev + staged, schema.json(), base, op="append", change_files=staged
        )

    def overwrite(self, df: DataFrame) -> int:
        staged = self._stage(df)
        return self._commit(
            staged,
            df.schema.json(),
            self.latest_version(),
            op="overwrite",
            change_files=staged,
        )

    # -- read path ---------------------------------------------------------

    def plan_files(
        self,
        version: int | None = None,
        where: tuple | None = None,
        bloom_eq: tuple | None = None,
    ) -> list[str]:
        """The pruned file list a read would scan — the data-skipping
        planner, exposed so tests (and cost estimates) can count skipped
        files without running the scan.  ``where=(col, lo, hi)`` drops
        files whose manifest min/max for ``col`` is disjoint from
        [lo, hi]; ``bloom_eq=(col, value)`` drops files whose bloom
        filter proves the point-lookup value absent (Delta bloom-index
        semantics: may-contain only — zero false negatives by
        construction, the caller still applies the row predicate). Files
        without stats/blooms are conservatively kept."""
        v = self.latest_version() if version is None else version
        m = self._read_manifest(v)
        files = m["files"]
        if bloom_eq is not None:
            bcol, bval = bloom_eq
            if bval is None:
                # NULLs are never indexed (the engine-side md5 of a NULL
                # concat is NULL and drops out of the filter), so a NULL
                # lookup legitimately cannot prune any file.
                pass
            else:
                if isinstance(bval, bool) or not isinstance(bval, (str, int)):
                    raise TypeError(
                        "bloom_eq lookups support str/int values only "
                        f"(got {type(bval).__name__}); other types hash "
                        "differently engine-side vs driver-side"
                    )
                blooms = m.get("blooms", {})
                want = self._bloom_positions(bval)

                def bloom_may(f: str) -> bool:
                    bits = blooms.get(f, {}).get(bcol)
                    if bits is None:
                        return True  # unindexed file → cannot skip
                    s = set(bits)
                    return all(p in s for p in want)

                files = [f for f in files if bloom_may(f)]
        if where is not None:
            col, lo, hi = where
            if hasattr(lo, "timestamp"):  # datetime bounds → epoch µs
                lo = int(lo.timestamp() * 1_000_000)
                hi = int(hi.timestamp() * 1_000_000)
            stats = m.get("stats", {})

            def may_match(f: str) -> bool:
                rng = stats.get(f, {}).get(col)
                if rng is None:
                    return True  # no stats → cannot skip
                fmin, fmax = rng
                return not (fmax < lo or fmin > hi)

            files = [f for f in files if may_match(f)]
        return files

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        where: tuple | None = None,
        bloom_eq: tuple | None = None,
    ) -> DataFrame:
        """Snapshot read; ``version`` = time travel. The returned frame is
        pinned to its manifest's file list — later commits don't move it.

        ``where=(col, lo, hi)`` enables FILE SKIPPING: files whose
        manifest min/max range for ``col`` is disjoint from [lo, hi] are
        dropped from the scan before Spark ever lists them. This is a
        may-contain filter — the caller still applies the row-level
        predicate; skipping only removes provably-irrelevant I/O.
        """
        v = self.latest_version() if version is None else version
        if v == 0:
            raise ValueError("empty table (no commits)")
        m = self._read_manifest(v)
        files = self.plan_files(version=v, where=where, bloom_eq=bloom_eq)
        schema = StructType.fromJson(json.loads(m["schema"]))
        paths = [os.path.join(self.data_dir, f) for f in files]
        if not paths:
            return spark.createDataFrame([], schema)
        # Explicit manifest schema: no footer inference pass, and files
        # written before an evolved column existed read back NULL for it.
        return spark.read.schema(schema).parquet(*paths)

    # -- change feed -------------------------------------------------------

    def read_changes(
        self,
        spark: SparkSession,
        since_version: int,
        to_version: int | None = None,
        include_preimages: bool = False,
    ) -> DataFrame:
        """Rows added or changed in versions ``(since_version, to_version]``
        — Delta's Change Data Feed contract (this format stages changed
        rows apart from copied rows, so the feed is exact).

        Output = table columns + ``_commit_version`` + ``_change_type``
        (``insert`` for append commits, ``upsert`` for merge, ``overwrite``
        for full rewrites; compactions contribute nothing). With
        ``include_preimages=True``, each merge commit also yields the
        REPLACED old rows as ``upsert_preimage`` — enough for a consumer to
        maintain any decomposable aggregate incrementally:
        ``new = old + f(postimage) − f(preimage)``. Incremental consumers
        read only the changed files — I/O scales with the delta, not the
        table.
        """
        import pyspark.sql.functions as F

        to_v = self.latest_version() if to_version is None else to_version
        schema = self.schema(to_v)
        op_to_type = {"append": "insert", "merge": "upsert", "overwrite": "overwrite", "delete": "delete", "update": "update_postimage", "restore": "overwrite"}
        parts: list[DataFrame] = []
        for v in range(since_version + 1, to_v + 1):
            m = self._read_manifest(v)
            groups = [(m.get("change_files", []), op_to_type.get(m.get("op", "append"), "insert"))]
            if include_preimages:
                pre_type = (
                    "update_preimage"
                    if m.get("op") == "update"
                    else "upsert_preimage"
                )
                groups.append((m.get("before_files", []), pre_type))
            for files, ctype in groups:
                if not files:
                    continue
                paths = [os.path.join(self.data_dir, f) for f in files]
                parts.append(
                    spark.read.schema(schema)
                    .parquet(*paths)
                    .withColumn("_commit_version", F.lit(v))
                    .withColumn("_change_type", F.lit(ctype))
                )
        if not parts:
            empty = StructType(
                list(schema.fields)
                + [
                    StructField("_commit_version", IntegerType(), False),
                    StructField("_change_type", StringType(), False),
                ]
            )
            return spark.createDataFrame([], empty)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- maintenance -------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        target_bytes: int = 128 << 20,
        small_threshold: int | None = None,
    ) -> int:
        """OPTIMIZE: bin-pack data files smaller than ``small_threshold``
        (default ``target_bytes // 2``) into ~``target_bytes`` files and
        commit the swap as a new version.

        Streaming sinks and trickle appends produce many tiny files; at
        100 TB that is the classic small-files problem (every file costs a
        task + an open). Compaction rewrites ONLY the small files — large
        files are carried by name — and the commit's change feed is empty
        because no logical row changed. Old versions still time-travel to
        the pre-compaction files until ``vacuum``.
        """
        base = self.latest_version()
        if base == 0:
            return 0
        m = self._read_manifest(base)
        thr = target_bytes // 2 if small_threshold is None else small_threshold
        sizes = {
            f: os.path.getsize(os.path.join(self.data_dir, f)) for f in m["files"]
        }
        small = [f for f in m["files"] if sizes[f] < thr]
        if len(small) < 2:
            return base  # nothing to gain
        keep = [f for f in m["files"] if f not in set(small)]
        schema = self.schema(base)
        paths = [os.path.join(self.data_dir, f) for f in small]
        n_out = max(1, -(-sum(sizes[f] for f in small) // target_bytes))
        packed = spark.read.schema(schema).parquet(*paths).repartition(n_out)
        staged = self._stage(packed)
        # Kept files' stats/blooms carry forward in _commit; the rewritten
        # (packed) files need fresh entries. Bloom columns are recovered
        # from the rewritten files' previous index entries so compaction
        # never narrows the index.
        if m.get("stats"):
            self._pending_meta = {
                **self._pending_meta,
                "stats": self._collect_stats(staged, list(schema.names)),
            }
        bloom_cols = sorted(
            {
                c
                for f in small
                for c in m.get("blooms", {}).get(f, {})
            }
        )
        if bloom_cols:
            self._pending_meta = {
                **self._pending_meta,
                "blooms": self._collect_blooms(spark, staged, bloom_cols),
            }
        return self._commit(
            keep + staged, m["schema"], base, op="compact", change_files=[]
        )

    def clone_shallow(self, dest_root: str) -> "SnapshotTable":
        """Zero-copy shallow clone (Delta SHALLOW CLONE): the clone's v1
        manifest references the source's CURRENT data files by absolute
        path — no bytes move. Because file resolution joins relative
        names against the owning table's data dir (and passes absolute
        names through untouched), the clone reads the shared files
        directly, while its own subsequent commits stage new files into
        its OWN data dir: histories diverge immediately and the source
        never sees clone writes. Clone-side ``vacuum`` only scans the
        clone's data dir, so shared source files are structurally safe
        from clone retention. (Source-side vacuum CAN still reclaim them
        — same caveat as Delta shallow clones.)"""
        src_v = self.latest_version()
        if src_v == 0:
            raise ValueError("clone_shallow on empty table")
        m = self._read_manifest(src_v)
        dest = SnapshotTable.create(dest_root)
        abs_files = [
            f if os.path.isabs(f) else os.path.join(self.data_dir, f)
            for f in m["files"]
        ]
        def _abs_keys(d: dict) -> dict:
            return {
                (f if os.path.isabs(f) else os.path.join(self.data_dir, f)): s
                for f, s in d.items()
            }

        dest._pending_meta = {
            **dest._pending_meta,
            "stats": _abs_keys(m.get("stats", {})),
            "blooms": _abs_keys(m.get("blooms", {})),
            "cloned_from": {"root": self.root, "version": src_v},
        }
        dest._commit(abs_files, m["schema"], 0, op="clone", change_files=[])
        return dest

    def restore(self, version: int) -> int:
        """RESTORE TABLE TO VERSION: commit a NEW version whose file list
        (and schema) equal the target's — a forward-written rollback, so
        history is preserved and the restore itself is time-travelable
        (Delta RESTORE semantics). The restored rows re-enter the change
        feed as an overwrite commit."""
        latest = self.latest_version()
        if version < 1 or version > latest:
            raise ValueError(f"cannot restore to nonexistent v{version}")
        m = self._read_manifest(version)
        # The restored files come from the TARGET manifest (they may be
        # absent from the latest one), so their skipping metadata must be
        # pinned from the target too — the base-manifest carry in _commit
        # only covers files the latest version still references.
        for key in ("stats", "blooms"):
            if m.get(key):
                self._pending_meta = {**self._pending_meta, key: m[key]}
        return self._commit(
            m["files"], m["schema"], latest, op="restore",
            change_files=m["files"],
        )

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop data files unreachable from the ``keep_last`` most recent
        manifests (older versions stop being time-travelable, exactly like
        Delta's VACUUM retention trade-off). Returns deleted file names."""
        latest = self.latest_version()
        keep_versions = set(range(max(1, latest - keep_last + 1), latest + 1))
        # tag targets stay reachable regardless of retention age
        keep_versions.update(self.tags().values())
        live = set()
        for v in sorted(keep_versions):
            m = self._read_manifest(v)
            live.update(m["files"])
            # CDC-only artifacts of retained versions stay readable too.
            live.update(m.get("before_files", []))
            live.update(m.get("change_files", []))
        deleted = []
        for f in os.listdir(self.data_dir):
            if f not in live:
                os.remove(os.path.join(self.data_dir, f))
                deleted.append(f)
        return deleted

    # -- merge (upsert) ----------------------------------------------------

    def merge(
        self, spark: SparkSession, updates: DataFrame, key_cols: list[str]
    ) -> int:
        """Copy-on-write MERGE: update rows whose keys match, insert the
        rest — rewriting ONLY the data files that contain a matched key.

        File pruning is what makes this scale: a merge touching 0.1 % of
        keys rewrites ~0.1 % of files (plus the update itself); every
        untouched file is carried into the new manifest by name. The
        touched-file discovery is one semi-join grouped by
        ``input_file_name`` — file COUNT scale, never row scale, on the
        driver.
        """
        import pyspark.sql.functions as F

        base = self.latest_version()
        if base == 0:
            return self.append(updates)
        manifest = self._read_manifest(base)
        cur = self.read(spark, base).withColumn(
            "__file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        keys = updates.select(*key_cols).distinct()
        touched = {
            r["__file"]
            for r in cur.join(keys, key_cols, "left_semi")
            .select("__file")
            .distinct()
            .collect()
        }
        untouched = [f for f in manifest["files"] if f not in touched]
        touched_rows = cur.filter(F.col("__file").isin(list(touched))).drop("__file")
        kept_rows = touched_rows.join(keys, key_cols, "left_anti")
        # Copied-over survivors and the actual upserts are staged APART so
        # the commit's change feed carries exactly the changed rows; the
        # REPLACED old rows (before-images) are staged as CDC-only files —
        # never part of the table, but read_changes can serve them, which
        # is what lets a downstream consumer maintain aggregates
        # incrementally (new = old + f(post) − f(pre), Delta CDF's
        # update_preimage contract).
        staged_kept = self._stage(kept_rows) if touched else []
        staged_before = (
            self._stage(touched_rows.join(keys, key_cols, "left_semi"))
            if touched
            else []
        )
        staged_changed = self._stage(updates)
        self._pending_meta = {**self._pending_meta, "before_files": staged_before}
        return self._commit(
            untouched + staged_kept + staged_changed,
            manifest["schema"],
            base,
            op="merge",
            change_files=staged_changed,
        )


    def delete_where(self, spark: SparkSession, predicate) -> int:
        """Copy-on-write row-level DELETE: rewrite ONLY the data files
        that contain a matching row, dropping matches; untouched files
        carry into the new manifest by name (same pruning contract as
        :meth:`merge` — cost scales with the files hit, not the table).
        The deleted rows are staged as the commit's change files with
        op='delete', so ``read_changes`` serves exact delete events to
        incremental consumers (Delta CDF's delete contract)."""
        import pyspark.sql.functions as F

        base = self.latest_version()
        if base == 0:
            raise ValueError("delete_where on empty table")
        manifest = self._read_manifest(base)
        cur = self.read(spark, base).withColumn(
            "__file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        hit = cur.filter(predicate)
        touched = {
            r["__file"]
            for r in hit.select("__file").distinct().collect()
        }
        untouched = [f for f in manifest["files"] if f not in touched]
        survivors = (
            cur.filter(F.col("__file").isin(list(touched)))
            .filter(~predicate)
            .drop("__file")
        )
        staged_kept = self._stage(survivors) if touched else []
        staged_deleted = self._stage(hit.drop("__file")) if touched else []
        return self._commit(
            untouched + staged_kept,
            manifest["schema"],
            base,
            op="delete",
            change_files=staged_deleted,
        )


    def update_where(
        self, spark: SparkSession, predicate, set_exprs: dict
    ) -> int:
        """Copy-on-write row-level UPDATE: rewrite ONLY the data files
        containing a matching row, applying ``set_exprs`` (column →
        Column) to matches; untouched files carry into the new manifest
        by name. The change feed carries BOTH images — matched rows
        pre-mutation as ``update_preimage`` (via ``before_files``) and
        post-mutation as ``update_postimage`` — Delta CDF's update
        contract, enough for exact incremental aggregate maintenance."""
        import pyspark.sql.functions as F

        base = self.latest_version()
        if base == 0:
            raise ValueError("update_where on empty table")
        manifest = self._read_manifest(base)
        cur = self.read(spark, base).withColumn(
            "__file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        hit = cur.filter(predicate)
        touched = {
            r["__file"] for r in hit.select("__file").distinct().collect()
        }
        data_cols = [c for c in cur.columns if c != "__file"]
        upd = {c: set_exprs.get(c, F.col(c)) for c in data_cols}
        touched_rows = cur.filter(F.col("__file").isin(list(touched)))
        rewritten = touched_rows.select(
            *[
                F.when(predicate, upd[c]).otherwise(F.col(c)).alias(c)
                for c in data_cols
            ]
        )
        post = hit.select(*[upd[c].alias(c) for c in data_cols])
        staged_kept = self._stage(rewritten) if touched else []
        staged_post = self._stage(post) if touched else []
        staged_pre = self._stage(hit.drop("__file")) if touched else []
        untouched = [f for f in manifest["files"] if f not in touched]
        self._pending_meta = {
            **self._pending_meta,
            "before_files": staged_pre,
        }
        return self._commit(
            untouched + staged_kept,
            manifest["schema"],
            base,
            op="update",
            change_files=staged_post,
        )

    # -- streaming sink integration ---------------------------------------

    def last_txn(self, app_id: str) -> int:
        """Highest streaming batch id committed under ``app_id``
        (−1 = none). Walks manifests newest-first; the first txn entry for
        the app wins, exactly like Delta's per-application txn action."""
        for v in range(self.latest_version(), 0, -1):
            m = self._read_manifest(v)
            txn = m.get("txn") or {}
            if txn.get("app_id") == app_id:
                return int(txn["batch_id"])
        return -1

    def append_txn(self, df: DataFrame, app_id: str, batch_id: int) -> int | None:
        """Idempotent transactional append: a batch id at or below the
        last committed one for this app is a REPLAY (foreachBatch retry /
        checkpoint recovery) and commits nothing."""
        if batch_id <= self.last_txn(app_id):
            return None
        self._pending_meta = {"txn": {"app_id": app_id, "batch_id": batch_id}}
        try:
            return self.append(df)
        finally:
            self._pending_meta = {}


def stream_to_snapshot_table(
    stream_df, table: SnapshotTable, checkpoint_dir: str, app_id: str = "stream"
) -> None:
    """Exactly-once streaming sink: foreachBatch + transactional append.

    Spark's checkpoint gives at-least-once batch delivery; the table's
    (app_id, batch_id) txn record turns replays into no-ops — together
    that is the standard exactly-once sink recipe (same contract as
    Delta's ``txnAppId``/``txnVersion`` writer options).
    """

    def _write(batch_df, batch_id: int) -> None:
        table.append_txn(batch_df, app_id, batch_id)

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
