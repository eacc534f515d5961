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


class CommitConflict(Exception):
    """Another writer committed this version first — retry on latest."""


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

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    # -- write path --------------------------------------------------------

    def _stage(self, df: DataFrame) -> list[str]:
        """Write df's rows as immutable data files; return their names."""
        tmp = os.path.join(self.root, f"_staging_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
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
                    per_col[c] = [min(mins), max(maxs)]
            out[name] = per_col
        return out

    def _commit(self, files: list[str], schema_json: str, base_version: int) -> int:
        """Atomically publish ``files`` as version ``base_version + 1``.

        The exclusive manifest create is the commit point: it fails if a
        concurrent writer already claimed the version (→ CommitConflict,
        nothing published, staged files are unreferenced garbage for
        vacuum). The _LATEST pointer is advisory fast-path state and is
        written via rename AFTER the commit point.
        """
        version = base_version + 1
        manifest = {"version": version, "files": files, "schema": schema_json}
        if self._pending_meta:
            manifest.update(self._pending_meta)
            self._pending_meta = {}
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

    def append(self, df: DataFrame, stats_cols: list[str] | None = None) -> int:
        base = self.latest_version()
        prev_m = self._read_manifest(base) if base else {}
        prev = prev_m.get("files", [])
        staged = self._stage(df)
        if stats_cols:
            stats = dict(prev_m.get("stats", {}))
            stats.update(self._collect_stats(staged, stats_cols))
            self._pending_meta = {**self._pending_meta, "stats": stats}
        return self._commit(prev + staged, df.schema.json(), base)

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(self._stage(df), df.schema.json(), self.latest_version())

    # -- read path ---------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        where: tuple | None = None,
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
        files = m["files"]
        if where is not None:
            col, lo, hi = where
            stats = m.get("stats", {})

            def may_match(f: str) -> bool:
                rng = stats.get(f, {}).get(col)
                if rng is None:
                    return True  # no stats → cannot skip
                fmin, fmax = rng
                return not (fmax < lo or fmin > hi)

            files = [f for f in files if may_match(f)]
        paths = [os.path.join(self.data_dir, f) for f in files]
        if not paths:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType.fromJson(json.loads(m["schema"])))
        return spark.read.parquet(*paths)

    # -- maintenance -------------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop data files unreachable from the ``keep_last`` most recent
        manifests (older versions stop being time-travelable, exactly like
        Delta's VACUUM retention trade-off). Returns deleted file names."""
        latest = self.latest_version()
        keep_versions = range(max(1, latest - keep_last + 1), latest + 1)
        live = set()
        for v in keep_versions:
            live.update(self._read_manifest(v)["files"])
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
        kept_rows = (
            cur.filter(F.col("__file").isin(list(touched)))
            .drop("__file")
            .join(keys, key_cols, "left_anti")
        )
        staged = self._stage(kept_rows.unionByName(updates))
        return self._commit(untouched + staged, updates.schema.json(), base)


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
