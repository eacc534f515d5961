"""AutoETL pipeline — the reference's engine core re-expressed Spark-first
(reference R13–R19, R24, R25; ETL_PROJECT.py:129-302,326-368).

The reference runs ~7 eager pandas passes with per-row Python loops. This
engine instead runs a CONSTANT number of aggregation jobs (≤6, most
conditional on column types present) to gather the data-dependent facts —
logical types, null ratios, medians, modes, category frequencies, outlier
stats — then compiles everything into ONE fused Project + dropDuplicates
plan that Catalyst collapses into a single whole-stage-codegen'd pass over
the data. Imputation values, clamp bounds, and rare-value lists enter the
plan as literals (they are tiny), so the data plane never joins against
driver state.

Job structure (SURVEY.md §3/§4.3):

1. profile        — raw frame: types (plans/profile.py, HLL distincts —
                    the type rules never need exact counts) + total rows
2. fused stats    — ONE action over the cleaned base serving both former
                    jobs 2 and 3: the stacked category/speculative-mode
                    groupBy is the collected plan (full value counts for
                    every categorical column — rare merge + post-merge
                    categorical mode — plus windowed top-1 rows for every
                    bounded-cardinality non-numeric column, SPECULATED
                    because mode need isn't known until null counts land;
                    deterministic tie-break: highest count, then smallest
                    value — pandas ``mode()[0]`` parity; Spark's ``F.mode``
                    is tie-nondeterministic, SURVEY.md §7); the global
                    pre-stats aggregates (per-column null counts, text
                    mean lengths driving the conditional whitespace
                    collapse, numeric medians — exact interpolating,
                    pandas parity) ride the same scan as an ``observe``.
                    A rare dedicated mode job covers columns whose
                    cardinality exceeded the speculation bound.
3. outlier stats  — imputed numerics: mean, stddev_samp (= pandas ddof=1),
                    exact percentiles 0.05/0.95. Outlier COUNTS ride an
                    ``observe`` on the pre-dedup node (filled by the first
                    downstream action — the clamp itself is a no-op when a
                    column has no outliers, so the plan never needs the
                    count, only the report does); the same observation
                    carries the pre-dedup row count for the duplicate-
                    removed report line.
4. summary        — final frame (post-dedup), eager mode only; its single
                    agg action also materializes the observation.

So: ≤3 stats jobs eager, ≤2 lazy (``eager_summary=False``), + the
caller's terminal action. At 100 TB additionally switch ``exact_stats``
off — medians/percentiles go approximate (partial-aggregable, no exact
sort-based percentile state) — and the data plane is unchanged.

The persisted cleaned-base projection is tracked class-level: a new
``transform()`` releases the previous pipeline's cache, and ``release()``
frees it explicitly, so repeated runs never accumulate cached plans.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mini_etl_project_spark.functions.cleaning import (
    clean_categorical_base,
    clean_date,
    clean_numeric,
    clean_text,
)
from mini_etl_project_spark.plans.profile import (
    CATEGORICAL,
    DATE,
    NUMERIC,
    ColumnProfile,
    profile_frame_and_count,
)

_V = "__etl_value"
_C = "__etl_column"

#: Speculative-mode stack labels: ``<col>\x1fr`` = raw cleaned value,
#: ``<col>\x1fw`` = whitespace-collapsed variant (\x1f never appears in a
#: real column name).
_RAW_VARIANT = "\x1fr"
_WS_VARIANT = "\x1fw"


def _stacked(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """(column_name, value) pairs for a set of expressions — lets one
    groupBy job serve every column instead of a job per column."""
    pairs: list[Column] = []
    for name, expr in cols.items():
        pairs.append(F.lit(name))
        pairs.append(expr.cast("string"))
    n = len(cols)
    return df.select(F.stack(F.lit(n), *pairs).alias(_C, _V))


class AutoETLPipeline:
    """Automatic profile→clean→impute→clamp→dedup pipeline over a Spark
    DataFrame, with the reference's cleaning-report / data-summary
    metadata surface (ETL_PROJECT.py:11-14).
    """

    def __init__(
        self,
        compat: bool = True,
        missing_threshold: float = 0.8,
        outlier_z: float = 3.0,
        exact_stats: bool = True,
        eager_summary: bool = True,
        cache_intermediate: bool = True,
        assume_partitioned: bool = False,
        profile_sample_mod: int | None = None,
        dedup_digest: bool = False,
    ) -> None:
        self.compat = compat
        self.missing_threshold = missing_threshold
        self.outlier_z = outlier_z
        self.exact_stats = exact_stats
        self.eager_summary = eager_summary
        # SURVEY §4.3 approx-profile switch, OFF by default (None/<=1 =
        # exact full-scan profile, reference-parity). k >= 2: R7 type
        # detection runs over the deterministic row sample
        # pmod(xxhash64(all columns), k) == 0 (~1/k of rows —
        # content-keyed, partitioning-independent), and the parse layer
        # is then built ONLY for the columns whose detected type will
        # read it. Every DATA decision downstream stays exact: fill
        # values (median/mode), outlier scalars, null-ratio drops, and
        # the rare-category threshold all read full-scan jobs; only the
        # type decisions and the two profile-count report lines
        # ("invalid values: N", speculation bound) become
        # sample-extrapolated estimates. The 100x sweep measured the
        # full-scan regex profile at 136-213 s — this is the switch that
        # cuts it.
        self.profile_sample_mod = profile_sample_mod
        # The degenerate-partitioning probe (ensure_parallelism) physically
        # plans the input frame (~0.8 s of driver time on expression-heavy
        # projections). Callers whose input already went through
        # session.load_table — which widens degenerate scans itself — can
        # declare that and skip the re-probe.
        self.assume_partitioned = assume_partitioned
        # R17 dedup key strategy (VERDICT r10 ask #3). False (default):
        # plain dropDuplicates() — the exchange and both hash-agg levels
        # key on the full wide row. True: key on a 16-byte md5 digest of
        # the row instead, so partial/final agg hashing and equality
        # compare 16 bytes rather than every column. Survivor-set parity
        # is exact: to_json keeps field names (null patterns cannot
        # collide across columns) and numeric -0.0 is normalized to 0.0
        # before hashing to mirror dropDuplicates' float normalization.
        # Collision risk: md5 is 128-bit — P(any collision) at n rows is
        # ~n²/2^129; at 10^12 rows (beyond 100 TB of this data) that is
        # ~10^-15, far below any hardware-error floor. Measurement:
        # SCALE_VALIDATION.md round-11 "digest-dedup experiment".
        self.dedup_digest = dedup_digest
        # The stats jobs (2–5) all re-evaluate the raw scan + cleaning
        # expressions; persisting the input across them trades memory/disk
        # for repeated parse work. MEMORY_AND_DISK, so it degrades to
        # spill (not OOM) at scale; switch off for one-pass-budget runs.
        self.cache_intermediate = cache_intermediate
        self.column_types: dict[str, str] = {}
        self.cleaning_report: dict[str, list[str]] = {"global": []}
        self.data_summary: dict[str, Any] = {}
        self._cached_base: DataFrame | None = None
        self._observation = None
        self._obs_filled = False

    #: Sampled parse ratios within this distance of the 0.7 type
    #: threshold force the exact full-scan profile (see transform).
    _TYPE_RATIO_BAND = 0.05

    @classmethod
    def _sample_ratio_near_threshold(cls, profiles) -> bool:
        for p in profiles.values():
            if not p.non_null:
                continue
            for ok in (p.date_ok, p.numeric_ok):
                if abs(ok / p.non_null - 0.7) <= cls._TYPE_RATIO_BAND:
                    return True
        return False

    #: Columns with more profiled distincts than this are not speculated
    #: into the fused stats job (their value counts would dominate its
    #: shuffle); they get a dedicated mode job only if they truly need
    #: a mode fill. 100k (col,value) partial counts per column is noise
    #: at any scale.
    _SPECULATE_MAX_DISTINCT = 100_000

    # Cached cleaned-base projections live here so sequential pipelines
    # (bench loops, notebook re-runs) never accumulate cached plans: each
    # transform() releases every earlier pipeline's cache. Concurrent
    # pipelines on one session should set cache_intermediate=False.
    _LIVE_CACHES: list[DataFrame] = []

    def release(self) -> None:
        """Unpersist the cleaned-base cache (call after the terminal
        action on the returned frame; the plan stays valid — downstream
        actions simply recompute the cleaning pass)."""
        if self._cached_base is not None:
            self._cached_base.unpersist(blocking=False)
            if self._cached_base in AutoETLPipeline._LIVE_CACHES:
                AutoETLPipeline._LIVE_CACHES.remove(self._cached_base)
            self._cached_base = None

    # -- R1–R6 / R20–R24: E and L phases + the full pipeline ---------------

    def extract(self, spark, data_source) -> DataFrame:
        from mini_etl_project_spark.sources.readers import extract as _extract

        return _extract(spark, data_source)

    def load(self, df: DataFrame, output_path=None, db_connection=None) -> DataFrame:
        from mini_etl_project_spark.sources.writers import load as _load

        return _load(df, output_path, db_connection)

    def run_etl(
        self, spark, data_source, output_path=None, db_connection=None
    ) -> DataFrame:
        """E→T→L (reference R24, ETL_PROJECT.py:326-349)."""
        raw = self.extract(spark, data_source)
        cleaned = self.transform(raw)
        if output_path is not None or db_connection is not None:
            self.load(cleaned, output_path, db_connection)
        return cleaned

    # -- phase 2 of run_etl (R19) ------------------------------------------

    def transform(self, df: DataFrame) -> DataFrame:
        # Regex-heavy profiling/cleaning must not run single-threaded just
        # because the input is one parquet row group (no-op at scale).
        if not self.assume_partitioned:
            from mini_etl_project_spark.session import ensure_parallelism

            df = ensure_parallelism(df)
        self.column_types = {}
        self.cleaning_report = {"global": []}
        for c in df.columns:
            self.cleaning_report[c] = []
        self.data_summary = {}

        # Single-scan layout (round 5): the profile's expensive parse
        # expressions ARE the cleaners' values, so both read one persisted
        # wide projection — raw columns plus per-string-column parse
        # layers (__pd__ date chain / __pn__ numeric mirror / __nc__ full
        # numeric cleaner, the last speculative). The profile aggregation
        # doubles as the cache materializer; the cleaned base re-selects
        # parsed columns from cache. Net at scale: ONE scan of the source
        # instead of two, and the 16-format date chain runs once.
        from mini_etl_project_spark.plans.profile import (
            NC_PREFIX,
            PD_PREFIX,
            prepare_parse_frame,
            profile_frame_and_count,
            profile_prepared_and_count,
        )

        k = self.profile_sample_mod or 0
        sampled_profile = k > 1
        sample_rows = 0
        if sampled_profile:
            # Approx mode, job 1: profile a deterministic ~1/k row sample
            # of the RAW frame (content-keyed hash — independent of
            # partitioning, stable across runs). Type rules are ratio
            # thresholds, which the sample estimates without bias;
            # distinct counts only feed coarse bounds (<50 categorical,
            # speculation cap) and never overcount under sampling.
            sample = df.filter(
                F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(k))
                == 0
            )
            profiles, sample_rows = profile_frame_and_count(
                sample, exact_distinct=False
            )
            if sample_rows == 0:
                # degenerate tiny input: fall back to the exact profile
                sampled_profile = False
            elif self._sample_ratio_near_threshold(profiles):
                # Safety band (ADVICE r12): the R7 type rules compare
                # parse ratios against a strict 0.7 threshold. When a
                # sampled ratio lands inside ±0.05 of it, the sample
                # can no longer guarantee the same side as the full
                # scan — fall back to the exact profile so the type
                # decision (and thus the output schema) is
                # sample-independent by construction. Real data sits at
                # ~0.0/~1.0; the band only trips on adversarial mixes.
                sampled_profile = False
        if sampled_profile:
            types = {c: profiles[c].logical_type for c in df.columns}
            wide, parsed = prepare_parse_frame(
                df,
                compat=self.compat,
                date_cols={c for c, t in types.items() if t == DATE},
                numeric_cols={c for c, t in types.items() if t == NUMERIC},
            )
        else:
            wide, parsed = prepare_parse_frame(df, compat=self.compat)
        if self.cache_intermediate:
            from pyspark import StorageLevel

            # blocking=True: a lazily-evicted predecessor cache competes
            # for executor memory with THIS run's jobs — measured 5-15 s
            # run-to-run jitter at sf0.1 from the resulting GC churn;
            # blocking eviction holds a steady ~5 s. The wait itself is
            # block-drop bookkeeping, not I/O.
            for cached in AutoETLPipeline._LIVE_CACHES:
                cached.unpersist(blocking=True)
            AutoETLPipeline._LIVE_CACHES.clear()
            # Under a sampled profile the types are already known, so
            # nothing downstream ever reads the wide frame directly — the
            # cleaned base (one narrow column per input column) is the
            # only consumer. Persist THAT below instead of the wide
            # raw+parse-layer projection (guide §5: cache only what the
            # downstream jobs actually read — r13; the wide persist
            # carried every raw string twice and re-evaluated the text
            # cleaners on every downstream job). The exact-profile path
            # keeps the wide persist: the profile job must materialize
            # the parse layers before any type is known.
            if not sampled_profile:
                wide = wide.persist(StorageLevel.MEMORY_AND_DISK)
                AutoETLPipeline._LIVE_CACHES.append(wide)
                self._cached_base = wide

        if not sampled_profile:
            # Job 1: profile → logical types (+ total rows, same job); the
            # action also materializes the persisted wide frame.
            profiles, n_rows = profile_prepared_and_count(
                wide, df.columns, parsed
            )
        else:
            # exact row count arrives with the fused stats job below (the
            # sampled profile's count covers only ~1/k of the rows)
            n_rows = -1
        self.column_types = {c: profiles[c].logical_type for c in df.columns}
        for c in df.columns:
            self.cleaning_report[c].append(
                f"detected column type: {self.column_types[c]}"
            )

        # Cleaned-base expressions over the wide frame: date/numeric
        # columns read their precomputed parse layer; text/categorical
        # cleaners are cheap char scans (btrim/nullif/initcap) evaluated
        # per downstream read of the cache.
        pset = set(parsed)
        base_exprs: dict[str, Column] = {}
        for c in df.columns:
            t = self.column_types[c]
            if t == NUMERIC:
                base_exprs[c] = (
                    F.col(NC_PREFIX + c)
                    if c in pset
                    else clean_numeric(c, compat=self.compat)
                )
            elif t == DATE:
                base_exprs[c] = (
                    F.col(PD_PREFIX + c) if c in pset else clean_date(c)
                )
            elif t == CATEGORICAL:
                base_exprs[c] = clean_categorical_base(c)
            else:  # text and unknown both take the text cleaner (:255-256)
                base_exprs[c] = clean_text(c, collapse_whitespace=False)
        base_df = wide.select(*[expr.alias(c) for c, expr in base_exprs.items()])
        if self.cache_intermediate and sampled_profile:
            from pyspark import StorageLevel

            base_df = base_df.persist(StorageLevel.MEMORY_AND_DISK)
            AutoETLPipeline._LIVE_CACHES.append(base_df)
            self._cached_base = base_df
        base: dict[str, Column] = {c: F.col(c) for c in df.columns}

        # Jobs 2+3 FUSED into one action: the stacked category/mode groupBy
        # is the action; job 2's global aggregates (null counts, text mean
        # lengths, numeric medians) ride it as an ``observe`` on the same
        # scan — computed map-side on the rows already flowing into the
        # stack, so the cleaned base is traversed ONCE for both.
        #
        # Mode columns aren't knowable before the null counts arrive, so
        # they are SPECULATED: every non-numeric, non-categorical column
        # whose profiled cardinality is bounded contributes top-1 rows
        # (text columns in both raw and whitespace-collapsed variants —
        # the collapse decision needs job-2's lengths and is resolved
        # driver-side after the fact); unused results are discarded. The
        # cardinality bound keeps the speculation scale-safe: a 100 TB
        # high-distinct text column never ships its value counts unless it
        # actually needs a mode (rare; dedicated fallback job below).
        cat_cols = [c for c in df.columns if self.column_types[c] == CATEGORICAL]
        spec_date: list[str] = []
        spec_text: list[str] = []
        # Under a 1/k sampled profile, a high-cardinality column's sampled
        # distinct count is ~distinct/k (near-unique values mostly appear
        # once), so the speculation cap scales down with it.
        spec_bound = (
            max(1, self._SPECULATE_MAX_DISTINCT // k)
            if sampled_profile
            else self._SPECULATE_MAX_DISTINCT
        )
        # Sampled-profile gating (r12, guide §1.2 "don't compute things you
        # throw away"): a column's median/mode is READ only when the
        # cleaned column has nulls. Under a sampled profile the sample's
        # parse counts estimate that for numeric/date columns (cleaned
        # null ⇔ parse failure ∨ raw null): when every sampled row parsed,
        # skip the speculative median (an exact-percentile/approx-sketch
        # agg per numeric column — the single most expensive term of the
        # fused observe) and the date column's speculative mode rows. The
        # estimate gates SPECULATION only, never a data decision: if the
        # full-scan null counts later disagree, the existing leftover-mode
        # job covers dates and the dedicated median job below covers
        # numerics — same exact values, one extra (rare) job.
        est_clean_full: set[str] = set()
        if sampled_profile and sample_rows:
            for c in df.columns:
                t = self.column_types[c]
                ok = (
                    profiles[c].numeric_ok
                    if t == NUMERIC
                    else profiles[c].date_ok if t == DATE else -1
                )
                if ok == sample_rows:
                    est_clean_full.add(c)
        for c in df.columns:
            t = self.column_types[c]
            if t in (NUMERIC, CATEGORICAL):
                continue
            if profiles[c].distinct > spec_bound:
                continue
            if t == DATE and c in est_clean_full:
                continue
            (spec_date if t == DATE else spec_text).append(c)
        spec_outlier = {
            c
            for c in est_clean_full
            if self.column_types[c] == NUMERIC
        }
        (
            null_count,
            text_len,
            medians,
            cat_counts,
            spec_top1,
            rows_total,
            spec_out_stats,
        ) = self._fused_stats(
            base_df,
            base,
            profiles,
            cat_cols,
            spec_date,
            spec_text,
            skip_median=est_clean_full,
            spec_outlier=spec_outlier,
        )
        if sampled_profile:
            n_rows = rows_total  # exact, from the full-scan fused job

        # Finalize cleaning expressions (on top of the cleaned base:
        # whitespace collapse after trim/nullify ≡ the reference's order).
        cleaned = dict(base)
        collapsed: set[str] = set()
        for c in df.columns:
            t = self.column_types[c]
            if t in (NUMERIC, DATE, CATEGORICAL):
                continue
            if (text_len.get(c) or 0.0) > 20:  # conditional collapse (:88-89)
                cleaned[c] = F.regexp_replace(base[c], r"\s+", " ")
                collapsed.add(c)
            self.cleaning_report[c].append("cleaned text column")

        # Missing-value classification (R13–R15, :129-170); the report
        # lines are emitted further down in the reference's order.
        dropped: list[str] = []
        fills: dict[str, Any] = {}
        mode_needed: list[str] = []
        med_missing: list[str] = []
        for c in df.columns:
            ratio = (null_count[c] / n_rows) if n_rows else 0.0
            if ratio > self.missing_threshold:
                dropped.append(c)
            elif ratio > 0:
                if self.column_types[c] == NUMERIC:
                    if c in medians:
                        fills[c] = medians[c]
                    else:
                        med_missing.append(c)
                else:
                    mode_needed.append(c)
        if med_missing:
            # The sample estimated zero cleaned-nulls but the full scan
            # found some: compute the skipped medians exactly, one
            # dedicated agg (rare — only on a sample/full disagreement).
            row = base_df.agg(
                *[
                    (
                        F.median(c) if self.exact_stats
                        else F.percentile_approx(c, 0.5)
                    ).alias(f"{c}__med")
                    for c in med_missing
                ]
            ).collect()[0]
            for c in med_missing:
                fills[c] = row[f"{c}__med"]

        # Resolve speculated top-1 rows into the modes actually needed;
        # columns that dodged speculation (cardinality above the bound)
        # get the dedicated stacked job as before.
        top1: dict[str, str] = {}
        leftover: list[str] = []
        for c in mode_needed:
            if self.column_types[c] == CATEGORICAL:
                continue
            variant = (
                c
                if self.column_types[c] == DATE
                else c + (_WS_VARIANT if c in collapsed else _RAW_VARIANT)
            )
            if variant in spec_top1:
                top1[c] = spec_top1[variant]
            else:
                leftover.append(c)
        if leftover:
            _, extra = self._category_and_mode_stats(
                base_df, {}, {c: cleaned[c] for c in leftover}
            )
            top1.update(extra)

        # Rare-value merge (:114-124) over the collected counts.
        threshold = max(2, 0.01 * n_rows)  # :117
        merged_counts: dict[str, dict[str, int]] = {}
        for c in cat_cols:
            vals = cat_counts.get(c, [])
            expr = base[c]
            counts = {v: n for v, n in vals}
            if len(vals) < 50:  # "truly categorical" guard (:116)
                rare = sorted(v for v, n in vals if n < threshold)
                if rare:
                    expr = F.when(expr.isin(rare), "Other").otherwise(expr)
                    self.cleaning_report[c].append(
                        f"merged {len(rare)} rare values into 'Other'"
                    )
                    counts = {v: n for v, n in vals if n >= threshold}
                    counts["Other"] = sum(n for v, n in vals if n < threshold)
            cleaned[c] = expr
            merged_counts[c] = counts
        for c in cat_cols:
            self.cleaning_report[c].append("cleaned categorical column")

        # Per-type report lines that need job-2 numbers.
        for c in df.columns:
            t = self.column_types[c]
            if t == NUMERIC:
                if sampled_profile:
                    # raw-null count extrapolated from the 1/k sample —
                    # the one report number the approx profile estimates
                    orig_na = min(
                        null_count[c],
                        (sample_rows - profiles[c].non_null) * k,
                    )
                else:
                    orig_na = n_rows - profiles[c].non_null
                self.cleaning_report[c].append(
                    f"cleaned numeric column, invalid values: {null_count[c] - orig_na}"
                )
            elif t == DATE:
                self.cleaning_report[c].append(
                    f"converted {n_rows - null_count[c]} of {n_rows} values to dates"
                )

        # Missing-value report lines (reference order: per-column drop /
        # median lines, then the global drop line, then the mode fills).
        for c in df.columns:
            ratio = (null_count[c] / n_rows) if n_rows else 0.0
            if c in dropped:
                self.cleaning_report[c].append(
                    f"dropped column: {ratio:.1%} missing values"
                )
            elif c in fills and self.column_types[c] == NUMERIC:
                self.cleaning_report[c].append(
                    f"filled missing values with median: {fills[c]}"
                )
        if dropped:
            self.cleaning_report["global"].append(
                f"dropped columns: {', '.join(dropped)}"
            )
        kept = [c for c in df.columns if c not in dropped]

        # Mode fills: categorical modes from the POST-merge counts (the
        # reference imputes after cleaning, so 'Other' competes as a value;
        # tie → smallest value, pandas mode()[0] parity); everything else
        # from the windowed top-1.
        for c in mode_needed:
            if self.column_types[c] == CATEGORICAL:
                counts = merged_counts.get(c) or {}
                v = (
                    min(counts, key=lambda k: (-counts[k], k))
                    if counts
                    else "Unknown"
                )
            else:
                v = top1.get(c, "Unknown")
            fills[c] = v
            label = "mode" if self.column_types[c] == CATEGORICAL else "value"
            self.cleaning_report[c].append(
                f"filled missing values with {label}: {v}"
            )

        imputed: dict[str, Column] = {}
        for c in kept:
            expr = cleaned[c]
            if c in fills:
                if self.column_types[c] == DATE:
                    expr = F.coalesce(expr, F.lit(str(fills[c])).cast("date"))
                else:
                    expr = F.coalesce(expr, F.lit(fills[c]))
            imputed[c] = expr

        # Job 5 + clamp plan: outliers on imputed numerics (R16, :172-201).
        # The clamp is gated per ROW (z > threshold), so applying it to a
        # column with zero outliers is the identity — the plan never needs
        # the outlier COUNT, only the report does. The counts therefore
        # ride the pre-dedup observation (below) instead of a second agg.
        obs_metrics: list[Column] = [F.count(F.lit(1)).alias("__rows_pre")]
        num_cols = [c for c in kept if self.column_types[c] == NUMERIC]
        if num_cols:
            # Use the ridden outlier scalars where the speculation held —
            # the full scan confirmed zero cleaned-nulls, so the imputed
            # expression equals the base column the ride aggregated.
            # Everything else (a fill happened, or the column wasn't
            # ridden) takes the dedicated exact job as before.
            stats = {}
            out_leftover = []
            for c in num_cols:
                if (
                    c in spec_out_stats
                    and null_count[c] == 0
                    and c not in fills
                ):
                    stats[c] = spec_out_stats[c]
                else:
                    out_leftover.append(c)
            if out_leftover:
                stats.update(
                    self._outlier_stats(
                        base_df, {c: imputed[c] for c in out_leftover}
                    )
                )
            for c in num_cols:
                mu, sigma, q05, q95 = stats[c]
                if sigma and q05 is not None:
                    z = F.abs((imputed[c] - F.lit(mu)) / F.lit(sigma))
                    clamped = F.least(
                        F.greatest(imputed[c], F.lit(q05)), F.lit(q95)
                    )
                    imputed[c] = F.when(z > self.outlier_z, clamped).otherwise(
                        imputed[c]
                    )
                    obs_metrics.append(
                        F.sum((z > self.outlier_z).cast("long")).alias(
                            f"{c}__n_out"
                        )
                    )

        # Fused final plan: one Project + distinct (R17, :264-272), with an
        # observation (row + outlier counts, filled for free by the first
        # downstream action). The observe node sits BELOW the projection —
        # its z-score metrics reference the UNclamped imputed expressions,
        # which only resolve against base_df's columns.
        from pyspark.sql import Observation

        self._observation = Observation()
        self._obs_filled = False
        observed = base_df.observe(self._observation, *obs_metrics)
        projected = observed.select(*[imputed[c].alias(c) for c in kept])
        self._pre_dedup = projected
        if self.dedup_digest:
            # Dedup on a 16-byte row digest instead of the wide row (see
            # __init__). -0.0 → 0.0 on numerics mirrors dropDuplicates'
            # float normalization; NaN renders stably as "NaN" in
            # to_json, and null fields are dropped WITH their names, so
            # the encoding stays injective per schema.
            fields = []
            for c in kept:
                col = F.col(c)
                if self.column_types[c] == NUMERIC:
                    col = F.when(col == 0.0, F.lit(0.0)).otherwise(col)
                fields.append(col.alias(c))
            digest = F.unhex(F.md5(F.to_json(F.struct(*fields))))
            result = (
                projected.withColumn("__row_digest", digest)
                .dropDuplicates(["__row_digest"])
                .drop("__row_digest")
            )
        else:
            result = projected.dropDuplicates()

        if self.eager_summary:
            self.create_data_summary(result)  # job 6; also fills the observation
        return result

    def _fill_observed_report(self, n_after: int | None = None) -> None:
        """Fold the pre-dedup observation (filled by the first action on
        the result frame) into the cleaning report. Blocks if no action has
        run yet — callers ensure one has."""
        if self._obs_filled or self._observation is None:
            return
        got = self._observation.get
        self._obs_filled = True
        for key, v in got.items():
            if key.endswith("__n_out") and v:
                self.cleaning_report[key[: -len("__n_out")]].append(
                    f"clamped {v} outlier values"
                )
        if n_after is not None:
            removed = got["__rows_pre"] - n_after
            if removed > 0:
                self.cleaning_report["global"].append(
                    f"removed {removed} duplicate rows"
                )

    # -- helpers (one job each) --------------------------------------------

    def _profile_with_count(
        self, df: DataFrame
    ) -> tuple[dict[str, ColumnProfile], int]:
        # HLL distincts always: the type rules compare the distinct count
        # against coarse thresholds (50 / 30 % ratio), where HLL's ~2 %
        # error is immaterial — and the exact path costs a whole extra
        # expression-free job (multi-column COUNT(DISTINCT) → Expand).
        return profile_frame_and_count(df, exact_distinct=False)

    def _pre_stats_aggs(
        self,
        base: dict[str, Column],
        profiles: dict[str, ColumnProfile],
        skip_median: set[str] | None = None,
        spec_outlier: set[str] | None = None,
    ) -> list[Column]:
        # exact row count rides for free; it replaces the profile job's
        # count when the profile ran on a sample
        aggs: list[Column] = [F.count(F.lit(1)).alias("__rows_total")]
        for c, expr in base.items():
            aggs.append(F.sum(expr.isNull().cast("long")).alias(f"{c}__null"))
            t = profiles[c].logical_type
            if t not in (NUMERIC, DATE, CATEGORICAL):
                aggs.append(F.avg(F.length(expr)).alias(f"{c}__len"))
            if t == NUMERIC and c not in (skip_median or ()):
                if self.exact_stats:
                    aggs.append(F.median(expr).alias(f"{c}__med"))
                else:
                    aggs.append(
                        F.percentile_approx(expr, 0.5).alias(f"{c}__med")
                    )
            if c in (spec_outlier or ()):
                # Speculative outlier-stat ride (r13, guide §1.2 "don't
                # run a whole job for what an existing scan can carry"):
                # when the sampled profile estimates a numeric column
                # fully clean, its imputed expression IS the cleaned base
                # column (no median fill), so the outlier scalars can
                # ride this same traversal. The full-scan null count
                # validates the speculation; any disagreement falls back
                # to the dedicated exact job (same values, one extra
                # rare job — identical to the median-gating contract).
                qs = F.array(F.lit(0.05), F.lit(0.95))
                quant = (
                    F.percentile(expr, qs)
                    if self.exact_stats
                    else F.percentile_approx(expr, qs)
                )
                aggs += [
                    F.avg(expr).alias(f"{c}__omu"),
                    F.stddev_samp(expr).alias(f"{c}__osd"),
                    quant.alias(f"{c}__oq"),
                ]
        return aggs

    @staticmethod
    def _split_pre_stats(
        row, base: dict[str, Column]
    ) -> tuple[dict[str, int], dict[str, float], dict[str, float], int]:
        d = dict(row) if isinstance(row, dict) else row.asDict()
        null_count = {c: d[f"{c}__null"] for c in base}
        text_len = {c: d[f"{c}__len"] for c in base if f"{c}__len" in d}
        medians = {c: d[f"{c}__med"] for c in base if f"{c}__med" in d}
        return null_count, text_len, medians, d["__rows_total"]

    def _fused_stats(
        self,
        df: DataFrame,
        base: dict[str, Column],
        profiles: dict[str, ColumnProfile],
        cat_cols: list[str],
        spec_date: list[str],
        spec_text: list[str],
        skip_median: set[str] | None = None,
        spec_outlier: set[str] | None = None,
    ) -> tuple[
        dict[str, int],
        dict[str, float],
        dict[str, float],
        dict[str, list[tuple[str, int]]],
        dict[str, str],
        int,
        dict[str, tuple],
    ]:
        """Jobs 2+3 as ONE action: the stacked category/speculative-mode
        groupBy is the collected plan; the global pre-stats aggregates
        (null counts, text lengths, medians) ride an ``observe`` below the
        stack — both are computed in the same traversal of the cleaned
        base. Returns (null_count, text_len, medians, cat_counts,
        spec_top1, rows_total, spec_out_stats) where ``spec_top1`` is
        keyed by stack label (column name, with the raw/ws variant suffix
        for text columns), ``rows_total`` is the exact row count, and
        ``spec_out_stats`` maps each ``spec_outlier`` column to its ridden
        (mean, stddev, q05, q95) scalars."""
        aggs = self._pre_stats_aggs(base, profiles, skip_median, spec_outlier)

        def out_stats(d: dict) -> dict[str, tuple]:
            out: dict[str, tuple] = {}
            for c in spec_outlier or ():
                q = d.get(f"{c}__oq")
                out[c] = (
                    d.get(f"{c}__omu"),
                    d.get(f"{c}__osd"),
                    q[0] if q else None,
                    q[1] if q else None,
                )
            return out

        stacked_cols: dict[str, Column] = {c: base[c] for c in cat_cols}
        for c in spec_date:
            stacked_cols[c] = base[c]
        for c in spec_text:
            stacked_cols[c + _RAW_VARIANT] = base[c]
            stacked_cols[c + _WS_VARIANT] = F.regexp_replace(
                base[c], r"\s+", " "
            )
        if not stacked_cols:
            row = df.agg(*aggs).collect()[0]
            null_count, text_len, medians, rows_total = self._split_pre_stats(
                row, base
            )
            return (
                null_count,
                text_len,
                medians,
                {},
                {},
                rows_total,
                out_stats(row.asDict()),
            )

        from pyspark.sql import Observation

        obs = Observation()
        observed = df.observe(obs, *aggs)
        w = Window.partitionBy(_C).orderBy(F.desc("count"), F.asc(_V))
        grouped = (
            _stacked(observed, stacked_cols)
            .filter(F.col(_V).isNotNull())
            .groupBy(_C, _V)
            .count()
            .withColumn("__rn", F.row_number().over(w))
        )
        keep = F.col("__rn") == 1
        if cat_cols:
            keep = keep | F.col(_C).isin(cat_cols)
        rows = grouped.filter(keep).collect()
        null_count, text_len, medians, rows_total = self._split_pre_stats(
            obs.get, base
        )
        by_col: dict[str, list[tuple[str, int]]] = {c: [] for c in cat_cols}
        spec_top1: dict[str, str] = {}
        for r in rows:
            if r[_C] in by_col:
                by_col[r[_C]].append((r[_V], r["count"]))
            if r["__rn"] == 1 and r[_C] not in by_col:
                spec_top1[r[_C]] = r[_V]
        return (
            null_count,
            text_len,
            medians,
            by_col,
            spec_top1,
            rows_total,
            out_stats(obs.get),
        )

    def _category_and_mode_stats(
        self,
        df: DataFrame,
        cat_base: dict[str, Column],
        mode_cols: dict[str, Column],
    ) -> tuple[dict[str, list[tuple[str, int]]], dict[str, str]]:
        """One stacked groupBy job serving the rare-value merge AND the
        mode fills: every (value, count) row for categorical columns
        (bounded — the profiler types a column categorical only under ~50
        distincts), top-1-by-(count desc, value asc) rows for the rest
        (high-cardinality text/date columns never ship their full counts
        to the driver). Returns ({cat_col: [(value, count), ...]},
        {mode_col: top_value})."""
        if not cat_base and not mode_cols:
            return {}, {}
        stacked_cols = {**cat_base, **mode_cols}
        counted = (
            _stacked(df, stacked_cols)
            .filter(F.col(_V).isNotNull())
            .groupBy(_C, _V)
            .count()
        )
        if not cat_base:
            # Mode-only call (the dedicated fallback job for columns whose
            # cardinality dodged speculation — by construction HIGH-distinct
            # columns): top-1-by-(count desc, value asc) as an AGGREGATE,
            # `min(struct(-count, value))`, which compares fields
            # lexicographically and so selects exactly the window's rn=1
            # row. The window form sorted every (value, count) row of a
            # label inside ONE partition (partitionBy label — a 400k-row
            # single-task sort for a 600k-row text column at sf0.1,
            # measured ~1.9 s); the agg form is partial-aggregable
            # map-side and never materializes a per-label sort (guide
            # §2.3 "aggregate before you shuffle").
            rows = (
                counted.groupBy(_C)
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("count")).alias("nc"), F.col(_V).alias("v")
                        )
                    ).alias("b")
                )
                .select(
                    _C,
                    F.col("b.v").alias(_V),
                    (-F.col("b.nc")).alias("count"),
                    F.lit(1).alias("__rn"),
                )
                .collect()
            )
        else:
            w = Window.partitionBy(_C).orderBy(F.desc("count"), F.asc(_V))
            grouped = counted.withColumn("__rn", F.row_number().over(w))
            keep = F.col("__rn") == 1
            if cat_base:
                keep = keep | F.col(_C).isin(list(cat_base))
            rows = grouped.filter(keep).collect()
        by_col: dict[str, list[tuple[str, int]]] = {c: [] for c in cat_base}
        top1: dict[str, str] = {}
        for r in rows:
            if r[_C] in by_col:
                by_col[r[_C]].append((r[_V], r["count"]))
            if r["__rn"] == 1 and r[_C] in mode_cols:
                top1[r[_C]] = r[_V]
        return by_col, top1

    def _outlier_stats(
        self, df: DataFrame, cols: dict[str, Column]
    ) -> dict[str, tuple]:
        pq = "percentile" if self.exact_stats else "approx_percentile"
        named = df.select(
            *[expr.alias(f"__etl_{c}") for c, expr in cols.items()]
        )
        aggs: list[Column] = []
        for c in cols:
            col = F.col(f"__etl_{c}")
            aggs += [
                F.avg(col).alias(f"{c}__mu"),
                F.stddev_samp(col).alias(f"{c}__sd"),
                F.expr(f"{pq}(`__etl_{c}`, array(0.05, 0.95))").alias(f"{c}__q"),
            ]
        row = named.agg(*aggs).collect()[0]
        out = {}
        for c in cols:
            q = row[f"{c}__q"]
            out[c] = (
                row[f"{c}__mu"],
                row[f"{c}__sd"],
                q[0] if q else None,
                q[1] if q else None,
            )
        return out

    # -- R18 ---------------------------------------------------------------

    def create_data_summary(self, df: DataFrame) -> dict[str, Any]:
        """Single wide aggregation (reference: one pandas pass per stat).

        The agg action also materializes the pre-dedup observation, which
        supplies the duplicate-removed and outlier-clamped report counts —
        no separate ``count()`` job.
        """
        aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
        for c in df.columns:
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__na"))
            t = self.column_types.get(c)
            if t == NUMERIC:
                aggs += [
                    F.avg(c).alias(f"{c}__mean"),
                    F.stddev_samp(c).alias(f"{c}__std"),
                    F.min(c).alias(f"{c}__min"),
                    F.max(c).alias(f"{c}__max"),
                ]
            elif t == DATE:
                aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
        row = df.agg(*aggs).collect()[0]
        n_after = row["__rows"]
        self._fill_observed_report(n_after=n_after)
        self.data_summary = {
            "total_rows": n_after,
            "total_columns": len(df.columns),
            "column_types": dict(self.column_types),
            "missing_values": {c: row[f"{c}__na"] for c in df.columns},
            "numeric_columns": {
                c: {
                    "mean": row[f"{c}__mean"],
                    "std": row[f"{c}__std"],
                    "min": row[f"{c}__min"],
                    "max": row[f"{c}__max"],
                }
                for c in df.columns
                if self.column_types.get(c) == NUMERIC
            },
            "date_columns": {
                c: {"min": row[f"{c}__min"], "max": row[f"{c}__max"]}
                for c in df.columns
                if self.column_types.get(c) == DATE
            },
        }
        return self.data_summary

    # -- R25 ---------------------------------------------------------------

    def generate_report(self) -> str:
        lines = ["=" * 50, "Data Cleaning Report", "=" * 50, ""]
        for col, notes in self.cleaning_report.items():
            if col == "global" or not notes:
                continue
            lines.append(f"column: {col}")
            lines += [f"  - {n}" for n in notes]
            lines.append("")
        if self.cleaning_report.get("global"):
            lines.append("global operations:")
            lines += [f"  - {n}" for n in self.cleaning_report["global"]]
            lines.append("")
        if self.data_summary:
            s = self.data_summary
            lines += [
                "summary:",
                f"  rows: {s['total_rows']}",
                f"  columns: {s['total_columns']}",
            ]
            for c, st in s.get("numeric_columns", {}).items():
                lines.append(
                    f"  {c}: mean={st['mean']}, std={st['std']}, "
                    f"min={st['min']}, max={st['max']}"
                )
            for c, st in s.get("date_columns", {}).items():
                lines.append(f"  {c}: min={st['min']}, max={st['max']}")
        return "\n".join(lines)
