"""Versioned parquet table: a minimal lakehouse-style commit log that
makes CDC upserts atomic, restartable and time-travelable on plain
parquet — no Delta/Iceberg dependency.

The reference's only at-rest state management is a JSON manifest with
skip-if-exists (`scripts/download_tlc_range_s3.py:127-139`); a pipeline
engine needs crash-safe table mutation. This module applies the same
commit-log idea Delta Lake uses, reduced to what plain parquet + an
atomic file create can guarantee:

Layout::

    <root>/data/<ulid>/part-*.parquet   immutable data directories
    <root>/_log/<version 20d>.json      ordered commit records

Protocol:
  * A writer first materializes a NEW data directory (never mutating
    an existing one), then publishes a commit record naming the active
    directory set. Publication is an ATOMIC CREATE (write temp +
    ``os.link`` — link fails if the version already exists), so:
      - readers only ever see fully-written data (a crash between data
        write and publish leaves an invisible orphan directory);
      - two writers racing to the same version conflict loudly
        (optimistic concurrency) instead of corrupting the log.
  * A reader replays the log: the LATEST record lists the complete
    active set (snapshot isolation without tombstone arithmetic), so
    reads are one listdir + one json load, O(1) in history length.
  * ``vacuum()`` deletes data directories no commit references —
    exactly the orphans crashes leave behind.

Scale posture: the log is tiny metadata (one small JSON per commit —
fine on any DFS); data stays ordinary parquet readable by any engine.
The upsert here rewrites the table (full-recompute merge through ONE
shuffle, operators/merge.py); at 100 TB you partition the table and
rewrite only the partitions the update batch touches (dynamic
partition overwrite) — the commit-log protocol is unchanged, only the
"replaced" set shrinks.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_upsert

__all__ = ["VersionedTable"]

_LOG_DIR = "_log"
_DATA_DIR = "data"


class VersionedTable:
    """Handle to a versioned parquet table rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, _LOG_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)

    # -- log plumbing ------------------------------------------------------

    def _log_path(self, version: int) -> str:
        return os.path.join(self.root, _LOG_DIR, f"{version:020d}.json")

    def versions(self) -> list[int]:
        names = os.listdir(os.path.join(self.root, _LOG_DIR))
        return sorted(int(n[:-5]) for n in names if n.endswith(".json"))

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _read_commit(self, version: int) -> dict:
        with open(self._log_path(version)) as f:
            return json.load(f)

    def _publish(self, version: int, record: dict) -> None:
        """Atomically create the commit record for ``version``.

        ``os.link`` of a fully-written temp file is an atomic
        create-if-absent: a concurrent writer publishing the same
        version gets EEXIST (surfaced as a conflict) and neither log
        entry is ever observed half-written. Every record carries a
        ``committed_at`` wall timestamp for AS-OF time travel.
        """
        import time as _time

        record.setdefault("committed_at", _time.time())
        tmp = self._log_path(version) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(record, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._log_path(version))
        except FileExistsError as exc:
            raise RuntimeError(
                f"commit conflict: version {version} of {self.root} was "
                "published concurrently; re-read and retry"
            ) from exc
        finally:
            os.unlink(tmp)

    # -- data plumbing -----------------------------------------------------

    def _write_data_dir(self, df: DataFrame) -> str:
        """Materialize ``df`` into a fresh immutable data directory and
        return its table-relative path. Crash after this, before
        publish ⇒ an orphan no reader sees (vacuum reclaims it)."""
        rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        df.write.mode("error").parquet(os.path.join(self.root, rel))
        return rel

    def _active_dirs(self, version: int) -> list[str]:
        return list(self._read_commit(version)["active"])

    # -- data-skipping statistics -----------------------------------------

    def _scan_stats(self, rel_dir: str) -> dict[str, dict]:
        """Per-file min/max column stats for a data directory, read
        from the parquet FOOTERS pyarrow exposes — exact bounds the
        writer already computed, no extra data pass. Only JSON-safe
        primitive types (int/float/str/bool) are recorded; a column a
        row group lacks stats for is dropped from that file's entry
        (pruning stays conservative)."""
        import pyarrow.parquet as pq

        stats: dict[str, dict] = {}
        absdir = os.path.join(self.root, rel_dir)
        for name in sorted(os.listdir(absdir)):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(absdir, name)).metadata
            cols: dict[str, list] = {}
            dropped: set[str] = set()
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    col = c.path_in_schema
                    if "." in col or col in dropped:
                        continue  # nested leaves aren't prunable here
                    st = c.statistics
                    if (
                        st is None
                        or not st.has_min_max
                        or not isinstance(st.min, (int, float, str, bool))
                        or (isinstance(st.min, float) and st.min != st.min)
                        or (isinstance(st.max, float) and st.max != st.max)
                    ):  # missing / non-primitive / NaN bounds: unusable
                        dropped.add(col)
                        cols.pop(col, None)
                        continue
                    if col in cols:
                        cols[col][0] = min(cols[col][0], st.min)
                        cols[col][1] = max(cols[col][1], st.max)
                    else:
                        cols[col] = [st.min, st.max]
            stats[os.path.join(rel_dir, name)] = {
                "rows": md.num_rows,
                "cols": cols,
            }
        return stats

    def _carry_stats(
        self, prior: dict, dirs: Sequence[str]
    ) -> dict[str, dict]:
        """Stats entries of a prior commit restricted to carried
        directories (older commits without stats carry nothing — their
        files are simply never pruned)."""
        keep = tuple(d + os.sep for d in dirs)
        return {
            f: s
            for f, s in (prior.get("file_stats") or {}).items()
            if f.startswith(keep)
        }

    def prune_plan(
        self,
        where: dict[str, tuple],
        version: int | None = None,
    ) -> tuple[list[str], list[str]]:
        """Partition the snapshot's files into (kept, skipped) for a
        conjunction of closed ranges ``{col: (lo, hi)}`` (``None`` =
        unbounded side; equality = ``(v, v)``) using ONLY commit
        metadata. Files without recorded stats for a constrained
        column are always kept (conservative)."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"versioned table {self.root} is empty")
        rec = self._read_commit(v)
        fstats = rec.get("file_stats") or {}
        kept, skipped = [], []
        for rel_dir in rec["active"]:
            absdir = os.path.join(self.root, rel_dir)
            for name in sorted(os.listdir(absdir)):
                if not name.endswith(".parquet"):
                    continue
                rel_f = os.path.join(rel_dir, name)
                cols = (fstats.get(rel_f) or {}).get("cols") or {}
                drop = False
                for col, (lo, hi) in where.items():
                    if col not in cols:
                        continue
                    mn, mx = cols[col]
                    if (hi is not None and mn > hi) or (
                        lo is not None and mx < lo
                    ):
                        drop = True
                        break
                (skipped if drop else kept).append(rel_f)
        return kept, skipped

    def read_where(
        self,
        where: dict[str, tuple],
        version: int | None = None,
    ) -> DataFrame:
        """Snapshot read with FILE-LEVEL DATA SKIPPING: files whose
        footer min/max bounds cannot intersect the ``where`` ranges are
        never handed to Spark (no open, no footer read, no task), and
        the residual range filter is applied to the survivors so the
        result equals ``read().filter(...)`` exactly.

        This is the lakehouse data-skipping pattern (Delta/Iceberg
        manifest pruning) on the commit-log protocol: at 100 TB the
        win is proportional to how well the layout clusters the
        constrained column — pair with :meth:`compact` after a
        range-partitioned write for sorted layouts."""
        kept, _ = self.prune_plan(where, version)
        cond = F.lit(True)
        for col, (lo, hi) in where.items():
            if lo is not None:
                cond = cond & (F.col(col) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(col) <= F.lit(hi))
        if not kept:
            return self.read(version).limit(0).filter(cond)
        return self.spark.read.parquet(
            *[os.path.join(self.root, f) for f in kept]
        ).filter(cond)

    # -- public API --------------------------------------------------------

    @staticmethod
    def _schema_of(df: DataFrame) -> list[list[str]]:
        return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]

    def write(self, df: DataFrame, operation: str = "overwrite") -> int:
        """Publish ``df`` as the complete new table state (init /
        overwrite). Returns the committed version."""
        rel = self._write_data_dir(df)
        latest = self.latest_version()
        version = 0 if latest is None else latest + 1
        self._publish(version, {"version": version, "operation": operation,
                                "active": [rel],
                                "schema": self._schema_of(df),
                                "file_stats": self._scan_stats(rel)})
        return version

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read (latest, or time-travel to ``version``).

        Commits whose history evolved the schema (see :meth:`append`)
        read with ``mergeSchema`` — files predating a column surface
        NULLs for it — and project the RECORDED column order, so the
        caller-visible schema is stable regardless of which file the
        scan starts footers from. Unevolved tables skip the mergeSchema
        footer pass entirely."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"versioned table {self.root} is empty")
        rec = self._read_commit(v)
        paths = [os.path.join(self.root, d) for d in rec["active"]]
        if not rec.get("schema_evolved"):
            return self.spark.read.parquet(*paths)
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        return df.select(*[name for name, _ in rec["schema"]])

    def append(self, df: DataFrame, merge_schema: bool = False) -> int:
        """Publish ``df`` as ADDITIONAL rows (insert-only fast path):
        the new commit's active set = the previous set + one fresh
        directory, so nothing is rewritten — the right shape for
        streaming/batch ingest where updates never touch old rows.
        Accumulated small directories are merged back to one by
        :meth:`compact`.

        ``merge_schema=True`` lets the batch EVOLVE the table schema:
        new columns are appended to the recorded schema (old files
        surface NULLs on read); columns shared with the table must keep
        their type, and a mismatch raises instead of corrupting the
        table — the Delta-style additive evolution contract. Without
        the flag, any schema drift raises."""
        latest = self.latest_version()
        prior_rec = {} if latest is None else self._read_commit(latest)
        prior_schema = prior_rec.get("schema")
        new_schema = self._schema_of(df)
        evolved = bool(prior_rec.get("schema_evolved"))
        if prior_schema is not None:
            prior_types = dict(map(tuple, prior_schema))
            new_types = dict(map(tuple, new_schema))
            clash = {
                n
                for n in prior_types.keys() & new_types.keys()
                if prior_types[n] != new_types[n]
            }
            if clash:
                raise ValueError(
                    f"append would change column type(s) {sorted(clash)}; "
                    "schema evolution is additive-only"
                )
            # column ORDER is not drift (parquet resolves by name);
            # only the column SET matters
            drift = prior_types.keys() != new_types.keys()
            if drift and not merge_schema:
                raise ValueError(
                    "append batch schema differs from the table schema; "
                    "pass merge_schema=True for additive evolution"
                )
            merged_schema = list(map(list, prior_schema)) + [
                [n, t] for n, t in new_schema if n not in prior_types
            ]
            merged_names = {n for n, _ in merged_schema}
            # evolved ⇔ some active file lacks a merged column: either
            # the batch ADDED columns (old files lack them) or the
            # batch OMITS table columns (its new files lack those)
            evolved = (
                evolved
                or bool(merged_names - prior_types.keys())
                or bool(merged_names - new_types.keys())
            )
        else:
            merged_schema = new_schema
        rel = self._write_data_dir(df)
        prior = list(prior_rec.get("active", []))
        version = 0 if latest is None else latest + 1
        stats = self._carry_stats(prior_rec, prior)
        stats.update(self._scan_stats(rel))
        self._publish(
            version,
            {"version": version, "operation": "append",
             "active": prior + [rel], "schema": merged_schema,
             "schema_evolved": evolved, "file_stats": stats},
        )
        return version

    def compact(
        self,
        target_files: int | None = None,
        cluster_by: Sequence[str] | None = None,
        zorder_bits: int = 8,
    ) -> int:
        """Rewrite the current snapshot as ONE data directory (with
        ``target_files`` parquet files when given) and commit it as
        the next version — the standard maintenance op after a run of
        appends has accumulated directories/small files. Old versions
        still time-travel to the original directories until
        ``vacuum_versions``-style retention (not implemented — vacuum
        here only removes unreferenced orphans) lets them go.

        Coalesce (narrow, no shuffle) when shrinking the file count;
        repartition only when growing it.

        ``cluster_by`` lays the rewrite out along the Morton curve of
        the given columns (``functions/zorder.py``) so that
        :meth:`read_where` footer pruning works on EVERY clustered
        column at once — the ``OPTIMIZE ZORDER BY`` maintenance op of
        the lakehouse formats, at the cost of one range shuffle."""
        base_version = self.latest_version()
        if base_version is None:
            raise FileNotFoundError(f"versioned table {self.root} is empty")
        snap = self.read(base_version)
        if cluster_by:
            from ..functions.zorder import zorder_layout

            n = target_files or len(snap.inputFiles()) or 1
            snap = zorder_layout(snap, cluster_by, n, zorder_bits)
        elif target_files is not None:
            n_now = len(snap.inputFiles()) or 1
            snap = (
                snap.coalesce(target_files)
                if target_files <= n_now
                else snap.repartition(target_files)
            )
        rel = self._write_data_dir(snap)
        record = {
            "version": base_version + 1,
            "operation": "compact",
            "base_version": base_version,
            "active": [rel],
            "file_stats": self._scan_stats(rel),
        }
        if cluster_by:
            record["clustered_by"] = list(cluster_by)
        self._publish(base_version + 1, record)
        return base_version + 1

    def upsert(
        self,
        updates: DataFrame,
        keys: Sequence[str],
        version_col: str | None = None,
    ) -> int:
        """Keep-latest merge of ``updates`` into the current snapshot,
        committed atomically as the next version (restartable: a crash
        anywhere before publish leaves the previous version intact and
        the merge can simply be re-run)."""
        base_version = self.latest_version()
        if base_version is None:
            return self.write(updates, operation="upsert")
        merged = merge_upsert(self.read(base_version), updates, keys, version_col)
        rel = self._write_data_dir(merged)
        self._publish(
            base_version + 1,
            {
                "version": base_version + 1,
                "operation": "upsert",
                "keys": list(keys),
                "base_version": base_version,
                "active": [rel],
                "file_stats": self._scan_stats(rel),
            },
        )
        return base_version + 1

    # -- partition-scoped mutation (the 100 TB path) -----------------------

    def write_partitioned(
        self, df: DataFrame, partition_col: str
    ) -> int:
        """Initial/overwrite publish with PARTITION TRACKING: one data
        directory per distinct ``partition_col`` value, and the commit
        records which directory holds which partition — the metadata
        that lets :meth:`upsert_partitioned` rewrite only touched
        partitions and :meth:`read` prune untouched ones.

        The partition column stays IN the parquet files (directories
        are tracked in the log, not encoded in paths), so snapshots
        read with plain ``spark.read.parquet`` and no basePath tricks.
        The per-partition write loop is a driver loop bounded by the
        partition count of the BATCH (months/days — metadata scale);
        ``df`` is persisted across the loop so the upstream plan runs
        once, not once per partition."""
        df = df.persist()
        try:
            values = sorted(
                str(r[0])
                for r in df.select(partition_col).distinct().collect()
            )
            dirs, parts = [], {}
            for v in values:
                rel = self._write_data_dir(
                    df.filter(F.col(partition_col).cast("string") == v)
                )
                dirs.append(rel)
                parts[rel] = v
            latest = self.latest_version()
            version = 0 if latest is None else latest + 1
            self._publish(
                version,
                {
                    "version": version,
                    "operation": "write_partitioned",
                    "partition_col": partition_col,
                    "active": dirs,
                    "partitions": parts,
                    "file_stats": {
                        f: s
                        for d in dirs
                        for f, s in self._scan_stats(d).items()
                    },
                },
            )
            return version
        finally:
            df.unpersist()

    def upsert_partitioned(
        self,
        updates: DataFrame,
        keys: Sequence[str],
        partition_col: str,
        version_col: str | None = None,
    ) -> int:
        """Keep-latest merge that rewrites ONLY the partitions the
        update batch touches; every other partition's directory is
        carried into the new commit BY REFERENCE (no data movement) —
        dynamic-partition-overwrite semantics on the commit-log
        protocol, which is how the full-rewrite :meth:`upsert` scales
        to 100 TB. Update keys must not move rows across partitions
        (the standard constraint; enforce upstream).

        New partition values in the batch simply become new
        directories. Requires a partition-tracked table
        (:meth:`write_partitioned`)."""
        base_version = self.latest_version()
        if base_version is None:
            return self.write_partitioned(updates, partition_col)
        rec = self._read_commit(base_version)
        parts = rec.get("partitions")
        if parts is None or set(rec["active"]) - set(parts):
            raise ValueError(
                "table has partition-untracked directories; use "
                "write_partitioned first (or the full-rewrite upsert)"
            )
        if rec.get("partition_col") not in (None, partition_col):
            raise ValueError(
                f"table is partitioned by {rec.get('partition_col')!r}, "
                f"not {partition_col!r}"
            )
        updates = updates.persist()
        try:
            touched = sorted(
                str(r[0])
                for r in updates.select(partition_col).distinct().collect()
            )
            touched_set = set(touched)
            carried = [d for d in rec["active"] if parts[d] not in touched_set]
            base_dirs = [d for d in rec["active"] if parts[d] in touched_set]
            if base_dirs:
                base = self.spark.read.parquet(
                    *[os.path.join(self.root, d) for d in base_dirs]
                )
            else:
                base = updates.limit(0)
            merged = merge_upsert(base, updates, keys, version_col).persist()
            new_parts = {d: parts[d] for d in carried}
            active = list(carried)
            stats = self._carry_stats(rec, carried)
            for v in touched:
                rel = self._write_data_dir(
                    merged.filter(F.col(partition_col).cast("string") == v)
                )
                active.append(rel)
                new_parts[rel] = v
                stats.update(self._scan_stats(rel))
            self._publish(
                base_version + 1,
                {
                    "version": base_version + 1,
                    "operation": "upsert_partitioned",
                    "partition_col": partition_col,
                    "keys": list(keys),
                    "base_version": base_version,
                    "rewritten": touched,
                    "active": active,
                    "partitions": new_parts,
                    "file_stats": stats,
                },
            )
            merged.unpersist()
            return base_version + 1
        finally:
            updates.unpersist()

    def read_partitions(
        self, values: Sequence[str], version: int | None = None
    ) -> DataFrame:
        """Snapshot read PRUNED to the given partition values using
        only commit metadata — no file listing or footer reads for
        untouched partitions."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"versioned table {self.root} is empty")
        rec = self._read_commit(v)
        parts = rec.get("partitions") or {}
        wanted = {str(x) for x in values}
        dirs = [d for d in rec["active"] if parts.get(d) in wanted]
        if not dirs:
            return self.read(v).limit(0)
        return self.spark.read.parquet(
            *[os.path.join(self.root, d) for d in dirs]
        )

    def version_as_of(self, ts: float) -> int:
        """Newest version committed at-or-before wall time ``ts``
        (epoch seconds) — Delta-style timestamp time travel. Raises if
        the table didn't exist yet at ``ts``."""
        best = None
        for v in self.versions():
            if self._read_commit(v).get("committed_at", float("inf")) <= ts:
                best = v
        if best is None:
            raise FileNotFoundError(
                f"versioned table {self.root} has no commit at or before {ts}"
            )
        return best

    def read_as_of(self, ts: float) -> DataFrame:
        """Snapshot read of the table as it stood at wall time ``ts``."""
        return self.read(self.version_as_of(ts))

    def table_changes(
        self, keys: Sequence[str], v_from: int, v_to: int | None = None
    ) -> DataFrame:
        """Change data feed between two snapshots, derived by key
        comparison: one row per key whose presence or content changed,
        with ``_change_type`` ∈ insert/update/delete and the NEW row
        values (delete rows carry the OLD values). Works for any
        operation history because it diffs STATE, not the log.

        Scale: one full-outer join of the two snapshots on the key —
        a single co-partitioned shuffle; update detection hashes the
        non-key columns engine-side (no row comparison in Python).
        For insert-only histories prefer :meth:`read_changes_since`,
        which reads only the appended directories and never touches
        the base snapshot."""
        v_to = self.latest_version() if v_to is None else v_to
        old, new = self.read(v_from), self.read(v_to)
        shared = [c for c in new.columns if c in set(old.columns)]
        value_cols = [c for c in shared if c not in set(keys)]

        def _sig(df: DataFrame) -> Column:
            if not value_cols:
                return F.lit(0).cast("long")
            return F.xxhash64(*[F.col(c) for c in value_cols])

        o = old.select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            F.struct(*[F.col(c) for c in shared]).alias("__old"),
            _sig(old).alias("__osig"),
        )
        n = new.select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            F.struct(*[F.col(c) for c in shared]).alias("__new"),
            _sig(new).alias("__nsig"),
        )
        cond = [o[f"__k_{k}"].eqNullSafe(n[f"__k_{k}"]) for k in keys]
        j = o.join(n, cond, "full_outer")
        change = (
            F.when(o["__osig"].isNull(), F.lit("insert"))
            .when(n["__nsig"].isNull(), F.lit("delete"))
            .when(o["__osig"] != n["__nsig"], F.lit("update"))
        )
        row = F.coalesce(n["__new"], o["__old"])
        return (
            j.select(change.alias("_change_type"), row.alias("__r"))
            .filter(F.col("_change_type").isNotNull())
            .select("_change_type", *[F.col(f"__r.{c}").alias(c) for c in shared])
        )

    def read_changes_since(self, v_from: int) -> DataFrame:
        """Incremental read for APPEND-ONLY history: the rows added
        after snapshot ``v_from``, read from exactly the data
        directories later commits introduced — no scan of the base
        snapshot at all (the consumption side of the streaming-ingest
        path; a downstream refresh processes only the delta).

        Raises if any commit in (v_from, latest] is not an append —
        a rewrite (upsert/compact/delete) invalidates directory-
        increment semantics; use :meth:`table_changes` there."""
        latest = self.latest_version()
        if latest is None or v_from > latest:
            raise FileNotFoundError(
                f"versioned table {self.root}: bad version range"
            )
        base = set(self._active_dirs(v_from))
        new_dirs: list[str] = []
        for v in self.versions():
            if v <= v_from:
                continue
            rec = self._read_commit(v)
            if rec.get("operation") != "append":
                raise ValueError(
                    f"commit {v} is {rec.get('operation')!r}, not append; "
                    "directory-increment reads need an append-only range"
                )
            new_dirs += [d for d in rec["active"] if d not in base]
            base.update(rec["active"])
        if not new_dirs:
            return self.read(latest).limit(0)
        df = self.spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.root, d) for d in new_dirs]
        )
        rec = self._read_commit(latest)
        if rec.get("schema_evolved"):
            for name, _ in rec["schema"]:
                if name not in df.columns:
                    df = df.withColumn(name, F.lit(None))
            df = df.select(*[name for name, _ in rec["schema"]])
        return df

    def delete_where(self, condition) -> int:
        """Row-level delete: remove rows matching ``condition`` (a
        Column or SQL string), committed as the next version.
        Completes the CRUD surface next to append/upsert.

        Scale: on a PARTITION-TRACKED table (write_partitioned) only
        the partitions that actually contain matching rows are
        rewritten — untouched partition directories carry into the new
        commit by reference, so delete cost follows the affected
        partitions, not the table (the dynamic-partition-overwrite
        shape). Untracked tables fall back to a full rewrite."""
        base_version = self.latest_version()
        if base_version is None:
            raise FileNotFoundError(f"versioned table {self.root} is empty")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        hit = F.coalesce(cond, F.lit(False))
        rec = self._read_commit(base_version)
        parts = rec.get("partitions")
        if parts and not (set(rec["active"]) - set(parts)):
            pcol = rec["partition_col"]
            touched = sorted(
                str(r[0])
                for r in self.read(base_version)
                .filter(hit)
                .select(pcol)
                .distinct()
                .collect()
            )
            touched_set = set(touched)
            carried = [d for d in rec["active"] if parts[d] not in touched_set]
            active = list(carried)
            new_parts = {d: parts[d] for d in carried}
            stats = self._carry_stats(rec, carried)
            for d in rec["active"]:
                if parts[d] not in touched_set:
                    continue
                kept = self.spark.read.parquet(
                    os.path.join(self.root, d)
                ).filter(~hit)
                rel = self._write_data_dir(kept)
                active.append(rel)
                new_parts[rel] = parts[d]
                stats.update(self._scan_stats(rel))
            self._publish(
                base_version + 1,
                {
                    "version": base_version + 1,
                    "operation": "delete",
                    "partition_col": pcol,
                    "base_version": base_version,
                    "rewritten": touched,
                    "active": active,
                    "partitions": new_parts,
                    "file_stats": stats,
                },
            )
            return base_version + 1
        kept = self.read(base_version).filter(~hit)
        rel = self._write_data_dir(kept)
        self._publish(
            base_version + 1,
            {
                "version": base_version + 1,
                "operation": "delete",
                "base_version": base_version,
                "active": [rel],
                "schema": self._schema_of(kept),
                "file_stats": self._scan_stats(rel),
            },
        )
        return base_version + 1

    def expire_versions(self, keep_last: int = 1) -> list[int]:
        """Retention: drop all but the newest ``keep_last`` commit
        records, then :meth:`vacuum` the data directories only expired
        commits referenced. Time travel to expired versions is gone —
        that is the point (bounded storage); the newest ``keep_last``
        snapshots remain fully readable.

        Expiry order is oldest-first and the newest commit is never
        expired, so a crash mid-expiry leaves a contiguous,
        fully-functional suffix of history."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        expired = vs[:-keep_last]
        for v in expired:
            os.unlink(self._log_path(v))
        self.vacuum()
        return expired

    def vacuum(self) -> list[str]:
        """Delete data directories referenced by NO commit (crash
        orphans, never-published writes), plus any bloom-index
        sidecars of removed directories. Returns the removed
        table-relative data paths."""
        import shutil

        referenced: set[str] = set()
        for v in self.versions():
            referenced.update(self._active_dirs(v))
        removed = []
        data_root = os.path.join(self.root, _DATA_DIR)
        for name in sorted(os.listdir(data_root)):
            rel = os.path.join(_DATA_DIR, name)
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, name))
                removed.append(rel)
        idx_root = os.path.join(self.root, "_index")
        if removed and os.path.isdir(idx_root):
            gone = {os.path.basename(r) for r in removed}
            for name in os.listdir(idx_root):
                # sidecars are named <dir-uuid>.<col>.json
                if name.split(".", 1)[0] in gone:
                    os.unlink(os.path.join(idx_root, name))
        return removed
