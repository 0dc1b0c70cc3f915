"""Snapshot-committed, resumable table writes (SURVEY §7.2 step 5).

The production design is an Iceberg table partitioned by ``bucket(N, url)``
with commits as snapshots and resume = anti-join against the last committed
snapshot. The Iceberg runtime jar is not in this sandbox, so the same
semantics are implemented over parquet + a JSON manifest directory behind
one IO interface:

- Each run writes its data files under ``data/run-<run_id>/`` (parquet).
- Commit = write ``_manifests/snapshot-<n>.json`` listing every live data
  directory, then atomically rename a ``_manifests/CURRENT.tmp`` pointer to
  ``_manifests/CURRENT``. Readers only ever see the pointed-at snapshot —
  never a partial write (the reference's file-existence poll,
  /root/reference/app/api/endpoints/full_process.py:136-145, is exactly the
  race this replaces; X9/S2 completion semantics become snapshot commits).
- Resume = read committed keys, anti-join the source, process the rest,
  commit a new snapshot appending the new run directory.
- Lineage: every snapshot records the run's counters (rows, pages
  extracted, errors, dups dropped — from ``df.observe``) + per-run config,
  mirroring A1/A5 metrics persistence.

Run ids derive from the snapshot ordinal — no uuid/wall-clock (determinism
rule; reference used uuid4 at full_process.py:34-36).
"""

from __future__ import annotations

import json
import os
import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, path: str):
        self.root = pathlib.Path(path)
        self.manifest_dir = self.root / "_manifests"

    # ---- read side ----------------------------------------------------------

    def current_snapshot(self) -> dict | None:
        cur = self.manifest_dir / "CURRENT"
        if not cur.exists():
            return None
        name = cur.read_text().strip()
        return json.loads((self.manifest_dir / name).read_text())

    def snapshots(self) -> list[dict]:
        if not self.manifest_dir.exists():
            return []
        out = []
        for p in sorted(self.manifest_dir.glob("snapshot-*.json")):
            out.append(json.loads(p.read_text()))
        return out

    def snapshot_at(self, ordinal: int) -> dict | None:
        """Time travel (Iceberg ``VERSION AS OF`` analog): the manifest of
        a PAST commit. Snapshots are immutable and append-only data dirs
        are never rewritten, so any committed ordinal stays readable."""
        p = self.manifest_dir / f"snapshot-{ordinal:06d}.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def read(
        self, spark: SparkSession, ordinal: int | None = None
    ) -> DataFrame | None:
        """Read the committed table state (union of live data dirs) —
        current by default, or as of a past ``ordinal`` (time travel).

        ``mergeSchema``: runs may carry evolved schemas (an added column
        — Iceberg's most-used schema evolution); the union reconciles by
        NAME and earlier runs read the new column as NULL, exactly
        Iceberg's add-column semantics. (Column RENAMES need id-based
        mapping — real Iceberg territory; documented out of scope for the
        parquet+manifest fallback.) mergeSchema launches a distributed
        all-file footer-merge job before the scan, so it is requested
        only when the per-run manifests record DIFFERENT column lists —
        the common case (hundreds of same-schema runs, e.g. the resume
        path's read-at-every-job-start) plans from one footer. Each run
        dir is named by its committing ordinal, whose manifest carries
        that run's columns; a dir whose manifest is missing falls back
        to merging (safe, just slower). Same-name type changes are out
        of scope for this fallback, like renames."""
        snap = (
            self.current_snapshot() if ordinal is None else self.snapshot_at(ordinal)
        )
        if snap is None or not snap["data_dirs"]:
            return None
        paths = [str(self.root / d) for d in snap["data_dirs"]]
        reader = spark.read
        if len(paths) > 1 and self._schemas_differ(snap["data_dirs"]):
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    def read_increment(
        self,
        spark: SparkSession,
        since_ordinal: int,
        until_ordinal: int | None = None,
    ) -> DataFrame | None:
        """Iceberg incremental-scan analog: ONLY the rows appended after
        ``since_ordinal``, up to ``until_ordinal`` (default: current).
        Because appends never rewrite data dirs, the increment is exactly
        the file-set difference of the two manifests — a downstream
        consumer (extract output feeding curation, verdicts feeding
        packing) processes each commit's delta without scanning the
        accumulated table or anti-joining keys: at 10^12 committed rows
        the anti-join resume shuffles the key column of the WHOLE table
        every run, while the incremental read plans only the new files.

        Raises ValueError when the lineage between the two ordinals is
        not append-only (an overwrite/compaction/recompute replaced the
        layout — ``since``'s dirs are no longer a subset of ``until``'s):
        "what's new" stops being a file-level question there, and the
        caller must fall back to a full read (+ key anti-join if it needs
        exactly-once). Iceberg's incremental scan has the same contract.
        Returns None when no rows were appended."""
        until = (
            self.current_snapshot()
            if until_ordinal is None
            else self.snapshot_at(until_ordinal)
        )
        since = self.snapshot_at(since_ordinal)
        if since is None or until is None:
            raise ValueError(
                f"read_increment: missing snapshot (since={since_ordinal}, "
                f"until={until_ordinal})"
            )
        since_set = set(since["data_dirs"])
        if not since_set <= set(until["data_dirs"]):
            raise ValueError(
                "read_increment: non-append lineage between ordinals "
                f"{since['ordinal']} and {until['ordinal']} (overwrite/"
                "compaction rewrote the layout); fall back to read()"
            )
        new_dirs = [d for d in until["data_dirs"] if d not in since_set]
        if not new_dirs:
            return None
        paths = [str(self.root / d) for d in new_dirs]
        reader = spark.read
        if len(new_dirs) > 1 and self._schemas_differ(new_dirs):
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    def diff(
        self,
        spark: SparkSession,
        ordinal_a: int,
        ordinal_b: int,
        key_col: str,
    ) -> DataFrame | None:
        """Row-level audit of what changed between two committed
        snapshots — the companion to the recompute arbiter: after a
        ``--recompute`` overwrite, ``diff(pre, post, "doc_id")`` is
        exactly the verdicts the corpus-global rerun flipped. Returns
        one row per affected key with ``change`` in
        (added, removed, changed); unchanged keys are absent. Rows
        compare on the COMMON non-key columns of the two ordinals
        (schema evolution adds columns — comparing them would mark
        every old row changed), by a canonical struct equality that is
        null-safe. Both sides remain readable because snapshots are
        immutable and expire_snapshots is the only deleter."""
        a = self.read(spark, ordinal=ordinal_a)
        b = self.read(spark, ordinal=ordinal_b)
        if a is None or b is None:
            raise ValueError(
                f"diff: missing snapshot (a={ordinal_a}, b={ordinal_b})"
            )
        common = sorted(set(a.columns) & set(b.columns) - {key_col})
        pa = a.select(
            F.col(key_col),
            F.struct(*[F.col(c) for c in common]).alias("_va"),
        )
        pb = b.select(
            F.col(key_col).alias("_kb"),
            F.struct(*[F.col(c) for c in common]).alias("_vb"),
        )
        j = pa.join(pb, F.col(key_col) == F.col("_kb"), "full_outer")
        change = (
            F.when(F.col(key_col).isNull(), F.lit("added"))
            .when(F.col("_kb").isNull(), F.lit("removed"))
            .when(~F.col("_va").eqNullSafe(F.col("_vb")), F.lit("changed"))
        )
        return (
            j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(
                F.coalesce(F.col(key_col), F.col("_kb")).alias(key_col),
                "change",
            )
        )

    def _schemas_differ(self, data_dirs: list[str]) -> bool:
        """True when the live runs committed different column lists (or
        any run's manifest is unreadable — merge is the safe default)."""
        seen: set[tuple[str, ...]] = set()
        for d in data_dirs:
            try:
                committed = self.snapshot_at(int(d.rsplit("-", 1)[1]))
            except (ValueError, json.JSONDecodeError):
                return True
            if committed is None or "columns" not in committed:
                return True
            seen.add(tuple(committed["columns"]))
            if len(seen) > 1:
                return True
        return False

    def committed_keys(self, spark: SparkSession, key_col: str) -> DataFrame | None:
        df = self.read(spark)
        return None if df is None else df.select(key_col).distinct()

    # ---- write side ---------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        lineage: dict | None = None,
    ) -> dict:
        """Write ``df`` as a new run directory and commit a snapshot that
        appends it to the live set. Data lands fully before the manifest
        pointer flips — crash mid-write leaves the table at the previous
        snapshot."""
        prior = self.current_snapshot()
        ordinal = (prior["ordinal"] + 1) if prior else 0
        run_dir = f"data/run-{ordinal:06d}"
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        df.write.mode("errorifexists").parquet(str(self.root / run_dir))

        data_dirs = (prior["data_dirs"] if prior else []) + [run_dir]
        snap = {
            "ordinal": ordinal,
            "data_dirs": data_dirs,
            # schema as committed THIS run (Iceberg records schema per
            # snapshot; an added column shows up here and time-travel
            # readers of older ordinals never see it)
            "columns": df.columns,
            "lineage": lineage or {},
        }
        self._commit(snap)
        return snap

    def overwrite(self, df: DataFrame, lineage: dict | None = None) -> dict:
        prior = self.current_snapshot()
        ordinal = (prior["ordinal"] + 1) if prior else 0
        run_dir = f"data/run-{ordinal:06d}"
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        df.write.mode("errorifexists").parquet(str(self.root / run_dir))
        snap = {
            "ordinal": ordinal,
            "data_dirs": [run_dir],
            "columns": df.columns,
            "lineage": lineage or {},
        }
        self._commit(snap)
        return snap

    def compact(
        self,
        spark: SparkSession,
        target_partitions: int | None = None,
        lineage: dict | None = None,
    ) -> dict:
        """Small-file compaction (Iceberg ``rewrite_data_files`` analog):
        read the live set, rewrite it as ONE run directory, commit a
        snapshot whose live set is just that directory. After hundreds
        of incremental appends the live set is hundreds of small run
        dirs — every read pays per-file open/footer costs and the resume
        anti-join scans them all; compaction collapses that to one
        columnar dir. History is untouched: old snapshots keep
        referencing the old dirs (time travel intact — compaction
        rewrites the live LAYOUT, never the past); reclaim the old dirs
        with ``expire_snapshots`` once history is no longer needed."""
        df = self.read(spark)
        prior = self.current_snapshot()
        if df is None or prior is None:
            return {"ordinal": -1, "noop": True}
        if target_partitions:
            df = df.repartition(target_partitions)
        info = dict(lineage or {})
        info["compaction_of"] = prior["ordinal"]
        info["compacted_dirs"] = len(prior["data_dirs"])
        return self.overwrite(df, lineage=info)

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Iceberg ``expire_snapshots`` analog: drop all but the newest
        ``keep_last`` manifests and DELETE data dirs referenced only by
        the dropped ones. Time travel to expired ordinals is gone — by
        choice; every kept snapshot (including CURRENT) still reads.
        Append-lineage means an old run dir usually also appears in
        newer snapshots' live sets — such dirs are NOT deleted; real
        space comes back after a compaction made the old dirs
        unreferenced by the kept tail. Returns the deleted dirs."""
        import shutil

        if keep_last < 1:
            raise ValueError("expire_snapshots: keep_last must be >= 1")
        snaps = self.snapshots()
        keep, drop = snaps[-keep_last:], snaps[:-keep_last]
        live = {d for s in keep for d in s["data_dirs"]}
        removed: list[str] = []
        for s in drop:
            for d in s["data_dirs"]:
                if d not in live and (self.root / d).exists():
                    shutil.rmtree(self.root / d)
                    removed.append(d)
            (self.manifest_dir / f"snapshot-{s['ordinal']:06d}.json").unlink()
        return removed

    def _commit(self, snap: dict) -> None:
        self.manifest_dir.mkdir(parents=True, exist_ok=True)
        name = f"snapshot-{snap['ordinal']:06d}.json"
        (self.manifest_dir / name).write_text(json.dumps(snap, indent=1))
        tmp = self.manifest_dir / "CURRENT.tmp"
        tmp.write_text(name)
        os.replace(tmp, self.manifest_dir / "CURRENT")  # atomic pointer flip


def resume_filter(
    source: DataFrame, table: SnapshotTable, spark: SparkSession, key_col: str = "url"
) -> DataFrame:
    """Anti-join the source against already-committed keys: only
    never-processed documents flow into the run. At scale both sides hash
    on the same key; with bucketed storage this is exchange-free."""
    done = table.committed_keys(spark, key_col)
    if done is None:
        return source
    return source.join(done, key_col, "left_anti")


def partition_counters(df: DataFrame) -> list[dict]:
    """Per-partition lineage counters (north_star: 'per-partition lineage +
    counters persisted'): one row per physical partition with rows seen,
    pages extracted, error rows, chars out — the distributed analog of the
    reference's per-batch metrics (A1/A5). Cheap: one map-side agg over an
    already-persisted result."""
    cols = set(df.columns)
    aggs = [F.count(F.lit(1)).alias("rows")]
    if "status" in cols:
        aggs.append(
            F.count(F.when(F.col("status") == "found", 1)).alias("pages_extracted")
        )
        aggs.append(F.count(F.when(F.col("status") == "error", 1)).alias("errors"))
    if "is_exact_dup" in cols:
        aggs.append(F.count(F.when(F.col("is_exact_dup"), 1)).alias("exact_dups"))
    if "n_chars_out" in cols:
        aggs.append(F.sum("n_chars_out").alias("chars_out"))
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(*aggs)
        .collect()
    )
    return [r.asDict() for r in sorted(rows, key=lambda r: r.partition_id)]


def reason_histogram(df: DataFrame) -> dict | None:
    """Drop-reason histogram for lineage (None when the table carries
    no ``drop_reason`` column). Bounded driver materialization: one row
    per distinct reason — a fixed enum in every producer."""
    if "drop_reason" not in df.columns:
        return None
    rows = (
        df.groupBy(F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("r"))
        .count()
        .collect()
    )
    return {r.r: r["count"] for r in sorted(rows, key=lambda r: r.r)}


def run_resumable(
    source: DataFrame,
    table: SnapshotTable,
    spark: SparkSession,
    transform,
    key_col: str = "url",
    lineage: dict | None = None,
) -> dict:
    """One resumable batch step: filter out committed keys, apply the
    pipeline ``transform``, append + commit. Returns the snapshot dict
    (with ``rows_written`` + per-partition counters in lineage)."""
    from pyspark import StorageLevel

    todo = resume_filter(source, table, spark, key_col)
    result = transform(todo).persist(StorageLevel.MEMORY_AND_DISK)
    n = result.count()
    info = dict(lineage or {})
    info["rows_written"] = n
    if n:
        info["partitions"] = partition_counters(result)
        reasons = reason_histogram(result)
        if reasons is not None:
            # the curation datasheet: every run's verdict breakdown
            # rides its snapshot (the A1/A5 metrics-persistence shape)
            info["reasons"] = reasons
    if n == 0:
        # Nothing new to process: leave the table at its current snapshot
        # and report a no-op instead of committing an empty append.
        result.unpersist()
        prior = table.current_snapshot()
        return {
            "ordinal": prior["ordinal"] if prior else -1,
            "noop": True,
            "lineage": info,
        }
    snap = table.append(result, lineage=info)
    result.unpersist()
    return snap
