"""Snapshot table: atomic commit, append, resume (X9/S2 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_parallel_spark.io import SnapshotTable, resume_filter, run_resumable


def _mkdf(spark, ids):
    return spark.createDataFrame(
        [(f"https://x/{i}", i) for i in ids], "url string, v int"
    )


def test_commit_and_read(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t1"))
    assert t.read(spark) is None
    snap = t.append(_mkdf(spark, range(10)), lineage={"run": "a"})
    assert snap["ordinal"] == 0
    got = t.read(spark)
    assert got.count() == 10
    assert t.current_snapshot()["lineage"]["run"] == "a"


def test_append_accumulates(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t2"))
    t.append(_mkdf(spark, range(5)))
    t.append(_mkdf(spark, range(5, 8)))
    assert t.read(spark).count() == 8
    assert len(t.snapshots()) == 2
    assert t.current_snapshot()["ordinal"] == 1


def test_resume_skips_committed(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t3"))
    source = _mkdf(spark, range(10))
    first = source.filter(F.col("v") < 4)
    t.append(first)
    todo = resume_filter(source, t, spark, "url")
    assert todo.count() == 6
    assert todo.agg(F.min("v")).collect()[0][0] == 4


def test_run_resumable_end_to_end(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t4"))
    source = _mkdf(spark, range(10))

    def transform(df):
        return df.withColumn("v2", F.col("v") * 2)

    s1 = run_resumable(source.filter(F.col("v") < 6), t, spark, transform, "url")
    assert s1["lineage"]["rows_written"] == 6
    s2 = run_resumable(source, t, spark, transform, "url")
    assert s2["lineage"]["rows_written"] == 4
    assert t.read(spark).count() == 10
    # third run: nothing new -> no-op, table unchanged
    s3 = run_resumable(source, t, spark, transform, "url")
    assert s3.get("noop") is True
    assert t.current_snapshot()["ordinal"] == s2["ordinal"]


def test_partial_write_invisible(spark, tmp_path):
    """Uncommitted data dirs are never read (atomic pointer semantics)."""
    t = SnapshotTable(str(tmp_path / "t5"))
    t.append(_mkdf(spark, range(3)))
    # simulate a crashed run: data written, no manifest commit
    _mkdf(spark, range(100, 105)).write.parquet(str(t.root / "data/run-999999"))
    assert t.read(spark).count() == 3


def test_partition_lineage_counters(spark, tmp_path):
    """Per-partition lineage: each snapshot records one counter row per
    physical partition; totals reconcile with rows_written."""
    from ocr_parallel_spark.pages import synthesize_pages
    from ocr_parallel_spark.pipeline import run_extraction_pipeline

    t = SnapshotTable(str(tmp_path / "t5"))
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").drop("doc_id")
    snap = run_resumable(
        pages, t, spark,
        lambda df: run_extraction_pipeline(df, near_dups=False), "url",
    )
    parts = snap["lineage"]["partitions"]
    assert len(parts) >= 1
    assert sum(p["rows"] for p in parts) == snap["lineage"]["rows_written"]
    assert sum(p["errors"] for p in parts) > 0  # synthesis plants error rows
    assert sum(p["pages_extracted"] for p in parts) > 0
    for p in parts:
        assert set(p) >= {"partition_id", "rows", "pages_extracted", "errors"}


def test_time_travel_read_at_ordinal(spark, tmp_path):
    """Iceberg 'VERSION AS OF' analog: every committed ordinal stays
    readable after later appends and even after an overwrite (old data
    dirs are never rewritten)."""
    t = SnapshotTable(str(tmp_path / "t6"))
    t.append(_mkdf(spark, range(3)))
    t.append(_mkdf(spark, range(10, 15)))
    assert t.read(spark).count() == 8
    assert t.read(spark, ordinal=0).count() == 3
    assert t.read(spark, ordinal=1).count() == 8
    assert t.snapshot_at(99) is None and t.read(spark, ordinal=99) is None
    t.overwrite(_mkdf(spark, range(100, 102)))
    assert t.read(spark).count() == 2
    # history still intact post-overwrite
    assert t.read(spark, ordinal=0).count() == 3
    assert t.read(spark, ordinal=1).count() == 8
    assert [s["ordinal"] for s in t.snapshots()] == [0, 1, 2]


def test_schema_evolution_added_column(spark, tmp_path):
    """Add-column evolution: a later run commits an extra column; the
    current read reconciles by name (old rows read NULL), a time-travel
    read of the pre-evolution ordinal never sees the column, and each
    manifest records the schema as committed."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "t7"))
    t.append(_mkdf(spark, range(3)))
    evolved = _mkdf(spark, range(10, 12)).withColumn("score", F.col("v") * 2.0)
    t.append(evolved)

    cur = t.read(spark)
    assert set(cur.columns) == {"url", "v", "score"}
    assert cur.count() == 5
    # old rows surface the added column as NULL; new rows carry values
    assert cur.filter("score IS NULL").count() == 3
    assert cur.filter("score = v * 2.0").count() == 2
    # time travel predates the evolution
    old = t.read(spark, ordinal=0)
    assert set(old.columns) == {"url", "v"}
    # per-snapshot schema recorded in the manifest
    assert t.snapshot_at(0)["columns"] == ["url", "v"]
    assert t.snapshot_at(1)["columns"] == ["url", "v", "score"]


def test_compaction_collapses_live_set_preserving_rows_and_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t7"))
    t.append(_mkdf(spark, range(5)))
    t.append(_mkdf(spark, range(5, 8)))
    t.append(_mkdf(spark, range(8, 12)))
    before = sorted(r["url"] for r in t.read(spark).collect())
    assert len(t.current_snapshot()["data_dirs"]) == 3

    snap = t.compact(spark, target_partitions=2)
    assert len(snap["data_dirs"]) == 1
    assert snap["lineage"]["compaction_of"] == 2
    after = sorted(r["url"] for r in t.read(spark).collect())
    assert after == before
    # history untouched: pre-compaction ordinals still read their state
    assert t.read(spark, ordinal=1).count() == 8
    # resume semantics survive compaction: everything is still committed
    todo = resume_filter(_mkdf(spark, range(12)), t, spark, "url")
    assert todo.count() == 0


def test_expire_snapshots_reclaims_only_unreferenced_dirs(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t8"))
    t.append(_mkdf(spark, range(5)))
    t.append(_mkdf(spark, range(5, 8)))
    # without compaction, run-000000 is still in the kept live set
    assert t.expire_snapshots(keep_last=1) == []
    assert t.read(spark).count() == 8

    t.compact(spark)
    removed = t.expire_snapshots(keep_last=1)
    # the two pre-compaction run dirs are now unreferenced -> deleted
    assert sorted(removed) == ["data/run-000000", "data/run-000001"]
    assert t.read(spark).count() == 8
    assert t.snapshot_at(0) is None and t.snapshot_at(1) is None
    # time travel to the kept (compacted) snapshot still works
    assert t.read(spark, ordinal=t.current_snapshot()["ordinal"]).count() == 8


def test_expire_snapshots_validates_keep_last(spark, tmp_path):
    import pytest

    t = SnapshotTable(str(tmp_path / "t9"))
    t.append(_mkdf(spark, range(3)))
    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=0)


def test_read_increment_returns_only_appended_rows(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t10"))
    t.append(_mkdf(spark, range(5)))          # ordinal 0
    t.append(_mkdf(spark, range(5, 8)))       # ordinal 1
    t.append(_mkdf(spark, range(8, 12)))      # ordinal 2
    inc = t.read_increment(spark, since_ordinal=0)
    assert sorted(r.v for r in inc.collect()) == list(range(5, 12))
    inc12 = t.read_increment(spark, since_ordinal=1, until_ordinal=2)
    assert sorted(r.v for r in inc12.collect()) == list(range(8, 12))
    # nothing appended since current -> None
    assert t.read_increment(spark, since_ordinal=2) is None


def test_read_increment_rejects_rewritten_lineage(spark, tmp_path):
    import pytest

    t = SnapshotTable(str(tmp_path / "t11"))
    t.append(_mkdf(spark, range(5)))          # ordinal 0
    t.append(_mkdf(spark, range(5, 8)))       # ordinal 1
    t.compact(spark)                          # ordinal 2: layout rewritten
    with pytest.raises(ValueError, match="non-append"):
        t.read_increment(spark, since_ordinal=0)
    # but increments WITHIN the post-compaction lineage work again
    t.append(_mkdf(spark, range(8, 10)))      # ordinal 3
    inc = t.read_increment(spark, since_ordinal=2)
    assert sorted(r.v for r in inc.collect()) == [8, 9]
    # and a missing ordinal is an explicit error, not a silent full read
    with pytest.raises(ValueError, match="missing snapshot"):
        t.read_increment(spark, since_ordinal=99)


def test_snapshot_diff_reports_added_removed_changed(spark, tmp_path):
    """diff(pre, post, key) is exactly the rows a recompute/append
    flipped: added keys, removed keys, changed values; unchanged keys
    are absent; comparison is null-safe."""
    t = SnapshotTable(str(tmp_path / "t12"))
    df0 = spark.createDataFrame(
        [("u1", 1), ("u2", None), ("u3", 3)], "url string, v int"
    )
    t.append(df0)                                        # ordinal 0
    df1 = spark.createDataFrame(
        [("u1", 1), ("u2", 9), ("u4", 4)], "url string, v int"
    )
    t.overwrite(df1)                                     # ordinal 1 (recompute)
    got = {r.url: r.change for r in t.diff(spark, 0, 1, "url").collect()}
    assert got == {"u2": "changed", "u3": "removed", "u4": "added"}
    # evolved schema: a new column on ordinal 2 must not mark old rows
    df2 = df1.withColumn("extra", F.lit("x"))
    t.overwrite(df2)                                     # ordinal 2
    assert t.diff(spark, 1, 2, "url").count() == 0


def test_reason_histogram_rides_lineage(spark, tmp_path):
    """A committed run whose rows carry drop_reason records its verdict
    breakdown in the snapshot lineage (kept = NULL reason)."""
    t = SnapshotTable(str(tmp_path / "t13"))
    df = spark.createDataFrame(
        [("u1", None), ("u2", "dup"), ("u3", "dup"), ("u4", "lang")],
        "url string, drop_reason string",
    )
    snap = run_resumable(df, t, spark, lambda d: d, key_col="url")
    assert snap["lineage"]["reasons"] == {"dup": 2, "kept": 1, "lang": 1}
    # tables without the column stay histogram-free
    t2 = SnapshotTable(str(tmp_path / "t14"))
    snap2 = run_resumable(
        spark.createDataFrame([("u1", 1)], "url string, v int"),
        t2, spark, lambda d: d, key_col="url",
    )
    assert "reasons" not in snap2["lineage"]
