"""IO layer: snapshot-committed resumable tables (Iceberg-semantics over
parquet+manifest in the sandbox; swap for real Iceberg via the same
interface when the runtime jar is available)."""

from ocr_parallel_spark.io.snapshot import (  # noqa: F401
    SnapshotTable,
    resume_filter,
    run_resumable,
)
