"""Plan utilities: capture and assert physical-plan properties."""

from ocr_parallel_spark.plans.inspect import (  # noqa: F401
    count_nodes,
    plan_string,
)
