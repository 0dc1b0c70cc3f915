"""Dump explain('formatted') plans for round-6 optimization evidence.

    python scripts/r06_plans.py before|after query [query ...]

Writes plans/r06/<query>_<tag>.txt for each named query (catalog entries
plus the bench-only ann_lsh_topk_wide). Captured at sf0.001 on local[8]
like scripts/dump_plans.py — plan SHAPE is size-independent.
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.001"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from bench import BENCH_ONLY, build_spark
    from ocr_parallel_spark import queries_catalog
    from scripts.dump_plans import plan_of

    spark = build_spark(8, "r06-plans")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries_catalog.queries()
    outdir = REPO / "plans" / "r06"
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        fn = q.get(name) or BENCH_ONLY.get(name)
        if fn is None:
            print(f"skip {name}: unknown")
            continue
        df = fn(spark, SF)
        (outdir / f"{name}_{tag}.txt").write_text(plan_of(df, "formatted"))
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
