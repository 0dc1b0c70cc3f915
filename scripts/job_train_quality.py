"""Quality-classifier training batch job (spark-submit entrypoint) —
fits the ternary-vote weight table from a labeled docs corpus and
writes it where ``job_curate --quality-weights`` reads it.

Input: parquet with (text, label_low boolean) [+ anything else,
ignored]. The fit is functions/curation.py ``train_quality_weights`` —
closed-form, integer-exact, seed-free (the same math the oracle-gated
``quality_trained`` catalog query refits in SQL with measured held-out
precision/recall 1.0 on the planted-taint benchmark). Optionally
evaluates on a held-out label split and refuses to write weights that
miss the precision/recall floor — a bad label set should fail the
job, not silently ship a bad filter.

    spark-submit --py-files ocr_parallel_spark.zip \
        scripts/job_train_quality.py \
        --input /data/labeled --output /data/qweights \
        [--eval-holdout 5] [--min-milli 900]
"""

from __future__ import annotations

import argparse
import json


def fit_and_eval(spark, labeled, holdout_mod: int | None, min_milli: int):
    """Fit on the non-holdout split, evaluate on the holdout, return
    (weights_df, metrics dict). holdout_mod None = fit on everything,
    no eval (metrics empty)."""
    from pyspark.sql import functions as F

    from ocr_parallel_spark.functions.curation import (
        train_quality_weights,
        trained_quality_scores,
    )
    from ocr_parallel_spark.operators.classify import normalize_col

    # Deterministic row key for the holdout split: a NUMERIC doc_id
    # when the label table carries one, else a text hash — NEVER
    # monotonically_increasing_id (partition-dependent: the split
    # would change with parallelism and the fit with it). A
    # string-typed doc_id falls through to the text hash rather than
    # cast-to-NULL, which would silently empty BOTH splits.
    numeric = {"bigint", "int", "smallint", "tinyint", "long"}
    if dict(labeled.dtypes).get("doc_id") in numeric:
        rid = F.col("doc_id").cast("long")
    else:
        rid = F.xxhash64(F.coalesce(F.col("text"), F.lit("")))
    normed = labeled.select(
        rid.alias("_rid"),
        normalize_col(F.coalesce(F.col("text"), F.lit(""))).alias("norm"),
        F.col("label_low").cast("boolean").alias("label_low"),
    )
    if holdout_mod is None:
        return train_quality_weights(normed), {}
    train = normed.filter(F.col("_rid") % holdout_mod != 0)
    heldout = normed.filter(F.col("_rid") % holdout_mod == 0)
    w = train_quality_weights(train)
    scored = trained_quality_scores(heldout, w, id_col="_rid").join(
        heldout.select("_rid", "label_low"), "_rid"
    )
    pred = F.col("score") > 0
    m = scored.agg(
        F.sum(F.when(F.col("label_low") & pred, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("label_low") & pred, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("label_low") & ~pred, 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = m.tp or 0, m.fp or 0, m.fn or 0
    metrics = {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "prec_milli": tp * 1000 // (tp + fp) if tp + fp else 0,
        "rec_milli": tp * 1000 // (tp + fn) if tp + fn else 0,
    }
    if metrics["prec_milli"] < min_milli or metrics["rec_milli"] < min_milli:
        raise SystemExit(
            f"quality fit below floor {min_milli}/1000 on holdout: {metrics}"
        )
    # ship weights fit on the FULL label set (the holdout proved the
    # procedure; the product uses all the labels)
    return train_quality_weights(normed), metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="labeled docs parquet (text, label_low)")
    ap.add_argument("--output", required=True, help="weights parquet path")
    ap.add_argument(
        "--eval-holdout",
        type=int,
        default=5,
        help="hold out every Nth row for the precision/recall floor "
        "check (0 = skip eval)",
    )
    ap.add_argument(
        "--min-milli",
        type=int,
        default=900,
        help="held-out precision AND recall floor in milli-units; the "
        "job refuses to write weights below it",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocr-parallel-spark-train-quality").getOrCreate()
    labeled = spark.read.parquet(args.input)
    w, metrics = fit_and_eval(
        spark,
        labeled,
        args.eval_holdout if args.eval_holdout > 0 else None,
        args.min_milli,
    )
    w.write.mode("overwrite").parquet(args.output)
    n_buckets = spark.read.parquet(args.output).count()
    print(json.dumps({"weights": args.output, "n_buckets": n_buckets, **metrics}))
    spark.stop()


if __name__ == "__main__":
    main()
