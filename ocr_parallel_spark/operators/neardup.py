"""Near-duplicate marking: SimHash banding and MinHash LSH.

D4's near-dup half (SURVEY §2.4): the kernel already emits a 64-bit SimHash
per document (one Python crossing, shared with extraction); everything after
that is built-in expressions — band splitting via bit ops, candidate
generation via a band-bucket self-join, Hamming verification via
``bit_count(xor)``, representative election via ``min(url)`` per bucket.

Scale notes: run AFTER exact dedup so identical texts (the worst band skew)
are already collapsed; the band join shuffles on (band_idx, band_val) which
is near-uniform after that; AQE skew-join splits any residual hot bucket.
One-iteration min-representative labeling is the standard LSH
approximation of connected components — documented, deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_parallel_spark.kernel.simhash import minhash_bands, minhash_signature

N_BANDS = 4
BAND_BITS = 64 // N_BANDS
HAMMING_THRESHOLD = 3

# A band bucket holding more than this many docs is degenerate (boilerplate
# or adversarial near-constant content): joining it is quadratic for no
# recall gain — every member already has 3 other band chances. Production
# LSH dedup caps bucket width for exactly this reason; the cap keeps the
# self-join linear in practice and is deterministic.
MAX_BAND_BUCKET = 256


def simhash_band_cols(df: DataFrame, simhash_col: str = "simhash") -> DataFrame:
    """Split the int64 SimHash into N_BANDS unsigned 16-bit band values."""
    out = df
    for i in range(N_BANDS):
        out = out.withColumn(
            f"band_{i}",
            F.shiftrightunsigned(F.col(simhash_col), i * BAND_BITS).bitwiseAND(
                F.lit((1 << BAND_BITS) - 1)
            ),
        )
    return out


def mark_simhash_near_dups(
    df: DataFrame,
    simhash_col: str = "simhash",
    id_col: str = "url",
    hamming_threshold: int = HAMMING_THRESHOLD,
    max_bucket: int = MAX_BAND_BUCKET,
    closure_rounds: int = 0,
) -> DataFrame:
    """Add ``is_near_dup`` + ``near_rep`` columns.

    Candidates = pairs sharing any of the 4 16-bit bands (guaranteed to
    include all pairs within Hamming distance 3); verified with
    ``bit_count(a^b) <= threshold``; each verified doc maps to the minimum
    id in its candidate neighborhood, and ``is_near_dup`` is true when that
    representative is a different, earlier doc.

    ``closure_rounds=0`` (default) is one-iteration min-representative
    labeling — the standard LSH approximation of connected components: a
    chain A~B~C labels C with B while A keeps itself. Pass
    ``closure_rounds=r`` to run ``r`` bounded label-propagation rounds
    over the verified-pair graph (each round: every doc takes the min of
    its own and its neighbors' labels — one keyed shuffle per round);
    each round extends the collapsed radius one hop (round r labels
    reach r+1 hops), so 2-3 rounds close any realistic near-dup cluster
    — drift chains longer than that are vanishingly rare — while staying
    a FIXED number of stages (no driver-side convergence loop at 100 TB).
    """
    ids = df.select(id_col, simhash_col).filter(F.col(simhash_col) != 0)
    # One pass over the input: posexplode the band array (a 4-way union
    # would scan the upstream table once per band).
    band_exprs = [
        F.shiftrightunsigned(F.col(simhash_col), i * BAND_BITS)
        .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
        for i in range(N_BANDS)
    ]
    bands = ids.select(
        F.col(id_col),
        F.col(simhash_col),
        F.posexplode(F.array(*band_exprs)).alias("band_idx", "band_val"),
    )

    if max_bucket:
        bucket_sizes = bands.groupBy("band_idx", "band_val").agg(
            F.count(F.lit(1)).alias("_nd_bucket_n")
        )
        bands = (
            bands.join(bucket_sizes, ["band_idx", "band_val"])
            .filter(F.col("_nd_bucket_n") <= max_bucket)
            .drop("_nd_bucket_n")
        )

    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
        )
        .filter(
            F.bit_count(
                F.col(f"l.{simhash_col}").bitwiseXOR(F.col(f"r.{simhash_col}"))
            )
            <= hamming_threshold
        )
        .select(
            F.col(f"l.{id_col}").alias("_nd_id"),
            F.col(f"r.{id_col}").alias("_nd_other"),
        )
    )
    if closure_rounds > 0:
        # pairs is re-consumed every propagation round; without this the
        # band self-join lineage re-executes per round. localCheckpoint
        # (not persist): persist pins blocks in the cache manager for the
        # SESSION lifetime with no handle for the caller to unpersist;
        # checkpoint blocks are freed by the ContextCleaner as soon as
        # the returned DataFrame is dropped.
        pairs = pairs.localCheckpoint(eager=False)
    reps = pairs.groupBy("_nd_id").agg(F.min("_nd_other").alias("_nd_min_other"))
    reps = reps.select(
        F.col("_nd_id"),
        F.least(F.col("_nd_id"), F.col("_nd_min_other")).alias("near_rep"),
    )
    for _ in range(closure_rounds):
        nbr = (
            pairs.join(
                reps.select(
                    F.col("_nd_id").alias("_nd_other"),
                    F.col("near_rep").alias("_nbr_rep"),
                ),
                "_nd_other",
            )
            .groupBy("_nd_id")
            .agg(F.min("_nbr_rep").alias("_min_nbr_rep"))
        )
        reps = reps.join(nbr, "_nd_id", "left").select(
            "_nd_id",
            F.least(
                F.col("near_rep"),
                F.coalesce(F.col("_min_nbr_rep"), F.col("near_rep")),
            ).alias("near_rep"),
        )
    out = df.join(reps, df[id_col] == reps["_nd_id"], "left").drop("_nd_id")
    return out.withColumn(
        "is_near_dup",
        F.coalesce(F.col("near_rep") != F.col(id_col), F.lit(False)),
    )


# ---- MinHash LSH (shingle Jaccard) ------------------------------------------

N_PERM = 64
LSH_BANDS = 16


def with_minhash_bands(
    df: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """Arrow-batched MinHash signatures -> LSH band bucket ids (long[16]).

    The signature is the only Python step (vectorized per batch); banding,
    explode and bucket joins are built-ins downstream.
    """
    schema = f"{id_col} string, bands array<bigint>"

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            bands = [
                [b - (1 << 64) if b >= (1 << 63) else b for b in
                 minhash_bands(minhash_signature(t or ""), LSH_BANDS)]
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "bands": bands})

    return df.select(id_col, text_col).mapInPandas(compute, schema=schema)


def pairs_from_banded(
    banded: DataFrame,
    id_col: str = "url",
    max_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """Candidate pairs from a precomputed ``with_minhash_bands`` frame
    (``id_col``, ``bands``): explode band buckets, self-join on (band
    position, bucket hash). Split out of :func:`minhash_candidate_pairs`
    so a caller that persisted band signatures (the curation job's
    verdicts table) reuses the identical bucket-cap + join logic."""
    exploded = banded.select(
        F.col(id_col), F.posexplode("bands").alias("band_idx", "band_hash")
    )
    if max_bucket:
        sizes = exploded.groupBy("band_idx", "band_hash").agg(
            F.count(F.lit(1)).alias("_mh_bucket_n")
        )
        exploded = (
            exploded.join(sizes, ["band_idx", "band_hash"])
            .filter(F.col("_mh_bucket_n") <= max_bucket)
            .drop("_mh_bucket_n")
        )
    l, r = exploded.alias("l"), exploded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    max_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash LSH: explode band buckets,
    self-join on (band position, bucket hash). Returns distinct id pairs
    (a < b) for downstream exact-Jaccard verification. Buckets wider than
    ``max_bucket`` are skipped (degenerate content; see MAX_BAND_BUCKET)."""
    return pairs_from_banded(
        with_minhash_bands(df, text_col, id_col), id_col, max_bucket
    )


# ---------------------------------------------- signature-estimate dedup --
#
# MinHash-ESTIMATE verification: instead of re-reading both texts for an
# exact Jaccard, estimate it as the fraction of agreeing signature
# components (the textbook unbiased MinHash estimator, E[agree/n_perm] =
# J). This is the verification a STREAMING dedup can afford — state
# carries 512-byte signatures, never document text — and the batch twin
# below exists so the streaming operator
# (streaming/stateful.py streaming_near_dup) has an exact
# DataFrame-native equivalence target. est_num/est_den give the
# agreement threshold as an integer fraction (1/2 = estimated J >= 0.5)
# so the comparison is exact in both engines.

MINHASH_PERMS = 64


def with_minhash_sigs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig array<bigint>[64], bands array<bigint>[16]) in ONE
    Arrow-batched pass — the signature is computed once and reused for
    banding and estimate-verification."""
    schema = f"{id_col} long, sig array<bigint>, bands array<bigint>"

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs, bands = [], []
            for t in pdf[text_col]:
                s = minhash_signature(t or "")
                sigs.append([v - (1 << 64) if v >= (1 << 63) else v for v in s])
                bands.append(
                    [
                        b - (1 << 64) if b >= (1 << 63) else b
                        for b in minhash_bands(s, LSH_BANDS)
                    ]
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "sig": sigs, "bands": bands}
            )

    return df.select(id_col, text_col).mapInPandas(compute, schema=schema)


def signature_near_dup_marks(
    sigs: DataFrame,
    id_col: str = "doc_id",
    est_num: int = 1,
    est_den: int = 2,
    max_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """Arrival-order near-dup marks from (id, sig, bands) rows: a doc is
    a near-dup of the MINIMUM earlier id that shares >= 1 LSH band with
    signature agreement >= est_num/est_den. Returns (id, near_rep,
    is_near_dup) — the batch semantics the streaming operator pins
    against. Candidate generation is the capped band self-join;
    verification compares the two 64-slot signatures with zip_with
    (JVM-side, no Python)."""
    # candidate generation IS pairs_from_banded — one definition of the
    # bucket-cap + banded self-join, so a cap/predicate fix cannot drift
    # between this batch twin and the other callers
    cands = pairs_from_banded(sigs, id_col, max_bucket)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("_sig_a", "_sig_b", lambda x, y: x == y),
            lambda b: b,
        )
    )
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(agree * est_den >= MINHASH_PERMS * est_num)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("near_rep"))
    )
    return (
        sigs.select(id_col)
        .join(verified.withColumnRenamed("id_b", id_col), id_col, "left")
        .select(
            id_col,
            "near_rep",
            F.col("near_rep").isNotNull().alias("is_near_dup"),
        )
    )
