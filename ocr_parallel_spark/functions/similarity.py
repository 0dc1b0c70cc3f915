"""Similarity search over embedding columns (array<float>).

Training-pipeline component: brute-force cosine top-k as the correctness
baseline, plus an LSH-bucketed (random hyperplane) variant as the scale
path. Dot products and norms are pure column expressions
(``zip_with`` + ``aggregate``) — JVM-side, no Python on the hot path.

Scale note: brute force is O(Q x N) — fine for small Q (point lookups)
with a broadcast query side; the hyperplane-bucket variant turns that into
a bucket-equi-join whose cost follows bucket occupancy, the standard
ANN/LSH trade (recall < 1.0, candidates verified exactly).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Convenience form. NOTE: evaluates norm(a)/norm(b) inline — inside
    a pair join that recomputes per-side norms PER PAIR (and twice each:
    when-condition plus value). The top-k paths below precompute each
    side's norm once per ROW and combine with ``cosine_from_norms``."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Same arithmetic as ``cosine`` (bit-identical IEEE results) with
    the per-side norms supplied as precomputed columns."""
    d = na * nb
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def _prep_vec(df: DataFrame, vec_col: str, prefix: str) -> DataFrame:
    """Materialize the double-cast vector and its norm ONCE per row
    (referenced inside pair expressions they would re-evaluate per pair)."""
    out = df.withColumn(f"{prefix}vec", F.col(vec_col).cast("array<double>"))
    return out.withColumn(f"{prefix}norm", norm(F.col(f"{prefix}vec")))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query side,
    score all pairs, window-rank per query. Output: query_id, vec_id,
    cos_sim, rank."""
    from pyspark.sql import Window

    q = _prep_vec(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_q")),
        "_q",
        "_q",
    ).drop("_q")
    v = _prep_vec(vectors.select(id_col, vec_col), vec_col, "_v").drop(vec_col)
    pairs = v.crossJoin(F.broadcast(q))
    scored = pairs.withColumn(
        "cos_sim",
        cosine_from_norms(
            F.col("_vvec"), F.col("_qvec"), F.col("_vnorm"), F.col("_qnorm")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


def hyperplane_planes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH bucketing."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Sign-LSH bucket id: bit i = sign(v . plane_i). Bucket computation
    is a pure expression over literal plane arrays — no Python, and the
    same literal planes reproduce identical buckets everywhere."""
    planes = hyperplane_planes(dim, n_planes, seed)
    # cast the vector ONCE per row; per-plane expressions reference the
    # materialized column instead of re-casting n_planes times
    out = df.withColumn("_lshv", F.col(vec_col).cast("array<double>"))
    bucket = F.lit(0).cast("bigint")
    v = F.col("_lshv")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, p) > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        bucket = bucket + F.shiftleft(bit, i)
    return out.withColumn("lsh_bucket", bucket).drop("_lshv")


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF cell assignment: nearest ``nprobe`` centroids per vector by
    cosine, as pure column expressions over literal centroid arrays.
    Centroids ship in the plan (tiny; at scale they come from a sampled
    k-means run and are broadcast the same way)."""
    import math

    out = df.withColumn(
        "_ivfv", F.col(vec_col).cast("array<double>")
    ).withColumn("_ivfn", norm(F.col("_ivfv")))
    v, vn = F.col("_ivfv"), F.col("_ivfn")
    scored = F.array(
        *[
            F.struct(
                # the centroid norm is a DRIVER-side constant — Catalyst
                # does NOT fold aggregate() over literal arrays (verified
                # on the optimized plan), so compute it here: Python's
                # left-to-right float sum performs the exact IEEE double
                # additions the aggregate would, then one sqrt — the
                # result is bit-identical. The row norm is the
                # materialized column, once per row not per cell.
                cosine_from_norms(
                    v,
                    F.array(*[F.lit(float(x)) for x in c]),
                    vn,
                    F.lit(math.sqrt(sum((float(x) * float(x) for x in c), 0.0))),
                ).alias("sim"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    return out.withColumn(
        "ivf_cells", F.transform(top, lambda s: s["cell"])
    ).drop("_ivfv", "_ivfn")


def deterministic_centroids(
    vectors: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic centroid seed: the first ``n_cells`` vectors by id.
    (Production would run sampled k-means; determinism matters more than
    cell balance for the correctness harness.)"""
    rows = (
        vectors.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    )
    return [list(map(float, r[0])) for r in rows]


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: vectors live in their nearest cell (nprobe=1),
    queries probe their ``nprobe`` nearest cells; exact cosine ranks within
    the probed cells. The candidate join is a cell-equi-join — cost follows
    cell occupancy, the standard IVF trade."""
    from pyspark.sql import Window

    # drop the raw vectors after prep: only the double-cast copy + norm
    # cross the broadcast/join (no dead array bytes per candidate row)
    vc = _prep_vec(
        ivf_assign(vectors.select(id_col, vec_col), centroids, vec_col, 1).select(
            id_col, vec_col, F.element_at("ivf_cells", 1).alias("cell")
        ),
        vec_col,
        "_v",
    ).drop(vec_col)
    qc = _prep_vec(
        ivf_assign(
            queries.select(query_id_col, F.col(vec_col).alias("_q")),
            centroids,
            "_q",
            nprobe,
        ).select(query_id_col, "_q", F.explode("ivf_cells").alias("cell")),
        "_q",
        "_q",
    ).drop("_q")
    cands = vc.join(F.broadcast(qc), "cell")
    scored = cands.withColumn(
        "cos_sim",
        cosine_from_norms(
            F.col("_vvec"), F.col("_qvec"), F.col("_vnorm"), F.col("_qnorm")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine rank within candidates. Fewer planes => bigger buckets =>
    higher recall, more work (standard LSH dial)."""
    from pyspark.sql import Window

    vb = _prep_vec(
        with_lsh_bucket(vectors.select(id_col, vec_col), vec_col, dim, n_planes),
        vec_col,
        "_v",
    ).drop(vec_col)
    qb = _prep_vec(
        with_lsh_bucket(
            queries.select(query_id_col, F.col(vec_col).alias("_q")),
            "_q",
            dim,
            n_planes,
        ),
        "_q",
        "_q",
    ).drop("_q")
    cands = vb.join(F.broadcast(qb), "lsh_bucket")
    scored = cands.withColumn(
        "cos_sim",
        cosine_from_norms(
            F.col("_vvec"), F.col("_qvec"), F.col("_vnorm"), F.col("_qnorm")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )
