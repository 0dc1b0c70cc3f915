"""Multimodal plumbing + similarity-search tests (training toolkit).

The decode arithmetic is a deterministic stand-in (no codecs in the
container) — these tests pin the REAL parts: Arrow batch shapes, schemas,
1->N plans, feature normalization, and ANN recall against brute force.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_parallel_spark.multimodal import (
    audio_chunk_plan,
    byte_histogram_features,
    decode_image_pixels,
    decode_media_meta,
    frame_sample_plan,
    synthesize_media,
)


def test_media_meta_schema_and_values(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    meta = decode_media_meta(media)
    assert [f.name for f in meta.schema.fields] == [
        "media_id", "kind", "n_bytes", "width", "height", "duration_s",
    ]
    rows = {r.media_id: r for r in meta.collect()}
    src = {r.media_id: r for r in media.select("media_id", "kind", F.octet_length("payload").alias("n")).collect()}
    assert rows.keys() == src.keys()
    for mid, r in rows.items():
        n = src[mid].n
        assert r.n_bytes == n
        if r.kind == "image":
            assert r.width == 64 + n % 577 and r.height == 48 + n % 331
            assert r.duration_s == 0.0
        else:
            assert r.width == 0 and r.height == 0
            assert r.duration_s > 0 or n < 1024


def test_decode_pixels_is_an_explicit_gap():
    with pytest.raises(NotImplementedError):
        decode_image_pixels(b"\x89PNG...")


def test_byte_histogram_features_normalized(spark, sf_dir):
    feats = byte_histogram_features(synthesize_media(spark, sf_dir)).collect()
    assert len(feats) > 0
    per_id: dict[int, list] = {}
    for r in feats:
        per_id.setdefault(r.media_id, []).append(r)
    for rows in per_id.values():
        assert sorted(r.bin for r in rows) == list(range(16))
        total = sum(r.n for r in rows)
        assert total > 0
        for r in rows:
            assert r.weight == r.n / total  # exact IEEE division
        assert abs(sum(r.weight for r in rows) - 1.0) < 1e-12


def test_frame_sample_plan_counts(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    frames = frame_sample_plan(media, every_n=24)
    got = (
        frames.groupBy("media_id").count().collect()
    )
    src = {
        r.media_id: r.n
        for r in media.filter(F.col("kind") == "video")
        .select("media_id", F.octet_length("payload").alias("n"))
        .collect()
    }
    assert {r.media_id for r in got} == set(src)
    for r in got:
        n_frames = max(src[r.media_id] // 1024 - 1, 0)
        assert r["count"] == n_frames // 24 + 1
    offs = frames.filter(F.col("frame_idx") > 0).select(
        (F.col("byte_offset") == F.col("frame_idx") * 1024).alias("ok")
    )
    assert all(x.ok for x in offs.collect())


def test_audio_chunks_cover_duration(spark, sf_dir):
    meta = decode_media_meta(synthesize_media(spark, sf_dir))
    chunks = audio_chunk_plan(meta, chunk_s=5.0, overlap_s=1.0)
    per = chunks.groupBy("media_id").agg(
        F.max("end_s").alias("max_end"), F.count(F.lit(1)).alias("n")
    )
    j = per.join(meta.select("media_id", "duration_s"), "media_id")
    for r in j.collect():
        assert r.max_end == r.duration_s  # last chunk reaches the end
    # chunks overlap by 1s: consecutive starts differ by step=4
    two = chunks.filter(F.col("chunk_idx") == 1).select("start_s").collect()
    assert all(abs(r.start_s - 4.0) < 1e-9 for r in two)


def test_lsh_topk_recall_vs_brute_force(spark, sf_dir):
    from ocr_parallel_spark.functions.similarity import brute_force_topk, lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, k=5, dim=64, n_planes=4, n_tables=4, n_probes=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    # rank-1 self-match always survives (query is in its own bucket)
    self_hits = {(r.query_id, r.vec_id) for r in approx.filter("rank = 1").collect()}
    assert all(q == v for q, v in self_hits)
    # multi-table dedup: no (query, vec) pair may appear twice even
    # though pairs collide in several tables
    assert len(a) == approx.count()
    recall = len(e & a) / len(e)
    # gated 4x4x4-probe config: measured 0.76 on this corpus (sf0.001);
    # deterministic (literal planes)
    assert recall >= 0.7, f"LSH recall collapsed: {recall}"


def test_lsh_sublinear_on_clustered_data(spark):
    """The production LSH claim: where the data HAS structure (clusters,
    near-neighbors at cos >= 0.9), a wide-and-many config (12 planes x 8
    tables) finds the true neighbors with high recall while touching only
    a small fraction of the corpus — the candidate set is sublinear.
    The synthetic benchmark embeddings are near-random (5th-neighbor cos
    ~0.35), where NO bucketing scheme can be simultaneously high-recall
    and sublinear; this planted corpus pins the regime the operator is
    actually built for."""
    import numpy as np

    from ocr_parallel_spark.functions.similarity import (
        brute_force_topk,
        lsh_topk,
        with_lsh_buckets,
    )

    rng = np.random.RandomState(3)
    dim, n_clusters, per = 64, 40, 25  # 1000 vectors in 40 tight clusters
    bases = rng.standard_normal((n_clusters, dim))
    bases /= np.linalg.norm(bases, axis=1)[:, None]
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per):
            # per-dim noise 0.02 -> noise-vector norm ~0.16 vs unit base
            # -> member-member cos ~0.95
            v = bases[c] + 0.02 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % per == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, k=5, dim=dim, n_planes=12, n_tables=8)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"clustered recall collapsed: {recall}"
    # sublinearity: distinct candidates per query << corpus size
    v_idx = with_lsh_buckets(
        emb, "embedding", dim, n_planes=12, n_tables=8
    ).select("vec_id", F.explode("lsh_buckets").alias("b"))
    q_idx = with_lsh_buckets(
        queries.withColumnRenamed("embedding", "_q"), "_q", dim, 12, 8
    ).select("query_id", F.explode("lsh_buckets").alias("b"))
    n_cand = (
        v_idx.join(q_idx, "b").select("query_id", "vec_id").distinct().count()
    )
    frac = n_cand / (queries.count() * emb.count())
    assert frac < 0.15, f"candidate set not sublinear on clustered data: {frac}"


def test_lsh_multiprobe_matches_recall_with_half_the_tables(spark):
    """Query-directed multi-probe trades broadcast-side query probes for
    corpus-index tables: on the planted clustered corpus, 4 tables with
    just 4 least-confident-bit probes must reach the >= 0.9 recall that
    8 tables reach probe-free, while the corpus index (the 100 TB side)
    carries HALF the rows. (Measured: probes=2 already hits 0.935 —
    margin-directed flips beat the fixed-bit scheme, which needed the
    entire Hamming-1 neighborhood of 12 probes for the same recall.)"""
    import numpy as np

    from ocr_parallel_spark.functions.similarity import brute_force_topk, lsh_topk

    rng = np.random.RandomState(3)
    dim, n_clusters, per = 64, 40, 25
    bases = rng.standard_normal((n_clusters, dim))
    bases /= np.linalg.norm(bases, axis=1)[:, None]
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = bases[c] + 0.02 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % per == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    e = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    probed = lsh_topk(
        emb, queries, k=5, dim=dim, n_planes=12, n_tables=4, n_probes=4
    )
    a = {(r.query_id, r.vec_id) for r in probed.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"multi-probe recall collapsed: {recall}"


def test_lsh_multiprobe_validates_probe_range(spark):
    import pytest

    from ocr_parallel_spark.functions.similarity import lsh_topk

    emb = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError):
        lsh_topk(emb, q, n_planes=4, n_tables=2, n_probes=5)


def test_simhash_near_dups_marks_drifted_copy(spark, sf_dir):
    from ocr_parallel_spark.queries_catalog import q_simhash_near_dups

    marked = q_simhash_near_dups(spark, sf_dir)
    rows = marked.collect()
    assert len(rows) > 0
    # representative invariants: near_rep <= doc_id for marked dups;
    # non-dups either unmarked (null rep) or are their own representative
    for r in rows:
        if r.is_near_dup:
            assert r.near_rep is not None and r.near_rep < r.doc_id
        elif r.near_rep is not None:
            assert r.near_rep == r.doc_id


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from ocr_parallel_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_centroids(emb, n_cells=8)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, cents, k=5, nprobe=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    # every query finds itself (its cell is always probed at nprobe>=1)
    self_hits = {(r.query_id, r.vec_id) for r in approx.filter("rank = 1").collect()}
    assert all(q == v for q, v in self_hits)
    recall = len(e & a) / len(e)
    # measured 0.80 on this corpus; deterministic (seeded k-means)
    assert recall >= 0.7, f"IVF recall collapsed: {recall}"


def test_kmeans_centroids_deterministic_and_balanced(spark, sf_dir):
    import numpy as np

    from ocr_parallel_spark.functions.similarity import (
        ivf_assign,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = kmeans_centroids(emb, n_cells=8)
    c2 = kmeans_centroids(emb, n_cells=8)
    assert c1 == c2, "sampled k-means must be run-to-run deterministic"
    assert len(c1) == 8 and all(len(c) == 64 for c in c1)
    # balanced cells: no cell above 2x the mean occupancy (the skew the
    # first-N-by-id seeding could not rule out)
    assigned = ivf_assign(emb, c1, "embedding", nprobe=1).select(
        F.element_at("ivf_cells", 1).alias("cell")
    )
    sizes = [r.n for r in assigned.groupBy("cell").count().withColumnRenamed("count", "n").collect()]
    mean = sum(sizes) / len(sizes)
    assert max(sizes) <= 2 * mean, f"skewed cells: {sorted(sizes)}"
    # k > sample: degrades to k=n without error
    tiny = emb.limit(3)
    assert len(kmeans_centroids(tiny, n_cells=8)) == 3
    two_np = np.array(c1)
    assert np.isfinite(two_np).all()


def test_minhash_verified_pairs_only_high_jaccard(spark, sf_dir):
    from ocr_parallel_spark.queries_catalog import q_minhash_verified_pairs

    rows = q_minhash_verified_pairs(spark, sf_dir).collect()
    assert all(r.jaccard >= 0.5 for r in rows)


def test_resize_plan_and_execution(spark, sf_dir):
    from ocr_parallel_spark.multimodal import (
        decode_media_meta,
        resize_images,
        resize_plan,
        synthesize_media,
    )

    media = synthesize_media(spark, sf_dir)
    meta = decode_media_meta(media)
    plan = resize_plan(meta, max_side=256)
    rows = plan.collect()
    assert len(rows) > 0
    for r in rows:
        assert max(r.new_width, r.new_height) <= 256
        if max(r.width, r.height) <= 256:
            assert (r.new_width, r.new_height) == (r.width, r.height)
        else:
            # aspect ratio preserved within integer floor error
            assert abs(r.new_width * r.height - r.new_height * r.width) <= max(
                r.width, r.height
            )
    done = resize_images(media, plan).collect()
    assert {r.media_id for r in done} == {r.media_id for r in rows}
    for r in done:
        assert r.n_bytes_resized >= 1


def test_byte_histogram_empty_payload_is_all_zero(spark):
    """An empty payload must yield 16 honest zero rows (no fabricated
    byte) with weight 0.0 — matching the SQL oracle's LEFT JOIN shape."""
    df = spark.createDataFrame([(1, b""), (2, b"\x12\x34")], "media_id long, payload binary")
    rows = {(r.media_id, r.bin): (r.n, r.weight) for r in byte_histogram_features(df).collect()}
    assert len(rows) == 32
    assert all(rows[(1, b)] == (0, 0.0) for b in range(16))
    assert rows[(2, 1)][0] == 1 and rows[(2, 3)][0] == 1  # high nibbles 1 and 3
    assert abs(rows[(2, 1)][1] - 0.5) < 1e-15


def test_lsh_persisted_index_round_trip(spark, sf_dir, tmp_path):
    """Build-once / query-many: the corpus index built in one pass,
    snapshot-committed, read back from disk, and passed into lsh_topk
    must return EXACTLY the inline result (deterministic planes); an
    appended second batch of vectors extends the same index."""
    from pyspark.sql import functions as F

    from ocr_parallel_spark.functions.similarity import build_lsh_index, lsh_topk
    from ocr_parallel_spark.io.snapshot import SnapshotTable

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cfg = dict(k=5, dim=64, n_planes=4, n_tables=4, n_probes=4)

    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    table = SnapshotTable(str(tmp_path / "lsh_index"))
    table.append(build_lsh_index(first, dim=64, n_planes=4, n_tables=4))
    table.append(build_lsh_index(second, dim=64, n_planes=4, n_tables=4))
    stored = table.read(spark)
    assert stored.count() == emb.count() * 4  # n_tables rows per vector

    from_index = lsh_topk(emb, queries, index=stored, **cfg)
    inline = lsh_topk(emb, queries, **cfg)
    a = sorted(map(tuple, from_index.collect()))
    b = sorted(map(tuple, inline.collect()))
    assert a == b and len(a) > 0


def test_ivf_persisted_index_round_trip(spark, sf_dir, tmp_path):
    """IVF build-once / query-many: centroids serialized to a (cell,
    centroid) table + the (id, cell) assignment rows snapshot-committed
    in two appends; read back, the centroid list round-trips exactly
    and ivf_topk(index=...) returns EXACTLY the inline result."""
    from pyspark.sql import functions as F

    from ocr_parallel_spark.functions.similarity import (
        build_ivf_index,
        centroids_from_df,
        centroids_to_df,
        ivf_topk,
        kmeans_centroids,
    )
    from ocr_parallel_spark.io.snapshot import SnapshotTable

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = kmeans_centroids(emb, n_cells=8)

    ctable = SnapshotTable(str(tmp_path / "ivf_centroids"))
    ctable.append(centroids_to_df(spark, cents))
    assert centroids_from_df(ctable.read(spark)) == cents

    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    itable = SnapshotTable(str(tmp_path / "ivf_index"))
    itable.append(build_ivf_index(first, cents))
    itable.append(build_ivf_index(second, cents))
    stored = itable.read(spark)
    assert stored.count() == emb.count()  # one cell row per vector

    restored = centroids_from_df(ctable.read(spark))
    from_index = ivf_topk(
        emb, queries, restored, k=5, nprobe=4, index=stored
    )
    inline = ivf_topk(emb, queries, cents, k=5, nprobe=4)
    a = sorted(map(tuple, from_index.collect()))
    b = sorted(map(tuple, inline.collect()))
    assert a == b and len(a) > 0


def test_ivf_stale_index_assigns_unindexed_inline(spark, sf_dir, tmp_path):
    """A persisted index built BEFORE new vectors arrived must not
    silently drop them from top-k (ADVICE r4): the left-anti remainder
    is assigned inline, so querying a grown corpus against a stale
    index equals the fully-inline result."""
    from pyspark.sql import functions as F

    from ocr_parallel_spark.functions.similarity import (
        build_ivf_index,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = kmeans_centroids(emb, n_cells=8)
    # index covers only a THIRD of the corpus — the rest is "added
    # after the build"
    stale = build_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), cents)
    from_stale = ivf_topk(emb, queries, cents, k=5, nprobe=4, index=stale)
    inline = ivf_topk(emb, queries, cents, k=5, nprobe=4)
    a = sorted(map(tuple, from_stale.collect()))
    b = sorted(map(tuple, inline.collect()))
    assert a == b and len(a) > 0
    # and the result really does contain unindexed ids (vacuity guard)
    assert any(r[1] % 3 != 0 for r in a)


# ---------------------------------------------------------------- semdedup --


def _semdedup_corpus(spark):
    """Three planted epsilon-groups (near-identical directions) plus
    orthogonal singletons — ground truth is exact by construction."""
    rows = []
    # group A: ids 0,1,2 ~ e0 direction with tiny jitter
    for i in range(3):
        rows.append((i, [1000.0 + i] + [float(i)] + [0.0] * 62))
    # group B: ids 10,11 ~ e2 direction
    for i in range(2):
        rows.append((10 + i, [0.0, 0.0, 500.0 + i, float(i)] + [0.0] * 60))
    # singletons far from everything (orthogonal axes)
    rows.append((20, [0.0] * 10 + [7.0] + [0.0] * 53))
    rows.append((21, [0.0] * 20 + [9.0] + [0.0] * 43))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_marks_planted_groups(spark):
    from ocr_parallel_spark.functions.similarity import (
        kmeans_centroids,
        semdedup_marks,
    )

    emb = _semdedup_corpus(spark)
    cents = kmeans_centroids(emb, n_cells=4)
    out = semdedup_marks(emb, cents, 0.9)
    got = {r.vec_id: (r.is_sem_dup, r.dup_of) for r in out.collect()}
    assert len(got) == 7  # one row per input vector
    # group minima + singletons survive; non-minima marked with dup_of
    assert got[0] == (False, None)
    assert got[1] == (True, 0) and got[2] == (True, 0)
    assert got[10] == (False, None) and got[11] == (True, 10)
    assert got[20] == (False, None) and got[21] == (False, None)


def test_semdedup_deterministic(spark):
    from ocr_parallel_spark.functions.similarity import (
        kmeans_centroids,
        semdedup_marks,
    )

    emb = _semdedup_corpus(spark)
    cents = kmeans_centroids(emb, n_cells=4)
    a = sorted(map(tuple, semdedup_marks(emb, cents, 0.9).collect()))
    b = sorted(map(tuple, semdedup_marks(emb, cents, 0.9).collect()))
    assert a == b


def test_semdedup_max_cell_cap_bounds_pairing(spark):
    """Overflow members of a hot cell pass through UNMARKED (bounded
    recall trade) — and every row still comes back exactly once."""
    from ocr_parallel_spark.functions.similarity import (
        kmeans_centroids,
        semdedup_marks,
    )

    emb = _semdedup_corpus(spark)
    cents = kmeans_centroids(emb, n_cells=4)
    capped = semdedup_marks(emb, cents, 0.9, max_cell=2)
    rows = capped.collect()
    assert len(rows) == 7
    n_marked = sum(r.is_sem_dup for r in rows)
    # group A has 3 members but only 2 may pair per cell: at most one of
    # them can be marked; group B (2 members) is unaffected.
    full = semdedup_marks(emb, cents, 0.9)
    n_full = sum(r.is_sem_dup for r in full.collect())
    assert n_full == 3 and n_marked <= 2


def test_semdedup_canon_resolves_epsilon_chains(spark):
    """a < b < c with (a,b) and (b,c) close but (a,c) not: c's dup_of
    is the MARKED doc b; semdedup_canon resolves both to the kept chain
    minimum a via connected components."""
    from ocr_parallel_spark.functions.similarity import (
        kmeans_centroids,
        semdedup_canon,
        semdedup_marks,
    )

    # unit-ish vectors on a slow arc: cos(a,b)=cos(b,c)~0.95, cos(a,c)~0.81
    import math

    def on_arc(theta):
        return [math.cos(theta) * 10, math.sin(theta) * 10] + [0.0] * 14

    t = math.acos(0.95)
    docs = spark.createDataFrame(
        [(1, on_arc(0.0)), (2, on_arc(t)), (3, on_arc(2 * t)),
         (9, [0.0] * 8 + [5.0] + [0.0] * 7)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_centroids(docs, n_cells=2)
    marks = semdedup_marks(docs, cents, 0.9)
    got = {r.vec_id: (r.is_sem_dup, r.dup_of) for r in marks.collect()}
    assert got[1] == (False, None)
    assert got[2] == (True, 1)
    assert got[3] == (True, 2)  # the chain: dup_of is itself marked
    canon = {r.vec_id: (r.canon_id, r.is_sem_dup)
             for r in semdedup_canon(marks).collect()}
    assert canon[1] == (1, False) and canon[9] == (9, False)
    assert canon[2] == (1, True) and canon[3] == (1, True)
