"""Overlap chunking and ordered concatenation (SURVEY §2.6 W1-W4).

Reference semantics (/root/reference/app/utils/chunking.py:11-72): slide a
window of ``chunk_size`` rows advancing ``chunk_size - overlap`` per step
over the ordered rows of one document; chunk text is the ``"\\n\\n"`` join
of member texts; the loop stops once a chunk reaches the end.

Spark-first shape: no per-group Python. Chunk ids are synthesized with
``sequence`` + ``explode`` from per-group counts, members attach via a
range condition on the row index, and text assembles with
``string_agg``-style ordered aggregation. Two shuffles total (rank, then
group-by-chunk) — both on (group, chunk) keys that scale with data, never
with the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_parallel_spark.config import CHUNK_OVERLAP, CHUNK_SIZE


def overlap_chunks(
    df: DataFrame,
    part_col: str,
    order_col: str,
    text_col: str,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """W1: overlapping chunks per partition group.

    Returns (part_col, chunk_index, start_<order>, end_<order>, n_rows,
    chunk_text). chunk_index is 0-based; last chunk may be short; a group
    with <= chunk_size rows yields exactly one chunk — matching the
    reference's loop-with-break (chunking.py:40-69).
    """
    if chunk_size <= overlap:
        raise ValueError(f"chunk_size ({chunk_size}) must be > overlap ({overlap})")
    step = chunk_size - overlap

    w = Window.partitionBy(part_col).orderBy(order_col)
    ranked = df.select(part_col, order_col, text_col).withColumn(
        "_rn", F.row_number().over(w) - 1
    ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(part_col)))

    # number of chunks: 1 for n <= chunk_size, else ceil((n-size)/step)+1
    n_chunks = F.when(F.col("_n") <= chunk_size, F.lit(1)).otherwise(
        F.ceil((F.col("_n") - chunk_size) / F.lit(step)) + 1
    )
    with_chunks = ranked.withColumn(
        "chunk_index",
        F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)),
    ).filter(
        (F.col("_rn") >= F.col("chunk_index") * step)
        & (F.col("_rn") < F.col("chunk_index") * step + chunk_size)
    )

    return (
        with_chunks.groupBy(part_col, "chunk_index")
        .agg(
            F.min(order_col).alias(f"start_{order_col}"),
            F.max(order_col).alias(f"end_{order_col}"),
            F.count(F.lit(1)).alias("n_rows"),
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_rn"), F.col(text_col)))
                    ),
                    lambda s: s[text_col],
                ),
            ).alias("chunk_text"),
        )
    )


def pages_from_chunks(
    chunks: DataFrame,
    part_col: str,
    start_col: str,
    end_col: str,
    chunk_filter=None,
) -> DataFrame:
    """W2: union of the page ranges of selected chunks -> sorted distinct
    page numbers per group (chunking.py:75-100)."""
    sel = chunks if chunk_filter is None else chunks.filter(chunk_filter)
    return (
        sel.select(
            part_col,
            F.explode(F.sequence(F.col(start_col), F.col(end_col))).alias("page"),
        )
        .distinct()
    )


def ordered_concat(
    df: DataFrame,
    part_col: str,
    order_col: str,
    text_col: str,
    sep: str = "\n\n",
) -> DataFrame:
    """W3/W4: per-group text concatenation in explicit order (the
    reference's sort-then-join, chunking.py:103-141 + full_ocr_service
    page sort :203). collect_list order is made deterministic by sorting
    on the carried order key, never on arrival order."""
    return df.groupBy(part_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col), F.col(text_col)))
                ),
                lambda s: s[text_col],
            ),
        ).alias("concat_text"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _two_level_offsets(
    t: DataFrame,
    id_col: str,
    source_col: str,
    num_parts: int | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed exclusive prefix sum of ``n_tokens`` per source in
    ``id_col`` order — the scale path behind :func:`pack_sequences`
    (VERDICT r4 #2). A plain ``Window.partitionBy(source)`` puts each
    source's ENTIRE manifest in one task; with the realistic handful
    of huge sources (CC, code, books…) that is a straggler/OOM at
    100 TB. Instead:

    1. ``repartitionByRange(source, id)`` — contiguous (source, id)
       ranges, one per shuffle partition, partition index monotone in
       the key order (Spark's RangePartitioner contract);
    2. local exclusive cumsum via a window on (source, partition id) —
       every window group is bounded by one shuffle partition, never
       by a source's total size;
    3. per-(source, pid) totals — ONE tiny row per window group —
       running-summed per source and broadcast back as each group's
       base.

    Returns the input columns plus ``tok_offset`` and ``_pack_pid``
    (kept so tests/plans can prove a source spans >1 task; callers
    drop it). Offsets are byte-identical to the single-window twin —
    pinned by ``tests/test_curation.py::test_pack_two_level_equals_window``.

    ``order_cols`` overrides the within-source order (default
    ``[id_col]``); it must be a TOTAL order per source — ties could
    split across range partitions and make the local cumsum
    order-dependent. token_budget_mix passes its seeded-hash shuffle
    order here (round-6: the same two-level shape replaced its
    single-window-per-source take, the r5 verdict's 100x-scale
    straggler).
    """
    from pyspark.sql import Window

    order_cols = list(order_cols) if order_cols else [id_col]

    # Default: AQE-managed partition count (coalescing adjacent range
    # partitions preserves key-order monotonicity, so correctness is
    # unaffected). An explicit num_parts pins the count — AQE leaves
    # user-specified repartitions alone — which tests use to prove a
    # source spans >1 task even on tiny inputs.
    # localCheckpoint pins the (row -> partition id) mapping: `ranged`
    # feeds BOTH the local-cumsum window and the totals/bases branch,
    # and the join back on (source, _pack_pid) is only correct if the
    # two subtrees observe identical pids — exchange reuse usually
    # guarantees that, but a nondeterministic upstream or divergent
    # AQE decisions would silently corrupt offsets.
    ranged = (
        (
            t.repartitionByRange(num_parts, source_col, *order_cols)
            if num_parts
            else t.repartitionByRange(source_col, *order_cols)
        )
        .withColumn("_pack_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy(source_col, "_pack_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "_local_off", (F.sum("n_tokens").over(w_local) - F.col("n_tokens")).cast("long")
    )
    totals = ranged.groupBy(source_col, "_pack_pid").agg(
        F.sum("n_tokens").cast("long").alias("_part_total")
    )
    w_base = (
        Window.partitionBy(source_col)
        .orderBy("_pack_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = totals.select(
        source_col,
        "_pack_pid",
        (F.sum("_part_total").over(w_base) - F.col("_part_total"))
        .cast("long")
        .alias("_part_base"),
    )
    # Null-safe equi-join: a NULL source is a legal group (the window
    # above treats it as one); a plain equi-key join would silently
    # drop its rows.
    b = bases.withColumnRenamed(source_col, "_b_src").withColumnRenamed(
        "_pack_pid", "_b_pid"
    )
    return (
        local.join(
            F.broadcast(b),
            F.col(source_col).eqNullSafe(F.col("_b_src"))
            & (F.col("_pack_pid") == F.col("_b_pid")),
        )
        .withColumn(
            "tok_offset", (F.col("_local_off") + F.col("_part_base")).cast("long")
        )
        .drop("_local_off", "_part_base", "_b_src", "_b_pid")
    )


def pack_sequences(
    docs: DataFrame,
    window_tokens: int = 512,
    id_col: str = "doc_id",
    source_col: str = "source",
    norm_col: str = "norm",
    base_offsets: DataFrame | None = None,
    n_tokens_col: str | Column | None = None,
    distributed: bool = True,
) -> DataFrame:
    """GPT-style concat-and-split sequence packing (the batch core
    behind queries_catalog.q_sequence_pack and scripts/job_pack.py):
    docs concatenate per source in ``id_col`` order; every doc gets its
    exact bigint start offset in the packed token stream plus the
    first/last window ids and the straddle flag training pipelines
    mask attention on.

    ``distributed=True`` (default) computes offsets with the two-level
    prefix sum (:func:`_two_level_offsets`) so no task ever holds a
    whole source; ``False`` keeps the original single-window-per-source
    pass as the semantics twin the equality pytest pins against.

    ``n_tokens_col`` makes the packer tokenizer-faithful (VERDICT r4
    #5): pass the name of a precomputed token-count column (or any
    Column expression) — e.g. real BPE counts landed by an upstream
    tokenizer pass — and offsets/window ids follow it exactly. Default
    ``None`` counts whitespace tokens over ``norm_col`` (the oracle
    twin), with NULL text coalesced to '' so a NULL row counts as one
    empty token instead of Spark's ``size(NULL) = -1`` corrupting every
    later offset (ADVICE r4).

    ``base_offsets`` (``source_col``, ``base_offset``) shifts each
    source's stream start — the resume hook: an incremental run packs
    its new docs CONTINUING from the committed stream end, exactly like
    the streaming packer's state store."""
    from pyspark.sql import Window

    if n_tokens_col is None:
        n_tok = F.size(
            F.split(F.coalesce(F.col(norm_col), F.lit("")), " ")
        ).cast("long")
    else:
        # Supplied counts are clamped to >= 0 with NULL -> 0: a caller
        # who builds counts with size(split(...)) on nullable text gets
        # -1 for NULL rows (the exact offset-corruption trap the default
        # counter guards against), and one bad row must never shift
        # every later doc's offset in its source.
        raw = (
            F.col(n_tokens_col)
            if isinstance(n_tokens_col, str)
            else n_tokens_col
        )
        n_tok = F.greatest(F.coalesce(raw.cast("long"), F.lit(0)), F.lit(0))
    t = docs.select(id_col, source_col, n_tok.alias("n_tokens"))
    if distributed:
        t = _two_level_offsets(t, id_col, source_col).select(
            id_col, source_col, "n_tokens", "tok_offset"
        )
    else:
        w = (
            Window.partitionBy(source_col)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        t = t.select(
            id_col,
            source_col,
            "n_tokens",
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            .cast("long")
            .alias("tok_offset"),
        )
    if base_offsets is not None:
        t = t.join(F.broadcast(base_offsets), source_col, "left").select(
            id_col,
            source_col,
            "n_tokens",
            (
                F.col("tok_offset")
                + F.coalesce(F.col("base_offset"), F.lit(0))
            )
            .cast("long")
            .alias("tok_offset"),
        )
    win_start = F.expr(f"tok_offset div {window_tokens}")
    # greatest(win_start, ...) pins the n_tokens = 0 edge: a zero-length
    # doc occupies the window AT its offset (n_windows = 1, never 0),
    # and the clamp absorbs the negative-dividend engine divergence
    # (tok_offset 0, n 0 -> Spark `-1 div W` truncates to 0 while
    # DuckDB `-1 // W` floors to -1; both sides of the oracle clamp).
    win_end = F.greatest(
        win_start, F.expr(f"(tok_offset + n_tokens - 1) div {window_tokens}")
    )
    return t.select(
        id_col,
        source_col,
        "n_tokens",
        "tok_offset",
        win_start.cast("long").alias("win_start"),
        win_end.cast("long").alias("win_end"),
        (win_end - win_start + 1).cast("long").alias("n_windows"),
        (win_end > win_start).alias("is_split"),
    )


def shard_shuffle(
    df: DataFrame,
    n_shards: int,
    key_cols: tuple[str, ...] = ("source", "win_id"),
    seed: str = "shard0",
) -> DataFrame:
    """Deterministic global shuffle of training units into output
    shards — the step between sequence packing and the training
    loader. Packed windows come out source-ordered (every CC window
    adjacent to the next CC window); feeding that order to a trainer
    correlates consecutive batches, so real pipelines hash-shuffle
    units across shard files exactly once, reproducibly.

    Each row gets ``shard_id`` (first 12 hex chars — 48 bits — of
    sha2-256('<seed>|<key...>') mod ``n_shards``; the repo's shared
    seeded-hash derivation, DuckDB-mirrorable) and ``shard_pos``
    (0-based rank within the shard, ordered by the NEXT 12 hex chars
    of the same digest with the key string as tiebreak — a uniform
    pseudo-random permutation derived from the seed alone, so re-runs,
    task retries, and the SQL oracle agree bit-for-bit; no Spark
    ``rand()``, whose per-partition streams reshuffle under AQE).
    48 bits, not a shorter slice: the id space must dominate any
    realistic ``n_shards`` — a 16-bit slice would cap distinct shards
    at 65,536 and bias the modulo long before that, while 2^48 keeps
    the bias negligible even at the ~400k shards a 100 TB pack needs.

    Scale shape: computing the keys is map-side; the rank is one hash
    exchange on ``shard_id`` + per-shard sort — and one task per shard
    is exactly the write pattern (a shard IS one output file). Unlike
    a per-SOURCE window (bounded by the corpus' biggest source), the
    per-task bound here is total/n_shards and ``n_shards`` is the
    caller's knob: 100 TB at ~256 MB shards is ~400k shards, each task
    bounded regardless of source skew. NULL key columns coalesce to ''
    inside the key (concat_ws would silently DROP them, letting
    ('a', NULL) collide with ('a',))."""
    key = F.concat_ws(
        "|",
        F.lit(seed),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(""))
            for c in key_cols
        ],
    )
    h = F.sha2(key, 256)
    out = df.withColumn("_shard_key", key).withColumn(
        "shard_id",
        (F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % n_shards),
    ).withColumn(
        "_shard_sort", F.conv(F.substring(h, 13, 12), 16, 10).cast("long")
    )
    w = Window.partitionBy("shard_id").orderBy("_shard_sort", "_shard_key")
    return (
        out.withColumn(
            "shard_pos", (F.row_number().over(w) - 1).cast("long")
        )
        .drop("_shard_key", "_shard_sort")
    )
