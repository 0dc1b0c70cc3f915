"""Event-time windows, watermarks, and custom stateful streaming operators.

Completes the Structured Streaming surface beyond ingest (incremental.py):

- ``windowed_lang_counts``: tumbling event-time window over ``warc_ts``
  with a watermark — the streaming analog of the reference's batch metric
  rollups (A1/A5), with late data handled by the watermark instead of a
  re-run. Append mode: a window emits exactly once, when the watermark
  passes its end.
- ``running_user_counts``: custom stateful operator via
  ``applyInPandasWithState`` — per-key running totals that survive
  restarts through the checkpoint (the streaming analog of the
  reference's per-batch accumulator loops, e.g. full_process_orchestrator
  stats). This is the extension point for custom session/rollup logic
  that built-in windows can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _round4_half_up(x: float) -> float:
    """Spark's ``F.round(col, 4)`` exactly: Java's
    ``BigDecimal.valueOf(x)`` parses the double's SHORTEST decimal
    repr (= Python ``repr``) and quantizes HALF_UP. Python's built-in
    ``round()`` is NOT equivalent — it rounds the exact binary value
    half-to-even (repr "0.90025" -> 0.9002 built-in vs 0.9003 Spark;
    exact tie 0.03125 -> 0.0312 vs 0.0313) — so a streaming twin that
    used it would diverge from its batch operator at threshold
    boundaries. Pinned against a literal F.round sweep in
    tests/test_streaming.py."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


def windowed_lang_counts(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Pages per (event-time window, lang). Late rows older than the
    watermark are dropped; in append output mode each window emits once,
    after the watermark passes its end."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )


_OUT_SCHEMA = "user_id bigint, total_events bigint, batches int"
_STATE_SCHEMA = "total bigint, batches int"


def _update_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    if state.exists:
        total, batches = state.get
    else:
        total, batches = 0, 0
    total += n
    batches += 1
    state.update((total, batches))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [total], "batches": [batches]}
    )


def running_user_counts(events_stream: DataFrame) -> DataFrame:
    """Per-user running event counts as a custom stateful operator: state
    (total, batches) lives in the state store, recovered from the
    checkpoint across restarts. One row per key per micro-batch that saw
    the key; append operator mode (emitted rows are final) so the file
    sink — which only supports append — can take them."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_counts,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------- streaming sequence packer

_PACK_OUT_SCHEMA = (
    "doc_id bigint, source string, n_tokens bigint, tok_offset bigint, "
    "win_start bigint, win_end bigint, n_windows bigint, is_split boolean"
)
_PACK_STATE_SCHEMA = "next_offset bigint, seen array<bigint>"

# Re-delivery guard window: the packer remembers the last PACK_SEEN_CAP
# doc_ids per source and silently drops a re-arrival — without this an
# at-least-once source (kafka producer retries, a doc landing in two
# ingest files) would pack the doc TWICE and permanently shift every
# later offset in the source (the offset state never self-corrects).
# BOUNDED by design, unlike the dedup operators' per-bucket membership:
# pack state is keyed per SOURCE (a handful of keys), so an unbounded
# seen-set would hold the whole corpus's ids in a few state rows.
# Producer-side duplicates cluster in adjacent micro-batches; a dup
# older than the window is the batch packer's --recompute arbiter case,
# the same contract as every streaming dedup here.
PACK_SEEN_CAP = 8192


def _make_pack_fn(window_tokens: int):
    def pack(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [p for p in pdfs if len(p)]
        if state.exists:
            off, seen_arr = state.get
            seen_list = list(seen_arr)
        else:
            off, seen_list = 0, []
        if not parts:
            state.update((off, seen_list))
            return
        pdf = (
            pd.concat(parts, ignore_index=True)
            .sort_values("doc_id")
            # in-batch duplicates collapse to the first row; cross-batch
            # re-deliveries drop against the recent-seen window
            .drop_duplicates("doc_id", keep="first")
        )
        pdf = pdf[~pdf["doc_id"].isin(set(seen_list))]
        if not len(pdf):
            state.update((off, seen_list))
            return
        n = pdf["n_tokens"].to_numpy()
        starts = n.cumsum() - n + off
        ends = starts + n - 1
        ws, we = starts // window_tokens, ends // window_tokens
        seen_list.extend(int(d) for d in pdf["doc_id"])
        state.update((int(off + n.sum()), seen_list[-PACK_SEEN_CAP:]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "source": key[0],
                "n_tokens": n,
                "tok_offset": starts,
                "win_start": ws,
                "win_end": we,
                "n_windows": we - ws + 1,
                "is_split": we > ws,
            }
        )

    return pack


def streaming_sequence_pack(
    docs_stream: DataFrame, window_tokens: int = 512
) -> DataFrame:
    """Streaming GPT-style sequence packing — the stateful twin of the
    batch ``q_sequence_pack``: per source, the next pack offset lives in
    the state store, so docs arriving across micro-batches (and across
    restarts, via the checkpoint) land at exactly the offsets a batch
    run over the concatenated arrivals would give. Within a micro-batch
    docs pack in doc_id order; across batches, in arrival order — the
    streaming contract (a global order does not exist on an unbounded
    stream). Re-delivered doc_ids inside the last ``PACK_SEEN_CAP``
    arrivals per source are dropped rather than re-packed (an
    at-least-once duplicate would otherwise shift every later offset
    permanently — see PACK_SEEN_CAP for why the guard is a bounded
    window here, not the dedup operators' full membership set).
    Equivalence with the batch operator on identical, ordered input is
    pinned in pytest. Append operator mode: emitted rows are final."""
    from ocr_parallel_spark.operators.classify import normalize_col

    # Coalesce NULL text like the batch twin (job_pack.build_output):
    # size(split(NULL)) is NULL -> NaN in the pandas batch -> cumsum
    # poisons every later offset and int(NaN) kills the query.
    text_nn = F.coalesce(F.col("text"), F.lit(""))
    toks = docs_stream.select(
        "doc_id",
        "source",
        F.size(F.split(normalize_col(text_nn), " "))
        .cast("long")
        .alias("n_tokens"),
    )
    return toks.groupBy("source").applyInPandasWithState(
        _make_pack_fn(window_tokens),
        outputStructType=_PACK_OUT_SCHEMA,
        stateStructType=_PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------- streaming near-dup --

_ND_OUT_SCHEMA = "doc_id bigint, near_rep bigint"
_ND_STATE_SCHEMA = "ids array<bigint>, sigs array<binary>"


def _make_neardup_fn(est_num: int, est_den: int, max_bucket: int, n_perm: int):
    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            ids, sigs = state.get
            ids, sigs = list(ids), [bytes(s) for s in sigs]
        else:
            ids, sigs = [], []
        seen = set(ids)
        parts = [p for p in pdfs if len(p)]
        if not parts:
            state.update((ids, sigs))
            return
        pdf = pd.concat(parts, ignore_index=True).sort_values("doc_id")
        mats = [np.frombuffer(s, dtype="<u8") for s in sigs]
        out_ids, out_reps = [], []
        for doc_id, sig_bytes in zip(pdf["doc_id"], pdf["sig"]):
            doc_id = int(doc_id)
            sig_bytes = bytes(sig_bytes)
            sig = np.frombuffer(sig_bytes, dtype="<u8")
            best = None
            for pid, pmat in zip(ids, mats):
                if pid >= doc_id:
                    continue  # keep-earliest: only earlier docs can own a rep slot
                agree = int((sig == pmat).sum())
                if agree * est_den >= n_perm * est_num and (
                    best is None or pid < best
                ):
                    best = pid
            if best is not None:
                out_ids.append(doc_id)
                out_reps.append(best)
            # membership check: at-least-once sources can re-deliver a
            # doc; re-appending it would burn cap slots and let a doc
            # match its own earlier delivery
            if len(ids) < max_bucket and doc_id not in seen:
                seen.add(doc_id)
                ids.append(doc_id)
                sigs.append(sig_bytes)
                mats.append(sig)
        state.update((ids, sigs))
        if out_ids:
            yield pd.DataFrame({"doc_id": out_ids, "near_rep": out_reps})

    return dedup


def streaming_near_dup(
    docs_stream: DataFrame,
    est_num: int = 1,
    est_den: int = 2,
    max_bucket: int = 256,
) -> DataFrame:
    """Streaming MinHash near-dup detection — the stateful twin of the
    batch ``operators/neardup.py signature_near_dup_marks``: per LSH
    band bucket, the state store carries the (doc_id, 512-byte MinHash
    signature) pairs seen so far — never document text — and each
    arriving doc compares its signature against the bucket's members
    (the unbiased agree/n_perm Jaccard estimator, integer threshold
    est_num/est_den). Emits one (doc_id, near_rep) row per band where a
    doc matched an EARLIER doc; consumers take min(near_rep) per doc
    (the match with the minimum rep is emitted by whatever shared band
    contains it, so the per-doc min equals the batch twin's min —
    pinned in pytest, along with restart continuity via the
    checkpoint). State per bucket is capped at ``max_bucket`` entries
    (same degenerate-boilerplate rationale as MAX_BAND_BUCKET).
    Over-cap semantics intentionally DIFFER from the batch twin: the
    batch cap drops the whole degenerate bucket (emits no marks from
    it), while the stream — which cannot retroactively unmark — stops
    ADMITTING members past the cap but keeps comparing arrivals
    against the admitted prefix, so a degenerate bucket still catches
    dups of its first ``max_bucket`` members. The pinned stream==batch
    equivalence therefore holds for buckets within the cap; degenerate
    buckets are best-effort in both, by different trades. Re-delivered
    doc_ids (at-least-once sources) are membership-checked so they
    neither burn cap slots nor match their own earlier delivery.

    State growth: each bucket is capped, but the NUMBER of buckets
    grows with distinct content — O(distinct band buckets x cap x
    ~520 B). A production deployment bounds that by evicting cold
    buckets on a processing-time TTL (trading dedup-against-cold-
    history for bounded state, the same policy the url-dedup stream
    applies via watermark TTL). NOT implemented here by design: under
    ``availableNow`` triggers — which every gate/test in this sandbox
    uses — a registered ``ProcessingTimeTimeout`` keeps scheduling
    timeout batches and the query never reaches the terminated state
    (verified empirically on pyspark 4.1; a continuous-trigger
    deployment does not hit this). The periodic-recompute arbiter
    (job_curate --recompute) is the batch-side answer to unbounded
    history.

    Prep (signature + banding) is one non-stateful Arrow pass; the
    stateful exchange shuffles (band_key, doc_id, 512-byte sig) rows
    only — at CC scale the state store holds bands of the KEPT corpus,
    the streaming analog of job_curate's committed-signature band join.
    """
    # Constants shared with the batch twin (operators/neardup.py) so
    # tuning LSH_BANDS/MINHASH_PERMS can never de-synchronize the two.
    from ocr_parallel_spark.kernel.simhash import minhash_bands, minhash_signature
    from ocr_parallel_spark.operators.neardup import LSH_BANDS, MINHASH_PERMS

    def prep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, keys, sigs = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                s = minhash_signature(t or "", n_perm=MINHASH_PERMS)
                raw = np.array(s, dtype="<u8").tobytes()
                for i, b in enumerate(minhash_bands(s, LSH_BANDS)):
                    ids.append(doc_id)
                    keys.append(f"{i}:{b:016x}")
                    sigs.append(raw)
            yield pd.DataFrame(
                {"band_key": keys, "doc_id": ids, "sig": sigs}
            )

    rows = docs_stream.select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    ).mapInPandas(prep, "band_key string, doc_id bigint, sig binary")
    return rows.groupBy("band_key").applyInPandasWithState(
        _make_neardup_fn(est_num, est_den, max_bucket, MINHASH_PERMS),
        outputStructType=_ND_OUT_SCHEMA,
        stateStructType=_ND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------- streaming sem-dedup --

_SD_OUT_SCHEMA = "doc_id bigint, sem_rep bigint"
_SD_STATE_SCHEMA = "ids array<bigint>, vecs array<binary>, norms array<double>"


def _make_semdedup_fn(threshold: float, max_cell: int):
    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            ids, vecs, norms = state.get
            ids = list(ids)
            vecs = [bytes(v) for v in vecs]
            norms = list(norms)
        else:
            ids, vecs, norms = [], [], []
        seen = set(ids)
        parts = [p for p in pdfs if len(p)]
        if not parts:
            state.update((ids, vecs, norms))
            return
        pdf = pd.concat(parts, ignore_index=True).sort_values("doc_id")
        mats = [np.frombuffer(v, dtype="<f8") for v in vecs]
        out_ids, out_reps = [], []
        for doc_id, vb, vn in zip(pdf["doc_id"], pdf["vec"], pdf["vnorm"]):
            doc_id, vb, vn = int(doc_id), bytes(vb), float(vn)
            v = np.frombuffer(vb, dtype="<f8")
            best = None
            for pid, pv, pn in zip(ids, mats, norms):
                if pid >= doc_id:
                    continue  # keep-earliest: only earlier docs own rep slots
                d = pn * vn
                if d > 0:
                    # cumsum's sequential left-to-right adds over the
                    # elementwise IEEE products are the exact fold
                    # Spark's aggregate() performs in the batch twin
                    # (bit-for-bit; np.sum would pairwise-sum and
                    # diverge) — at C speed instead of a per-element
                    # Python loop over up to max_cell members
                    cos = (
                        float(np.cumsum(pv * v)[-1]) / d if len(v) else 0.0
                    )
                else:
                    cos = 0.0
                if _round4_half_up(cos) >= threshold and (
                    best is None or pid < best
                ):
                    best = pid
            if best is not None:
                out_ids.append(doc_id)
                out_reps.append(best)
            if len(ids) < max_cell and doc_id not in seen:
                seen.add(doc_id)
                ids.append(doc_id)
                vecs.append(vb)
                norms.append(vn)
                mats.append(v)
        state.update((ids, vecs, norms))
        if out_ids:
            yield pd.DataFrame({"doc_id": out_ids, "sem_rep": out_reps})

    return dedup


def streaming_sem_dedup(
    docs_stream: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    max_cell: int = 4096,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming SemDedup — the stateful twin of
    ``functions/similarity.py semdedup_marks`` with PRETRAINED
    centroids: k-means is fit offline on a committed sample (the
    build-once shape of the persisted IVF index) while the stream
    assigns cells and screens arrivals. Cell assignment and the
    per-row vector/norm prep run as the SAME stateless Spark
    expressions the batch twin uses (``ivf_assign`` + ``_prep_vec``) —
    identical by construction — then one Arrow pass packs the double
    vector to bytes and the stateful exchange shuffles (cell, doc_id,
    8B x dim vector, norm) rows. State per cell: the members seen so
    far, capped at ``max_cell``; an arriving doc compares against its
    cell's earlier members with the exact cosine the batch operator
    computes (sequential IEEE fold) and emits (doc_id, sem_rep =
    min-id match) — append mode, rows final.

    Ordering contract (shared with streaming_near_dup): a doc can only
    match EARLIER-arriving, LOWER-id members — within a micro-batch
    docs screen in doc_id order, across batches in arrival order. On
    id-ascending delivery this equals the batch twin exactly (the
    pinned test); out-of-order delivery (twin's lower id arrives
    later) misses that pair, because a stream cannot retroactively
    re-screen emitted rows — the periodic --recompute arbiter is the
    batch-side answer, as for every streaming dedup here.

    Cap semantics mirror streaming_near_dup's deliberate divergence:
    the batch twin caps by (xxhash64(id), id) rank while the stream —
    which cannot rank what has not arrived — admits the first
    ``max_cell`` arrivals and keeps screening against that prefix;
    the pinned stream==batch equivalence holds for cells within the
    cap. NULL embeddings are skipped (the batch twin leaves them
    unmarked; the stream must not crash on them). Re-delivered doc_ids are membership-checked (at-least-once
    sources). State growth is bounded per cell but linear in cells x
    cap x (8 x dim + 16) bytes; the periodic-recompute arbiter is the
    batch-side answer to unbounded history, exactly as for near-dup."""
    from ocr_parallel_spark.functions.similarity import _prep_vec, ivf_assign

    assigned = ivf_assign(
        docs_stream.select(id_col, vec_col), centroids, vec_col, 1
    ).select(id_col, vec_col, F.element_at("ivf_cells", 1).alias("cell"))
    prepped = _prep_vec(assigned, vec_col, "_v").drop(vec_col)

    def pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            # a NULL embedding passes through the BATCH twin unmarked
            # (its cosine falls to the otherwise-0.0 branch); mirror
            # that here by skipping the row — packing None would kill
            # the task and terminate the query
            pdf = pdf[pdf["_vvec"].notna()]
            yield pd.DataFrame(
                {
                    "cell": pdf["cell"],
                    "doc_id": pdf[id_col],
                    "vec": [
                        np.asarray(v, dtype="<f8").tobytes()
                        for v in pdf["_vvec"]
                    ],
                    "vnorm": pdf["_vnorm"],
                }
            )

    rows = prepped.mapInPandas(
        pack, "cell int, doc_id bigint, vec binary, vnorm double"
    )
    return rows.groupBy("cell").applyInPandasWithState(
        _make_semdedup_fn(threshold, max_cell),
        outputStructType=_SD_OUT_SCHEMA,
        stateStructType=_SD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
