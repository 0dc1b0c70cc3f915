"""Distributed BPE tokenization: fit merges from a corpus word-frequency
table, count tokens per doc in one Arrow pass.

The deployment shape for tokenizer-faithful packing
(``pack_sequences(n_tokens_col=...)``): BPE TRAINING operates on the
word -> frequency table, not on raw text — the distributed part is the
word count (one explode + one keyed agg, the same shape as line dedup),
after which the capped frequency table is tiny and the merge loop runs
driver-side (the standard practice: real tokenizers are trained once on
a bounded sample and shipped everywhere). APPLICATION is embarrassingly
parallel because words tokenize independently (kernel/bpe.py
distributivity law): one mapInPandas with the merge table broadcast via
closure, a per-partition word cache exploiting web text's word reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_parallel_spark.kernel.bpe import (
    merges_from_strings,
    merges_to_strings,
    train_bpe,
)


def fit_bpe_merges(
    docs: DataFrame,
    norm_col: str = "norm",
    n_merges: int = 200,
    max_vocab_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn a merge table from the corpus: distributed word count,
    deterministic top-``max_vocab_words`` cap (frequency desc, word asc
    — no hash/partition order dependence), driver-side merge loop.
    The cap bounds driver memory at any corpus size; rare-tail words
    beyond it cannot win a merge anyway (a merge needs frequency >= 2
    to beat the stop rule, and the cap keeps every high-frequency
    word)."""
    rows = (
        docs.select(F.explode(F.split(F.col(norm_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(max_vocab_words)
        .collect()
    )
    return train_bpe({r["w"]: r["n"] for r in rows}, n_merges)


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    norm_col: str = "norm",
    id_col: str = "doc_id",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """(id_col, out_col) — exact BPE token count per doc, one Arrow
    pass, merge table shipped in the task closure (a few KB)."""
    import pandas as pd  # noqa: F401

    strs = merges_to_strings(merges)

    def gen(it):
        import pandas as pd

        from ocr_parallel_spark.kernel.bpe import make_counter

        counter = make_counter(merges_from_strings(strs))
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [counter(t or "") for t in pdf[norm_col]],
                }
            )

    return docs.select(id_col, norm_col).mapInPandas(
        gen, f"{id_col} long, {out_col} long"
    )
