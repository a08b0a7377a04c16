"""Sequence packing: assign documents to fixed-token-budget training shards.

LLM training wants examples of (near-)uniform token length; feeding raw
documents wastes budget on padding. The published fix is to pack multiple
documents into each training sequence (Raffel et al. 2020 T5 §2.2 "packing";
Krell et al. 2021 "Efficient Sequence Packing" formalizes it as bin
packing). Optimal bin packing is NP-hard and inherently sequential —
useless at corpus scale — so this implements the standard approximation:

1. hash-bucket documents (deterministic xxhash64 of the id, so the layout
   of the input is irrelevant to the result);
2. within each bucket, first-fit-decreasing (FFD) pack — FFD uses at most
   11/9·OPT + 6/9 bins (Dósa 2007), and a bucket is small enough to pack
   in memory inside one `applyInPandas` group.

The Python crossing is justified: packing is a sequential greedy loop over
a sorted list — not expressible as column algebra — and per-bucket it is
O(n log n) on a few thousand rows. Arrow batches carry only
(id, n_tokens, bucket) — never the text. At 100 TB, n_buckets scales the
parallelism; each shard id is globally unique as (bucket, local index).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "doc_id long, n_tokens long, bucket int, shard_id long, shard_fill long"
)


def pack_documents(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every document to a shard whose token sum never exceeds
    ``budget`` (oversized single documents get a dedicated shard — callers
    chunk those upstream). Returns (doc_id, n_tokens, bucket, shard_id,
    shard_fill) where shard_id is globally unique and shard_fill is the
    final token total of that shard (attached to every member row, so a
    packing-efficiency report is one groupBy away).

    Deterministic: bucket = xxhash64(id) mod n_buckets, pack order =
    (n_tokens desc, id) — independent of partitioning and cluster size.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], ignore_index=True
        )
        bucket = int(pdf["bucket"].iloc[0])
        # FFD greedy: shards as (fill, shard_index); linear scan first-fit.
        fills: list[int] = []
        assign = []
        for t in pdf["n_tokens"].to_list():
            t = int(t)
            for i, fill in enumerate(fills):
                if fill + t <= budget:
                    fills[i] = fill + t
                    assign.append(i)
                    break
            else:
                fills.append(t)
                assign.append(len(fills) - 1)
        pdf["shard_id"] = [bucket * (1 << 32) + i for i in assign]
        pdf["shard_fill"] = [fills[i] for i in assign]
        return pdf

    keyed = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandas(_pack, _OUT_SCHEMA)
