"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is seed-dependent *per partition layout*: the same seed over a
different file split yields a different sample, which breaks reproducibility
the moment a corpus is recompacted. Everything here instead derives the
sampling decision from a **content hash of a key column**, so the selected
set is a pure function of the data — stable across partitionings, engines,
cluster sizes, and reruns, and expressible in ANSI SQL for oracle checks.

Scale shape: hash-Bernoulli sampling is a stateless per-row filter (no
shuffle, pushes nothing but computes above the scan); stratified top-n is
one hash-partition per stratum + a WindowGroupLimit rank; the split column
is again per-row stateless. Nothing here ever collects or broadcasts data.

Reference parity: the reference's only sampling surface is
sklearn.model_selection.train_test_split (reference src/model_training.py:6,
seeded but layout-independent only because pandas is single-node);
`deterministic_split` is the distributed-safe equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_WIDTH = 8  # 32 bits of the md5 prefix drive the decision


def _bucket_hex(key: Column, seed: int) -> Column:
    """First 8 hex chars of md5(seed || key) — a uniform 32-bit bucket as a
    lowercase hex STRING. Lexicographic order on fixed-width lowercase hex
    equals numeric order, and both Spark and DuckDB render md5 identically,
    so thresholds compare the same in both engines without any hex→int
    conversion builtin (which they do NOT share)."""
    return F.substring(F.md5(F.concat(F.lit(str(seed) + "|"), key.cast("string"))), 1, _HEX_WIDTH)


def _threshold_hex(fraction: float) -> str:
    t = int(round(fraction * (16 ** _HEX_WIDTH)))
    t = max(0, min(t, 16 ** _HEX_WIDTH))
    return format(t, f"0{_HEX_WIDTH + 1}x")[-_HEX_WIDTH:] if t < 16 ** _HEX_WIDTH else "g" * _HEX_WIDTH
    # "gggggggg" sorts after every hex digit → fraction=1.0 keeps all rows


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff the 32-bit md5 bucket
    of its key falls below ``fraction``. Same key → same verdict, forever.
    Expected (not exact) fraction, like Bernoulli sampling everywhere."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(_bucket_hex(F.col(key_col), seed) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, n_per_stratum: int, seed: int = 0
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by hash order — a deterministic reservoir. The hash
    rank makes the choice uniform-ish and content-stable; the key tiebreak
    makes it total. Plans as one shuffle on the stratum + WindowGroupLimit
    (rank filter pushed into the sort), so no stratum's full contents ever
    rank beyond what one partition holds — skewed strata are the caller's
    salting problem, same as any per-key window."""
    w = Window.partitionBy(strata_col).orderBy(
        _bucket_hex(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def deterministic_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.2, seed: int = 0
) -> DataFrame:
    """Adds a ``split`` column ('train' / 'test') from the key hash — the
    distributed, layout-independent train/test split (reference
    src/model_training.py:6 does this with a seeded shuffle; a seed is not
    reproducible across partitionings, a content hash is). Rows with equal
    keys always land in the same split, so entity leakage across the
    boundary is structurally impossible when keyed on the entity id."""
    return df.withColumn(
        "split",
        F.when(
            _bucket_hex(F.col(key_col), seed) < F.lit(_threshold_hex(test_fraction)),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    target_rows: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic data-mixture sampling: downsample each source so the
    output approximates ``target_rows`` distributed per ``weights`` — the
    training-corpus composition step (a Pile/LLaMA-style source mixture),
    as a pure two-pass distributed plan:

      pass 1: one tiny per-source count aggregate (driver gets |sources|
              rows — mixture specs are dozens of sources, never large);
      pass 2: a stateless hash-Bernoulli filter with a PER-SOURCE rate
              ``min(1, target_rows·w_s / n_s)``, compiled into a CASE
              expression — no shuffle, no join, layout-independent.

    Same content-hash discipline as ``hash_sample``: a document's verdict
    depends only on (seed, key), so recompaction/repartitioning/cluster
    size never change the sample, and reruns are reproducible. Sources
    missing from ``weights`` are dropped (weight 0). A source with fewer
    rows than its quota keeps everything (rate clamps at 1) — the mixture
    then under-fills like every real under-represented source does;
    callers rebalance weights if that matters.

    Expected (not exact) counts per source, like Bernoulli sampling
    everywhere; exact-count mixtures would need a per-source total order
    (stratified_sample's rank machinery) at one shuffle of cost.
    """
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative weights: {bad}")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights sum to zero")
    counts = {
        r["src"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("src"))
        .agg(F.count("*").alias("n"))
        .collect()
        # driver-side by design: |sources| rows, not data
    }
    verdict = None
    for src, w in weights.items():
        n = counts.get(src, 0)
        if n == 0 or w == 0:
            continue
        rate = min(1.0, (target_rows * w / total_w) / n)
        cond = (F.col(source_col) == src) & (
            _bucket_hex(F.col(key_col), seed) < F.lit(_threshold_hex(rate))
        )
        verdict = cond if verdict is None else (verdict | cond)
    if verdict is None:
        raise ValueError("no overlap between weights and observed sources")
    return df.where(verdict)
