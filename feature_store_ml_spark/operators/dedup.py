"""Deduplication operators — exact, n-gram Jaccard, MinHash-LSH, SimHash.

SURVEY.md §2B E9. The scale story, per variant:

- exact:        hash-shuffle on the fingerprint — one shuffle, fully
                distributed, the 100 TB workhorse.
- jaccard:      exact pairwise Jaccard via shingle self-join. Quadratic in
                documents *per shared shingle* — correct but only viable as
                a verifier or behind a candidate filter. Hot (high
                document-frequency) shingles are droppable via ``max_df``;
                at web scale you ALWAYS cap df (a shingle shared by 1M docs
                contributes 10^12 pairs and zero information).
- minhash_lsh:  the scale path. Signatures are computed entirely inside a
                single projection (array expressions — no explode, no
                shuffle), then one explode-on-bands + groupBy buckets
                candidates. Expected cost ~ O(N · bands) shuffle rows.
- simhash:      64-bit signature via per-bit majority vote of token hashes;
                near-dup = Hamming distance ≤ k, candidates via 4-chunk
                banding (pigeonhole: distance ≤ 3 ⇒ one 16-bit chunk equal).

All hash functions are Spark's xxhash64 — deterministic across runs and
cluster layouts, so signatures are reproducible (required for incremental
dedup of a growing corpus).
"""

from __future__ import annotations

from ..localframe import local_rows_df

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as T
from ._lifecycle import autorelease


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-content fingerprint."""
    fp = df.withColumn("fingerprint", T.fingerprint(F.col(text_col)))
    keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [id_col, "fingerprint"], "inner")


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact word-``n``-gram Jaccard similarity for all pairs sharing ≥1
    shingle; returns pairs (id_a < id_b) with jaccard ≥ threshold.

    ``max_df`` (default 1000) drops shingles shared by more than that many
    documents BEFORE the self-join — a shingle shared by 1M docs contributes
    10^12 join rows and zero signal, so at scale the cap is mandatory
    (pass ``None`` only on corpora small enough to enumerate all pairs).
    Jaccard is then computed EXACTLY over the capped shingle universe: both
    the intersection counts and the set sizes come from the surviving
    shingles, so numerator and denominator agree. Residual bias vs uncapped
    Jaccard: pairs whose overlap lives mostly in ubiquitous (df > max_df)
    shingles score lower and may drop below threshold — by construction,
    since those shingles carry no discriminating information.

    Plan shape: project shingles → explode → (df-cap) → per-doc capped
    sizes (window over the existing id partitioning) → self-equi-join on
    shingle → count intersections. Every join is an equi-join
    (shuffle-hash / sort-merge capable).
    """
    from pyspark.sql import Window

    par = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(par, id_col).select(
        F.col(id_col).alias("id"), T.word_shingles(F.col(text_col), n).alias("sh")
    )
    exploded = sh.select("id", F.explode("sh").alias("shingle"))
    if max_df is not None:
        # Broadcast the HOT set (df > max_df) and anti-join it away. The hot
        # set is small BY CONSTRUCTION (≤ |corpus shingle occurrences|/max_df
        # distinct values — pigeonhole), so it broadcasts at any corpus size;
        # broadcasting the kept set would ship ≈ every distinct shingle in
        # the corpus to every executor.
        hot = exploded.groupBy("shingle").count().where(F.col("count") > max_df)
        exploded = exploded.join(
            F.broadcast(hot.select("shingle")), "shingle", "left_anti"
        )
    # capped set size per doc — shingles are distinct per doc, so a plain
    # count over the id partition is |capped shingle set|
    exploded = exploded.withColumn("sz", F.count("*").over(Window.partitionBy("id")))
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "shingle"
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = inter.withColumn(
        "jaccard",
        F.col("n_inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
    )
    return jac.where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """num_hashes minhash values per doc as an array<bigint>.

    Formulation: explode shingles → hash each shingle STRING exactly once
    (``h = xxhash64(shingle)``) → groupBy(doc) with ``num_hashes``
    min(xxhash64(seed_i, h)) aggregates. Deriving the family from the one
    64-bit base hash instead of re-hashing the string per seed makes 63 of
    the 64 hash evaluations O(1) fixed-width ops instead of O(len) string
    scans — the dominant CPU of the signature stage at corpus scale. The
    shingle tree is evaluated exactly ONCE per document (a pure-projection
    formulation gets inlined by CollapseProject into one copy per hash —
    64× recomputation); the min aggregates combine map-side, so the shuffle
    carries only |docs| × num_hashes longs per partition, not the exploded
    shingles.

    Hash family: xxhash64(seed_i, xxhash64(shingle)) — deterministic across
    runs, partitionings and cluster layouts (required for incremental dedup).

    Measured-and-rejected alternative: a fully per-row formulation
    (``transform(sequence(0,63), i -> array_min(transform(hashes, ...)))``,
    zero shuffle) produces identical signatures but ran 25× SLOWER at sf0.1
    (34 s vs 1.4 s steady-state): lambda-bound array expressions are
    evaluated interpreted per element and defeat codegen's common-
    subexpression elimination, so the shingle tree re-derives per seed.
    The explode+agg form keeps every hash evaluation inside codegen'd
    aggregates and combines map-side.

    The input is hash-repartitioned on the doc id first: document corpora
    often arrive as few fat files (here: one), which would pin this
    CPU-bound stage to one task; the groupBy(id) then reuses that
    partitioning, so the repartition shuffle replaces (not adds to) the
    aggregation shuffle.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(T.word_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .select("id", F.xxhash64("shingle").alias("h"))
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    wide = sh.groupBy("id").agg(*aggs)
    return wide.select(
        "id",
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias(
            "sig", metadata=_sig_family(n, num_hashes)
        ),
    )


#: bump when the hash family / shingle normalization changes incompatibly
MINHASH_FAMILY_VERSION = 1


def _sig_family(n: int, num_hashes: int) -> dict:
    """Signature-family stamp, carried as `sig` column METADATA — Spark
    persists column metadata through parquet, so a signature index written
    last month self-describes its family. Two signature tables are
    join-compatible iff their stamps are equal; silently mixing families
    (different shingle n, hash count, or a re-seeded hash family after a
    version bump) yields estimated Jaccards that are pure noise."""
    return {
        "minhash_family": f"xxhash64-rehash-v{MINHASH_FAMILY_VERSION}",
        "shingle_n": n,
        "num_hashes": num_hashes,
    }


def _check_sig_family(sigs: DataFrame, n: int, num_hashes: int, side: str) -> None:
    """Fail loudly when a signature table's stamp contradicts the requested
    parameters. Unstamped tables (pre-versioning, or hand-built in tests)
    pass — the stamp is a tripwire, not a gate on legacy data."""
    meta = sigs.schema["sig"].metadata if "sig" in sigs.columns else {}
    if not meta or "minhash_family" not in meta:
        return
    want = _sig_family(n, num_hashes)
    got = {k: meta.get(k) for k in want}
    if got != want:
        raise ValueError(
            f"minhash signature-family mismatch on {side}: table carries "
            f"{got}, caller requested {want} — recompute one side or pass "
            "matching (n, num_hashes)"
        )


def _banded(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Explode a signature table into (id, sig, band, bucket) LSH rows —
    bucket = xxhash64 of the band's signature slice. Shared by the batch
    pair-finder and the incremental path so both sides of an incremental
    join band identically (a must: bucket ids are only meaningful within
    one banding scheme)."""
    return sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via banded MinHash-LSH, scored by estimated Jaccard
    (fraction of agreeing minhashes), filtered at ``threshold``.

    bands=16 × rows=4 over 64 hashes → s-curve threshold ≈ (1/16)^(1/4) ≈ 0.5.
    The bucket join shuffles ~N·bands small rows; signatures ride along so
    scoring needs no second join back to the corpus.
    """
    rows_per_band = num_hashes // bands
    # Persist the signature stage: without a barrier, CollapseProject inlines
    # the 64-minhash expression into every band-hash reference (16×
    # recomputation of the whole shingle+hash tree). In production the
    # signature table is materialized anyway (it's what incremental dedup
    # diffs against); signatures are 64×8B per doc — tiny next to the text.
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes).cache()
    banded = _banded(sigs, bands, rows_per_band)
    a = banded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = cand.withColumn(
        "est_jaccard",
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(num_hashes),
    )
    out = est.where(F.col("est_jaccard") >= threshold).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )
    return autorelease(out, sigs)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over distinct word tokens: bit j of the signature is
    the majority vote of bit j across xxhash64(token).

    Formulation: explode distinct tokens → hash each token once → groupBy(doc)
    with 64 sum(±1) vote aggregates → assemble the signature from the vote
    signs. The votes are plain codegen'd aggregates with map-side combine
    (shuffle carries 64 longs per doc per partition). The naive
    per-row-array form (F.aggregate over a transform(tokens, xxhash64) with
    a 64-bit voter lambda) measures ~1.4x slower wall-clock at sf0.1 and
    degrades with document length at scale (the whole end-to-end query is
    3.4s vs 2.5s): Catalyst evaluates higher-order-function lambdas INTERPRETED per
    array element — 64 interpreted passes over every token array — while
    sum(CASE...) aggregates stay inside whole-stage codegen.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.repartition(par, id_col)  # spread CPU-bound hashing (see minhash)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(T.words(F.col(text_col)))).alias("tok"),
        )
        .select("id", F.xxhash64("tok").alias("h"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(64)
    ]
    voted = toks.groupBy("id").agg(*votes)
    sig = None
    for j in range(64):
        bit = F.when(
            F.col(f"v_{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return voted.select("id", sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Candidates by pigeonhole banding: split 64 bits into (max_hamming + 1)
    chunks; any pair within distance ≤ max_hamming agrees exactly on at
    least one chunk → equi-join per chunk, then verify with bit_count(xor).
    """
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    # Same barrier rationale as minhash_lsh_pairs: stop the 64-bit-vote
    # expression being inlined into every chunk extraction.
    sigs = simhash(df, id_col, text_col).cache()
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("key"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "simhash", "ck.chunk", "ck.key")
    a = chunks.select(F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"), "chunk", "key")
    b = chunks.select(F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"), "chunk", "key")
    out = (
        a.join(b, ["chunk", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return autorelease(out, sigs)


def embedding_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    round_scale: int = 6,
) -> DataFrame:
    """Semantic (embedding-cosine) near-dup pairs — the DEFAULT scale path.

    Candidates are pairs agreeing on all ``n_planes`` hyperplane signs in ANY
    of ``n_tables`` independent tables (same random-hyperplane machinery as
    ``similarity.lsh_topk``); each candidate is then exact-verified with
    ``cosine >= threshold``. Shuffle cost ~ N·n_tables bucket rows — never
    the O(N²) all-pairs join (that form survives only as the small-N oracle
    twin, queries.py::e9_dedup_embedding).

    Recall math (random-hyperplane collision prob p = (1 - θ/π)^n_planes per
    table, θ = arccos(threshold)): at threshold 0.9, 8 planes → p ≈ 0.29,
    8 tables → recall ≈ 1-(1-p)^8 ≈ 0.93; raise n_tables for more. Lower
    thresholds need FEWER planes (collisions get rare fast) — at 0.35 use
    n_planes 2-4.

    Returns (id_a < id_b, cos_sim). Feed into ``connected_components`` +
    ``dedup_by_clusters`` to drop duplicates.
    """
    from .similarity import _hyperplanes, cosine, lsh_bucket

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).cache()
    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=42 + 1000 * t)
        tables.append(
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(F.col("vec"), planes).alias("bucket"),
            )
        )
    banded = base.select(
        "id", "vec", F.explode(F.array(*tables)).alias("tb")
    ).select("id", "vec", "tb.table", "tb.bucket")
    a = banded.select(
        F.col("id").alias("id_a"), F.col("vec").alias("va"), "table", "bucket"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vb"), "table", "bucket"
    )
    cand = (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    out = cand.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")), round_scale).alias("cos_sim"),
    ).where(F.col("cos_sim") >= threshold)
    return autorelease(out, base)


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Duplicate-cluster formation: connected components over a near-dup
    pair list → (id, cluster_id=min id in component).

    Distributed min-label propagation: each iteration is one equi-join +
    one groupBy (both hash-shuffles on the id), so an iteration costs
    O(|E|) shuffled rows; iterations needed = component diameter, which for
    dedup graphs is tiny (near-dup clusters are dense). The driver only
    runs the convergence loop — a count per iteration — never the data.

    This is the standard "small-star" style loop (cf. the GraphFrames /
    Hash-to-Min literature) without the GraphX dependency.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.cache()
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).cache()

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            # TRUNCATE lineage each round: the iteration references
            # `labels` twice (join + fallback), so a cache alone lets the
            # logical plan DOUBLE per iteration — a long-diameter graph
            # then OOMs the driver just materializing the plan tree. An
            # eager local checkpoint keeps the per-iteration plan
            # constant-size (a cluster deployment would use
            # checkpoint() with a reliable dir — same idea).
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    out = labels.select(F.col("id"), F.col("label").alias("cluster_id"))
    return autorelease(out, edges, labels)


def dedup_by_clusters(df: DataFrame, clusters: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (the cluster min id) per duplicate cluster;
    rows not in any cluster pass through."""
    reps = clusters.where(F.col("id") == F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    in_cluster = clusters.select(F.col("id").alias(id_col))
    survivors = df.join(in_cluster, id_col, "left_anti").select(df["*"]).union(
        df.join(reps, id_col, "left_semi")
    )
    return survivors


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at least
    ``min_overlap`` distinct word ``n``-grams with an evaluation corpus —
    the published method for scrubbing eval leakage from training data
    (Brown et al. 2020, GPT-3 appendix C n-gram overlap; Dodge et al. 2021
    C4 benchmark-contamination analysis).

    Scale shape: the benchmark side collapses to its DISTINCT shingle set —
    eval suites are tiny next to a training corpus, so that set broadcasts —
    and the corpus side explodes shingles ONCE, hash-semi-joins against the
    broadcast, and aggregates per document. Cost is one pass + one agg on
    the doc id; nothing pairwise, nothing all-pairs. Every doc comes back
    with its overlap count and verdict (zero-overlap docs included via the
    left join), so the same output drives both filtering and reporting.
    """
    d_sh = docs.select(
        F.col(id_col), F.explode(T.word_shingles(F.col(text_col), n)).alias("shingle")
    )
    b_sh = (
        benchmark.select(
            F.explode(T.word_shingles(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
    )
    hits = (
        d_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("_n"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_n"), F.lit(0)).cast("int").alias("n_overlap"),
            (F.coalesce(F.col("_n"), F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


def minhash_lsh_incremental(
    new_docs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup matches of NEW documents against an EXISTING corpus
    signature index — the growing-corpus workflow: signatures are computed
    once per document ever (minhash_signatures output persisted as a table,
    64×8 B/doc), and each ingest batch hashes only ITS text, bands both
    sides with the identical scheme, and joins on (band, bucket).

    Cost: O(|batch|) hashing + a join whose left side is |batch|·bands rows
    against the (pre-bucketed, ideally bucket-partitioned) index — nothing
    touches the corpus text again. Returns (new_id, corpus_id,
    est_jaccard ≥ threshold): everything a dedup-on-ingest gate needs.

    Determinism makes this sound: xxhash64 signatures are identical across
    runs/layouts, so an index built last month buckets exactly like a batch
    hashed today.
    """
    rows_per_band = num_hashes // bands
    _check_sig_family(corpus_sigs, n, num_hashes, side="corpus_sigs")
    new_sigs = minhash_signatures(new_docs, id_col, text_col, n, num_hashes).cache()
    a = _banded(new_sigs, bands, rows_per_band).select(
        F.col("id").alias("new_id"), F.col("sig").alias("sig_a"), "band", "bucket"
    )
    b = _banded(corpus_sigs, bands, rows_per_band).select(
        F.col("id").alias("corpus_id"), F.col("sig").alias("sig_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .select("new_id", "corpus_id", "sig_a", "sig_b")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    est = cand.withColumn(
        "est_jaccard",
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
        ).cast("double")
        / F.lit(num_hashes),
    )
    out = est.where(F.col("est_jaccard") >= threshold).select(
        "new_id", "corpus_id", F.round("est_jaccard", 6).alias("est_jaccard")
    )
    return autorelease(out, new_sigs)


def shared_span_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    window: int = 4,
    min_shared: int = 2,
    max_df: int | None = 1000,
) -> DataFrame:
    """Cross-document shared-SPAN detection — the candidate filter for
    substring-level dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better": exact duplicated spans, not whole-doc
    similarity, drive memorization). Built on winnowing fingerprints
    (operators/text.py::winnow_fingerprints, MOSS guarantee: any shared
    literal span of length ≥ k+window-1 chars — 23 at the defaults, a
    sentence fragment, not a stopword — shares ≥1 fingerprint), so
    two docs sharing ≥``min_shared`` fingerprints very likely share long
    literal spans — the pairs to route into an exact substring verifier.

    Returns (id_a, id_b, n_shared) with id_a < id_b, n_shared ≥ min_shared.

    Scale shape: fingerprints sample ~2/(window+1) of positions (not every
    k-gram), the ``max_df`` hot-set is broadcast and anti-joined away
    (boilerplate spans — same shape as the jaccard df-cap, small by
    pigeonhole), and the pair join is bucketed by fingerprint — expected
    cost Σ df² over KEPT fingerprints, capped by max_df, never corpus².
    """
    fps = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    ).select(
        F.col(id_col).alias("id"),
        F.explode(T.winnow_fingerprints(F.col(text_col), k, window)).alias("fp"),
    )
    if max_df is not None:
        hot = fps.groupBy("fp").count().where(F.col("count") > max_df)
        fps = fps.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def canonical_docs(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    order_by: list[Column] | None = None,
) -> DataFrame:
    """The dedup OUTPUT step: given the corpus and the duplicate-cluster
    assignment (connected_components' (id, cluster_id)), keep ONE
    canonical document per cluster — docs outside any cluster are their
    own canonicals (singleton clusters). ``order_by`` ranks candidates
    within a cluster (default: longest text wins, id ascending as the
    deterministic tie-break — the common "keep the most complete copy"
    heuristic; pass e.g. [text.quality_score(col).desc(), col(id).asc()]
    to keep the highest-quality copy instead).

    Returns the surviving rows plus ``cluster_id`` and ``members`` (the
    cluster size the survivor represents — the dedup ratio audit column).

    Scale shape: one broadcast-or-shuffle left join against the cluster
    map (|clusters| ≪ |docs| — only docs IN near-dup pairs appear), then
    one window over cluster_id (single shuffle). No driver participation.
    """
    if order_by is None:
        order_by = [F.length("text").desc(), F.col(id_col).asc()]
    from pyspark.sql import Window

    cmap = clusters.select(
        F.col("id").alias("_cid"), F.col("cluster_id").alias("_cluster")
    )
    enriched = docs.join(cmap, docs[id_col] == cmap["_cid"], "left").withColumn(
        "cluster_id", F.coalesce(F.col("_cluster"), F.col(id_col))
    ).drop("_cid", "_cluster")
    w = Window.partitionBy("cluster_id")
    ranked = enriched.withColumn(
        "_rn", F.row_number().over(w.orderBy(*order_by))
    ).withColumn("members", F.count(F.lit(1)).over(w))
    return ranked.where(F.col("_rn") == 1).drop("_rn")


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    round_scale: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication via k-means + within-cluster cosine — the published
    recipe for trimming web-scale corpora by MEANING, not bytes.

    1. k-means coarse-clusters the embeddings (one MLlib fit — the same
       quantizer ivf_topk uses);
    2. candidate pairs are generated ONLY within a cluster (self-join on
       cluster id; sizing rule: grow ``n_clusters`` with the corpus so
       |cluster| ~ N/k stays bounded — the paper uses 50k clusters for
       LAION — which keeps the per-cluster quadratic term constant while
       the join itself is one shuffle on cluster id);
    3. pairs with cosine >= ``threshold`` link into duplicate groups
       (``connected_components``, distributed min-label propagation);
    4. within each group the survivor is the member FARTHEST from its
       k-means centroid (the paper's "keep low centroid-similarity"
       choice — it preserves the cluster's diversity; deterministic
       tie-break on id).

    Returns the surviving rows of ``df`` plus ``sem_cluster`` (the
    k-means cell), ``dup_group`` (the duplicate component, = own id for
    singletons) and ``members`` (group size — the dedup-ratio audit).

    Known trade (documented in the paper too): near-duplicates that land
    in DIFFERENT k-means cells are not compared — recall is bounded by
    the quantizer; raise threshold confidence by lowering n_clusters, or
    run embedding_dups (LSH tables) when cross-cell recall matters more
    than the cluster structure.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    from .similarity import cosine

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("_fv"),
    )
    km = KMeans(
        k=n_clusters, seed=seed, featuresCol="_fv", predictionCol="sem_cluster"
    )
    model = km.fit(base)
    centers = [c.tolist() for c in model.clusterCenters()]
    centers_df = local_rows_df(df.sparkSession, 
        [(i, c) for i, c in enumerate(centers)],
        "sem_cluster int, _center array<double>",
    )
    assigned = (
        model.transform(base)
        .select("id", "vec", "sem_cluster")
        .join(F.broadcast(centers_df), "sem_cluster")
        .select(
            "id",
            "vec",
            "sem_cluster",
            F.round(cosine(F.col("vec"), F.col("_center")), round_scale).alias(
                "_centroid_sim"
            ),
        )
        .cache()
    )
    a = assigned.select(
        F.col("id").alias("id_a"), F.col("vec").alias("va"), "sem_cluster"
    )
    b = assigned.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vb"), "sem_cluster"
    )
    pairs = (
        a.join(b, "sem_cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_scale).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    groups = connected_components(pairs)
    gmap = groups.select(F.col("id").alias("_gid"), F.col("cluster_id").alias("_grp"))
    enriched = (
        # alias the right side's key so an input column literally named
        # "id" (distinct from id_col) can't make F.col("id") ambiguous
        df.join(assigned.select(F.col("id").alias("_sd_id"),
                                "sem_cluster", "_centroid_sim"),
                df[id_col] == F.col("_sd_id"))
        .drop("_sd_id")
        .join(gmap, df[id_col] == F.col("_gid"), "left")
        .withColumn("dup_group", F.coalesce(F.col("_grp"), F.col(id_col)))
        .drop("_gid", "_grp")
    )
    w = Window.partitionBy("dup_group")
    ranked = enriched.withColumn(
        "_rn",
        F.row_number().over(
            w.orderBy(F.col("_centroid_sim").asc(), F.col(id_col).asc())
        ),
    ).withColumn("members", F.count(F.lit(1)).over(w))
    out = ranked.where(F.col("_rn") == 1).drop("_rn", "_centroid_sim")
    return autorelease(out, assigned)
