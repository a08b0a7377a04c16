"""Dedup operator tests: known near-duplicates, idempotence, LSH recall."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
    (2, "The quick brown fox jumps over the lazy dog near the river bank!"),  # exact dup of 0 after normalize
    (3, "completely different text about spark query engines and shuffles"),
    (4, "spark query engines need shuffles and partitions for scale work"),
    (5, "the quick brown fox jumps over the lazy dog near the river bank"),  # identical to 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    kept = dedup.exact_dedup(docs).toPandas()
    # 0, 2, 5 normalize to the same content -> one representative (min id = 0)
    assert set(kept.doc_id) == {0, 1, 3, 4}


def test_exact_dedup_idempotent(spark, docs):
    once = dedup.exact_dedup(docs)
    twice = dedup.exact_dedup(once.select("doc_id", "text"))
    assert sorted(r.doc_id for r in twice.collect()) == sorted(
        r.doc_id for r in once.collect()
    )


def test_jaccard_finds_near_dup(spark, docs):
    pairs = dedup.jaccard_pairs(docs, threshold=0.5).toPandas()
    keyed = {(a, b): j for a, b, j in pairs.itertuples(index=False)}
    assert keyed[(0, 5)] == 1.0  # identical
    assert keyed[(0, 2)] == 1.0  # identical after normalization
    assert (0, 1) in keyed and 0.6 < keyed[(0, 1)] < 1.0  # one word differs
    assert (0, 3) not in keyed  # unrelated


def test_jaccard_max_df_prunes_hot_shingles(spark, docs):
    # with a df cap of 1, every shared shingle is dropped -> no pairs
    pairs = dedup.jaccard_pairs(docs, threshold=0.1, max_df=1)
    assert pairs.count() == 0


def test_shared_span_pairs_finds_injected_span(spark):
    """Two documents sharing one long literal span (otherwise unrelated
    text) must pair up; documents with no shared spans must not. Winnowing
    guarantee: a shared span of length >= k+window-1 chars shares a
    fingerprint, so a ~60-char span clears min_shared=2 comfortably."""
    span = "this exact sentence is duplicated verbatim across two documents"
    rows = [
        (0, "completely original opening text. " + span + " and a unique tail here."),
        (1, "different beginning for doc one. " + span + " with another distinct end."),
        (2, "nothing in common with the others at all, fully novel words only."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in dedup.shared_span_pairs(df, min_shared=2).collect()}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_shared_span_pairs_layout_independent(spark):
    span = "a shared literal span long enough to fingerprint reliably"
    rows = [(i, f"doc {i} unique prefix. {span}. unique suffix {i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup.shared_span_pairs(df, min_shared=2)
                   .select("id_a", "id_b", "n_shared").collect()))
    b = sorted(map(tuple, dedup.shared_span_pairs(df.repartition(7), min_shared=2)
                   .select("id_a", "id_b", "n_shared").collect()))
    assert a == b and len(a) == 15  # all C(6,2) pairs share the span


def test_jaccard_df_cap_broadcasts_hot_set(spark, docs):
    """The df-cap must be planned as a broadcast LEFT ANTI join against the
    HOT (df > max_df) shingle set — the side that is small by construction.
    Broadcasting the kept set instead ships ~every distinct shingle in the
    corpus to every executor and OOMs at scale."""
    pairs = dedup.jaccard_pairs(docs, threshold=0.5, max_df=1000)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the broadcast build side must be the aggregated (hot-set) subtree, and
    # the probe side must NOT be behind a broadcast exchange
    import re

    anti = plan[plan.index("LeftAnti"):]
    assert re.search(r"BroadcastExchange", anti), anti[:500]


def test_jaccard_capped_denominator_consistent(spark):
    """With max_df active, set sizes must come from the CAPPED shingle
    universe: two docs identical except for shingles dropped by the cap
    must score jaccard == 1.0 over the surviving shingles (not < 1 from
    uncapped denominators)."""
    # "alpha beta gamma" appears in 3 docs (df=3 > cap 2) -> dropped; the
    # remaining shingle sets of docs 0 and 1 are identical.
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma entirely other words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.jaccard_pairs(df, threshold=0.5, max_df=2).toPandas()
    keyed = {(a, b): j for a, b, j in pairs.itertuples(index=False)}
    assert keyed[(0, 1)] == 1.0


def test_embedding_dups_recall(spark):
    """LSH-bucketed semantic dedup must recover (nearly) all true high-cosine
    pairs found by the exact all-pairs computation, on clustered synthetic
    vectors with genuine near-duplicates."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    # 40 clusters: one base vector + 2 noisy copies each (noise norm ~0.24
    # vs unit base -> intra-cluster cos ~0.94-0.97), plus 80 unrelated
    # random vectors.
    for _ in range(40):
        base = rng.randn(64)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + 0.03 * rng.randn(64)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    for _ in range(80):
        v = rng.randn(64)
        rows.append((vid, (v / np.linalg.norm(v)).tolist()))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from feature_store_ml_spark.operators.similarity import cosine

    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cs"))
        .where(F.col("cs") >= 0.9)
        .collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_dups(df, threshold=0.9, n_tables=16).collect()
    }
    assert exact, "fixture must contain true near-dup pairs"
    assert got <= exact | got  # sanity
    # every LSH pair is exact-verified, so no false positives
    assert got <= exact
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.2f} over {len(exact)} true pairs"


def test_minhash_recall_of_exact_pairs(spark, docs):
    """LSH candidates must include every high-similarity pair found by the
    exact computation (on this tiny set)."""
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_pairs(docs, threshold=0.7).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert exact <= lsh


def test_minhash_estimate_close_to_exact(spark, docs):
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.1).collect()
    }
    assert est[(0, 5)] == 1.0
    assert abs(est[(0, 1)] - 0.75) < 0.25  # 64 hashes: +-2 sigma tolerance


def test_cached_intermediates_release(spark, docs):
    """Operator caches (the CollapseProject barriers) must be releasable:
    release(out) unpersists them so long-lived sessions don't accumulate
    executor memory across calls."""
    from feature_store_ml_spark.operators._lifecycle import release

    out = dedup.minhash_lsh_pairs(docs, threshold=0.2)
    out.count()  # materialize through the cache
    cached = out._cached_intermediates
    assert cached and all(c.storageLevel.useMemory for c in cached)
    release(out)
    assert all(not c.storageLevel.useMemory for c in cached)


def test_simhash_near_dups(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_pairs(docs, max_hamming=16).collect()
    }
    assert pairs[(0, 5)] == 0  # identical docs -> identical signature
    assert pairs[(0, 2)] == 0  # normalization-identical
    assert (0, 1) in pairs  # near-dup within 16 bits
    assert (0, 3) not in pairs  # unrelated text far apart


def test_signatures_deterministic_across_partitionings(spark, docs):
    a = dedup.minhash_signatures(docs).orderBy("id").collect()
    b = dedup.minhash_signatures(docs.repartition(7)).orderBy("id").collect()
    assert [r.sig for r in a] == [r.sig for r in b]


def test_decontaminate_planted(spark):
    from feature_store_ml_spark.operators import dedup

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "quick brown fox jumps over a fence"),   # shares trigrams
            (2, "completely unrelated text about spark"),  # none
            (3, "the quick brown fox jumps over the lazy dog entirely"),  # near-copy
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.decontaminate(docs, bench, min_overlap=2).collect()}
    assert out[3].contaminated and out[3].n_overlap >= 6
    assert out[1].contaminated  # "quick brown fox", "brown fox jumps", ...
    assert not out[2].contaminated and out[2].n_overlap == 0
    # broadcast on the benchmark side, no corpus self-join
    plan = dedup.decontaminate(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_lsh_hot_bucket_engages_aqe_skew_split(spark):
    """SCALE.md's skew story, pinned: a near-duplicate cluster of ~10% of
    the corpus lands every one of its docs in the SAME bucket of every
    band, so the LSH bucket self-join gets a pathologically hot key. With
    the broadcast path disabled and test-scaled AQE skew thresholds (the
    mechanism is byte-threshold-gated; production sizes are far past it),
    the executed plan must show the skew split actually engaged
    (skew=true on the sort-merge join) — bounding per-task input — and
    the pair output must still be exactly the hot cluster's pairs."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        # thresholds are COMPRESSED shuffle bytes; identical signatures
        # compress ~100x, so the test-scale knobs sit in the KB range
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2048",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = [
            (i, "the exact same hot duplicate text repeated across the cluster")
            for i in range(150)
        ]
        cold = [
            (1000 + i, f"unique cold document number {i} carrying words {i*7} {i*13} {i*29}")
            for i in range(40)
        ]
        df = spark.createDataFrame(hot + cold, "doc_id long, text string")
        pairs = dedup.minhash_lsh_pairs(df, num_hashes=64, bands=2, threshold=0.9)
        got = {(r.id_a, r.id_b) for r in pairs.collect()}  # collect: AQE final plan
        assert got == {(a, b) for a in range(150) for b in range(150) if a < b}
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "skew=true" in final, f"AQE skew split did not engage:\n{final[:2000]}"
        assert "AQEShuffleRead skewed" in final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ------------------------------------------------------------- semdedup


def _clustered_vectors(spark):
    """Three well-separated direction groups; within-group cosine ≈ 1,
    across ≈ 0; ids encode the group for easy asserts."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    bases = np.eye(3)
    for g in range(3):
        for i in range(6):
            v = bases[g] + rng.normal(0, 0.01, 3)
            rows.append((g * 100 + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_collapses_near_identical(spark):
    from feature_store_ml_spark.operators import dedup as D

    df = _clustered_vectors(spark)
    out = D.semantic_dedup(df, n_clusters=3, threshold=0.99, seed=1)
    rows = out.collect()
    # each direction group collapses to ONE survivor representing 6 members
    assert len(rows) == 3
    assert sorted(r["members"] for r in rows) == [6, 6, 6]
    assert {r["vec_id"] // 100 for r in rows} == {0, 1, 2}


def test_semantic_dedup_survivor_is_farthest_from_centroid(spark):
    from feature_store_ml_spark.operators import dedup as D
    import numpy as np

    # group X: tight bundle + one member farther from the centroid but
    # still a near-dup of the rest; group Y: orthogonal anchors so k=2
    # separates directions, not members of X
    rows = [(i, [1.0, 0.0 + i * 1e-4, 0.0]) for i in range(5)]
    rows.append((99, [1.0, 0.30, 0.0]))  # same direction, most distant
    rows += [(200 + j, [0.0, 0.0, 1.0]) for j in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = D.semantic_dedup(df, n_clusters=2, threshold=0.9, seed=1).collect()
    x_survivors = [r for r in out if r["vec_id"] < 200]
    assert len(x_survivors) == 1 and x_survivors[0]["vec_id"] == 99  # keep-rule


def test_semantic_dedup_orthogonal_kept_and_deterministic(spark):
    from feature_store_ml_spark.operators import dedup as D

    df = _clustered_vectors(spark)
    # threshold above within-group noise: nothing links across groups
    a = sorted(r["vec_id"] for r in D.semantic_dedup(df, n_clusters=3, threshold=0.99).collect())
    b = sorted(r["vec_id"] for r in D.semantic_dedup(df, n_clusters=3, threshold=0.99).collect())
    assert a == b, "same seed must be deterministic"
    # raising the threshold only INCREASES survivors (monotonicity)
    loose = D.semantic_dedup(df, n_clusters=3, threshold=0.5).count()
    tight = D.semantic_dedup(df, n_clusters=3, threshold=0.999999).count()
    assert loose <= 3 <= tight <= 18
