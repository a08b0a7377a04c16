"""Similarity search: hand-computed cosines, rank determinism, LSH recall."""

import math

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.operators import similarity


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [1.0, 1.0, 0.0]),
        (3, [2.0, 0.0, 0.0]),  # parallel to 0 -> cosine 1
        (4, [-1.0, 0.0, 0.0]),  # antiparallel -> cosine -1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_values(spark, vecs):
    out = similarity.cosine_topk(vecs, vecs.where(F.col("vec_id") == 0), k=4).toPandas()
    got = dict(zip(out.neighbor_id, out.cos_sim))
    assert got[3] == 1.0
    assert got[1] == 0.0
    assert abs(got[2] - 1 / math.sqrt(2)) < 1e-6
    assert got[4] == -1.0


def test_rank_is_total_order(spark, vecs):
    out = similarity.cosine_topk(vecs, vecs.where(F.col("vec_id") == 1), k=4).toPandas()
    assert list(out.sort_values("rank")["rank"]) == [1, 2, 3, 4]
    # the tie between 0 and 3 (both cosine 0) breaks by neighbor_id
    r = out.set_index("neighbor_id")["rank"]
    assert r[0] < r[3]


def test_self_excluded(spark, vecs):
    out = similarity.cosine_topk(vecs, vecs, k=10).toPandas()
    assert not (out.neighbor_id == out.query_id).any()


def test_quantized_recall_on_real_embeddings(spark, sf_dir):
    """int8-quantized exact search vs float cosine: with ~0.4% per-component
    rounding error the top-5 sets should match almost everywhere — require
    recall ≥ 0.9 (in practice ~1.0 on this corpus)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    qz = similarity.quantize_int8(emb)
    quant = similarity.cosine_topk_quantized(
        qz, qz.where(F.col("vec_id") < 20), k=5
    ).select("query_id", "neighbor_id")
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"quantized recall@5 = {recall}"


def test_quantized_cosine_scale_invariant(spark):
    """Per-vector symmetric quantization must make cosine scale-invariant:
    scaling any vector by a positive constant yields the IDENTICAL qvec
    (the scale divides out in maxabs), hence identical similarities."""
    rows = [(0, [1.0, -2.0, 3.0, 0.5]), (1, [2.0, -4.0, 6.0, 1.0]),  # 2x of 0
            (2, [-0.1, 0.2, -0.3, -0.05])]                            # -0.1x of 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qz = {r.vec_id: list(r.qvec) for r in similarity.quantize_int8(df).collect()}
    assert qz[0] == qz[1]  # positive scaling: identical quantized vector
    assert qz[2] == [-v for v in qz[0]]  # negation flips signs exactly


def test_quantized_vectors_bounded(spark, vecs):
    qz = similarity.quantize_int8(vecs).toPandas()
    for row in qz.itertuples():
        assert max(abs(v) for v in row.qvec) <= 127
        # at least one component hits full scale (symmetric maxabs scaling)
        assert max(abs(v) for v in row.qvec) == 127 or all(v == 0 for v in row.qvec)


def test_lsh_recall_on_real_embeddings(spark, sf_dir):
    """LSH top-5 recall on the driver corpus. True-neighbor cosines here are
    only ~0.3 (near-random vectors — adversarial for LSH), so the defaults
    (4 planes x 8 tables) give ~0.67 expected recall; assert a margin below."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = similarity.lsh_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"recall@5 = {recall}"


def test_ivf_recall_on_real_embeddings(spark, sf_dir):
    """IVF with n_probe=4/16 clusters must beat random candidate recall by a
    wide margin even on this weakly-clustered corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = similarity.ivf_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # n_probe/n_clusters = 25% of corpus scanned; random candidates would
    # give ~0.25 recall — require meaningfully better
    assert recall >= 0.4, f"recall@5 = {recall}"


# ---------------------------------------------------------------- IVF index
# persistence (round 11): build once, query across restarts, append
# without refit — the E10 serving contract (VERDICT r10 item 7).


def test_ivf_index_build_once_query_twice(spark, sf_dir, tmp_path):
    """The persisted index is the source of truth: two query runs against
    the same index path return IDENTICAL results (no refit jitter), and
    they match the ad-hoc ivf_topk for the same (corpus, seed) because
    both ride the same fit."""
    idx = str(tmp_path / "ivf")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    similarity.ivf_build_index(emb, idx)

    def rows(df):
        return {
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in df.collect()
        }

    r1 = rows(similarity.ivf_query_index(spark, idx, queries, k=5))
    r2 = rows(similarity.ivf_query_index(spark, idx, queries, k=5))
    assert r1 == r2 and r1
    adhoc = rows(similarity.ivf_topk(emb, queries, k=5))
    assert r1 == adhoc


def test_ivf_index_append_without_refit(spark, sf_dir, tmp_path):
    """Vectors appended after the build are served: each appended vector
    must appear as its own nearest-neighbor query's exact duplicate hit
    (we append copies of existing vectors under new ids — cosine 1.0 with
    their originals, so they MUST surface in the originals' top-k)."""
    idx = str(tmp_path / "ivf")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.where(F.col("vec_id") >= 100)
    similarity.ivf_build_index(base, idx)
    clones = (
        emb.where(F.col("vec_id") < 5)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    n = similarity.ivf_append_index(clones, idx)
    assert n == 5
    queries = emb.where(F.col("vec_id") < 5)
    out = similarity.ivf_query_index(spark, idx, queries, k=3)
    got = {(r.query_id, r.neighbor_id) for r in out.collect() if r.rank == 1}
    assert got == {(i, i + 1_000_000) for i in range(5)}


def test_ivf_index_meta_contract(spark, sf_dir, tmp_path):
    """Torn build (no meta) and geometry mismatch both fail loud."""
    import os

    idx = str(tmp_path / "ivf")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(2)
    with pytest.raises(ValueError, match="_ivf_meta"):
        similarity.ivf_query_index(spark, idx, queries)
    similarity.ivf_build_index(emb, idx)
    with pytest.raises(ValueError, match="built over"):
        similarity.ivf_query_index(spark, idx, queries, id_col="other_id")
    os.remove(os.path.join(idx, "_ivf_meta.json"))
    with pytest.raises(ValueError, match="_ivf_meta"):
        similarity.ivf_append_index(emb.limit(1), idx)


def test_ivf_index_query_prunes_partitions(spark, sf_dir, tmp_path):
    """The probe filter must reach the assignments scan as a PARTITION
    filter — the explain's FileScan lists cluster IN (...) under
    PartitionFilters, proving a probe reads ~n_probe/n_clusters of the
    corpus, not all of it."""
    idx = str(tmp_path / "ivf")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    similarity.ivf_build_index(emb, idx)
    out = similarity.ivf_query_index(
        spark, idx, emb.where(F.col("vec_id") < 3), k=5, n_probe=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "cluster" in ln
    ]
    assert scan, f"no partition filter on cluster in plan:\n{plan}"


# --------------------------------------------------------- IVF maintenance
# (round 12, VERDICT r11 item 7): sampled recall probe + recall-gated
# rebuild — the thing that notices when appends drift past the fitted
# centroids.


def _blob(spark, start_id, n, direction, dim=6, spread=0.15):
    """n unit-ish vectors around a direction (deterministic, no RNG)."""
    rows = []
    for i in range(n):
        v = [
            direction[d] + spread * math.sin(1.7 * (i + 1) * (d + 1))
            for d in range(dim)
        ]
        rows.append((start_id + i, v))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def _straddle_pairs(spark, start_id, n, dim=6):
    """n near-duplicate PAIRS on the e1/e2 diagonal, nudged so the two
    twins assign to DIFFERENT stale centroids — each twin's true nearest
    neighbor then lives in a list its n_probe=1 probe never scans."""
    rows = []
    for j in range(n):
        base = [0.7071, 0.7071] + [
            0.3 * math.sin(2.3 * (j + 1) * (d + 1)) for d in range(dim - 2)
        ]
        a = list(base)
        a[0] += 0.02
        b = list(base)
        b[1] += 0.02
        rows.append((start_id + 2 * j, a))
        rows.append((start_id + 2 * j + 1, b))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_ivf_maintain_recall_gated_rebuild(spark, tmp_path):
    """Build on two well-separated axis blobs, append straddling
    diagonal PAIRS whose twins assign to different stale centroids
    (their true neighbors live in lists the n_probe=1 probe never
    scans, so recall decays); ivf_maintain notices (recall < gate),
    refits over the full corpus, and the re-probed recall recovers.
    A healthy index is left alone."""
    dim = 6
    e1 = [1.0, 0.0] + [0.0] * (dim - 2)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    idx = str(tmp_path / "ivf")
    base = _blob(spark, 0, 60, e1, dim).unionByName(
        _blob(spark, 1000, 60, e2, dim)
    )
    similarity.ivf_build_index(base, idx, n_clusters=2)
    # healthy index: maintain is a no-op
    res0 = similarity.ivf_maintain(
        spark, idx, min_recall=0.9, k=5, n_probe=1, sample=40
    )
    assert res0["rebuilt"] is False and res0["recall"] >= 0.9
    # drift: 40 straddling pairs split across the two stale centroids
    similarity.ivf_append_index(_straddle_pairs(spark, 2000, 40, dim), idx)
    res = similarity.ivf_maintain(
        spark, idx, min_recall=0.95, k=5, n_probe=1, sample=60
    )
    assert res["rebuilt"] is True, res
    assert res["recall"] < 0.95
    assert res["recall_after"] > res["recall"], res
    assert res["recall_after"] >= 0.95, res
    # the rebuilt index still serves every vector (no rows lost)
    import os

    n = (
        spark.read.parquet(os.path.join(idx, "assignments")).count()
    )
    assert n == 200


def test_ivf_query_falls_back_to_old_sidecar(spark, sf_dir, tmp_path):
    """A query racing ivf_maintain's two-rename swap (or recovering a
    crash between the renames) serves the ``<index>.old`` sidecar
    instead of erroring (ADVICE r12). Write paths must NOT fall back —
    .old is doomed."""
    import os

    idx = str(tmp_path / "ivf")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    similarity.ivf_build_index(emb, idx)
    queries = emb.where(F.col("vec_id") < 5)

    def rows(df):
        return {(r.query_id, r.neighbor_id, r.rank) for r in df.collect()}

    before = rows(similarity.ivf_query_index(spark, idx, queries, k=3))
    # simulate the mid-swap state: index renamed away, rebuild not yet in
    os.rename(idx, idx + ".old")
    after = rows(similarity.ivf_query_index(spark, idx, queries, k=3))
    assert after == before and after
    assert similarity.ivf_index_recall(spark, idx, k=3, sample=8) > 0
    with pytest.raises(ValueError, match="_ivf_meta"):
        similarity.ivf_append_index(emb.limit(1), idx)  # writes: loud


def test_ivf_maintain_defers_old_sidecar_removal(spark, tmp_path):
    """After a rebuild swap the ``<index>.old`` sidecar must SURVIVE the
    maintain call — a racing reader that resolved its _dir to .old via
    the load-meta fallback still has lazy scans against it (ADVICE r13:
    an immediate rmtree raced those into FileNotFoundError). The NEXT
    maintain's pre-swap cleanup collects it."""
    import os

    dim = 6
    e1 = [1.0, 0.0] + [0.0] * (dim - 2)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    idx = str(tmp_path / "ivf")
    base = _blob(spark, 0, 60, e1, dim).unionByName(
        _blob(spark, 1000, 60, e2, dim)
    )
    similarity.ivf_build_index(base, idx, n_clusters=2)
    similarity.ivf_append_index(_straddle_pairs(spark, 2000, 40, dim), idx)
    res = similarity.ivf_maintain(
        spark, idx, min_recall=0.95, k=5, n_probe=1, sample=60
    )
    assert res["rebuilt"] is True
    old = idx + ".old"
    assert os.path.isdir(old)  # deferred: racing lazy readers stay alive
    # the stale sidecar still SERVES (the exact racing-reader scenario)
    emb = spark.read.parquet(os.path.join(old, "assignments"))
    assert emb.count() > 0
