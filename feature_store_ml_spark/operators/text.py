"""Text-analysis operators for LLM training-data pipelines — SURVEY.md §2B E11.

Everything here is built-in-expression-only (JVM-side, whole-stage codegen):
no Python UDFs in any hot path. Each op is a column factory (returns a
Column) so callers compose them into a single projection — one pass over
100 TB of text, not one pass per statistic.
"""

from __future__ import annotations

from ..localframe import local_rows_df

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword list (public-domain English function words).
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "from",
]

# Marker words for the n-gram-free language-ID heuristic. Deterministic and
# SQL-expressible; accuracy is secondary to having a well-defined, testable
# scoring function (real corpora would use char-n-gram profiles).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "es", "los"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],  # pinyin-ish markers
}

_WORD_RE = r"[a-z0-9]+"
# BPE-ish tokenizer: words, numbers, or single non-space symbols — the same
# shape GPT-2's pre-tokenizer splits on, minus unicode categories.
_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def normalize(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics to single spaces, trim. The
    canonical form used for hashing/dedup so trivial formatting differences
    don't defeat exact dedup."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def words(text: Column) -> Column:
    """Array of lowercase word tokens (whitespace/punct split)."""
    return F.filter(F.split(normalize(text), " "), lambda w: w != F.lit(""))


def n_tokens_bpe(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_RE), 0))


def stopword_ratio(tokens: Column) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(tokens) > 0, n_sw / F.size(tokens)).otherwise(F.lit(0.0))


def mean_word_len(tokens: Column) -> Column:
    total = F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(tokens) > 0, total.cast("double") / F.size(tokens)).otherwise(
        F.lit(0.0)
    )


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(F.length(text) > 0, n_punct.cast("double") / F.length(text)).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length sweet-spot, sane stopword
    density, low punctuation noise. Weights are arbitrary but fixed —
    downstream filters select on thresholds of this score."""
    toks = words(text)
    len_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(toks)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.3)) / F.lit(0.3)
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.3 * F.greatest(sw_score, F.lit(0.0)) + 0.3 * punct_score, 6
    )


def lang_id(text: Column) -> Column:
    """Heuristic language ID: score = count of marker-word hits per language
    over the token array; argmax wins, ties broken by language code order,
    zero hits → 'und' (BCP-47 undetermined)."""
    toks = words(text)
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # array_max on (score, lang) structs: max score, then max lang — make tie
    # order deterministic by comparing on (score, negated-rank) instead.
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. Stable across
    engines (md5 is md5 everywhere) → exact-dedup key and oracle-checkable."""
    return F.md5(normalize(text))


def _sliding_join(items: Column, n: int, sep: str) -> Column:
    """n-gram shingles of an array via zip_with over shifted slices.

    Why not ``transform(sequence(0, k-n), i -> slice(items, i+1, n))``: a
    lambda body's child expressions are re-evaluated per element, so the
    whole upstream tokenize tree would run once PER SHINGLE (measured ~10x
    slowdown). zip_with evaluates each input array exactly once per row;
    n-1 zips -> the tree runs O(n) times per row total.
    """
    out = items
    for k in range(1, n):
        shifted = F.slice(items, k + 1, F.greatest(F.size(items) - k, F.lit(0)))
        # concat propagates null at the ragged tail (zip_with pads with null)
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(sep), b))
    return F.filter(out, lambda x: x.isNotNull())


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text — the input to
    MinHash/Jaccard near-dup."""
    chars = F.filter(F.split(normalize(text), ""), lambda c: c != F.lit(""))
    return F.array_distinct(_sliding_join(chars, n, ""))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) of the normalized text.
    Documents shorter than n words yield one whole-text shingle."""
    toks = words(text)
    return F.array_distinct(
        F.when(F.size(toks) >= n, _sliding_join(toks, n, " ")).otherwise(
            F.array(F.array_join(toks, " "))
        )
    )


def tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Exact TF-IDF, long form (id, term, tf, df, tfidf).

    tf = term frequency in the doc; idf = ln((N+1)/(df+1)) + 1 (smoothed,
    sklearn-style). Composition: explode tokens → per-(doc,term) counts →
    document frequency by term → join. All equi-joins/aggs; the df table is
    broadcast when small. No MLlib HashingTF — exact terms, no collisions,
    and SQL-expressible for the oracle.

    N (the document count) is a 1-row aggregate cross-joined into the plan —
    no ``df.count()`` driver action, so the whole computation stays lazy and
    runs as one job (the N subquery prunes to the id column's parquet
    metadata, not a second full scan of the text).
    """
    ndocs = df.agg(F.count("*").alias("__n_docs"))
    toks = df.select(F.col(id_col).alias("id"), F.explode(words(F.col(text_col))).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    docfreq = (
        tf.groupBy("term")
        .agg(F.countDistinct("id").alias("df"))
        .where(F.col("df") >= min_df)
    )
    return (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n_docs") + 1).cast("double") / (F.col("df") + 1)
                    )
                    + 1.0
                ),
                6,
            ).alias("tfidf"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4/Gopher-style repetition metrics per document (Raffel et al. 2020
    §2.2; Rae et al. 2021 Gopher table A1 — the published training-data
    repetition filters), word-token level:

    - ``dup_word_frac``:  1 − |distinct tokens| / |tokens|
    - ``top_bigram_frac``: occurrences of the most frequent bigram / total
      bigram positions (Gopher drops docs where the top 2-gram covers too
      much of the text)
    - ``dup_5gram_frac``: 1 − |distinct 5-grams| / |5-gram positions|
      (Gopher's duplicate-n-gram rule)
    - ``keep``: the composite Gopher-ish filter verdict at fixed thresholds

    Plan shape: the per-row fractions are single-projection array
    expressions (zero shuffle); only the top-bigram mode needs distribution
    — explode bigrams → count per (doc, bigram) → max per doc → join back.
    Two shuffles on the doc id total, independent of corpus size. A per-row
    ``transform(distinct, g -> count occurrences)`` formulation would be
    O(m²) per document and is exactly what this avoids.
    """
    base = df.select(
        F.col(id_col).alias("id"), words(F.col(text_col)).alias("toks")
    )
    bigrams = _sliding_join(F.col("toks"), 2, " ")
    grams5 = _sliding_join(F.col("toks"), 5, " ")

    def dup_frac(arr: Column) -> Column:
        return F.when(
            F.size(arr) > 0,
            1.0 - F.size(F.array_distinct(arr)).cast("double") / F.size(arr),
        ).otherwise(F.lit(0.0))

    stats = base.select(
        "id",
        F.size("toks").alias("n_tokens"),
        F.round(dup_frac(F.col("toks")), 6).alias("dup_word_frac"),
        F.round(dup_frac(grams5), 6).alias("dup_5gram_frac"),
        (F.size(bigrams)).alias("_n_bigrams"),
    )
    top = (
        base.select("id", F.explode(bigrams).alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("_top_bg"))
    )
    out = (
        stats.join(top, "id", "left")
        .select(
            "id",
            "n_tokens",
            "dup_word_frac",
            F.round(
                F.when(
                    F.col("_n_bigrams") > 0,
                    F.coalesce(F.col("_top_bg"), F.lit(0)).cast("double")
                    / F.col("_n_bigrams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_bigram_frac"),
            "dup_5gram_frac",
        )
    )
    # the top-bigram rule only fires on docs long enough for the ratio to
    # be meaningful (a SHORT doc of all-unique bigrams still has top frac
    # 1/(n-1)); Gopher likewise gates repetition rules on minimum length.
    return out.withColumn(
        "keep",
        (F.col("dup_word_frac") < 0.5)
        & ((F.col("n_tokens") < 20) | (F.col("top_bigram_frac") < 0.1))
        & (F.col("dup_5gram_frac") < 0.6),
    )


def winnow_fingerprints(text: Column, k: int = 5, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 — the
    MOSS algorithm): hash every char k-gram, then keep the minimum hash of
    each sliding window of ``window`` consecutive hashes; the distinct mins
    are the fingerprint set. Guarantees any match of length ≥ k+window-1
    shares a fingerprint, at ~2/(window+1) sampling density.

    All array expressions: k-gram build and window-min both use the shifted
    zip_with pattern (O(k+window) tree evaluations per row, never
    per-position). Hash = xxhash64 → deterministic across runs/layouts.
    """
    norm = normalize(text)
    chars = F.filter(F.split(norm, ""), lambda c: c != F.lit(""))
    grams = _sliding_join(chars, k, "")  # ordered, NOT distinct
    # docs shorter than k chars: fingerprint the whole normalized text
    grams = F.when(F.size(grams) > 0, grams).otherwise(F.array(norm))
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    mins = hashes
    for j in range(1, window):
        shifted = F.slice(hashes, j + 1, F.greatest(F.size(hashes) - j, F.lit(0)))
        mins = F.zip_with(mins, shifted, lambda a, b: F.least(a, b))
    # drop the ragged tail (partial windows); short docs keep one window
    n_windows = F.greatest(F.size(hashes) - window + 1, F.lit(1))
    return F.array_distinct(F.slice(mins, 1, n_windows))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
) -> DataFrame:
    """Sliding-window document CHUNKING — the standard pre-tokenization
    step of an LLM training pipeline (long documents become overlapping
    windows that fit a context length). Whitespace tokens; windows start
    every ``chunk_tokens - overlap_tokens`` tokens and the tail window may
    run short. Output: (id, chunk_id, n_tokens, chunk_text), one row per
    chunk; empty documents produce none.

    Scale shape: pure JVM array expressions (split → filter → sequence of
    starts → posexplode → slice → array_join) — zero Python, zero
    shuffle; chunking is embarrassingly row-parallel and the explode
    multiplies rows inside the same stage. Deterministic, so the whole
    output is exactly DuckDB-oracle-checkable (e11_chunking)."""
    if overlap_tokens >= chunk_tokens:
        raise ValueError(
            f"chunk_documents: overlap ({overlap_tokens}) must be smaller "
            f"than the chunk ({chunk_tokens})"
        )
    step = chunk_tokens - overlap_tokens
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step)
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .where(F.size("_toks") > 0)
        .select(
            id_col,
            "chunk_id",
            F.slice(
                "_toks", F.col("_start") + 1, F.lit(chunk_tokens)
            ).alias("_chunk"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_chunk").alias("n_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction — regex patterns restricted to the syntax subset
# Java regex (Spark) and RE2 (DuckDB) interpret identically, so every scan
# count and every redacted string is oracle-checkable across engines.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    # order matters for redaction: ssn before phone (a phone regex with
    # flexible groups could otherwise eat part of an SSN), email before
    # anything that could match its digits.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII hit counts as columns (one projection, zero shuffle —
    compose into a select like every other op here)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }


def pii_redact(text: Column) -> Column:
    """Replace every PII hit with its [KIND] placeholder, applied in the
    declared pattern order. Redaction-before-training is the standard
    pipeline position (the scan counts feed filtering thresholds; the
    redacted text is what ships)."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def pii_scan(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Scan + redact in one pass: per-doc counts of each PII kind, a total,
    and the redacted text. Pure column expressions — at 100 TB this is scan
    bandwidth, nothing else."""
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        total.alias("n_pii"),
        pii_redact(F.col(text_col)).alias("redacted"),
    )


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL into host / registered domain / path / query — the
    inputs of the standard training-data domain filters (C4 blocklists by
    domain, Dolma/RefinedWeb URL dedup). Spark's parse_url is a JVM
    built-in; the registered domain is the last two host labels (good
    enough without a public-suffix list, which would be a lookup join)."""
    host = F.parse_url(url, F.lit("HOST"))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    domain = F.when(
        n >= 2, F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    ).otherwise(host)
    return {
        "host": host,
        "domain": domain,
        "path": F.parse_url(url, F.lit("PATH")),
        "query": F.parse_url(url, F.lit("QUERY")),
    }


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model quality proxy: score each document by the
    mean log-probability of its tokens under the CORPUS's own unigram
    distribution (add-one smoothed). CCNet buckets documents into
    head/middle/tail by LM perplexity and trains on the head; with no
    external LM in this environment, the corpus unigram model is the
    standard self-contained stand-in — gibberish and boilerplate-repetition
    both land in the tail, fluent text in the head.

    Output: (id, n_tokens, logprob) with logprob = mean over tokens of
    ln((count(tok)+1)/(N+V)); higher = more typical text.

    Plan shape (same class as tfidf's): explode tokens once → per-token
    corpus counts (map-side-combined) → join counts back by token (the one
    heavy shuffle, on token instances — broadcastable instead when the
    vocab fits) → broadcast the tiny (N, V) scalar → one groupBy(doc)
    mean. The corpus text is scanned ONCE; the unigram model is |vocab|
    rows of state — why unigram, not n-gram, is the self-scoring default
    at 100 TB."""
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(words(F.col(text_col))).alias("tok"))
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    totals = vocab.agg(
        F.sum("tf").alias("n_total"), F.count("*").alias("v_size")
    )
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            F.log((F.col("tf") + 1).cast("double") / (F.col("n_total") + F.col("v_size"))).alias("lp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("logprob"),
    )


def bm25_topk(
    df: DataFrame,
    queries: "list[tuple[str, str]]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 ranked retrieval: top-k documents per query, the
    classical lexical-search baseline (Robertson & Walker; the Lucene
    positive-bounded idf form ``ln(1 + (N - df + 0.5) / (df + 0.5))``).

    ``queries`` is a small ``[(query_id, query_text)]`` list — query
    terms tokenize through the SAME normalizer as documents and join
    BROADCAST into the (doc, term) frequency table, so document
    frequencies and scores are computed only for matching terms, never
    the whole vocabulary. Scale shape (round 10): ONE document-scale
    shuffle (repartition by id before the explode) on which the token
    explode, the (doc, term) agg, the doc-length window and the final
    (query, doc) agg all plan exchange-free — corpus-scale data crosses
    the wire exactly once; the only other exchanges are candidate-only
    (df agg) or tiny (final top-k window).

    Ranking is over the 6-decimal-ROUNDED score with doc id as the tie
    break — deterministic across engines (unrounded float ranking would
    let last-ulp summation noise flip neighbors).

    Returns (query_id, doc_id, rk, score).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    qdf = local_rows_df(spark, 
        list(queries), "query_id string, query_text string"
    )
    qterms = qdf.select(
        "query_id", F.explode(words(F.col("query_text"))).alias("term")
    ).distinct()
    ndocs = df.agg(F.count("*").alias("__n_docs"))
    # ONE shuffle, at DOCUMENT scale (pre-explode — the cheapest place;
    # token rows are ~dl x bigger): cluster documents by id. Generate
    # (explode) preserves the child's HashPartitioning, and every
    # downstream corpus-sized operator keys on doc_id or a superset —
    # tf's (doc_id, term) agg, the dl window, the per-doc-length agg and
    # the final (query_id, doc_id) agg — all satisfied by
    # HashPartitioning(doc_id) under the subset rule, so Catalyst plans
    # them exchange-free on top of this one shuffle. The round-9
    # formulation shuffled corpus-scale data three more times: tf by
    # (doc_id, term), dl by doc_id, and a cand⋈dl join (VERDICT r9
    # item 2 — at 100x the (doc, term) exchanges dominate).
    toks = df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # doc length = sum of the doc's term counts, as a WINDOW over the
    # co-partitioned tf — no separate dl branch, no corpus-scale join
    tf = tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    )
    # avgdl averages one dl per DOCUMENT (docs with >=1 token), exactly
    # as the former groupBy formulation; the agg is exchange-free on the
    # doc_id partitioning and reduces to a broadcast single row
    avgdl = (
        tf.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(F.avg("dl").alias("__avgdl"))
    )
    cand = tf.join(F.broadcast(qterms.select("term").distinct()), "term")
    docfreq = cand.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        1.0
        + (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_tf = (
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
        )
    )
    scored = (
        cand.join(F.broadcast(qterms), "term")
        .join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(ndocs))
        .crossJoin(F.broadcast(avgdl))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * norm_tf), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
        .select("query_id", "doc_id", "rk", "score")
    )
