"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All built-in-function compositions (split/regexp/aggregate/xxhash64) — the
whole module runs inside whole-stage codegen with zero Python. At 100 TB
these are scan-dominated map-only stages: no shuffle at all until an
aggregate is requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bda_spadochrony_spark.functions.numeric import stable_round

# tiny built-in stopword lists: enough signal for n-gram-free heuristic
# language ID without external models (real deployments plug fasttext/cld3
# in via mapInPandas behind the same column contract)
_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "pl": ["i", "w", "nie", "na", "to", "że", "jest", "się", "do", "z"],
}


def tokens(text_col: str) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(F.trim(F.col(text_col))), "\\s+")


def token_count(text_col: str) -> Column:
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: str) -> Column:
    """BPE-ish token estimate: word-piece boundaries approximated by the
    regex split on letter/digit/punct class changes, the usual cheap proxy
    for tokenizer cost accounting."""
    return F.size(F.split(
        F.col(text_col),
        r"(?<=\p{L})(?=\p{N})|(?<=\p{N})(?=\p{L})|\s+|(?=\p{Punct})"))


def stopword_ratio(text_col: str, lang: str = "en") -> Column:
    """Fraction of tokens in the language's stopword list."""
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    toks = tokens(text_col)
    return (F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) /
            F.greatest(F.size(toks), F.lit(1)))


def detect_language(text_col: str) -> Column:
    """Heuristic language ID: the language whose stopword hit-ratio is
    highest (ties → earlier language in the fixed order, 'und' if no
    hits; NULL text → 'und' — pinned by the NULL-text edge fixture, r6).
    Plug a real model in via mapInPandas for production quality."""
    toks = tokens(text_col)
    best = None
    for lang in _STOPWORDS:
        sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        entry = F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        best = entry if best is None else F.when(entry["score"] > best["score"], entry).otherwise(best)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str, prefix: str = "q_") -> DataFrame:
    """Quality-scoring feature block: length, token stats, punctuation /
    digit / uppercase ratios, mean token length, stopword ratio — the usual
    Gopher/C4-style filter inputs."""
    toks = tokens(text_col)
    n_chars = F.length(text_col)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    return df.withColumns({
        prefix + "n_chars": n_chars,
        prefix + "n_tokens": F.size(toks),
        prefix + "mean_token_len":
            stable_round(F.aggregate(toks, F.lit(0).cast("long"),
                                     lambda acc, t: acc + F.length(t)).cast("double") /
                         F.greatest(F.size(toks), F.lit(1)), 4),
        prefix + "punct_ratio":
            stable_round(F.length(F.regexp_replace(text_col, r"[^\p{Punct}]", "")) / safe_chars, 4),
        prefix + "digit_ratio":
            stable_round(F.length(F.regexp_replace(text_col, r"[^0-9]", "")) / safe_chars, 4),
        prefix + "upper_ratio":
            stable_round(F.length(F.regexp_replace(text_col, r"[^A-Z]", "")) / safe_chars, 4),
        prefix + "stopword_ratio": stable_round(stopword_ratio(text_col), 4),
    })


def quality_score(df: DataFrame, text_col: str, out_col: str = "quality",
                  keep_features: str | None = None) -> DataFrame:
    """Composite 0-1 quality score from the feature block (monotone
    penalties for extreme ratios/lengths — a filterable scalar).
    ``keep_features='q_'`` retains the feature columns under that prefix."""
    prefix = keep_features or "__q_"
    qf = quality_features(df, text_col, prefix=prefix)
    score = (
        F.when(F.col(prefix + "n_tokens") < 5, 0.2).otherwise(1.0) *
        (1.0 - F.least(F.col(prefix + "punct_ratio") * 2, F.lit(0.5))) *
        (1.0 - F.least(F.col(prefix + "digit_ratio"), F.lit(0.5))) *
        (0.5 + F.least(F.col(prefix + "stopword_ratio") * 2, F.lit(0.5)))
    )
    out = qf.withColumn(out_col, stable_round(score, 4))
    if keep_features is None:
        out = out.drop(*[c for c in out.columns if c.startswith("__q_")])
    return out


def repetition_features(df: DataFrame, id_col: str, text_col: str,
                        prefix: str = "r_") -> DataFrame:
    """Gopher-style repetition metrics per document — the standard
    low-quality-content signals for corpus filtering:

    - ``distinct_token_fraction``: |set(tokens)| / |tokens| (low → loops)
    - ``top_token_fraction``: occurrences of the most frequent token /
      |tokens| (high → one token dominates)
    - ``dup_3gram_fraction``: 1 − |set(3-grams)| / |3-grams| (high →
      repeated phrases)

    Computed via explode + two doc-keyed aggregations (codegen, map-side
    partial aggregation; shuffle carries (doc_id, token) pairs keyed on
    doc_id — uniform by construction, no skew). Array-HOF formulations
    would be map-only but run interpreted per element, O(n·distinct) per
    doc; the exploded form is the 100 TB shape.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    base = df.select(F.col(id_col), toks.alias("__toks"), n.alias("__n"))
    tok_rows = base.select(id_col, "__n", F.explode("__toks").alias("tok"))
    per_tok = tok_rows.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).alias("c"), F.first("__n").alias("__n"))
    tok_stats = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
        F.first("__n").alias("n_tokens"))
    # 3-gram repetition from the shared shingle machinery (non-distinct)
    from bda_spadochrony_spark.operators.dedup import shingle_rows
    g = shingle_rows(df.select(id_col, text_col), id_col, text_col, 3,
                     distinct=False)
    g_stats = g.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_3grams"),
        F.count_distinct("shingle").alias("n_distinct_3grams"))
    out = (df.join(tok_stats, id_col, "left").join(g_stats, id_col, "left")
           .withColumns({
               prefix + "n_tokens": F.coalesce("n_tokens", F.lit(0)),
               prefix + "distinct_token_fraction": stable_round(
                   F.col("n_distinct") /
                   F.greatest(F.col("n_tokens"), F.lit(1)), 4),
               prefix + "top_token_fraction": stable_round(
                   F.col("top_c") /
                   F.greatest(F.col("n_tokens"), F.lit(1)), 4),
               # a doc with <3 tokens has NO shingle rows: g_stats left-join
               # NULLs must read as "no 3-grams → no duplication" (0.0),
               # not NULL (and not the 1.0 a naive 1−0/1 would give)
               prefix + "dup_3gram_fraction": stable_round(
                   F.when(F.coalesce("n_3grams", F.lit(0)) == 0, F.lit(0.0))
                   .otherwise(F.lit(1.0) - F.col("n_distinct_3grams") /
                              F.col("n_3grams")), 4),
           }))
    return out.drop("n_distinct", "top_c", "n_tokens", "n_3grams",
                    "n_distinct_3grams")


# deterministic scrub targets, ordered: emails before URLs (an email's
# domain must not be half-eaten by the URL rule), long digit runs last
_PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"[0-9]{6,}", "<NUM>"),
]


def pii_scrub(text_col: str | Column) -> Column:
    """Scrub emails / URLs / long digit runs to typed placeholder tokens —
    the standard pre-training redaction pass. Pure codegen regexp_replace
    chain (map-only at any scale); the patterns avoid engine-specific
    regex syntax so the same rules state the DuckDB oracle."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat, repl in _PII_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def normalize_text(text_col: str | Column) -> Column:
    """Canonical text normalization for dedup/filter pipelines: lowercase,
    strip everything but letters/digits/whitespace (Unicode classes, so
    accents and CJK survive), collapse whitespace runs, trim. Pure codegen
    regex — map-only at any scale. The character classes are shared by
    Java regex and RE2, so the DuckDB oracle states the same pattern."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[^\p{L}\p{N}\s]", " "), r"\s+", " "))


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    size: int = 50, stride: int = 40) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    standard context-window prep for embedding/training pipelines. One row
    per (doc, chunk): ``chunk_id``, the chunk text, and its token count.

    sequence(0, n_tokens-1, stride) + explode generates the chunk starts
    JVM-side; slice + array_join materializes each chunk. Map-only (the
    explode is a generator inside the scan stage, no shuffle); output size
    is size/stride × corpus — the caller picks the overlap budget."""
    toks = tokens(text_col)
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)),
                        F.lit(stride))
    ex = df.select(F.col(id_col), toks.alias("__toks"),
                   F.explode(starts).alias("__start"))
    return ex.select(
        F.col(id_col),
        (F.col("__start") / stride).cast("int").alias("chunk_id"),
        F.array_join(F.slice("__toks", F.col("__start") + 1, size), " ")
        .alias("chunk"),
        F.least(F.lit(size), F.size("__toks") - F.col("__start"))
        .alias("chunk_tokens"))


def fingerprint(df: DataFrame, id_col: str, text_col: str,
                window: int = 5, out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: winnowing-style — min xxhash64 over each
    sliding token window, XOR-folded to one 64-bit value. Rolling-hash
    selection without UDFs via transform over token indices."""
    toks = tokens(text_col)
    win_hashes = F.filter(
        F.transform(toks, lambda _, i: F.when(
            i + window <= F.size(toks),
            F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))))),
        lambda x: x.isNotNull())
    fp = F.aggregate(win_hashes, F.lit(0).cast("long"),
                     lambda acc, h: acc.bitwiseXOR(h))
    return df.withColumn(out_col, F.when(F.size(toks) >= window, fp)
                         .otherwise(F.xxhash64(F.lower(F.trim(F.col(text_col))))))


def fingerprint_md5(df: DataFrame, id_col: str, text_col: str,
                    window: int = 5, out_col: str = "fingerprint") -> DataFrame:
    """Engine-portable fingerprint twin of ``fingerprint``: the document's
    fingerprint is the lexicographic MIN of the md5 hex digests of each
    sliding token window — the winnowing 'select the minimum hash' rule
    applied document-wide. md5-on-UTF-8 and string ordering are identical
    across engines (unlike xxhash64), so this variant is exactly
    reproducible in ANSI SQL / DuckDB for cross-engine verification.
    Short docs (< ``window`` tokens) fall back to md5 of the normalized
    text. Same codegen properties as ``fingerprint``: map-only, no shuffle.
    """
    toks = tokens(text_col)
    win_hashes = F.filter(
        F.transform(toks, lambda _, i: F.when(
            i + window <= F.size(toks),
            F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))))),
        lambda x: x.isNotNull())
    return df.withColumn(
        out_col,
        F.when(F.size(toks) >= window, F.array_min(win_hashes))
        .otherwise(F.md5(F.lower(F.trim(F.col(text_col))))))


def hashed_doc_vectors(df: DataFrame, id_col: str, text_col: str,
                       dim: int = 64, signed: bool = True,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """Feature-hashed document vectors (r9 — the hashing trick,
    Weinberger et al. 2009): each token hashes to one of ``dim`` buckets
    (and, with ``signed=True``, to a ±1 sign from an independent hash bit
    — the unbiased variant), the document's vector is the signed token
    counts per bucket as ``array<double>``. Model-free embeddings that
    feed the engine's ENTIRE cosine family directly — ``semantic_dedup``,
    ``cosine_topk``, the LSH/IVF indexes — closing the text→vector loop
    with no external model and no vocabulary state (the hash IS the
    vocabulary, so the featurizer is stateless and merge-free at any
    corpus size).

    Plan shape: tokens explode (map), ONE (id, bucket)-keyed count
    shuffle, then the dense array assembles map-only per document
    (``map_from_entries`` + a ``sequence`` transform — no per-dimension
    join, no UDF). Empty/NULL documents yield the all-zero vector
    (``valid_vectors`` drops them at the consumers, by design).

    ``hash_fn="md5"``: engine-portable bucket/sign family (bucket = the
    first md5 half mod dim with the sign-preserving ((x%m)+m)%m rule the
    hash oracles pin; sign = parity of the second half) so a SQL oracle
    restates the vectors exactly — same convention as ``simhash_md5``.
    """
    toks = (df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
            .where(F.col("tok") != ""))
    if hash_fn == "md5":
        h1 = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long")
    else:
        h1 = F.xxhash64("tok")
        h2 = F.xxhash64("tok", F.lit(1))
    bucket = F.pmod(h1, F.lit(dim)).cast("int")
    sign = (F.when(F.pmod(h2, F.lit(2)) == 0, F.lit(1.0))
            .otherwise(F.lit(-1.0)) if signed else F.lit(1.0))
    per = (toks.select(F.col(id_col), bucket.alias("bucket"),
                       sign.alias("sign"))
           .groupBy(id_col, "bucket")
           .agg(F.sum("sign").alias("c")))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0.0)))
    vec = (per.groupBy(id_col)
           .agg(F.map_from_entries(
               F.collect_list(F.struct("bucket", "c"))).alias("__m"))
           .select(F.col(id_col), dense.alias("vector")))
    # documents with no tokens (NULL/empty text) still get a row — the
    # all-zero vector, which every cosine consumer's valid_vectors drops
    return (df.select(id_col).distinct()
            .join(vec, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("vector", F.array_repeat(F.lit(0.0), dim))
                    .alias("vector")))
