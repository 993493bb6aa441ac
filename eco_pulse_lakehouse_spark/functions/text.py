"""Text-analysis column expressions (north-star X4, SURVEY.md §2.11).

All pure built-in expressions (split / transform / aggregate /
sequence) — JVM-side, codegen-friendly, no UDFs — so they run at
100 TB without Python in the hot path AND stay expressible in ANSI
SQL for the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small deterministic stopword list over the corpus vocabulary.
STOPWORDS = ("the", "a", "of", "and", "to")

# The same list as an ANSI-SQL IN-tuple — the ONLY sanctioned way for
# an oracle to spell the stopword set (interpolate, never re-type:
# a hardcoded copy silently drifts if STOPWORDS changes).
STOPWORDS_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

# Marker words per language for the n-gram/stopword lang-id heuristic.
# Deterministic and domain-synthetic: real lang-id would use char
# n-gram profiles; the Spark plumbing (score -> argmax) is identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "table", "row"),
    "es": ("data", "column", "part"),
    "de": ("window", "batch", "stream"),
    "fr": ("join", "merge", "order"),
    "zh": ("spark", "hash", "scan"),
}

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_MULT = 131


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the corpus is single-space separated)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column, piece_len: int = 4) -> Column:
    """Subword token ESTIMATE: each whitespace word contributes
    ceil(len/piece_len) pieces — the ~4-chars-per-token heuristic a
    BPE vocabulary averages out to. Pure arithmetic over the token
    array (no dictionary), so the estimate is exactly reproducible in
    any engine — the property the context-length budgeting and
    packing operators need. Returns BIGINT."""
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.ceil(F.length(t) / F.lit(float(piece_len))).cast("bigint"),
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Overlapping word n-grams as space-joined strings.

    transform(sequence(1, len-n+1), i -> concat_ws(' ', slice(toks, i, n)))
    """
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    # guard: Spark's sequence(1, x) DESCENDS for x < 1 instead of being
    # empty — short docs must yield an empty shingle list
    return F.when(F.size(toks) >= n,
                  F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
                  ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stops = F.filter(toks, lambda w: w.isin(*STOPWORDS))
    return F.size(stops).cast("double") / F.size(toks)


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality heuristic: rewards mid-length docs,
    penalizes stopword stuffing and very short tokens.

    score = least(1.0, n_tokens/100) * (1 - stopword_ratio)
            * least(1.0, avg_token_len/8)
    Pure arithmetic on exact ints → double; deterministic across
    engines (single division per factor, same association).
    """
    toks = tokens(text)
    n = F.size(toks).cast("double")
    avg_len = (F.length(text) - (F.size(toks) - 1)).cast("double") / F.size(toks)
    return (
        F.least(F.lit(1.0), n / 100.0)
        * (F.lit(1.0) - stopword_ratio(text))
        * F.least(F.lit(1.0), avg_len / 8.0)
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (the n-gram-profile shape)."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda w: w.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language by marker hits via greatest + first-match CASE —
    ties resolve in fixed declaration order (deterministic, and
    trivially mirrored in the SQL oracle); 'und' when nothing hits."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, "und")
    for lang in LANG_MARKERS:
        expr = expr.when(scores[lang] == best, lang)
    return expr.otherwise("und")


def fingerprint(text: Column) -> Column:
    """Rolling polynomial document fingerprint over words.

    h_0 = 0;  h_i = (h_{i-1} * 131 + len(w_i) * 31 + code(w_i[0])) mod 1e9+7

    Exact BIGINT arithmetic (h < 1e9, h*131 + c < 2^63) — identical in
    any engine; the DuckDB twin is list_reduce over string_split.
    """
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, w: (
            h * F.lit(FINGERPRINT_MULT)
            + F.length(w).cast("long") * F.lit(31)
            + F.ascii(w).cast("long")
        )
        % F.lit(FINGERPRINT_MOD),
    )


TOKEN_HASH_MOD = 1_000_003


def token_char_hash(tok: Column) -> Column:
    """Full-token polynomial character hash (the hashing-trick
    feature map a linear text classifier uses):

      h_0 = 0;  h_i = (h_{i-1} * 131 + code(c_i)) mod 1_000_003

    Exact BIGINT arithmetic (h < 1e6+3, h*131 + 127 < 2^28), so the
    hash is bit-identical in any engine — the DuckDB twin is
    list_reduce over the character codes. One interpreted HOF fold
    per token, O(token length); the codegen alternative (posexplode
    characters) multiplies row count by mean token length, which
    costs more than the interpreter at any scale.
    """
    codes = F.transform(
        F.sequence(F.lit(1), F.length(tok)),
        lambda i: F.ascii(F.substring(tok, i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, c: (h * F.lit(FINGERPRINT_MULT) + c) % F.lit(TOKEN_HASH_MOD),
    )


# PII scrubbing — ordered (URL before EMAIL: a URL can embed '@';
# EMAIL before PHONE is arbitrary but fixed). Patterns restricted to
# syntax shared by Java regex and RE2 so the DuckDB oracle replays
# them verbatim (with the 'g' flag — DuckDB replaces first-only by
# default, Spark replaces all).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b555-[0-9]+\b", "<PHONE>"),
)


def scrub_pii(text: Column) -> Column:
    """Redact URLs, emails and (555-prefixed) phone numbers with typed
    placeholder tokens — the standard pre-training text-curation pass.
    Chained JVM-side ``regexp_replace`` (codegen, no UDF): at 100 TB
    this runs inside the same whole-stage-codegen span as the
    surrounding projection."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def distinct_ngram_stats(docs, id_col: str, text_col: str, lang_col: str):
    """Distinct-n diversity profile per corpus slice (Li et al. 2016's
    distinct-1/2/3, corpus-level): for n ∈ {1,2,3} and each ``lang``,
    the distinct n-gram count, total n-gram positions, and their
    ratio — the standard template/mode-collapse diagnostic (a slice
    whose distinct-2 ratio collapses is boilerplate- or
    generation-loop-heavy; pairs with the per-doc repetition_signals
    view).

    One row-local explode per n (shingles are array transforms), one
    map-side-combinable groupBy per (lang, n); count-distinct expands
    to (lang, n, gram) partials — at 100 TB swap for HLL
    (approx_count_distinct) exactly like a6's documented ladder.
    Returns (lang, n, n_distinct, n_total, distinct_ratio)."""
    from pyspark.sql import functions as F

    parts = []
    for n in (1, 2, 3):
        grams = (
            tokens(F.col(text_col))
            if n == 1
            else word_shingles(F.col(text_col), n)
        )
        parts.append(
            docs.select(
                F.col(lang_col).alias("lang"),
                F.lit(n).cast("int").alias("n"),
                F.explode(grams).alias("__g"),
            )
        )
    allg = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return allg.groupBy("lang", "n").agg(
        F.countDistinct("__g").cast("bigint").alias("n_distinct"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        (
            F.countDistinct("__g").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("distinct_ratio"),
    )
