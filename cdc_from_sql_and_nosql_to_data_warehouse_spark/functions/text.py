"""Text-analysis expression library (SURVEY.md §2.3 C4/C5 + driver
north-star text ops: language-ID, quality scoring, token counting,
fingerprinting).

Everything here is built-in `pyspark.sql.functions` compositions —
JVM-side, whole-stage-codegen'd, no Python in the hot path — so the same
expressions run unchanged over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny marker-word lists for the n-gram/stopword language heuristic.
# Deliberately deterministic and SQL-replicable (no model).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour", "est"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["for", "on", "with", "as", "at", "by"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, lowercased, empties dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish regex tokenization: word pieces, numbers, punctuation as
    separate tokens (GPT-2-style pre-tokenizer shape, public pattern)."""
    c = F.col(col) if isinstance(col, str) else col
    # split points: between word chars and non-word chars
    spaced = F.regexp_replace(F.lower(c), r"([^\w\s]+)", r" $1 ")
    return F.filter(F.split(spaced, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("bigint")


def stopword_filter(toks: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    return F.filter(toks, lambda t: ~F.array_contains(sw, t))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (distinct markers present)."""
    toks = F.array_distinct(tokens(col))
    return {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).cast("bigint")
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col: Column | str) -> Column:
    """argmax language by marker hits; 'und' when nothing matches OR
    the text is NULL (NULL scores made struct-min pick an arbitrary
    language while the SQL oracle's CASE fell to its ELSE — divergent
    verdicts on NULL text; fixture-caught).  Deterministic tie-break:
    language name ascending."""
    scores = lang_scores(col)
    # struct sort: (-hits, lang) so max hits wins, ties to lexicographic
    pairs = F.array(
        *[F.struct((-s).alias("neg"), F.lit(lang).alias("lang")) for lang, s in scores.items()]
    )
    best = F.array_min(pairs)
    return F.when(
        best["neg"].isNull() | (best["neg"] == 0), F.lit("und")
    ).otherwise(best["lang"])


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) == 0, 0.0).otherwise(
        n_punct.cast("double") / F.length(c).cast("double")
    )


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, 0.0).otherwise(
        n_sw.cast("double") / F.size(toks).cast("double")
    )


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, 0.0).otherwise(
        total.cast("double") / F.size(toks).cast("double")
    )


def quality_score(col: Column | str) -> Column:
    """Composite heuristic quality score in [0,1]: favors texts that are
    not too short, not punctuation-heavy, with some stopword glue.
    Pure rational arithmetic on counts → oracle-replicable."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c).cast("double") / F.lit(400.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw * 2.0, F.lit(1.0))
    return (len_score + punct_pen + sw_score) / F.lit(3.0)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-collapsed lowercased text
    (exact-dup canonical form; md5 is identical in every engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def _shingle_starts(toks: Column, n: int) -> Column:
    """1-based shingle start positions; EMPTY when the document has
    fewer than n tokens.  The guard matters: Spark's sequence(1, 0)
    returns the DESCENDING [1, 0] (step defaults to -1 when start >
    stop, unlike DuckDB generate_series which returns []), and index 0
    then crashes element_at/slice on any short document."""
    return F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>), the MinHash input unit.
    Documents with fewer than n tokens yield an empty shingle array.

    IMPORTANT: pass a materialized token *column* (an attribute from a
    previous projection), not a raw text column — the lambda references
    its input per element, and a full tokenization expression would be
    re-evaluated O(len) times (measured 15s → 0.5s on the minhash
    bench after materializing)."""
    toks = F.col(col) if isinstance(col, str) else col
    return F.transform(
        _shingle_starts(toks, n), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )


def shingle_hashes(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as murmur3 hashes (array<int>) — the
    identity-only form for MinHash/Jaccard, where the shingle *string*
    is never needed downstream.  Skipping the concat_ws string
    allocation per shingle roughly halves shingling cost (higher-order
    lambdas run interpreted, so per-element allocation dominates).
    Same materialized-token-column caveat (and short-document guard)
    as word_shingles."""
    toks = F.col(col) if isinstance(col, str) else col
    # element_at is 1-based; _shingle_starts runs over start positions
    return F.transform(
        _shingle_starts(toks, n), lambda i: F.hash(*[F.element_at(toks, i + k) for k in range(n)])
    )
