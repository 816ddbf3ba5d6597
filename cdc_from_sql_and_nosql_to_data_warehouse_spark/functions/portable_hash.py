"""Engine-portable deterministic hashing — ONE definition of the
md5-prefix integer and the whitespace-token oracle fragment.

The invariant (measured, SURVEY.md numeric policy): Spark
``conv(substr(md5(s), 1, k), 16, 10)::bigint`` equals DuckDB
``('0x' || substr(md5(s), 1, k))::BIGINT`` for k ≤ 15 (≤ 60 bits, so
the value fits int64 with headroom for affine MinHash arithmetic).
Every dedup/sampling/split operator that needs a cross-engine
deterministic pseudo-random value derives it from here; the fragments
were previously copy-pasted per file (round-3 verdict's documented
duplication debt).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^60 — the exclusive upper bound of the 15-hex-digit prefix, used to
# map the hash to a uniform double in [0, 1)
MD5_60BIT_SPAN = float(1 << 60)


def md5_prefix_int(col: Column, n_hex: int = 15) -> Column:
    """Spark side: first ``n_hex`` hex digits of md5 as a BIGINT
    (codegen'd conv/substr — no Python in the hot path)."""
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("bigint")


def md5_unit(col: Column) -> Column:
    """Deterministic uniform double in [0, 1) from the 60-bit prefix —
    the cross-engine replacement for rand() in sampling/splits."""
    return md5_prefix_int(col) / F.lit(MD5_60BIT_SPAN)


def sql_md5_int(expr: str, n_hex: int = 15) -> str:
    """DuckDB mirror of ``md5_prefix_int``."""
    return f"('0x' || substr(md5({expr}), 1, {n_hex}))::BIGINT"


def sql_md5_unit(expr: str) -> str:
    """DuckDB mirror of ``md5_unit``."""
    return f"(CAST({sql_md5_int(expr)} AS DOUBLE) / {int(MD5_60BIT_SPAN)}.0)"


# DuckDB whitespace tokenization (mirror of functions.text.tokens):
# lowercased, split on runs of whitespace, empties removed.  The
# whitespace class is spelled explicitly because Java's \s includes
# \x0B and RE2's does not (SURVEY numeric policy) — this fragment MUST
# stay bit-identical everywhere it appears, which is why it has one
# definition (round-8: the per-file literal twins now interpolate it).


def sql_toks_expr(col: str = "text") -> str:
    """DuckDB mirror of ``functions.text.tokens(col)`` over any column
    expression (e.g. ``"text"``, ``"d.text"``)."""
    return (
        f"list_filter(string_split_regex(lower({col}), "
        "'[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')"
    )


SQL_TOKS_EXPR = sql_toks_expr()


def sql_bpe_toks_expr(col: str = "text") -> str:
    """DuckDB mirror of ``functions.text.bpe_ish_tokens(col)``: the
    GPT-2-style pre-tokenizer shape — punctuation runs split from word
    pieces, then whitespace-split (same explicit class; RE2 has no \\s
    parity with Java)."""
    return (
        "list_filter(string_split_regex(regexp_replace(lower("
        + col
        + "), '([^\\w \\t\\n\\x0B\\f\\r]+)', ' \\1 ', 'g'), "
        "'[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
    )

# the same, as a ready-to-WITH CTE over the documents table
SQL_TOKS_CTE = f"""
    toks AS (
      SELECT doc_id,
        {SQL_TOKS_EXPR} AS toks
      FROM documents
    )
"""
