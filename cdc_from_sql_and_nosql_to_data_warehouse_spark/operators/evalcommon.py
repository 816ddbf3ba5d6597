"""Shared cross-engine cosine/dot SQL fragments for the eval-family
operators (retrievaleval / classifiereval): one definition so the
DuckDB oracles and every consumer stay literally identical."""

from __future__ import annotations

_SQL_DOT = """
  list_reduce(
    list_prepend(CAST(0 AS DOUBLE),
      list_transform(generate_series(1, length({a})),
        i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
    (x, y) -> x + y)
"""


def _sql_cos(a: str, b: str) -> str:
    return (
        f"(({_SQL_DOT.format(a=a, b=b)}) / "
        f"(sqrt({_SQL_DOT.format(a=a, b=a)}) * sqrt({_SQL_DOT.format(a=b, b=b)})))"
    )


