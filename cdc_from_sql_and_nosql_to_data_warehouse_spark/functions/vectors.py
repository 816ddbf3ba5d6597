"""Vector expression library for similarity search (SURVEY.md §2.3 C3).

Dot products / norms / cosine over ``array<float>`` columns as built-in
higher-order functions (``zip_with`` + ``aggregate``) — JVM-side, no
Python per row.  Elements are cast to double before any arithmetic so the
left-fold accumulation is bit-deterministic and matches a DuckDB
``list_reduce`` oracle.

For the 100 TB path a brute-force k-NN is a cross join — O(N·Q); the
LSH-bucketed variant in ``operators.similarity`` prunes candidates by
random-hyperplane signatures so the join is equi on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm2(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def hyperplane_signature(a: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(a · plane_i),
    packed into a BIGINT bucket key.  ``planes`` are deterministic
    (seeded) constants broadcast as literals — no shuffle to build.
    At most 63 planes: bit 63 is the BIGINT sign bit and ``1 << 63``
    overflows the long literal (review-caught); signatures wider than
    63 bits belong in multiple bucket columns.

    This is the expression-form REFERENCE implementation: the hot path
    (operators.similarity._signature_rows) computes the same bits in
    one Arrow numpy matmul (the per-bit interpreted folds here measured
    6.6 s vs 1.0 s at sf0.1), and
    tests/test_helper_review_fixes.py::test_signature_kernel_matches_reference
    pins the two forms bit-identical on the testdata."""
    if not 1 <= len(planes) <= 63:
        raise ValueError(
            f"hyperplane_signature needs 1..63 planes, got {len(planes)}"
        )
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    _c(a),
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1 << i).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
