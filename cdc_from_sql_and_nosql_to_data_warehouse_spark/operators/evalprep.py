"""Retrieval-evaluation and feature-prep operators (round 6).

The reference pipeline ends at the warehouse (Lambda handlers COPY/merge
into Redshift; /root/reference/source/*/handler.py, no evaluation code of
its own) — these operators cover the next stage a training-data platform
needs once the warehouse holds documents + embeddings: measuring the
retrieval stack it serves (NDCG, AUC, rank fusion) and preparing model
features from warehouse columns (one-hot, robust scaling, quantile
alignment, leakage-safe splits).

Engine-determinism policy (same as mlprep.py): cross-row float sums use
position-sorted folds or exact integer/DECIMAL arithmetic; transcendental
outputs (log2) are rounded to 6dp per-term BEFORE summation on both
engines; "randomness" is md5-derived.  Windows only ever run over
aggregates whose row count is bounded by a domain (distinct scores,
distinct lengths, calendar days), never over fact rows — the Gini
pattern from SCALE.md.
"""


# Round-7 split (VERDICT r6 §next-8): the four operator families live in
# their own modules now; this aggregator keeps every existing import
# path (tests, docs) working.  Importing the family modules is what
# registers their queries — the import order below tracks the original
# single-file registration order (featureprep → retrieval → classifier
# → drift/TS) so the registry's insertion order barely moves.

# isort: off
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.featureprep import *  # noqa: F401,F403
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.featureprep import (  # noqa: F401
    _ROBUST_APPROX_ACCURACY,
    _ROBUST_EXACT_MAX_ROWS,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.retrievaleval import *  # noqa: F401,F403
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.classifiereval import *  # noqa: F401,F403
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.driftts import *  # noqa: F401,F403
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.evalcommon import (  # noqa: F401
    _SQL_DOT,
    _sql_cos,
)
# isort: on
