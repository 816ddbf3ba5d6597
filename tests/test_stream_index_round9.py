"""Streaming ANN-index maintenance (round 9): the q_sim_index_incremental
delta applied through the REAL CDC pipeline — vector change events →
frozen-codebook re-encode (pure streaming projection) → bucket-
incremental versioned merge — must land on exactly the code table the
batch operator computes.

Also pins pq_encode_expr ≡ _pq_encode (the literal-folded map-only
encode against the join+aggregate encode) on the whole base corpus.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.mlprep import (
    _DELTA_MOD,
    _INS_SHIFT,
    _pq_codebook,
    _pq_encode,
    pq_codebook_literal,
    pq_encode_expr,
    q_sim_index_incremental,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import cdc

from conftest import SF_DIR


def _codes_str(encoded) -> dict[str, str]:
    rows = (
        encoded.groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "code"))),
                    lambda t: t["code"].cast("string"),
                ),
                ",",
            ).alias("codes")
        )
        .collect()
    )
    return {str(r["vec_id"]): r["codes"] for r in rows}


def test_pq_encode_expr_matches_join_encode(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cb = _pq_codebook(emb).localCheckpoint()
    via_expr = {
        str(r["vec_id"]): r["codes"]
        for r in emb.select(
            "vec_id", pq_encode_expr(pq_codebook_literal(cb)).alias("codes")
        ).collect()
    }
    via_join = _codes_str(_pq_encode(emb, cb))
    assert via_expr == via_join


def _drop(drop_dir: str, events: list[dict]) -> None:
    with open(f"{drop_dir}/{uuid.uuid4().hex}.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_streaming_maintenance_equals_batch_operator(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cb = _pq_codebook(emb).localCheckpoint()
    cb_lit = pq_codebook_literal(cb)

    base = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]

    def ins(vid: int, vec: list[float], seq: int) -> dict:
        return {
            "eventName": "INSERT",
            "seq": seq,
            "newImage": {"vec_id": str(vid), "embedding": vec},
            "removedId": None,
        }

    # feed 1: the base corpus; feed 2: the SAME CDC delta the batch
    # operator synthesizes (%17: 3→REMOVE, 5→MODIFY negated, 7→INSERT
    # reversed under a shifted id)
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    _drop(drop, [ins(vid, vec, vid) for vid, vec in base])
    delta: list[dict] = []
    hi = 10**9  # delta seqs beat every base seq
    for vid, vec in base:
        m = vid % _DELTA_MOD
        if m == 3:
            delta.append(
                {
                    "eventName": "REMOVE",
                    "seq": hi + vid,
                    "newImage": None,
                    "removedId": str(vid),
                }
            )
        elif m == 5:
            delta.append(
                {
                    "eventName": "MODIFY",
                    "seq": hi + vid,
                    "newImage": {
                        "vec_id": str(vid),
                        "embedding": [-x for x in vec],
                    },
                    "removedId": None,
                }
            )
        elif m == 7:
            delta.append(ins(vid + _INS_SHIFT, vec[::-1], hi + vid))
    _drop(drop, delta)

    table, ck = str(tmp_path / "index"), str(tmp_path / "ck")
    stream = cdc.encode_vector_changes(
        cdc.read_vector_change_stream(spark, drop), cb_lit
    )
    q = cdc.start_merge_stream(stream, table, ck, key="vec_id")
    q.awaitTermination(180)

    got = {
        r["vec_id"]: r["codes"]
        for r in cdc.read_merge_table(spark, table).collect()
    }
    want_rows = q_sim_index_incremental(spark, SF_DIR).collect()
    want: dict[str, dict[int, int]] = {}
    for r in want_rows:
        want.setdefault(str(r["vec_id"]), {})[r["subspace"]] = r["code"]
    want_str = {
        vid: ",".join(str(cs[s]) for s in sorted(cs)) for vid, cs in want.items()
    }
    assert got == want_str
