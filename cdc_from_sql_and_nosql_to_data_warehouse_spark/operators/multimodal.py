"""Tier C multimodal columns (driver north star): image/audio/video as
opaque ``binary`` columns with typed metadata, decoded / feature-
extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic fake (``_fake_decode``) behind the same
plumbing a real libjpeg/ffmpeg kernel would use: binary column in, typed
struct-ish columns out, partition-wise batches, schema declared up
front.  Swapping in a real decoder changes one function, not the plan.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import register
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table


@register(
    "q_multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
      CAST(length(e.embedding) AS BIGINT) AS dim
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    """,
)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 multimodal row: text + embedding side-by-side via key join
    (doc_id = vec_id in the testdata)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return d.join(e, d["doc_id"] == e["vec_id"]).select(
        "doc_id", "lang", "n_chars", "label", F.size("embedding").cast("bigint").alias("dim")
    )


@register(
    "q_binary_meta",
    oracle="""
    SELECT doc_id, 'text/plain' AS media_type,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary column + typed metadata: the storage model for
    multimodal payloads (binary blob, media_type tag, size).  Here the
    blob is the utf-8 encoding of the text column."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
    )


def _fake_decode(blob: bytes | None) -> tuple[int | None, int | None, int | None]:
    """DETERMINISTIC FAKE decode standing in for an image codec (real
    decoders aren't in this container).  Produces (width, height,
    checksum) purely from the bytes so the oracle can replicate it.
    A NULL payload decodes to NULL features (a real codec kernel must
    tolerate missing blobs too — a len(None) crash here killed the
    whole job where the oracle returned a NULL row; review-caught)."""
    if blob is None:
        return None, None, None
    n = len(blob)
    width = n % 64 + 1
    height = n % 37 + 1
    checksum = (blob[0] if n else 0) + n
    return width, height, checksum


def _decode_batches(it):
    for pdf in it:
        feats = [_fake_decode(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                # nullable Int64 so None features survive the Arrow trip
                "width": pd.array([f[0] for f in feats], dtype="Int64"),
                "height": pd.array([f[1] for f in feats], dtype="Int64"),
                "checksum": pd.array([f[2] for f in feats], dtype="Int64"),
            }
        )


@register(
    "q_multimodal_decode",
    oracle="""
    WITH b AS (SELECT doc_id, encode(text) AS payload FROM documents)
    SELECT doc_id,
      CAST(octet_length(payload) % 64 + 1 AS BIGINT) AS width,
      CAST(octet_length(payload) % 37 + 1 AS BIGINT) AS height,
      -- first BYTE (not first character: the kernel reads blob[0], and
      -- ascii(substr(...)) returned the first CODEPOINT, diverging on
      -- any non-ASCII leading character)
      CAST(CASE WHEN octet_length(payload) = 0 THEN 0
                ELSE ('0x' || substr(hex(payload), 1, 2))::INT END
           + octet_length(payload) AS BIGINT) AS checksum
    FROM b
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing: binary payload → mapInPandas decode
    kernel → typed feature columns.  The kernel is the deterministic
    fake above; the Spark-side schema, batching, and partitioning are
    exactly what a real codec kernel needs."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(
        _decode_batches, schema="doc_id long, width long, height long, checksum long"
    )


def decode_stub_real(blob: bytes):  # pragma: no cover - documentation stub
    """The slot where a real decoder goes (PIL/libjpeg, ffmpeg audio
    frames, video frame sampling).  Not available in this container."""
    raise NotImplementedError(
        "real image/audio/video decoding requires codec libraries not "
        "present in this environment; use _fake_decode for plumbing tests"
    )


def _frame_sample_batches(it):
    # 1→N decode: each payload yields (n_bytes % 5 + 1) "frames" — the
    # batch shape of video frame sampling (row explosion inside the
    # Arrow kernel, not a Spark-side explode of pre-decoded data)
    for pdf in it:
        ids, frame_nos, hashes = [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
            if blob is None:
                continue  # no payload → no frames (oracle: generate_series(0, NULL) is empty)
            n = len(blob)
            for f in range(n % 5 + 1):
                ids.append(doc_id)
                frame_nos.append(f)
                hashes.append(n + f * 7)
        yield pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "frame_no": pd.array(frame_nos, dtype="int64"),
                "frame_hash": pd.array(hashes, dtype="int64"),
            }
        )


@register(
    "q_multimodal_frames",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    f AS (SELECT doc_id, n, unnest(generate_series(0, n % 5)) AS f FROM b)
    SELECT doc_id, CAST(f AS BIGINT) AS frame_no, CAST(n + f * 7 AS BIGINT) AS frame_hash
    FROM f
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: one input payload row → N frame rows,
    produced INSIDE the mapInPandas kernel (a real ffmpeg sampler emits
    frames the same way — the engine never materializes the undecoded
    video as multiple rows).  Output cardinality is data-dependent,
    which is exactly what mapInPandas allows and a pandas_udf (1:1)
    does not.  Decode-after-prune still applies: filter/join on
    metadata first, sample frames last, and the payload never crosses
    a shuffle."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(
        _frame_sample_batches, schema="doc_id long, frame_no long, frame_hash long"
    )
