"""DynamoDB AttributeValue wire-format decoding (SURVEY.md §2.1 A11).

The reference deserializes stream records with boto3's TypeDeserializer
(``TypeDeserializer().deserialize({"M": NewImage})``,
reference: source/write_dynamodb_stream_to_s3_lambda/handler.py:30) and
re-serializes decimals as floats (DecimalEncoder, :16-20).

Spark-first: for a KNOWN document schema the decode is a pure column
expression over ``from_json`` with the wire schema — no Python per row,
fully codegen'd.  For arbitrary/drifting documents there is a small
pure-Python deserializer (the wire format is public AWS documentation)
usable from ``mapInPandas``.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Wire schema for the trades document (FIXTURES.md §1.2) wrapped as
# {"M": {...}}.  Every leaf is {"S": str} / {"N": str} / {"BOOL": bool};
# lists are {"L":[...]}, maps {"M":{...}}.
TRADES_WIRE_DDL = """
  M struct<
    id: struct<S: string>,
    price: struct<N: string>,
    shares: struct<N: string>,
    ticker: struct<S: string>,
    ticket: struct<S: string>,
    time: struct<M: struct<date: struct<S: string>>>,
    details: struct<M: struct<
      asks: struct<L: array<struct<N: string>>>,
      bids: struct<L: array<struct<N: string>>>,
      lag: struct<N: string>,
      system: struct<S: string>
    >>
  >
"""


def decode_trades_wire(col: Column | str) -> Column:
    """AttributeValue JSON string → typed trades struct (the engine's
    expression-level TypeDeserializer).  Numbers go to double — the
    reference's lossy Decimal→float policy."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.from_json(c, TRADES_WIRE_DDL)["M"]
    num = lambda field: m[field]["N"].cast("double")  # noqa: E731
    return F.struct(
        m["id"]["S"].alias("id"),
        F.struct(
            F.transform(m["details"]["M"]["asks"]["L"], lambda x: x["N"].cast("double")).alias(
                "asks"
            ),
            F.transform(m["details"]["M"]["bids"]["L"], lambda x: x["N"].cast("double")).alias(
                "bids"
            ),
            m["details"]["M"]["lag"]["N"].cast("long").alias("lag"),
            m["details"]["M"]["system"]["S"].alias("system"),
        ).alias("details"),
        num("price").alias("price"),
        m["shares"]["N"].cast("long").alias("shares"),
        m["ticker"]["S"].alias("ticker"),
        m["ticket"]["S"].alias("ticket"),
        F.struct(m["time"]["M"]["date"]["S"].alias("date")).alias("time"),
    )


def decode_trades_df(df: DataFrame, col: str = "value") -> DataFrame:
    """Decode a DataFrame of AttributeValue JSON strings into flat
    typed trades columns."""
    doc = decode_trades_wire(col)
    return df.select(doc.alias("doc")).select("doc.*")


def deserialize_attrvalue(av: dict[str, Any]) -> Any:
    """Generic pure-Python AttributeValue deserializer for schema-drifting
    documents (use inside mapInPandas).  Mirrors the public wire format:
    S/N/BOOL/NULL/L/M (binary and set types omitted — the reference's
    data never produces them).

    Numbers: lexically integral N values decode to int — the expression
    path (decode_trades_wire) casts shares/lag to long, and a float
    round-trip silently corrupts integers above 2^53
    (9007199254740993 → 9007199254740992.0; review-caught divergence
    between the two decoders).  Fractional/exponent forms keep the
    reference's Decimal→float policy."""
    (tag, v), = av.items()
    if tag == "S":
        return v
    if tag == "N":
        return float(v) if any(c in v for c in ".eE") else int(v)
    if tag == "BOOL":
        return bool(v)
    if tag == "NULL":
        return None
    if tag == "L":
        return [deserialize_attrvalue(x) for x in v]
    if tag == "M":
        return {k: deserialize_attrvalue(x) for k, x in v.items()}
    raise ValueError(f"unsupported AttributeValue tag: {tag}")


def deserialize_attrvalue_json(line: str) -> dict[str, Any]:
    return deserialize_attrvalue(json.loads(line))
