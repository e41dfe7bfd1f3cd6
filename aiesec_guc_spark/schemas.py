"""Explicit schemas — no inference anywhere (SURVEY.md §1.2: the
reference hardcodes its 8-column schema; we keep that discipline for
every table).

``OPPORTUNITY_SCHEMA`` is the exact-fidelity schema of the reference's
snapshot tables (all strings, "N/A" sentinels — aiesec.py:71-81,
140-141).  ``OPPORTUNITY_TYPED_SCHEMA`` is the derived typed view the
reference never had (real nulls, parsed ints/bools).

The ``TESTDATA_SCHEMAS`` mirror the driver corpus parquet footers
(/root/repo/FIXTURES.md §B) and are asserted in tests — reads use the
footer schema (parquet is self-describing), these exist as the declared
contract.
"""

from __future__ import annotations

from pyspark.sql import types as T

OPPORTUNITY_COLUMNS = [
    "opportunity_id",
    "opportunity_link",
    "title",
    "country",
    "premium",
    "applicants",
    "duration",
    "organization",
]

OPPORTUNITY_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in OPPORTUNITY_COLUMNS]
)

OPPORTUNITY_TYPED_SCHEMA = T.StructType(
    [
        T.StructField("opportunity_id", T.LongType(), False),
        T.StructField("opportunity_link", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("premium", T.BooleanType(), True),
        T.StructField("applicants_count", T.IntegerType(), True),
        T.StructField("duration_min", T.IntegerType(), True),
        T.StructField("duration_max", T.IntegerType(), True),
        T.StructField("duration_unit", T.StringType(), True),
        T.StructField("organization", T.StringType(), True),
    ]
)

RAW_CARD_SCHEMA = T.StructType(
    [
        T.StructField("page_id", T.IntegerType(), True),
        T.StructField("html", T.StringType(), True),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TABLE_NAMES = list(TESTDATA_SCHEMAS)
