"""Declared silver-layer schemas (SURVEY.md §1.3).

The reference's schemas live in external SQLAlchemy models and the code
introspects them generically (oit_to_edw/employee_job.py:17); the JSON
side is schema-on-read with permissive defaults
(transformer_loaders/pure_api_internal_person.py:109-113).

Here every table the engine consumes has an explicit ``StructType`` —
nullable everywhere, strings for business keys (the reference's
convention: emplid/deptid/jobcode are strings even when numeric-looking,
SURVEY.md §1.2).  ``validated_read`` enforces the contract at the scan:
missing column → hard error; extra columns are dropped (forward
compatibility); types are cast, never trusted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from experts_etl_spark.sources import read_table


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, T.StructType] = {
    "region": _s(("r_regionkey", T.IntegerType()), ("r_name", T.StringType())),
    "nation": _s(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _s(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
    ),
    "orders": _s(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _s(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),  # parquet NANOS → micros in read_table
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _s(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _s(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}


class SchemaMismatch(ValueError):
    pass


def validated_read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1 with the schema contract enforced: project to the declared
    columns (order included), casting each to its declared type.
    Missing columns raise; extra physical columns are pruned at the
    scan (never even read, thanks to column pruning)."""
    schema = SCHEMAS[name]
    df = read_table(spark, sf_dir, name)
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise SchemaMismatch(f"{name}: missing columns {missing}")
    return df.select(
        *[F.col(f.name).cast(f.dataType) for f in schema.fields]
    )
