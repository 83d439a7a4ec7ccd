"""Ingest converters — delimited/JSON/parquet -> typed feature tables.

Reference: the ``geomesa-convert`` module family (delimited-text, JSON, Avro,
XML, fixed-width converters configured by HOCON specs with a
transform-expression DSL — e.g. ``geomesa-convert/geomesa-convert-common/
.../transforms/StringFunctionFactory.scala``). The Spark-first re-expression:
a converter spec is a dict of output column -> SQL expression evaluated over
the raw source columns; every DSL function the reference ships (trim,
lowercase, concat, regexReplace, date parsing, md5, casts, point
construction) is already a Spark built-in, so the converter is pure plan —
no UDFs, full codegen, and Catalyst prunes unused raw columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# reference DSL name -> Spark SQL equivalent (documentation + validation map)
DSL_EQUIVALENTS = {
    "trim": "trim", "lowercase": "lower", "uppercase": "upper",
    "concat": "concat", "mkstring": "concat_ws", "regexReplace": "regexp_replace",
    "substr": "substring", "length": "length", "printf": "format_string",
    "now": "current_timestamp", "millisToDate": "timestamp_millis",
    "secsToDate": "timestamp_seconds", "dateParse": "to_timestamp",
    "add": "+", "subtract": "-", "multiply": "*", "divide": "/",
    "mean": "avg", "min": "least", "max": "greatest",
    "parseList": "split", "md5": "md5", "base64": "base64", "uuid": "uuid",
    "stringToInt": "cast(x as int)", "stringToDouble": "cast(x as double)",
    "point": "struct(lon, lat)",
}


def apply_converter(df: DataFrame, spec: dict[str, str]) -> DataFrame:
    """Evaluate a converter spec (out_col -> SQL expression over raw cols)."""
    return df.select(*[F.expr(sql).alias(name) for name, sql in spec.items()])


def ingest_delimited(
    spark: SparkSession,
    path: str,
    spec: dict[str, str],
    sep: str = ",",
    header: bool = True,
    **options,
) -> DataFrame:
    """DelimitedTextConverter analog: csv/tsv -> transformed feature table."""
    raw = spark.read.options(sep=sep, header=header, **options).csv(path)
    return apply_converter(raw, spec)


def ingest_json(
    spark: SparkSession, path: str, spec: dict[str, str], **options
) -> DataFrame:
    """JsonConverter analog (feature-path flattening = Spark's native nested
    field access inside the spec expressions)."""
    raw = spark.read.options(**options).json(path)
    return apply_converter(raw, spec)


def ingest_parquet(
    spark: SparkSession, path: str, spec: dict[str, str] | None = None
) -> DataFrame:
    raw = spark.read.parquet(path)
    return raw if spec is None else apply_converter(raw, spec)
