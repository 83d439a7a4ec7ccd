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


# ---------------------------------------------------------------------------
# Fixed-width converter (geomesa-convert fixed-width analog)
# ---------------------------------------------------------------------------

def ingest_fixed_width(
    spark: SparkSession,
    path: str,
    fields: dict[str, tuple[int, int, str]],
    spec: dict[str, str] | None = None,
) -> DataFrame:
    """Fixed-width text -> typed table. ``fields``: name -> (start_1based,
    length, spark_type); an optional converter ``spec`` post-transforms.
    Pure plan: substring + cast + trim under codegen, no Python."""
    raw = spark.read.text(path)
    cols = [
        F.trim(F.substring(F.col("value"), start, length)).cast(typ).alias(name)
        for name, (start, length, typ) in fields.items()
    ]
    out = raw.select(*cols)
    return out if spec is None else apply_converter(out, spec)


# ---------------------------------------------------------------------------
# XML converter (geomesa-convert-xml analog; stdlib ElementTree, Arrow-batched)
# ---------------------------------------------------------------------------

def ingest_xml(
    spark: SparkSession,
    path: str,
    record_tag: str,
    fields: dict[str, str],
    spec: dict[str, str] | None = None,
) -> DataFrame:
    """XML files -> one row per ``<record_tag>`` element. ``fields``: output
    column -> relative ElementTree path ('.' = element text, '@attr' =
    attribute, 'child/grandchild' = nested text). Whole files are
    distributed one-per-task (XML is not line-splittable); all values are
    strings — use ``spec`` for casts."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                root = ET.fromstring(bytes(blob).decode("utf-8"))
                it = root.iter(record_tag)
                for el in it:
                    row = []
                    for fpath in fields.values():
                        if fpath == ".":
                            row.append(el.text)
                        elif fpath.startswith("@"):
                            row.append(el.get(fpath[1:]))
                        else:
                            sub = el.find(fpath)
                            row.append(None if sub is None else sub.text)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=list(fields))

    schema = ", ".join(f"{name} string" for name in fields)
    out = files.mapInPandas(parse, schema=schema)
    return out if spec is None else apply_converter(out, spec)


# ---------------------------------------------------------------------------
# Avro Object Container File converter (geomesa-convert-avro analog)
#
# The Spark distribution in this environment ships without the external
# spark-avro module, so the OCF format (public Apache Avro spec) is decoded
# from scratch: header magic Obj\x01 + metadata map (avro.schema JSON,
# avro.codec null/deflate) + sync-marker-delimited blocks of binary-encoded
# records. Flat record schemas of primitives and ["null", T] unions are
# supported — the shapes geomesa-convert-avro's SFT mappings target.
# ---------------------------------------------------------------------------

def _avro_read_varlong(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # zigzag


def _avro_decode_value(buf: bytes, pos: int, typ):
    import struct as _s

    if isinstance(typ, list):  # union: index then value
        idx, pos = _avro_read_varlong(buf, pos)
        return _avro_decode_value(buf, pos, typ[idx])
    if isinstance(typ, dict):
        typ = typ["type"]
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _avro_read_varlong(buf, pos)
    if typ == "float":
        return _s.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return _s.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("bytes", "string"):
        n, pos = _avro_read_varlong(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n
    raise ValueError(f"unsupported avro type {typ!r}")


def read_avro_file(data: bytes):
    """-> (field_names, rows) from one Avro OCF byte blob."""
    import json as _json
    import zlib as _z

    assert data[:4] == b"Obj\x01", "not an Avro OCF"
    pos = 4
    meta = {}
    while True:
        n, pos = _avro_read_varlong(data, pos)
        if n == 0:
            break
        if n < 0:  # block with byte size prefix
            _, pos = _avro_read_varlong(data, pos)
            n = -n
        for _ in range(n):
            klen, pos = _avro_read_varlong(data, pos)
            key = data[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _avro_read_varlong(data, pos)
            meta[key] = data[pos : pos + vlen]
            pos += vlen
    sync = data[pos : pos + 16]
    pos += 16
    schema = _json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    assert schema["type"] == "record", "flat record schemas only"
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    rows = []
    while pos < len(data):
        count, pos = _avro_read_varlong(data, pos)
        size, pos = _avro_read_varlong(data, pos)
        block = data[pos : pos + size]
        pos += size
        assert data[pos : pos + 16] == sync, "sync marker mismatch"
        pos += 16
        if codec == "deflate":
            block = _z.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        bpos = 0
        for _ in range(count):
            row = []
            for _, ftype in fields:
                v, bpos = _avro_decode_value(block, bpos, ftype)
                row.append(v)
            rows.append(row)
    return [name for name, _ in fields], rows


def write_avro_file(names, types, rows) -> bytes:
    """Minimal OCF writer (null codec) for round-trip tests: flat records of
    int/long/double/string/boolean."""
    import json as _json
    import struct as _s

    def zz(v: int) -> bytes:
        acc = (v << 1) ^ (v >> 63)
        out = bytearray()
        while True:
            b = acc & 0x7F
            acc >>= 7
            if acc:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        return bytes(out)

    schema = {
        "type": "record", "name": "rec",
        "fields": [{"name": n, "type": t} for n, t in zip(names, types)],
    }
    sj = _json.dumps(schema).encode()
    head = b"Obj\x01" + zz(2)
    for k, v in ((b"avro.schema", sj), (b"avro.codec", b"null")):
        head += zz(len(k)) + k + zz(len(v)) + v
    head += zz(0)
    sync = b"0123456789abcdef"
    body = bytearray()
    for row in rows:
        for v, t in zip(row, types):
            if t in ("int", "long"):
                body += zz(int(v))
            elif t == "double":
                body += _s.pack("<d", float(v))
            elif t == "boolean":
                body += b"\x01" if v else b"\x00"
            elif t == "string":
                e = str(v).encode()
                body += zz(len(e)) + e
            else:
                raise ValueError(t)
    return head + sync + zz(len(rows)) + zz(len(body)) + bytes(body) + sync


def ingest_avro(
    spark: SparkSession,
    path: str,
    spec: dict[str, str] | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Avro OCF -> table, one file per task via binaryFile + mapInPandas
    (the block decode runs Arrow-batched on executors; files are the split
    unit exactly like the reference's converter job)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")
    if schema is None:
        # derive the Spark schema from the first file's avro schema
        import json as _json

        first = files.limit(1).collect()[0].content
        sch = _json.loads(_avro_header_meta(bytes(first))["avro.schema"])
        _MAP = {"int": "int", "long": "long", "float": "float",
                "double": "double", "string": "string", "boolean": "boolean",
                "bytes": "binary"}

        def styp(t):
            if isinstance(t, list):
                t = [x for x in t if x != "null"][0]
            if isinstance(t, dict):
                t = t["type"]
            return _MAP[t]

        schema = ", ".join(f"{f['name']} {styp(f['type'])}" for f in sch["fields"])

    def parse(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                names, rows = read_avro_file(bytes(blob))
                yield pd.DataFrame(rows, columns=names)

    out = files.mapInPandas(parse, schema=schema)
    return out if spec is None else apply_converter(out, spec)


def _avro_header_meta(data: bytes):
    pos = 4
    meta = {}
    while True:
        n, pos = _avro_read_varlong(data, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _avro_read_varlong(data, pos)
            n = -n
        for _ in range(n):
            klen, pos = _avro_read_varlong(data, pos)
            key = data[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _avro_read_varlong(data, pos)
            meta[key] = data[pos : pos + vlen].decode()
            pos += vlen
    return meta
