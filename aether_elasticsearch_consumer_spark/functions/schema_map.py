"""Avro→engine type system (reference config.py:35-68 tables, processor.py:81-88
union resolution, index_handler.py:616-639 mapping derivation).

The reference derives an Elasticsearch mapping from each message's Avro
schema; here the same tables derive (a) a Spark ``StructType`` for the docs
DataFrame and (b) an index "mapping" dict (field → index type) that drives
the ingest pipeline compiler and change detection. Rules:

- union types resolve to the *most permissive* member = the LAST match in
  table order (processor.py:86 takes ``[-1]``), nullability from ``null``;
- logical types (``date``, ``timestamp-millis``, ``uuid``) and aether
  extended types (``dateTime``, ``geopoint``, ``select``/``select1``, …)
  override the base type;
- records nest as StructType, arrays as ArrayType (ES ``nested``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

# (avro type, es index type) — order matters: later = more permissive
AVRO_TYPES: list[tuple[str, str]] = [
    ("boolean", "boolean"),
    ("int", "integer"),
    ("long", "long"),
    ("float", "float"),
    ("double", "double"),
    ("bytes", "binary"),
    ("string", "keyword"),
    ("record", "object"),
    ("enum", "string"),
    ("array", "nested"),
    ("fixed", "string"),
    ("object", "object"),
    ("array:string", "object"),
]

AVRO_LOGICAL_TYPES: dict[str, Any] = {
    "date": ("date", "date"),
    "timestamp-millis": ("date", "epoch_millis"),
    "uuid": "string",
}

AETHER_TYPES: dict[str, Any] = {
    "dateTime": "date",
    "epoch_second": ("date", "epoch_second"),
    "epoch_millis": ("date", "epoch_millis"),
    "geopoint": "object",
    "select": "keyword",
    "select1": "keyword",
    "group": "object",
}

_SPARK_BY_AVRO: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    "enum": T.StringType(),
    "fixed": T.StringType(),
}

_AVRO_ORDER = [t for t, _ in AVRO_TYPES]


def most_permissive_avro_type(types: Any) -> Any:
    """Union → last matching member in AVRO_TYPES order (processor.py:81-88).
    Non-lists pass through; unions of complex types fall back to the first
    non-null member."""
    if not isinstance(types, list):
        return types
    names = []
    for t in types:
        if isinstance(t, dict):
            names.append(t.get("type"))
        else:
            names.append(t)
    matches = [t for t in _AVRO_ORDER if t in names]
    if matches:
        return matches[-1]
    complex_members = [t for t in types if t != "null"]
    return complex_members[0] if complex_members else None


def is_nullable(avro_type: Any) -> bool:
    return isinstance(avro_type, list) and "null" in [
        t if not isinstance(t, dict) else t.get("type") for t in avro_type
    ]


def _resolve_member(avro_type: Any) -> Any:
    """For unions, pick the schema object of the most permissive member."""
    if not isinstance(avro_type, list):
        return avro_type
    target = most_permissive_avro_type(avro_type)
    for t in avro_type:
        name = t.get("type") if isinstance(t, dict) else t
        if name == target:
            return t
    return target


def avro_field_to_spark(field: dict) -> T.StructField:
    avro_type = field["type"]
    nullable = is_nullable(avro_type)
    member = _resolve_member(avro_type)
    return T.StructField(field["name"], _avro_type_to_spark(member, field), nullable)


def _avro_type_to_spark(member: Any, field: dict | None = None) -> T.DataType:
    ext = (field or {}).get("@aether_extended_type")
    if ext == "geopoint":
        return T.StructType(
            [
                T.StructField("lat", T.DoubleType(), True),
                T.StructField("lon", T.DoubleType(), True),
            ]
        )
    if isinstance(member, dict):
        logical = member.get("logicalType")
        mtype = member.get("type")
        if logical == "date":
            # coerced to ISO string downstream (processor.py:44-49)
            return T.StringType()
        if logical == "timestamp-millis":
            return T.TimestampType()
        if logical == "uuid":
            return T.StringType()
        if mtype == "record":
            return T.StructType(
                [avro_field_to_spark(f) for f in member.get("fields", [])]
            )
        if mtype == "enum":
            return T.StringType()
        if mtype == "array":
            return T.ArrayType(_avro_type_to_spark(member.get("items")), True)
        if mtype == "map":
            return T.MapType(T.StringType(), _avro_type_to_spark(member.get("values")))
        return _SPARK_BY_AVRO.get(mtype, T.StringType())
    return _SPARK_BY_AVRO.get(member, T.StringType())


def avro_schema_to_spark(schema: dict) -> T.StructType:
    assert schema.get("type") == "record", "top-level schema must be a record"
    return T.StructType([avro_field_to_spark(f) for f in schema["fields"]])


def es_index_type(field: dict) -> Any:
    """Per-field index type via the three-table sweep
    (index_handler.py:616-639): aether extended → logical → base."""
    ext = field.get("@aether_extended_type")
    if ext in AETHER_TYPES:
        return AETHER_TYPES[ext]
    member = _resolve_member(field["type"])
    if isinstance(member, dict):
        logical = member.get("logicalType")
        if logical in AVRO_LOGICAL_TYPES:
            return AVRO_LOGICAL_TYPES[logical]
        member = member.get("type")
    permissive = most_permissive_avro_type(field["type"])
    if isinstance(permissive, dict):
        permissive = permissive.get("type")
    for avro, es in AVRO_TYPES:
        if avro == (member if isinstance(member, str) else permissive):
            return es
    return "keyword"


def derive_mapping(schema: dict) -> dict[str, Any]:
    """schema → {field: index type} — the engine's 'ES mapping'."""
    return {f["name"]: es_index_type(f) for f in schema["fields"]}


def elect_time_field(schema: dict, preferred: str | None = None) -> str | None:
    """Kibana timeFieldName election (index_handler.py:676-695): preferred
    if it is a date field; else first field whose name contains 'timestamp';
    else first dateTime-typed field."""
    fields = schema["fields"]
    date_fields = [
        f["name"]
        for f in fields
        if (lambda t: t == "date" or (isinstance(t, tuple) and t[0] == "date"))(
            es_index_type(f)
        )
    ]
    if preferred and preferred in date_fields:
        return preferred
    for name in date_fields:
        if "timestamp" in name.lower():
            return name
    return date_fields[0] if date_fields else None
