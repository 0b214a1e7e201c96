"""Ingest pipeline (SURVEY.md §2.2-2.3, §3.1) — the reference's per-document
``ESItemProcessor`` interpreter (processor.py:90-196) recompiled as a
one-shot Catalyst plan.

The reference builds an instruction list once per schema and replays it per
doc; here ``IngestPipeline.compile()`` turns (schema, _meta instructions,
topic options) into a list of DataFrame transforms applied via
``withColumns``/``select`` — Catalyst is the IR, whole-stage codegen is the
interpreter. Per-row Python is never involved.

Operator map (reference → here):
- P1 message filter (artifacts.py:419-431): ``filter_required`` +
  ``filter_field_path`` ∈ ``filter_pass_values`` → ``df.where(isin)``
- P2 masking (artifacts.py:432-443, SDK MaskConfig): ordered classification
  levels, emit iff level(field) ≤ emit_level → column pruning ``select``
- P3 reserved-field rename (processor.py:34-38,177-184) →
  ``withColumnsRenamed`` to ``es_reserved_<key>``
- F1 logical-date coercion (processor.py:44-49): int days-since-epoch →
  ISO 'YYYY-MM-DD' string; golden 10957 → '2000-01-01'
- F2 aet_auto_ts (processor.py:221-223): injected timestamp — stamped once
  per batch run (deterministic), not per row
- F3/F4 aet_geopoint (processor.py:210-243): lat/lon discovery by candidate
  names ('lat','latitude' / 'lon','lng','long','longitude' —
  conf/consumer/consumer.json) → struct(lat double, lon double)
- F5 aet_parent_field/aet_join_field (processor.py:198-208,165-175):
  join payload struct {name, parent} + routing by parent id
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ES_RESERVED = [
    "_uid", "_id", "_type", "_source", "_all", "_field_names",
    "_routing", "_index", "_size", "_timestamp", "_ttl", "_version",
    "_submitted_at", "_surveyor",
]

LATITUDE_FIELDS = ["lat", "latitude"]
LONGITUDE_FIELDS = ["lon", "lng", "long", "longitude"]

DEFAULT_MASK_LEVELS = ["false", "true"]
DEFAULT_EMIT_LEVEL = "false"

LOOKUP_ANNOTATION = "@aether_lookup"
LOOKUP_DEFAULT = "Other"


def lookup_fields(
    schema: dict, annotation: str = LOOKUP_ANNOTATION, prefix: str = ""
) -> dict[str, list[dict]]:
    """F11 schema walk: dotted path → [{label, value}, ...] for every field
    carrying an ``@aether_lookup`` annotation, nested records included —
    the reference's ``schema.collect_matching({'has_attr': ['__lookup']})``
    (/root/reference/consumer/app/index_handler.py:698-712)."""
    out: dict[str, list[dict]] = {}
    for f in schema.get("fields", []):
        path = f"{prefix}{f['name']}"
        pairs = f.get(annotation)
        if pairs:
            out[path] = pairs
        t = f["type"]
        members = t if isinstance(t, list) else [t]
        for m in members:
            if isinstance(m, dict) and m.get("type") == "record":
                out.update(lookup_fields(m, annotation, prefix=path + "."))
    return out


def lookup_decode_col(
    path: str, pairs: list[dict], default: str = LOOKUP_DEFAULT
) -> Column:
    """value→label decode with the reference's 'Other' fallback
    (``unknownKeyValue`` in ``_format_single_lookup``,
    index_handler.py:715-723) as a broadcast-free Catalyst map literal."""
    mapping = F.create_map(
        *[
            F.lit(x)
            for pair in pairs
            for x in (str(pair["value"]), str(pair["label"]))
        ]
    )
    return F.coalesce(
        mapping[F.col(path).cast("string")], F.lit(default)
    )


def _find_paths(schema: dict, name: str, prefix: str = "") -> list[str]:
    """All dotted paths in (possibly nested) avro schema whose leaf name
    matches ``name`` (processor.py:245-255 find_path_in_schema)."""
    out = []
    for f in schema.get("fields", []):
        path = f"{prefix}{f['name']}"
        if f["name"] == name:
            out.append(path)
        t = f["type"]
        members = t if isinstance(t, list) else [t]
        for m in members:
            if isinstance(m, dict) and m.get("type") == "record":
                out.extend(_find_paths(m, name, prefix=path + "."))
    return out


def discover_geo_fields(
    schema: dict,
    latitude_fields: list[str] = LATITUDE_FIELDS,
    longitude_fields: list[str] = LONGITUDE_FIELDS,
) -> tuple[str, str] | None:
    """First schema path matching candidate lat/lon names (processor.py:225-243)."""
    lat = lon = None
    for cand in latitude_fields:
        paths = _find_paths(schema, cand)
        if paths:
            lat = paths[0]
            break
    for cand in longitude_fields:
        paths = _find_paths(schema, cand)
        if paths:
            lon = paths[0]
            break
    if lat and lon:
        return lat, lon
    return None


def get_nested(path: str) -> Column:
    """P4 jsonpath-style dotted field get (processor.py:54-68 CachedParser)
    — Catalyst nested access, no runtime parser."""
    return F.col(path)


def replace_nested(df: DataFrame, path: str, value: Column) -> DataFrame:
    """P5 nested field replace (aether replace_nested, processor.py:70-79):
    set ``a.b.c`` to ``value`` preserving the rest of the struct, via
    chained ``withField`` — pure Column surgery, never a UDF."""
    parts = path.split(".")
    if len(parts) == 1:
        return df.withColumn(path, value)
    root = parts[0]
    inner = ".".join(parts[1:])
    return df.withColumn(root, F.col(root).withField(inner, value))


@dataclass
class IngestPipeline:
    """Compiled ingest plan for one topic/schema."""

    schema: dict
    instructions: dict[str, Any] = dc_field(default_factory=dict)  # the _meta block
    topic_options: dict[str, Any] = dc_field(default_factory=dict)
    batch_ts: str | None = None  # deterministic auto-ts stamp for this run
    type_name: str = "doc"

    # -- P1 ---------------------------------------------------------------
    def filter_predicate(self) -> Column | None:
        opts = self.topic_options
        if not opts.get("filter_required", False):
            return None
        path = opts.get("filter_field_path", "")
        values = opts.get("filter_pass_values", [])
        if not path:
            return None
        return F.col(path).isin(values)

    # -- P2 ---------------------------------------------------------------
    def masked_columns(self) -> list[str]:
        """Columns allowed through the mask. Unannotated fields always pass;
        annotated fields pass iff level index ≤ emit level index."""
        opts = self.topic_options
        annotation = opts.get("masking_annotation")  # e.g. '@aether_masking'
        if not annotation:
            return [f["name"] for f in self.schema["fields"]]
        levels = opts.get("masking_levels", DEFAULT_MASK_LEVELS)
        emit = opts.get("masking_emit_level", DEFAULT_EMIT_LEVEL)
        try:
            emit_idx = levels.index(emit)
        except ValueError:
            emit_idx = -1
        keep = []
        for f in self.schema["fields"]:
            classification = f.get(annotation)
            if classification is None or classification not in levels:
                keep.append(f["name"])
            elif levels.index(classification) <= emit_idx:
                keep.append(f["name"])
        return keep

    # -- F1 ---------------------------------------------------------------
    def date_coercions(self) -> dict[str, Column]:
        """int days-since-epoch → ISO date string, per logicalType='date'."""
        out = {}
        for f in self.schema["fields"]:
            t = f["type"]
            members = t if isinstance(t, list) else [t]
            for m in members:
                if isinstance(m, dict) and m.get("logicalType") == "date":
                    out[f["name"]] = F.date_format(
                        F.date_add(F.to_date(F.lit("1970-01-01")), F.col(f["name"])),
                        "yyyy-MM-dd",
                    )
        return out

    # -- F2/F3/F5 from _meta ----------------------------------------------
    def meta_columns(self) -> dict[str, Column]:
        out: dict[str, Column] = {}
        meta = self.instructions.get("_meta", self.instructions) or {}
        join_field = meta.get("aet_join_field")
        for key, value in meta.items():
            if key == "aet_parent_field" and join_field:
                parent_field = (
                    value.get(self.type_name) if isinstance(value, dict) else value
                )
                if parent_field:
                    out[join_field] = F.struct(
                        F.lit(self.type_name).alias("name"),
                        F.col(parent_field).cast("string").alias("parent"),
                    )
            elif key == "aet_geopoint":
                geo = discover_geo_fields(self.schema)
                if geo:
                    lat, lon = geo
                    out[value] = F.struct(
                        F.col(lat).cast("double").alias("lat"),
                        F.col(lon).cast("double").alias("lon"),
                    )
            elif key == "aet_auto_ts":
                # stamped per batch for determinism (SURVEY.md §7.3 risk 6)
                stamp = (
                    F.lit(self.batch_ts)
                    if self.batch_ts
                    else F.date_format(
                        F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
                    )
                )
                out[value] = stamp
        return out

    # -- F11 ----------------------------------------------------------------
    def lookup_decodes(self, default: str = LOOKUP_DEFAULT) -> dict[str, Column]:
        """Schema-annotation-driven decode columns: every ``@aether_lookup``
        field gains a ``<path>_decoded`` sibling (dots → underscores) with
        the 'Other' fallback. Compiled from the schema like aet_geopoint —
        no hardcoded maps."""
        return {
            path.replace(".", "_") + "_decoded": lookup_decode_col(
                path, pairs, default
            )
            for path, pairs in lookup_fields(self.schema).items()
        }

    # -- P3 ---------------------------------------------------------------
    def reserved_renames(self, columns: list[str]) -> dict[str, str]:
        return {c: f"es_reserved_{c}" for c in columns if c in ES_RESERVED}

    def routing_column(self) -> str | None:
        meta = self.instructions.get("_meta", self.instructions) or {}
        join_field = meta.get("aet_join_field")
        if join_field and meta.get("aet_parent_field"):
            return join_field
        return None

    # -- apply -------------------------------------------------------------
    def apply(self, df: DataFrame) -> DataFrame:
        pred = self.filter_predicate()
        if pred is not None:
            df = df.where(pred)
        keep = [c for c in self.masked_columns() if c in df.columns]
        df = df.select(*keep)
        coercions = {k: v for k, v in self.date_coercions().items() if k in df.columns}
        if coercions:
            df = df.withColumns(coercions)
        meta_cols = self.meta_columns()
        if meta_cols:
            df = df.withColumns(meta_cols)
        decodes = {
            path.replace(".", "_") + "_decoded": lookup_decode_col(path, pairs)
            for path, pairs in lookup_fields(self.schema).items()
            if path.split(".")[0] in df.columns  # root survived the mask
        }
        if decodes:
            df = df.withColumns(decodes)
        renames = self.reserved_renames(df.columns)
        if renames:
            df = df.withColumnsRenamed(renames)
        route = self.routing_column()
        if route and route in df.columns:
            # reference routes child docs by parent id (artifacts.py:525);
            # here: co-locate children with their parent's shuffle partition
            df = df.repartition(F.col(route)["parent"])
        return df
