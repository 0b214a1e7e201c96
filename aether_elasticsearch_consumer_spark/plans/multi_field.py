"""Multi-field index build — per-field postings under one index root.

The reference's mapping layer is multi-field by construction: ES mappings
are derived for EVERY schema field (get_es_types_from_schema walks all
children, /root/reference/consumer/app/index_handler.py:616-639), with the
analyzed-text vs keyword split coming from the type table
(/root/reference/consumer/app/config.py:38-50 — avro ``string`` maps to
``keyword``, aether text types to analyzed ``text``).  ES then stores one
inverted index PER FIELD, each with its own postings, document frequencies,
and length normalization — that per-field statistics isolation is what makes
``multi_match`` scoring meaningful (a term frequent in titles but rare in
bodies gets different idf per field).

Spark-first shape: each field is a standard single-field sub-index under
``<root>/fields/<name>/`` (same layout as the root: stats / doclens /
postings / term_stats, built by the SAME staged checkpoint-resumable
``IndexBuilder`` plan — nothing new to maintain), sharing the root index's
doc_id space via ``id_col="doc_id"``.  The root index IS the primary text
field.  A sub-index build is one extra pass over the (much smaller) field
text; queries against different fields prune to different sub-directories,
so a multi_match over 2 of 40 fields reads 2 small indexes, never a
monolithic postings table with a low-selectivity ``field =`` filter — at
100 TB the per-field directory split is the difference between a pruned
listing and a full-index scan.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

FIELDS_SUBDIR = "fields"


def field_index_dir(index_root: str | Path, field: str) -> Path:
    return Path(index_root) / FIELDS_SUBDIR / field


def list_field_indexes(index_root: str | Path) -> list[str]:
    """Field names with a built sub-index under ``<root>/fields/``."""
    root = Path(index_root) / FIELDS_SUBDIR
    if not root.is_dir():
        return []
    return sorted(
        p.name for p in root.iterdir() if (p / "stats").is_dir()
    )


def build_field_index(
    spark: SparkSession,
    index_root: str | Path,
    field: str,
    field_docs: DataFrame,
    docs_per_segment: int = 8192,
    term_buckets: int = 16,
    profile: str = "ascii",
    with_positions: bool = False,
    fingerprint_extra: object = None,
    force: bool = False,
) -> dict:
    """Build the sub-index for ``field`` from ``field_docs`` —
    a DataFrame with ``doc_id`` (the ROOT index's ids — statistics join on
    them at query time) and ``text`` (the field's analyzed string).

    Checkpoint-resumable exactly like the root build (same run_stage
    manifests, rooted under the sub-directory), so rebuilding a root with
    N fields re-runs nothing that already committed."""
    from .index_build import IndexBuilder

    if not field or any(c in field for c in "/\\. "):
        raise ValueError(f"bad field name {field!r}")
    sub = field_index_dir(index_root, field)
    builder = IndexBuilder(
        spark,
        str(sub),
        profile=profile,
        docs_per_segment=docs_per_segment,
        term_buckets=term_buckets,
        id_col="doc_id",
        with_positions=with_positions,
    )
    return builder.build(
        field_docs,
        fingerprint_extra={"field": field, "src": fingerprint_extra},
        force=force,
    )
