"""ES ``has_child`` / ``has_parent`` queries over the F5 join payload.

The reference's ingest attaches ES join-field payloads to child documents —
``doc[join_field] = {'name': es_type, 'parent': parent_id}``
(/root/reference/consumer/app/processor.py:198-208) and routes child docs by
parent id (artifacts.py:525) so parent and children co-locate on one shard.
This engine's ingest builds the same struct (operators/ingest.py
``meta_columns``) and co-partitions on it; these are the QUERY-side
consumers ES provides for that payload:

- ``has_child``: on the parent side — parents having between
  ``min_children`` and ``max_children`` children of ``child_type`` matching
  a predicate (ES defaults: min 1, max unbounded, score_mode "none" — the
  filter context implemented here).
- ``has_parent``: on the child side — children whose parent matches a
  predicate (ES default score=false, filter context).

Spark-first shape (and why it scales): the child predicate is a pushed-down
filter on the child scan; the child→parent fold is ONE ids-only hash
aggregate (map-side partial count — a mega-parent with 10^9 children
partial-aggregates before the exchange, no skew blowup); the parent attach
is a semi-join on the id set, which AQE broadcasts when the matching set is
small (the common selective case) and shuffle-joins only when genuinely
large.  Nothing replicates document payloads: only (parent_id, count)
crosses the wire.  When ingest routed children by ``join.parent`` and
parents by id into the same partitioning, the semi-join co-locates —
the Spark analogue of ES's same-shard routing requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _typed_children(
    children: DataFrame, join_col: str, child_type: str | None
) -> DataFrame:
    out = children.where(F.col(join_col)["parent"].isNotNull())
    if child_type is not None:
        out = out.where(F.col(join_col)["name"] == child_type)
    return out


def has_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    join_col: str = "aet_join",
    child_type: str | None = None,
    match: Column | None = None,
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """Parent rows having ``min_children`` ≤ #matching children ≤
    ``max_children``.  ``match`` filters the child side (pushed to the
    child scan); ``parent_key`` is the parent id column the join payload's
    string ``parent`` pointer refers to."""
    if min_children < 1:
        raise ValueError(f"min_children must be >= 1, got {min_children}")
    if max_children is not None and max_children < min_children:
        raise ValueError("max_children < min_children")
    kids = _typed_children(children, join_col, child_type)
    if match is not None:
        kids = kids.where(match)
    pid = F.col(join_col)["parent"]
    if min_children == 1 and max_children is None:
        # existence only: plain semi-join, no count aggregate
        ids = kids.select(pid.alias("__pid"))
        return parents.join(
            ids,
            parents[parent_key].cast("string") == F.col("__pid"),
            "left_semi",
        )
    counts = (
        kids.groupBy(pid.alias("__pid"))
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") >= min_children)
    )
    if max_children is not None:
        counts = counts.where(F.col("__n") <= max_children)
    return parents.join(
        counts.select("__pid"),
        parents[parent_key].cast("string") == F.col("__pid"),
        "left_semi",
    )


def has_parent(
    children: DataFrame,
    parents: DataFrame,
    parent_key: str,
    parent_match: Column,
    join_col: str = "aet_join",
    child_type: str | None = None,
) -> DataFrame:
    """Child rows whose parent passes ``parent_match`` — the inverse
    direction: filter the (usually small) parent side first, semi-join the
    children's parent pointer against the surviving id set (broadcast-sized
    in the selective case; AQE decides)."""
    ids = parents.where(parent_match).select(
        parents[parent_key].cast("string").alias("__pid")
    )
    kids = _typed_children(children, join_col, child_type)
    return kids.join(
        ids,
        F.col(join_col)["parent"] == F.col("__pid"),
        "left_semi",
    )
