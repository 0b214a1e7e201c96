"""has_child / has_parent over the F5 join payload.

Contracts (vs direct python evaluation over a hand-built parent/child
corpus): type filter, child predicate, min/max children window, null
parent pointers ignored, has_parent inverse direction, and the
existence-only fast path (min=1, no max) equals the counted path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aether_elasticsearch_consumer_spark.operators.joinquery import (
    has_child,
    has_parent,
)


@pytest.fixture(scope="module")
def family(spark):
    parents = spark.createDataFrame(
        [(1, "BUILDING"), (2, "AUTO"), (3, "BUILDING"), (4, "MACH")],
        "pid long, seg string",
    )
    kids_rows = [
        # (kid, parent, type, price)
        (10, "1", "order", 50.0),
        (11, "1", "order", 500.0),
        (12, "1", "order", 600.0),
        (13, "2", "order", 700.0),
        (14, "3", "invoice", 900.0),  # wrong type
        (15, None, "order", 999.0),   # orphan: no parent pointer
        (16, "9", "order", 800.0),    # dangling parent id
    ]
    kids = spark.createDataFrame(
        kids_rows, "kid long, parent string, typ string, price double"
    ).select(
        "kid", "price",
        F.struct(F.col("typ").alias("name"), F.col("parent").alias("parent"))
        .alias("aet_join"),
    )
    return parents, kids


def _pids(df):
    return sorted(r["pid"] for r in df.collect())


def _kids(df):
    return sorted(r["kid"] for r in df.collect())


def test_has_child_existence(family):
    parents, kids = family
    out = has_child(parents, kids, "pid", child_type="order")
    assert _pids(out) == [1, 2]  # 3 only has an invoice; 9 not a parent row


def test_has_child_predicate_and_min(family):
    parents, kids = family
    out = has_child(
        parents, kids, "pid", child_type="order",
        match=F.col("price") > 100, min_children=2,
    )
    assert _pids(out) == [1]
    out1 = has_child(
        parents, kids, "pid", child_type="order",
        match=F.col("price") > 100, min_children=1,
    )
    assert _pids(out1) == [1, 2]


def test_has_child_max_children(family):
    parents, kids = family
    out = has_child(
        parents, kids, "pid", child_type="order",
        min_children=1, max_children=1,
    )
    assert _pids(out) == [2]  # parent 1 has three orders


def test_has_child_type_none_counts_all_types(family):
    parents, kids = family
    out = has_child(parents, kids, "pid", child_type=None)
    assert _pids(out) == [1, 2, 3]


def test_has_child_validations(family):
    parents, kids = family
    with pytest.raises(ValueError):
        has_child(parents, kids, "pid", min_children=0)
    with pytest.raises(ValueError):
        has_child(parents, kids, "pid", min_children=3, max_children=2)


def test_has_parent(family):
    parents, kids = family
    out = has_parent(
        kids, parents, "pid", F.col("seg") == "BUILDING", child_type="order"
    )
    # BUILDING parents are 1 and 3; 3's only child is an invoice
    assert _kids(out) == [10, 11, 12]
    out2 = has_parent(kids, parents, "pid", F.col("seg") == "BUILDING")
    assert _kids(out2) == [10, 11, 12, 14]
