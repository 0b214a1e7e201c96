"""Snapshot-table catalog — the engine's 'index' store (S4-S6).

Target architecture is an Iceberg catalog (BASELINE.json north_star); this
sandbox ships no Iceberg jars, so the same contract is provided by a thin
parquet snapshot catalog behind one class — swap `SnapshotTable` for
``spark.read.format('iceberg')`` + ``MERGE INTO`` on a real cluster, the
call sites don't change:

- a *table* is a directory of immutable snapshots ``snap-<n>/`` plus an
  atomically-replaced ``_CURRENT.json`` pointer → readers never see a
  half-written commit (the reference gets this from ES index swap +
  save-hash-last, index_handler.py:341-343);
- *alias* (S6, es.indices.put_alias → index_handler.py:170-171) is a named
  pointer in ``_aliases.json`` re-bound atomically — a stable query name
  over rotating physical tables;
- *upsert* (S4, artifacts.py:513-550 create→update→ignore-conflict) is
  MERGE semantics: new snapshot = target ⟕anti updates ∪ updates, key-wise
  last-write-wins, committed atomically;
- *reindex* (S5, index_handler.py:188-218) is a snapshot copy with
  doc-count parity verification.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CURRENT = "_CURRENT.json"


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str | Path):
        self.spark = spark
        self.path = Path(path)

    # -- pointers ----------------------------------------------------------
    def _pointer(self) -> dict | None:
        p = self.path / CURRENT
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def _swap_pointer(self, meta: dict) -> None:
        tmp = self.path / (CURRENT + ".tmp")
        tmp.write_text(json.dumps(meta, indent=2))
        os.replace(tmp, self.path / CURRENT)  # atomic on POSIX

    def exists(self) -> bool:
        return self._pointer() is not None

    def current_snapshot(self) -> str | None:
        ptr = self._pointer()
        return ptr["snapshot"] if ptr else None

    def snapshots(self) -> list[dict]:
        """Metadata listing (S3 analogue of Iceberg .snapshots)."""
        out = []
        for d in sorted(self.path.glob("snap-*")):
            mf = d / "_meta.json"
            if mf.exists():
                out.append(json.loads(mf.read_text()))
        return out

    # -- read --------------------------------------------------------------
    def read(self, snapshot: str | None = None) -> DataFrame:
        snap = snapshot or self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no current snapshot in {self.path}")
        return self.spark.read.parquet(str(self.path / snap / "data"))

    def count(self) -> int:
        ptr = self._pointer()
        return int(ptr["count"]) if ptr else 0

    # -- write -------------------------------------------------------------
    def commit(self, df: DataFrame, op: str = "overwrite") -> dict:
        """Write df as a new immutable snapshot and swap the pointer."""
        ptr = self._pointer()
        n = 0 if ptr is None else int(ptr["snapshot"].split("-")[1]) + 1
        snap = f"snap-{n}"
        snap_dir = self.path / snap
        df.write.mode("overwrite").parquet(str(snap_dir / "data"))
        count = self.spark.read.parquet(str(snap_dir / "data")).count()
        meta = {
            "snapshot": snap,
            "op": op,
            "count": count,
            "parent": ptr["snapshot"] if ptr else None,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        (snap_dir / "_meta.json").write_text(json.dumps(meta, indent=2))
        self._swap_pointer(meta)
        return meta

    def append(self, df: DataFrame) -> dict:
        if not self.exists():
            return self.commit(df, op="append")
        return self.commit(self.read().unionByName(df), op="append")

    def merge_upsert(self, updates: DataFrame, key: str) -> dict:
        """MERGE INTO … ON t.key=u.key WHEN MATCHED UPDATE / NOT MATCHED
        INSERT. Duplicate keys inside ``updates`` collapse to one row
        (arbitrary-deterministic: max by struct of all columns) — mirrors
        the reference's idempotent conflict handling."""
        deduped = (
            updates.groupBy(key)
            .agg(F.max(F.struct(*[c for c in updates.columns if c != key])).alias("_s"))
            .select(key, "_s.*")
            .select(*updates.columns)
        )
        if not self.exists():
            return self.commit(deduped, op="merge")
        target = self.read()
        kept = target.join(deduped.select(key), on=key, how="left_anti")
        return self.commit(kept.unionByName(deduped), op="merge")

    def delete(self) -> None:
        if self.path.exists():
            shutil.rmtree(self.path)

    def rollback(self, snapshot: str) -> None:
        mf = self.path / snapshot / "_meta.json"
        if not mf.exists():
            raise FileNotFoundError(f"no snapshot {snapshot}")
        self._swap_pointer(json.loads(mf.read_text()))

    def reindex_to(self, dest: "SnapshotTable") -> dict:
        """S5 bulk re-copy with doc-count verification
        (index_handler.py:188-218 __count_from_stats parity check)."""
        src_count = self.read().count()
        meta = dest.commit(self.read(), op="reindex")
        if meta["count"] != src_count:
            raise RuntimeError(
                f"reindex count mismatch: {src_count} → {meta['count']}"
            )
        return meta


class Catalog:
    """Namespace of tables + alias pointers (S2/S3/S6)."""

    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.spark, self.root / name)

    def list_tables(self, pattern: str = "*") -> list[str]:
        """fnmatch listing — the reference's wildcard topic subscription
        (artifacts.py:361-374, _handles_topic fnmatch at 246-250)."""
        import fnmatch

        names = sorted(
            d.name
            for d in self.root.iterdir()
            if d.is_dir() and (d / CURRENT).exists()
        )
        return [n for n in names if fnmatch.fnmatch(n, pattern)]

    # -- aliases -----------------------------------------------------------
    def _aliases_path(self) -> Path:
        return self.root / "_aliases.json"

    def aliases(self) -> dict[str, str]:
        p = self._aliases_path()
        return json.loads(p.read_text()) if p.exists() else {}

    def set_alias(self, alias: str, table_name: str) -> None:
        aliases = self.aliases()
        aliases[alias] = table_name
        tmp = self._aliases_path().with_suffix(".tmp")
        tmp.write_text(json.dumps(aliases, indent=2))
        os.replace(tmp, self._aliases_path())

    def resolve(self, name: str) -> SnapshotTable:
        return self.table(self.aliases().get(name, name))


def read_json_messages(
    spark: "SparkSession", path: str, avro_schema: dict
) -> "DataFrame":
    """Read JSON-lines messages typed by an AVRO schema — the reference's
    actual wire format (Kafka messages are Avro-described JSON;
    artifacts.py:393-401 polls them one by one). The Avro schema compiles
    to a Spark schema (functions/schema_map.avro_schema_to_spark — the
    same union/logicalType rules the mapping derivation uses), so the
    source is schema-ENFORCED: missing fields surface as NULLs, extra
    fields are dropped, and type mismatches fail loudly (FAILFAST) instead
    of silently corrupting downstream indexes."""
    from ..functions.schema_map import avro_schema_to_spark

    schema = avro_schema_to_spark(avro_schema)
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .json(path)
    )
