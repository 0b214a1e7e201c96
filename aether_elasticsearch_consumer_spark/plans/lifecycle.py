"""Index lifecycle: DDL, aliasing, schema-change migration, artifacts
(S5-S7; reference index_handler.py).

The reference names indices ``{tenant}.{name}`` (index_handler.py:246-255),
derives a mapping from each message's Avro schema, and on schema change
performs a two-hop reindex migration (index → index.migrate → delete →
recreate → migrate back, index_handler.py:132-218) guarded by content-hash
artifact documents (387-435) so replays are idempotent.

Here physical tables are versioned (``name__v<k>``) and the alias swap is
atomic, so the two-hop dance collapses to: build new version → verified
reindex → alias swap → record hash. A replay with an unchanged schema hash
is a no-op; a crash between reindex and hash write re-runs the migration
idempotently (same reference idiom: artifact hash written last,
index_handler.py:341-343).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame

from ..functions.schema_map import derive_mapping
from ..sources.catalog import Catalog, SnapshotTable
from .checkpoint import content_hash

ARTIFACTS = "_aether_artifacts_v1.json"


def get_alias_from_namespace(namespace: str) -> str:
    """Strip the trailing ``_``-part (index_handler.py:660-664)."""
    parts = namespace.split("_")
    if len(parts) < 2:
        return namespace
    return "_".join(parts[:-1])


def remove_formname(name: str) -> str:
    """Drop the last ``.``-segment (index_handler.py:666-669)."""
    return ".".join(name.split(".")[:-1]) if "." in name else name


def get_formname(name: str) -> str:
    return name.split(".")[-1]


def index_name(tenant: str, name: str) -> str:
    return f"{tenant}.{name}".lower()


class IndexLifecycle:
    def __init__(self, catalog: Catalog, tenant: str):
        self.catalog = catalog
        self.tenant = tenant

    # -- artifact checkpoints (S7) ----------------------------------------
    def _artifacts_path(self) -> Path:
        return self.catalog.root / f"{self.tenant}.{ARTIFACTS}"

    def get_artifacts(self) -> dict:
        p = self._artifacts_path()
        return json.loads(p.read_text()) if p.exists() else {}

    def put_artifact(self, key: str, value: dict) -> None:
        arts = self.get_artifacts()
        arts[key] = value
        tmp = self._artifacts_path().with_suffix(".tmp")
        tmp.write_text(json.dumps(arts, indent=2))
        os.replace(tmp, self._artifacts_path())

    # -- DDL + migration (S5/S6) ------------------------------------------
    def ensure_index(
        self, name: str, schema: dict, alias: str | None = None
    ) -> SnapshotTable:
        """Create-or-migrate the index for ``schema``; returns the live
        physical table. Hash-gated: unchanged schema → no-op."""
        base = index_name(self.tenant, name)
        mapping = derive_mapping(schema)
        mapping_hash = content_hash(mapping)
        alias = alias or get_alias_from_namespace(base)
        art = self.get_artifacts().get(base)

        if art is None:
            physical = f"{base}__v0"
            table = self.catalog.table(physical)
            self.catalog.set_alias(alias, physical)
            self.catalog.set_alias(base, physical)
            self.put_artifact(
                base, {"hash": mapping_hash, "physical": physical, "version": 0}
            )
            return table

        if art["hash"] == mapping_hash:
            return self.catalog.table(art["physical"])

        # schema changed → versioned migration with verified reindex
        old = self.catalog.table(art["physical"])
        version = art["version"] + 1
        physical = f"{base}__v{version}"
        new = self.catalog.table(physical)
        if old.exists():
            old.reindex_to(new)  # doc-count parity enforced inside
        self.catalog.set_alias(alias, physical)
        self.catalog.set_alias(base, physical)
        # hash recorded LAST: a crash before this line re-runs the
        # migration idempotently on restart
        self.put_artifact(
            base, {"hash": mapping_hash, "physical": physical, "version": version}
        )
        return new

    def submit(self, name: str, docs: DataFrame, key: str = "id") -> dict:
        """S4 idempotent upsert into the live index (artifacts.py:513-550)."""
        base = index_name(self.tenant, name)
        art = self.get_artifacts().get(base)
        if art is None:
            raise RuntimeError(f"index {base} not created — call ensure_index first")
        return self.catalog.table(art["physical"]).merge_upsert(docs, key)
