"""Declarative resource/job configs with JSON-Schema validation (§3.3).

The reference exposes REST CRUD per resource type (describe, get_schema,
validate, add/get/delete/list — /root/reference/README.md:122-205) with
Draft-7 JSON-Schema validation (artifacts.py:45,122-127; schemas in
fixtures/schemas.py) and multi-tenant isolation. In the Spark re-design
this collapses to config files + a thin CLI (jobs/ctl.py): ``validate`` =
schema check at submit time, resources live in a per-tenant JSON store,
job status comes from stage manifests.

Resource model (the engine-relevant subset of the reference's six types):
- ``subscription``: which tables/topics to consume + topic_options
  (filter/masking — the P1/P2 contract, fixtures/schemas.py:315-345)
- ``job``: subscriptions + index options (analyzer profile, layout)

Why only 2 of the reference's 6 resource types: the other four
(``elasticsearch``, ``local_elasticsearch``, ``kibana``, ``local_kibana``
— reference fixtures/schemas.py:19-637) are CONNECTION descriptors for
external ES/Kibana servers (url, user, password). This engine replaces
those servers — the index layout and artifact store live in the catalog
itself — so a connection resource has nothing to point at. The behaviors
those resources carried (index DDL/alias, artifact hash-gating, default
index selection) exist as plans/lifecycle.py + operators/autoviz.py.

Job control: the reference's REST ``pause``/``resume`` (README.md:168-188)
maps to a cooperative flag checked between build stages — ``pause_job``
writes the flag, the builder stops at the next stage boundary (stage
checkpoints make this lossless), ``resume_job`` clears it and a re-run
continues from the manifests.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jsonschema

SUBSCRIPTION_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["id", "topic_pattern"],
    "properties": {
        "id": {"type": "string"},
        "topic_pattern": {"type": "string"},
        "topic_options": {
            "type": "object",
            "properties": {
                "masking_annotation": {"type": ["string", "null"]},
                "masking_levels": {"type": "array", "items": {"type": "string"}},
                "masking_emit_level": {"type": "string"},
                "filter_required": {"type": "boolean"},
                "filter_field_path": {"type": "string"},
                "filter_pass_values": {"type": "array"},
            },
            "additionalProperties": False,
        },
        "index_options": {
            "type": "object",
            "properties": {
                "alias_name": {"type": "string"},
                "geo_point_creation": {"type": "boolean"},
                "geo_point_name": {"type": "string"},
                "auto_timestamp": {"type": ["string", "null"]},
            },
            "additionalProperties": False,
        },
    },
    "additionalProperties": False,
}

JOB_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["id", "subscriptions"],
    "properties": {
        "id": {"type": "string"},
        "subscriptions": {"type": "array", "items": {"type": "string"}, "minItems": 1},
        "index": {
            "type": "object",
            "properties": {
                "profile": {"enum": ["ascii", "unicode"]},
                "docs_per_segment": {"type": "integer", "minimum": 128},
                "term_buckets": {"type": "integer", "minimum": 1},
            },
            "additionalProperties": False,
        },
    },
    "additionalProperties": False,
}

SCHEMAS = {"subscription": SUBSCRIPTION_SCHEMA, "job": JOB_SCHEMA}


class ResourceStore:
    """Per-tenant JSON resource store with schema-validated writes —
    the CLI analogue of the reference's REST resource endpoints."""

    def __init__(self, root: str | Path, tenant: str = "default"):
        self.root = Path(root) / tenant
        self.root.mkdir(parents=True, exist_ok=True)
        self.tenant = tenant

    @staticmethod
    def describe() -> list[str]:
        return sorted(SCHEMAS)

    @staticmethod
    def get_schema(rtype: str) -> dict:
        return SCHEMAS[rtype]

    @staticmethod
    def validate(rtype: str, doc: dict) -> list[str]:
        """Return a list of validation error messages (empty = valid)."""
        validator = jsonschema.Draft7Validator(SCHEMAS[rtype])
        return [e.message for e in validator.iter_errors(doc)]

    def _path(self, rtype: str, rid: str) -> Path:
        return self.root / rtype / f"{rid}.json"

    def add(self, rtype: str, doc: dict) -> None:
        errors = self.validate(rtype, doc)
        if errors:
            raise jsonschema.ValidationError("; ".join(errors))
        p = self._path(rtype, doc["id"])
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps(doc, indent=2))
        os.replace(tmp, p)

    def get(self, rtype: str, rid: str) -> dict:
        return json.loads(self._path(rtype, rid).read_text())

    def delete(self, rtype: str, rid: str) -> bool:
        p = self._path(rtype, rid)
        if p.exists():
            p.unlink()
            return True
        return False

    def list(self, rtype: str) -> list[str]:
        d = self.root / rtype
        return sorted(p.stem for p in d.glob("*.json")) if d.exists() else []


PAUSE_FLAG = "_PAUSED"


class JobPausedError(RuntimeError):
    """Raised by the builder when it stops at a stage boundary because the
    job was paused. The completed stages' manifests remain valid; resume =
    clear the flag and re-run build (checkpoints skip finished stages)."""


def pause_job(index_dir: str | Path) -> None:
    root = Path(index_dir)
    root.mkdir(parents=True, exist_ok=True)
    (root / PAUSE_FLAG).write_text("paused")


def resume_job(index_dir: str | Path) -> bool:
    p = Path(index_dir) / PAUSE_FLAG
    if p.exists():
        p.unlink()
        return True
    return False


def is_paused(index_dir: str | Path) -> bool:
    return (Path(index_dir) / PAUSE_FLAG).exists()


def job_status(index_dir: str | Path) -> dict:
    """Job status from stage manifests (the reference's get_status +
    artifact checkpoints, README.md:168-188 / index_handler.py:387-435)."""
    from .checkpoint import MANIFEST

    out: dict = {"index_dir": str(index_dir), "stages": {}}
    root = Path(index_dir)
    if not root.exists():
        out["state"] = "absent"
        return out
    for stage_dir in sorted(root.iterdir()):
        mf = stage_dir / MANIFEST
        if stage_dir.is_dir() and mf.exists():
            m = json.loads(mf.read_text())
            out["stages"][stage_dir.name] = {
                "fingerprint": m.get("fingerprint"),
                "elapsed_sec": m.get("elapsed_sec"),
            }
        elif stage_dir.is_dir() and stage_dir.name.endswith(".__tmp__"):
            out["stages"][stage_dir.name] = {"state": "in-progress-or-crashed"}
    done = {"docs", "doclens", "stats", "postings", "term_stats"}
    out["paused"] = is_paused(root)
    out["state"] = "complete" if done <= set(out["stages"]) else "partial"
    if out["paused"] and out["state"] != "complete":
        out["state"] = "paused"
    return out
