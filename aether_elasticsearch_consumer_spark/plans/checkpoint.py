"""Hash-gated stage checkpointing — the reference's resumability contract.

The reference guards every external artifact with a content hash stored
*after* the artifact ("in case of partial failure; on restart, it should try
again" — /root/reference/consumer/app/index_handler.py:341-343, hashes from
utils.py:24-31). Generalized here: each build stage writes its output to a
temp dir, then atomically renames and writes a manifest recording the input
fingerprint. A restarted build skips stages whose manifest matches the
current input fingerprint; a half-written stage (no manifest) is invisible
and re-runs.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable
from pathlib import Path
from typing import Any

MANIFEST = "_MANIFEST.json"


def content_hash(obj: Any) -> str:
    """md5 of canonical JSON, truncated to 16 hex chars — same contract as
    the reference's utils.get_hash (utils.py:24-31: order-insensitive)."""
    blob = json.dumps(obj, sort_keys=True, default=str).encode()
    return hashlib.md5(blob).hexdigest()[:16]


def stage_done(out_dir: str | Path, fingerprint: str) -> bool:
    mf = Path(out_dir) / MANIFEST
    if not mf.exists():
        return False
    try:
        return json.loads(mf.read_text()).get("fingerprint") == fingerprint
    except (json.JSONDecodeError, OSError):
        return False


def run_stage(
    name: str,
    out_dir: str | Path,
    fingerprint: str,
    fn: Callable[[str], dict | None],
    force: bool = False,
) -> dict:
    """Run ``fn(tmp_path)`` unless ``out_dir`` already carries a manifest for
    this fingerprint. fn writes its output under tmp_path and may return
    extra metrics for the manifest. Commit = rename(tmp → out) + manifest
    write, in that order (manifest last, per the reference idiom)."""
    out = Path(out_dir)
    tmp = out.with_name(out.name + ".__tmp__")
    if not force and stage_done(out, fingerprint):
        # a stale tmp from a killed attempt is dead weight even when the
        # stage itself is committed — sweep it on the skip path too
        if tmp.exists():
            shutil.rmtree(tmp)
        return json.loads((out / MANIFEST).read_text())
    if tmp.exists():
        shutil.rmtree(tmp)
    if out.exists():
        shutil.rmtree(out)
    tmp.mkdir(parents=True)
    t0 = time.time()
    extra = fn(str(tmp)) or {}
    lineage = _parquet_lineage(tmp)
    os.rename(tmp, out)
    manifest = {
        "stage": name,
        "fingerprint": fingerprint,
        "elapsed_sec": round(time.time() - t0, 3),
        **lineage,
        **extra,
    }
    (out / MANIFEST).write_text(json.dumps(manifest, indent=2, default=str))
    return manifest


def _parquet_lineage(stage_dir: Path) -> dict:
    """Per-partition lineage: every parquet file the stage produced with
    its row count and byte size, read from footers (no Spark job). A
    resumed or re-run stage can be audited file-by-file against this."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return {}
    files = sorted(stage_dir.rglob("*.parquet"))
    if not files:
        return {}
    parts = {}
    total_rows = 0
    for f in files:
        try:
            rows = pq.read_metadata(f).num_rows
        except Exception:
            continue
        rel = str(f.relative_to(stage_dir))
        parts[rel] = {"rows": rows, "bytes": f.stat().st_size}
        total_rows += rows
    return {
        "rows": total_rows,
        "n_files": len(parts),
        "partitions": parts,
    }
