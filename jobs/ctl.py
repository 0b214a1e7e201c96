#!/usr/bin/env python
"""Control-plane CLI — the reference's REST resource API as a thin CLI
(/root/reference/README.md:122-205: describe / get_schema / validate /
add / get / delete / list, plus job get_status).

Usage:
  python jobs/ctl.py describe
  python jobs/ctl.py get-schema subscription
  python jobs/ctl.py validate subscription sub.json
  python jobs/ctl.py add subscription sub.json   [--store DIR] [--tenant T]
  python jobs/ctl.py get subscription mysub
  python jobs/ctl.py list subscription
  python jobs/ctl.py delete subscription mysub
  python jobs/ctl.py status --index-dir /path/to/index
  python jobs/ctl.py pause  --index-dir /path/to/index
  python jobs/ctl.py resume --index-dir /path/to/index

``pause`` is cooperative (reference README.md:168-188 pause/resume): a
running build stops at the next stage boundary; completed stages keep
their checkpoints. ``resume`` clears the flag — re-running the build
continues from the manifests.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aether_elasticsearch_consumer_spark.plans.resources import (
    ResourceStore,
    job_status,
    pause_job,
    resume_job,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=[
        "describe", "get-schema", "validate", "add", "get", "list",
        "delete", "status", "pause", "resume",
    ])
    ap.add_argument("rtype", nargs="?")
    ap.add_argument("arg", nargs="?")
    ap.add_argument("--store", default=".aether_resources")
    ap.add_argument("--tenant", default="default")
    ap.add_argument("--index-dir")
    args = ap.parse_args(argv)
    store = ResourceStore(args.store, args.tenant)

    if args.command == "describe":
        print(json.dumps(store.describe()))
    elif args.command == "get-schema":
        print(json.dumps(store.get_schema(args.rtype), indent=2))
    elif args.command == "validate":
        doc = json.loads(Path(args.arg).read_text())
        errors = store.validate(args.rtype, doc)
        print(json.dumps({"valid": not errors, "errors": errors}))
        sys.exit(1 if errors else 0)
    elif args.command == "add":
        store.add(args.rtype, json.loads(Path(args.arg).read_text()))
        print(json.dumps({"added": True}))
    elif args.command == "get":
        print(json.dumps(store.get(args.rtype, args.arg), indent=2))
    elif args.command == "list":
        print(json.dumps(store.list(args.rtype)))
    elif args.command == "delete":
        print(json.dumps({"deleted": store.delete(args.rtype, args.arg)}))
    elif args.command == "status":
        print(json.dumps(job_status(args.index_dir), indent=2))
    elif args.command == "pause":
        pause_job(args.index_dir)
        print(json.dumps({"paused": True}))
    elif args.command == "resume":
        print(json.dumps({"resumed": resume_job(args.index_dir)}))


if __name__ == "__main__":
    main()
