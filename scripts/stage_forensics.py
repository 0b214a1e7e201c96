#!/usr/bin/env python
"""Parse a Spark event-log directory: per-job wall + per-stage task-time
sums, grouped under job descriptions (set via setJobDescription).

Usage: python scripts/stage_forensics.py <eventlog file or dir> [min_sec]

The only reliable way to find stage bottlenecks on this noisy VM is
task-time sums from event logs, not wall clocks (CLAUDE.md measurement
gotchas)."""

from __future__ import annotations

import json
import sys
from pathlib import Path


def parse(path: Path):
    jobs = {}  # job_id -> {desc, submit, end, stages: [ids]}
    stages = {}  # stage_id -> {name, task_time, read, write, shuffle_r, shuffle_w, n_tasks}
    for f in sorted(path.iterdir()) if path.is_dir() else [path]:
        if f.name.startswith("."):
            continue
        for line in f.open(errors="replace"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev.get("Submission Time", 0),
                    "t1": 0,
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(
                    sid,
                    {"task_time": 0.0, "n": 0, "shr": 0, "shw": 0, "in": 0},
                )
                tm = ev.get("Task Metrics") or {}
                st["task_time"] += tm.get("Executor Run Time", 0) / 1000.0
                st["n"] += 1
                st["shr"] += (tm.get("Shuffle Read Metrics") or {}).get(
                    "Remote Bytes Read", 0
                ) + (tm.get("Shuffle Read Metrics") or {}).get(
                    "Local Bytes Read", 0
                )
                st["shw"] += (tm.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                st["in"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages.setdefault(si["Stage ID"], {}).update(
                    name=si.get("Stage Name", "")
                )
    return jobs, stages


def main():
    path = Path(sys.argv[1])
    min_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
    jobs, stages = parse(path)
    by_desc: dict[str, list] = {}
    for jid, j in sorted(jobs.items()):
        by_desc.setdefault(j["desc"], []).append((jid, j))
    for desc, js in by_desc.items():
        wall = sum((j["t1"] - j["t0"]) / 1000.0 for _, j in js if j["t1"])
        print(f"\n== {desc or '(unlabeled)'}: {len(js)} jobs, wall {wall:.2f}s")
        for jid, j in js:
            jw = (j["t1"] - j["t0"]) / 1000.0 if j["t1"] else 0
            if jw < min_sec:
                continue
            print(f"  job {jid}: {jw:.2f}s wall")
            for sid in j["stages"]:
                st = stages.get(sid)
                if not st or not st.get("n"):
                    continue
                print(
                    f"    stage {sid}: tasks={st['n']} task_time={st['task_time']:.1f}s "
                    f"in={st['in']/1e6:.0f}MB shr={st['shr']/1e6:.0f}MB "
                    f"shw={st['shw']/1e6:.0f}MB  {st.get('name','')[:80]}"
                )


if __name__ == "__main__":
    main()
