#!/usr/bin/env python
"""Print the suggested next-round ``_DRIVER_PRIORITY`` list.

The correctness driver samples the FIRST 50 entries of ``queries()`` in
registration order; ``registry._DRIVER_PRIORITY`` re-keys the dict so
never-driver-checked entries occupy that window (see CLAUDE.md).  After a
round's ``CORRECTNESS_r{N}.json`` lands, run this to get the rotation:

    python scripts/rotate_registry.py            # reads all CORRECTNESS_*.json

It prints (a) the entries that STILL lack a driver row (they stay/move
into positions 0-49, newest first is fine), (b) the python list literal to
paste into ``_DRIVER_PRIORITY``, padding the window with the
longest-unsampled green entries, and (c) the names to append to
``tests/test_registry_order.py``'s frozen driver-checked set.

Read-only: never rewrites registry.py itself.
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aether_elasticsearch_consumer_spark import registry  # noqa: E402


def main() -> None:
    last_round: dict[str, int] = {}
    rounds = sorted(glob.glob("CORRECTNESS_r*.json"))
    for f in rounds:
        n = int(Path(f).stem.split("_r")[1])
        for name in json.load(open(f)):
            last_round[name] = max(last_round.get(name, 0), n)
    names = list(registry._REGISTRY)
    virgin = [n for n in names if n not in last_round]
    # pad with the entries whose last driver row is oldest
    seasoned = sorted(
        (n for n in names if n in last_round),
        key=lambda n: (last_round[n], n),
    )
    window = (virgin + seasoned)[:50]
    rest = [n for n in names if n not in window]

    print(f"# rounds seen: {[Path(f).stem for f in rounds]}")
    print(f"# registry: {len(names)} entries; never driver-checked: "
          f"{len(virgin)}")
    print("# --- paste into registry._DRIVER_PRIORITY ---")
    print("_DRIVER_PRIORITY = [")
    for n in window:
        tag = "never sampled" if n in virgin else f"last r{last_round[n]}"
        print(f'    "{n}",  # {tag}')
    print("    # -- positions 50+ (will keep original relative order) --")
    for n in rest[: max(0, 54 - len(window))]:
        print(f'    "{n}",')
    print("]")
    checked = sorted(last_round)
    print("# --- frozen driver-checked set for tests/test_registry_order.py ---")
    print(f"# {len(checked)} names: extend _DRIVER_CHECKED_THROUGH_R4 (rename "
          "to match the latest round) with the newly green entries")


if __name__ == "__main__":
    main()
