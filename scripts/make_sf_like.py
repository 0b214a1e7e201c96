#!/usr/bin/env python
"""Generate a driver-testdata LOOKALIKE scale-factor directory for bench
re-runs at scales the sandbox does not ship (e.g. sf1.0).

The driver's own generator is not available in the sandbox; this script
reproduces the OBSERVED schemas, row-count scaling anchors, and value
distributions of /root/testdata/sf{0.001,0.01,0.1} (characterized in
OPTIMIZATION_r06.md) so that bench.py timings at large sf are
representative. It is NOT bit-compatible with the driver's data and must
never be used for correctness/oracle checks — timing fidelity only.

Observed anchors (rows at sf0.1, floors from sf0.001):
  documents  5,000  (= 50,000*sf, floor 500; vocab of 30 words + 5%%
             near-dup docs copying an earlier doc with ' dup' appended;
             source = src{doc_id %% 20}; lang en~41%%, 4 others ~15%%)
  events     100,000 (= 1e6*sf, floor 1,000; ts ascending over 30 days)
  lineitem   600,000 (= 6e6*sf);  orders 150,000 (= 1.5e6*sf)
  customer   15,000 (= 150k*sf);  part 20,000;  supplier 1,000
  embeddings 2,000  (= 20k*sf, floor 500; dim 64, unit-norm, 10 labels)
  nation 25 / region 5 (fixed)

Usage: python scripts/make_sf_like.py <sf> <out_dir>   (seed fixed: 42)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
ADJ = ["large", "hot", "blue", "old", "cold", "new", "red", "small"]
NOUN = ["ring", "bolt", "plate", "gear", "wheel", "pin", "rod", "cap"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]


def gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            texts.append(texts[rng.integers(0, i)] + " dup")
            continue
        ln = int(rng.integers(10, 101))
        texts.append(" ".join(rng.choice(VOCAB, size=ln)))
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(LANGS, size=n, p=LANG_P),
            "source": [f"src{i % 20}" for i in range(n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pd.DataFrame:
    start = pd.Timestamp("2024-01-01").value // 1000  # us
    span = 30 * 86400 * 1_000_000
    ts = np.sort(rng.integers(0, span, size=n)) + start
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "event_type": rng.choice(EVENT_TYPES, size=n),
            "value": np.round(rng.exponential(50.0, size=n), 2),
            "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)],
        }
    )


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_docs = max(500, int(50_000 * sf))
    n_events = max(1_000, int(1_000_000 * sf))
    n_li = max(6_000, int(6_000_000 * sf))
    n_orders = max(1_500, int(1_500_000 * sf))
    n_cust = max(150, int(150_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_supp = max(100, int(10_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    gen_documents(rng, n_docs).to_parquet(f"{out}/documents.parquet", index=False)

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pd.DataFrame(
        {
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": [v for v in vecs],
            "label": rng.integers(0, 10, size=n_emb).astype(np.int32),
        }
    ).to_parquet(f"{out}/embeddings.parquet", index=False)

    gen_events(rng, n_events, n_cust).to_parquet(f"{out}/events.parquet", index=False, coerce_timestamps="us", allow_truncated_timestamps=True)

    day = 86_400_000_000
    o_start = pd.Timestamp("1995-01-01").value // 1000
    pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, size=n_orders).astype(np.int64),
            "o_orderstatus": rng.choice(["O", "F", "P"], size=n_orders),
            "o_totalprice": np.round(rng.uniform(1000, 500_000, size=n_orders), 2),
            "o_orderdate": pd.to_datetime(
                o_start + rng.integers(0, 2404, size=n_orders) * day, unit="us"
            ),
            "o_orderpriority": rng.choice(PRIORITIES, size=n_orders),
        }
    ).to_parquet(f"{out}/orders.parquet", index=False, coerce_timestamps="us", allow_truncated_timestamps=True)

    pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_orders, size=n_li).astype(np.int64),
            "l_partkey": rng.integers(0, n_part, size=n_li).astype(np.int64),
            "l_suppkey": rng.integers(0, n_supp, size=n_li).astype(np.int64),
            "l_linenumber": rng.integers(1, 8, size=n_li).astype(np.int32),
            "l_quantity": rng.integers(1, 51, size=n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, size=n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, size=n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, size=n_li) / 100.0, 2),
            "l_returnflag": rng.choice(["N", "A", "R"], size=n_li),
            "l_linestatus": rng.choice(["O", "F"], size=n_li),
            "l_shipdate": pd.to_datetime(
                o_start + rng.integers(1, 2500, size=n_li) * day, unit="us"
            ),
        }
    ).to_parquet(f"{out}/lineitem.parquet", index=False, coerce_timestamps="us", allow_truncated_timestamps=True)

    pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, size=n_cust).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10_000, size=n_cust), 2),
            "c_mktsegment": rng.choice(SEGMENTS, size=n_cust),
        }
    ).to_parquet(f"{out}/customer.parquet", index=False)

    pk = np.arange(n_part, dtype=np.int64)
    pd.DataFrame(
        {
            "p_partkey": pk,
            "p_name": [f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in range(n_part)],
            "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
            "p_type": rng.choice(PTYPES, size=n_part),
            "p_size": rng.integers(1, 51, size=n_part).astype(np.int32),
            "p_retailprice": np.round(900 + (pk % 10_000) / 10.0, 2),
        }
    ).to_parquet(f"{out}/part.parquet", index=False)

    pd.DataFrame(
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, size=n_supp).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10_000, size=n_supp), 2),
        }
    ).to_parquet(f"{out}/supplier.parquet", index=False)

    pd.DataFrame(
        {
            "n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int32),
        }
    ).to_parquet(f"{out}/nation.parquet", index=False)

    pd.DataFrame(
        {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS}
    ).to_parquet(f"{out}/region.parquet", index=False)

    with open(f"{out}/_DONE", "w") as fh:
        fh.write("lookalike\n")
    print(f"wrote lookalike sf{sf} to {out}")


if __name__ == "__main__":
    main()
