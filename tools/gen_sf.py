#!/usr/bin/env python
"""Deterministic synthetic data generator matching the driver testdata
schema (TESTDATA.md), for scale factors the driver does not ship (sf1+).

The driver-generated parquet at /root/testdata/sf{0.001,0.01,0.1} is
read-only and its exact RNG stream is not reproducible here, so sf1
evidence is SELF-CONSISTENT: the same generated parquet is read by both
the Spark queries and the DuckDB oracle, exactly like the driver's own
correctness harness.  Schemas, value ranges, category sets, fan-outs and
dup-rate are matched to the driver data (measured at sf0.1):

  table      sf1 rows     notes
  region     5            fixed
  nation     25           fixed
  customer   150,000      c_acctbal U(0,10000); 5 mktsegments
  supplier   10,000       s_acctbal U(0,10000)
  part       200,000      Brand#1..25; 5 types; size 1..50
  orders     1,500,000    dates 1995..2001; status O/P/F; 5 priorities
  lineitem   6,000,000    ~4 lines/order (Poisson); qty 1..50
  events     1,000,000    30 days from 2024-01-01; 5 event types
  documents  50,000       10..100 words of a 31-token vocab; 5 langs;
                          20 sources; ~2% near-dups + ~0.2% exact dups
  embeddings 20,000       64-dim unit-norm, 10 cluster labels

Usage: python tools/gen_sf.py [--sf 1] [--out testdata_sf1]
Writes one .parquet file per table.  Seed fixed (4242) — reruns are
bit-identical.  ~35 s, ~170 MB at sf1.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 4242

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
PCOLORS = ["red", "blue", "green", "small", "large", "shiny", "dim", "old"]
PNOUNS = ["widget", "bolt", "ring", "gear", "cog", "pin", "rod", "cap"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]
VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "a", "part",
    "group", "big", "sort", "query", "fast", "the", "dup",
]
VOCAB_W = np.array([1.0] * 30 + [0.03])
VOCAB_W /= VOCAB_W.sum()

DAY_US = 86_400_000_000  # microseconds per day


def _write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts_us(base: str, offsets_us: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    return pa.array(base_us + offsets_us, type=pa.timestamp("us"))


def gen(sf: float, out: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation (fixed)
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # customer
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(0, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    # supplier
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))

    # part
    ci = rng.integers(0, len(PCOLORS), n_part)
    ni = rng.integers(0, len(PNOUNS), n_part)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{PCOLORS[a]} {PNOUNS[b]}" for a, b in zip(ci, ni)],
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 5, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900 + 0.1 * np.arange(n_part) % 1200, 2),
    }))

    # orders: dates 1995-01-01 .. 2001-08-01 (~2404 days)
    odate_day = rng.integers(0, 2404, n_ord)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01", odate_day * DAY_US),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: ~Poisson(3)+1 lines per order, mean ~4 -> ~6M at sf1
    lines = rng.poisson(3.0, n_ord) + 1
    l_orderkey = np.repeat(np.arange(n_ord), lines)
    n_li = len(l_orderkey)
    l_linenumber = (np.arange(n_li) - np.repeat(np.cumsum(lines) - lines, lines) + 1)
    ship_off = rng.integers(1, 95, n_li)  # ship 1..94 days after order
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(1000, 100_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us("1995-01-01", (np.repeat(odate_day, lines) + ship_off) * DAY_US),
    }))

    # events: 30 days of microsecond-resolution timestamps, sorted
    ts_off = np.sort(rng.integers(0, 30 * DAY_US, n_evt))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": _ts_us("2024-01-01", ts_off),
        "user_id": pa.array(rng.integers(0, max(1, n_evt // 667), n_evt), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.exponential(20.0, n_evt).clip(0, 600), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]),
    }))

    # documents: 10..100 words from VOCAB; ~2% near-dups, ~0.2% exact dups
    nwords = rng.integers(10, 101, n_doc)
    vocab_arr = np.array(VOCAB)
    texts = [
        " ".join(vocab_arr[rng.choice(len(VOCAB), nw, p=VOCAB_W)])
        for nw in nwords
    ]
    n_near = n_doc // 50
    n_exact = n_doc // 500
    victims = rng.choice(n_doc // 2, n_near + n_exact, replace=False)
    targets = rng.choice(np.arange(n_doc // 2, n_doc), n_near + n_exact, replace=False)
    near_pairs, exact_pairs = [], []
    for v, t in zip(victims[:n_near], targets[:n_near]):
        words = texts[v].split()
        for _ in range(max(1, len(words) // 30)):  # perturb ~3% of tokens
            words[rng.integers(0, len(words))] = VOCAB[rng.integers(0, 30)]
        texts[t] = " ".join(words)
        near_pairs.append([int(v), int(t)])
    for v, t in zip(victims[n_near:], targets[n_near:]):
        texts[t] = texts[v]
        exact_pairs.append([int(v), int(t)])
    # Ground-truth manifest: at sf1 the all-pairs SQL oracles are
    # infeasible (50k docs -> 2.5B candidate pairs), so dedup ops are
    # instead verified against these PLANTED pairs (known-dup recall).
    import json
    with open(os.path.join(out, "_planted_dups.json"), "w") as fh:
        json.dump({"exact": exact_pairs, "near": near_pairs}, fh)
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_W)),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # embeddings: 10 unit-norm cluster centers + noise, renormalized
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.25, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype("float32")
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"testdata_sf{args.sf:g}",
    )
    print(f"generating sf={args.sf} -> {out}")
    gen(args.sf, out)


if __name__ == "__main__":
    main()
