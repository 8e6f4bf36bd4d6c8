#!/usr/bin/env python
"""Scaling study: run representative contract queries at sf0.001 / 0.01 /
0.1 (100x data range) and report how runtime grows with data size.

The informative number at laptop scale is the 0.01→0.1 slope (the 0.001
runs are dominated by fixed overhead — JVM, Arrow worker spin-up, plan
compile): a query whose time grows ≤10x across a 10x data step is
scale-linear or better; superlinear growth flags a plan that would not
survive 100x.  Results land in BENCH_SCALING.md.

Usage: python tools/bench_scaling.py  (~3-4 min on 32 cores)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

# One representative per plan family (scan-agg, join-heavy, window,
# inverted-index dedup, banded LSH, corpus clean, LM scoring, BPE,
# cluster split) — all scale-path ops, no quadratic oracles.
QUERIES = [
    "q01_tpch_q1",
    "q56_tpch_q5",
    "q75_tpch_q18",
    "q13_windows",
    "t52_clean_corpus",
    "d35_minhash_pairs",
    "t68_segment_dedup",
    "t86_lm_perplexity",
    "t95_bpe_roundtrip",
    "t96_leakage_split",
    "t64_strip_html",
    "t66_importance_sample",
    "t67_pack_ffd",
    "e56_equi_depth",
    "s42_hard_negatives",
]
SFS = ["0.001", "0.01", "0.1"]
RUNS = 3


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main() -> None:
    from tidierdb_jl_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app="tidierdb-scaling", cpus=cpus, shuffle_partitions=int(cpus))
    qs = entry_mod.queries()
    names = [n for n in QUERIES if n in qs]
    qs[names[0]](spark, "/root/testdata/sf0.001").count()  # warm-up

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in names:
            samples = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            results[name][sf] = round(median(samples), 3)
            print(f"# sf{sf} {name}: {results[name][sf]:.3f}s", file=sys.stderr)

    lines = [
        "# Scaling study — runtime vs data size",
        "",
        f"Median of {RUNS} end-to-end runs per cell, local[{cpus}], "
        "AQE on, shuffle partitions = cores.  `slope` is t(sf0.1)/t(sf0.01)",
        "across the 10x data step — ≤10 means linear or better (small-SF",
        "cells are fixed-overhead-dominated, so slopes well under 10 are",
        "expected for scan-bound ops; the red flag would be a slope >10).",
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | slope (0.01→0.1, 10x data) |",
        "|---|---|---|---|---|",
    ]
    for name in names:
        r = results[name]
        slope = r["0.1"] / r["0.01"] if r["0.01"] > 0 else float("nan")
        lines.append(
            f"| {name} | {r['0.001']:.3f} | {r['0.01']:.3f} | {r['0.1']:.3f} "
            f"| {slope:.2f}x |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_SCALING.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
