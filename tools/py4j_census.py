#!/usr/bin/env python
"""Per-builder py4j round-trip census (guide §7.3 driver-chatter evidence).

Counts serialized py4j ``send_command`` round trips issued while BUILDING
each headline query (no execution), attributing each to the innermost
repo frame.  py4j memory-management commands (GC detach, ``m\\n...``) are
excluded — they fire on garbage collection and attribute to whatever
frame happens to be active, swamping the signal with ±100 noise.

Trip counts are host-load-independent (unlike build milliseconds), which
makes them the stable cross-run currency for driver-chatter work: each
trip costs ~0.5-0.7 ms on a quiet host and >5 ms under co-tenant load.

Usage: python tools/py4j_census.py   [honors SPARK_GRAFT_BENCH_QUERIES]
"""

from __future__ import annotations

import collections
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    from tidierdb_jl_spark import get_spark

    spark = get_spark(app="py4j-census", cpus="8", shuffle_partitions=8)
    qs = entry_mod.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in HEADLINE if n in qs]
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]

    import py4j.java_gateway as jg

    counter = {"n": 0}
    frames: collections.Counter = collections.Counter()
    orig = jg.GatewayClient.send_command

    def patched(self, *a, **k):
        if a and isinstance(a[0], str) and a[0].startswith("m\n"):
            return orig(self, *a, **k)  # GC detach — noise, skip
        counter["n"] += 1
        for fr in reversed(traceback.extract_stack()):
            fn = fr.filename
            if fn.startswith(REPO) and "py4j" not in fn:
                frames[f"{os.path.basename(fn)}:{fr.name}:{fr.lineno}"] += 1
                break
        return orig(self, *a, **k)

    qs[names[0]](spark, sf_dir)  # warm registry/session setup
    jg.GatewayClient.send_command = patched

    results = {}
    for name in names:
        counter["n"] = 0
        frames.clear()
        qs[name](spark, sf_dir)
        cold = (counter["n"], frames.most_common(6))
        # second build of the SAME query in the SAME session: what bench
        # reps 2..N pay (r13: session-registered UDFs make this the hot
        # path — registration amortizes, the catalog probe remains)
        counter["n"] = 0
        frames.clear()
        qs[name](spark, sf_dir)
        results[name] = (cold, (counter["n"], frames.most_common(6)))
    jg.GatewayClient.send_command = orig

    total = wtotal = 0
    for name, ((n, top), (wn, _)) in sorted(
        results.items(), key=lambda kv: -kv[1][0][0]
    ):
        total += n
        wtotal += wn
        print(f"{name}: {n} trips cold / {wn} warm")
        for loc, c in top:
            print(f"    {c:5d}  {loc}")
    print(f"TOTAL: {total} trips cold / {wtotal} warm "
          f"across {len(results)} builders")


if __name__ == "__main__":
    main()
