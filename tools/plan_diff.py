#!/usr/bin/env python
"""Diff two plan-capture dirs modulo expression IDs / plan ids / tempdirs.

Usage: python tools/plan_diff.py <dirA> <sufA> <dirB> <sufB>
(e.g. plans/r12 before /tmp/plans_new after) — prints per-query line-diff
counts and an identical/differing summary.  The r12 change-14 gate:
build-path changes must show identical=N differing=0."""
import glob
import os
import re
import sys


def norm(text: str) -> str:
    text = re.sub(r"#\d+L?", "#X", text)
    text = re.sub(r"plan_id=\d+", "plan_id=N", text)
    text = re.sub(r"\[id=#?\d+\]", "[id=N]", text)
    text = re.sub(r"/tmp/[\w./-]+", "/tmp/T", text)
    text = re.sub(r"cachedrdd_\d+", "cachedrdd_N", text)
    return text


a_dir, a_suf, b_dir, b_suf = sys.argv[1:5]
same = diff = 0
for fa in sorted(glob.glob(os.path.join(a_dir, f"*_{a_suf}.txt"))):
    q = os.path.basename(fa)[: -len(f"_{a_suf}.txt")]
    fb = os.path.join(b_dir, f"{q}_{b_suf}.txt")
    if not os.path.exists(fb):
        print(f"MISSING {q}")
        continue
    na, nb = norm(open(fa).read()), norm(open(fb).read())
    if na == nb:
        same += 1
    else:
        diff += 1
        la, lb = na.splitlines(), nb.splitlines()
        nd = sum(1 for x, y in zip(la, lb) if x != y) + abs(len(la) - len(lb))
        print(f"DIFF {q}: {nd} lines differ (a={len(la)} b={len(lb)})")
print(f"identical={same} differing={diff}")
