"""Runnable form of .claude/skills/verify/SKILL.md: drive the library
surface end-to-end (collect + plan_summary) and smoke the driver contract."""

import importlib
import sys

sys.path.insert(0, "/root/repo")

from tidierdb_jl_spark import get_spark, plan_summary, register_testdata

spark = get_spark(app="verify", cpus=8, driver_memory="8g")
t = register_testdata(spark, "/root/testdata/sf0.001")
q = (
    t["lineitem"].filter("l_shipdate <= '1998-09-02'")
    .group_by("l_returnflag", "l_linestatus")
    .summarize(sum_qty="sum(l_quantity)", n="n()")
    .arrange("l_returnflag")
)
rows = q.collect()
assert len(rows) == 6, rows
ps = plan_summary(q)
assert ps["pushed_filters"], ps
print("library surface OK:", ps)

e = importlib.import_module("__spark_entry__")
n = e.entry(spark).count()
assert n == 6, n
qs, osql = e.queries(), e.oracle_sql()
missing = sorted(set(osql) - set(qs))
assert not missing, f"oracles without queries: {missing}"

# every module-level builder function must be registered in _BUILDERS —
# an unregistered _qNN/_tNN/... is dead surface the driver never sees
import re

registered = set(e._BUILDERS.values())
unregistered = [
    name
    for name, fn in vars(e).items()
    if callable(fn) and re.fullmatch(r"_[qtdsem]\d+s?", name)
    and fn not in registered
]
assert not unregistered, f"builders defined but not registered: {unregistered}"

prefix = list(qs)[:50]
no_oracle_prefix = [k for k in prefix if k not in osql]
assert not no_oracle_prefix, f"driver-checked prefix has no-oracle rows: {no_oracle_prefix}"
print(f"driver contract OK: entry rows={n}, {len(qs)} queries, "
      f"{len(qs) - len(set(qs) & set(osql))} rows-only, "
      f"first-50 all oracle-backed, no unregistered builders")
