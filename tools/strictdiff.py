"""Strict driver-gate replica: run queries() vs oracle_sql() at sf0.01 and
compare EXACT values (bit-level for floats), not the 9-sig-digit local
canonicalization — this is what the driver's value-hash effectively does.

Usage: python tools/strictdiff.py [query ...]   (default: all oracle-backed)
"""

from __future__ import annotations

import glob
import math
import os
import struct
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("STRICT_SF_DIR", "/root/testdata/sf0.01")


def canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return ("null",)
    if isinstance(v, float):
        return ("f", struct.pack("d", v))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canon(x) for x in v))
    if isinstance(v, bytes):
        return ("b", v)
    return ("v", str(type(v).__name__), v)


def rows_of(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def main() -> int:
    from tidierdb_jl_spark.session import get_spark

    spark = get_spark(app="strictdiff", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    wanted = sys.argv[1:] or [n for n in queries if n in oracles]
    n_fail = 0
    for name in wanted:
        try:
            ours = queries[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(ours)} rows)")
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ocols, orows = rows_of(ours)
        dcols, drows = rows_of(oracle)
        if ocols != dcols:
            print(f"{name}: SCHEMA ours={ocols} oracle={dcols}")
            n_fail += 1
        elif len(orows) != len(drows):
            print(f"{name}: ROWS ours={len(orows)} oracle={len(drows)}")
            n_fail += 1
        elif orows != drows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, drows)) if a != b)
            print(f"{name}: HASH row {bad} differs\n  ours={orows[bad]}\n  orac={drows[bad]}")
            n_fail += 1
        else:
            print(f"{name}: OK ({len(orows)} rows)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
