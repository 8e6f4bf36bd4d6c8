"""Differential-testing helpers.

Mirrors the reference's oracle discipline
(``/root/reference/test/comp_tests.jl`` — `all(isequal.(Array(TDF),
Array(TDB)))` after sorting): run the same semantics through our engine and
through DuckDB SQL, sort rows by all columns, canonicalize floats/NULLs,
compare cell-by-cell.
"""

from __future__ import annotations

import math

import pandas as pd


def _canon_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null",)
        if v == 0:
            return ("f", 0.0)
        return ("f", round(v, 9) if abs(v) < 1 else round(v, max(0, 9 - int(math.log10(abs(v))))))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_canon_cell(x) for x in v))
    return (type(v).__name__[0], v)


def canonical_rows(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def assert_frames_match(ours: pd.DataFrame, oracle: pd.DataFrame, context: str = ""):
    ocols, orows = canonical_rows(ours)
    dcols, drows = canonical_rows(oracle)
    assert ocols == dcols, f"{context}: column mismatch ours={ocols} oracle={dcols}"
    assert len(orows) == len(drows), f"{context}: row count ours={len(orows)} oracle={len(drows)}"
    for i, (a, b) in enumerate(zip(orows, drows)):
        assert a == b, f"{context}: row {i} differs\n ours={a}\n oracle={b}"


def assert_matches_duckdb(tf, ddb, sql: str, context: str = ""):
    ours = tf.collect()
    oracle = ddb.execute(sql).fetchdf()
    assert_frames_match(ours, oracle, context or sql[:80])
