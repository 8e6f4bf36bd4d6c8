"""Replicates the driver's correctness gate: every ``queries()`` entry vs
its ``oracle_sql()`` on the same parquet, order-insensitive compare."""

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

from helpers import assert_frames_match  # noqa: E402
from conftest import SF_DIR  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, ddb):
    ours = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(ours) >= 0  # rows-only check for non-SQL-expressible ops
        return
    oracle = ddb.execute(ORACLES[name]).fetchdf()
    assert_frames_match(ours, oracle, name)
