"""Stack-safe IN-list scan filters (operators/inlist.py).

The regression these tests guard: Spark expands a pushed IN into a
left-deep OR-of-Eq chain that parquet-mr evaluates recursively — a
plain ``isin`` of ~1.5k values stack-overflows the scan task when
``spark.sql.parquet.pushdown.inFilterThreshold`` admits it (the session
caps the threshold at 512; ``isin_chunked`` restores pushdown for the
bigger verify lists the persistent-state family ships).
"""

import hashlib

from pyspark.sql import functions as F

from tidierdb_jl_spark.operators.inlist import isin_chunked


def _hash_table(spark, tmp_path, n=20000):
    p = str(tmp_path / "t")
    (
        spark.range(n)
        .withColumn("s", F.md5(F.col("id").cast("string")))
        .write.parquet(p)
    )
    return spark.read.parquet(p)


def test_isin_chunked_matches_isin(spark, tmp_path):
    df = _hash_table(spark, tmp_path, n=5000)
    vals = [hashlib.md5(str(v).encode()).hexdigest() for v in range(700)]
    a = df.where(isin_chunked("s", vals, chunk=100)).count()
    b = df.where(F.col("s").isin(vals)).count()
    assert a == b == 700
    # small lists pass through; empty list selects nothing
    assert df.where(isin_chunked("s", vals[:5])).count() == 5
    assert df.where(isin_chunked("s", [])).count() == 0


def test_isin_chunked_large_list_scans_clean_and_pushes(spark, tmp_path):
    """A 3000-value list (plain isin at threshold 4096 stack-overflowed
    the scan task): the chunked filter must evaluate AND reach parquet
    as pushed Or(In, ...) point filters."""
    df = _hash_table(spark, tmp_path)
    vals = [hashlib.md5(str(v).encode()).hexdigest() for v in range(3000)]
    q = df.where(isin_chunked("s", vals))
    assert q.count() == 3000
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re

    pushed = re.search(r"PushedFilters: \[([^\]]*)", plan)
    assert pushed and "Or(" in pushed.group(1) and "In(s" in pushed.group(1)
