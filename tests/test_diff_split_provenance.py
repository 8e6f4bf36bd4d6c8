"""snapshot_diff, leakage_safe_split, read_with_provenance.

snapshot_diff and the split hash-match DuckDB recomputations; provenance
matches DuckDB's read_parquet(filename, file_row_number) over the same
files.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.helpers import assert_matches_duckdb
from tidierdb_jl_spark.operators.diff import snapshot_diff


def _versions(tables):
    """Two deterministic 'snapshots' of orders: keys %7!=0 vs %5!=0, with
    the price bumped on %3==0 in the new version."""
    old = tables["orders"].filter("o_orderkey % 7 != 0").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = (
        tables["orders"]
        .filter("o_orderkey % 5 != 0")
        .mutate(
            o_totalprice="if_else(o_orderkey % 3 == 0, o_totalprice + 1.0, o_totalprice)"
        )
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )
    return old, new


def test_snapshot_diff_matches_duckdb(tables, ddb):
    old, new = _versions(tables)
    out = snapshot_diff(old, new, "o_orderkey").mutate(
        changed_cols="array_join(changed_cols, ',')"
    )
    assert_matches_duckdb(
        out,
        ddb,
        """
        WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus
                     FROM orders WHERE o_orderkey % 7 != 0),
        new AS (SELECT o_orderkey,
                       CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
                            ELSE o_totalprice END AS o_totalprice,
                       o_orderstatus
                FROM orders WHERE o_orderkey % 5 != 0)
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                         OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                         THEN 'changed'
                    ELSE 'unchanged' END AS status,
               CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN ''
                    ELSE coalesce(array_to_string(list_filter(
                      [CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                            THEN 'o_totalprice' END,
                       CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                            THEN 'o_orderstatus' END],
                      x -> x IS NOT NULL), ','), '') END AS changed_cols
        FROM old o FULL OUTER JOIN new n USING (o_orderkey)
        """,
    )


def test_snapshot_diff_statuses_and_values(tables):
    old, new = _versions(tables)
    out = snapshot_diff(old, new, "o_orderkey", include_values=True).collect()
    assert set(out["status"]) == {"added", "removed", "changed", "unchanged"}
    ch = out[out["status"] == "changed"]
    assert (ch["changed_cols"].map(lambda a: list(a) == ["o_totalprice"])).all()
    assert (ch["new_o_totalprice"] - ch["old_o_totalprice"]).round(6).eq(1.0).all()
    add = out[out["status"] == "added"]
    assert add["old_o_totalprice"].isna().all()
    # added/removed carry empty changed_cols
    assert out[out["status"] != "changed"]["changed_cols"].map(len).eq(0).all()


def test_snapshot_diff_no_compare_columns(tables):
    old, new = _versions(tables)
    out = snapshot_diff(
        old.select("o_orderkey"), new.select("o_orderkey"), "o_orderkey"
    ).collect()
    assert set(out["status"]) <= {"added", "removed", "unchanged"}


def test_snapshot_diff_missing_key_raises(tables):
    old, new = _versions(tables)
    with pytest.raises(KeyError):
        snapshot_diff(old, new, "nope")


def test_leakage_safe_split_keeps_dup_groups_together(tables, ddb):
    from tidierdb_jl_spark.llm.dedup import minhash_dedup_pairs
    from tidierdb_jl_spark.llm.pipeline import leakage_safe_split

    docs = tables["documents"]
    pairs = minhash_dedup_pairs(docs, "doc_id", threshold=0.5, verify="exact")
    out = leakage_safe_split(docs, pairs, "doc_id", train_frac=0.8).collect()
    assert len(out) == docs.df.count()
    # every duplicate pair lands on the same side
    ppdf = pairs.collect()
    side = dict(zip(out["doc_id"], out["split"]))
    cluster = dict(zip(out["doc_id"], out["cluster_id"]))
    n_pairs = 0
    for a, b in zip(ppdf["id_a"], ppdf["id_b"]):
        assert side[a] == side[b], f"pair ({a},{b}) split across sides"
        assert cluster[a] == cluster[b]
        n_pairs += 1
    assert n_pairs > 0, "synthetic corpus should contain near-dup pairs"
    # the split itself is the documented md5 rule on the cluster id
    frac = (out["split"] == "train").mean()
    assert 0.6 < frac < 0.95


def test_read_with_provenance_matches_duckdb(spark, ddb):
    from tidierdb_jl_spark.sources.readers import read_with_provenance

    path = os.path.join(SF_DIR, "nation.parquet")
    out = read_with_provenance(spark, path).select(
        "n_nationkey", "source_file", "source_row"
    )
    assert_matches_duckdb(
        out,
        ddb,
        f"""
        SELECT n_nationkey,
               regexp_extract(filename, '[^/]+$') AS source_file,
               CAST(file_row_number AS BIGINT) AS source_row
        FROM read_parquet('{path}', filename=true, file_row_number=true)
        """,
    )


def test_read_with_provenance_full_path_and_guards(spark):
    from tidierdb_jl_spark.sources.readers import read_with_provenance

    path = os.path.join(SF_DIR, "nation.parquet")
    out = read_with_provenance(spark, path, full_path=True)
    files = {r["source_file"] for r in out.df.select("source_file").distinct().collect()}
    assert len(files) == 1 and next(iter(files)).endswith("nation.parquet")

    with pytest.raises(ValueError):
        read_with_provenance(spark, 42)
    with pytest.raises(ValueError):
        read_with_provenance(spark, "some_table")
