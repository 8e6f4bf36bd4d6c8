"""URL ops: differential oracle on deterministically-constructed messy
URLs (the expected canonical form is independently constructible in
DuckDB SQL), idempotence, blocklist semantics, and plan shape."""

import pytest

from tidierdb_jl_spark import TidyFrame
from tidierdb_jl_spark.llm.urls import (
    filter_url_blocklist,
    normalize_url,
    with_url_parts,
)

from helpers import assert_matches_duckdb

# four messy variants covering: case folding + www + default port + tracking
# params + fragment + param sorting; :80 + trailing slash; bare host; deep
# subdomain + lone tracking param
_MESSY = """
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN concat('HTTPS://WWW.', source, '.Example.CO.UK:443/Docs/',
                         doc_id, '/?utm_source=x&b=', doc_id % 3, '&a=1#frag')
      WHEN 1 THEN concat('http://', source, '.example.com:80/')
      WHEN 2 THEN concat('https://', source, '.example.com')
      ELSE concat('http://a.b.', source, '.example.org/x/?fbclid=', doc_id)
    END
"""

_EXPECTED = """
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN concat('https://', lower(source), '.example.co.uk/Docs/',
                         doc_id, '?a=1&b=', doc_id % 3)
      WHEN 1 THEN concat('http://', lower(source), '.example.com')
      WHEN 2 THEN concat('https://', lower(source), '.example.com')
      ELSE concat('http://a.b.', lower(source), '.example.org/x')
    END
"""


def _built(tables):
    return tables["documents"].select("doc_id", "source").mutate(u=_MESSY)


def test_normalize_and_parts_vs_duckdb(tables, ddb):
    out = (
        normalize_url(with_url_parts(_built(tables), "u"), "u", into="norm")
        .select("doc_id", "url_scheme", "url_host", "url_domain", "norm")
    )
    oracle = f"""
        SELECT doc_id,
               CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'https' WHEN 2 THEN 'https'
                    ELSE 'http' END AS url_scheme,
               CASE CAST(doc_id % 4 AS INT)
                 WHEN 0 THEN concat('www.', lower(source), '.example.co.uk')
                 WHEN 1 THEN concat(lower(source), '.example.com')
                 WHEN 2 THEN concat(lower(source), '.example.com')
                 ELSE concat('a.b.', lower(source), '.example.org')
               END AS url_host,
               CASE CAST(doc_id % 4 AS INT)
                 WHEN 0 THEN 'example.co.uk'
                 WHEN 1 THEN 'example.com'
                 WHEN 2 THEN 'example.com'
                 ELSE 'example.org'
               END AS url_domain,
               {_EXPECTED} AS norm
        FROM documents
    """
    assert_matches_duckdb(out, ddb, oracle, "url_normalize")


def test_normalize_idempotent(tables):
    once = normalize_url(_built(tables), "u", into="n1")
    twice = normalize_url(once, "n1", into="n2")
    assert twice.df.filter("n1 != n2").count() == 0


def test_blocklist_list_and_frame(tables, spark):
    built = _built(tables)
    # case 1 and 2 both land on <source>.example.com -> domain example.com
    dropped = filter_url_blocklist(built, "u", ["example.com"])
    kept_only = filter_url_blocklist(built, "u", ["example.com"], keep=True)
    total = built.df.count()
    want_blocked = built.df.filter("doc_id % 4 IN (1, 2)").count()
    assert kept_only.df.count() == want_blocked
    assert dropped.df.count() == total - want_blocked
    # DataFrame blocklist goes through a broadcast join, same result
    bl = TidyFrame(spark.sql("SELECT 'Example.COM' AS domain"))
    via_frame = filter_url_blocklist(built, "u", bl)
    assert via_frame.df.count() == total - want_blocked


def test_parts_plan_is_scan_fused(tables):
    out = normalize_url(with_url_parts(_built(tables), "u"), "u", into="norm")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_hostile_inputs_never_error(spark):
    rows = [(x,) for x in [
        "", "   ", "no scheme at all", "http://", "https:///path-only",
        "ftp://weird.example.com/file", "http://[::1]:8080/v6",
        "https://example.com/??double=q", "http://example.com/#only-frag",
        None,
    ]]
    df = TidyFrame(spark.createDataFrame(rows, "u string"))
    out = normalize_url(with_url_parts(df, "u"), "u", into="n").df.collect()
    assert len(out) == len(rows)
