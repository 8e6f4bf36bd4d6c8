"""Scale-oriented operators: time rollups with mergeable sketches
(operators/timeagg.py), observe-based metrics (plans/metrics.py),
semi-join reduction (operators/skew.py)."""

import pytest

from helpers import assert_matches_duckdb
from tidierdb_jl_spark.operators.timeagg import (
    merge_rollup,
    time_bucket_expr,
    time_rollup,
)


def test_time_bucket_widths(tables):
    ev = tables["events"]
    for width, trunc in [("1 hour", "hour"), ("1 day", "day"), ("1 minute", "minute")]:
        got = ev.mutate(b=time_bucket_expr("ts", width)).distinct("b").df.count()
        want = ev.df.selectExpr(f"date_trunc('{trunc}', ts) AS b").distinct().count()
        assert got == want, width
    with pytest.raises(ValueError, match="unsupported"):
        time_bucket_expr("ts", "3 fortnights")


def test_time_rollup_matches_duckdb(tables, ddb):
    roll = time_rollup(
        tables["events"], "ts", "1 hour", keys=["event_type"],
        n="n()", total="sum(value)",
    )
    assert_matches_duckdb(
        roll,
        ddb,
        """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
               CAST(count(*) AS BIGINT) AS n, sum(value) AS total
        FROM events GROUP BY 1, 2
        """,
    )


def test_merge_rollup_exact_measures(tables):
    """Daily-from-hourly must equal daily-from-raw for additive measures —
    the continuous-aggregate contract."""
    hourly = time_rollup(
        tables["events"], "ts", "1 hour", n="n()", total="sum(value)",
        vmax="max(value)",
    )
    daily_merged = (
        merge_rollup(hourly, "1 day", n="sum(n)", total="sum(total)",
                     vmax="max(vmax)")
        .arrange("bucket").collect()
    )
    daily_direct = (
        time_rollup(tables["events"], "ts", "1 day", n="n()",
                    total="sum(value)", vmax="max(value)")
        .arrange("bucket").collect()
    )
    assert (daily_merged["bucket"] == daily_direct["bucket"]).all()
    assert (daily_merged["n"] == daily_direct["n"]).all()
    assert (daily_merged["vmax"] == daily_direct["vmax"]).all()
    assert abs(daily_merged["total"] - daily_direct["total"]).max() < 1e-6


def test_merge_rollup_hll_sketch(tables):
    """HLL sketches stored in the fine rollup must merge to (nearly) the
    raw distinct count at the coarse granularity."""
    hourly = time_rollup(
        tables["events"], "ts", "1 hour",
        uniq_sketch="hll_sketch_agg(user_id)",
    )
    daily = (
        merge_rollup(hourly, "1 day",
                     uniq="as_integer(hll_sketch_estimate(hll_union_agg(uniq_sketch)))")
        .arrange("bucket").collect()
    )
    exact = (
        time_rollup(tables["events"], "ts", "1 day",
                    uniq="count(DISTINCT user_id)")
        .arrange("bucket").collect()
    )
    assert (daily["bucket"] == exact["bucket"]).all()
    for est, ex in zip(daily["uniq"], exact["uniq"]):
        assert abs(est - ex) <= max(2, 0.05 * ex), (est, ex)


def test_with_metrics_no_extra_pass(tables):
    from tidierdb_jl_spark.plans.metrics import collect_with_metrics

    q = tables["lineitem"].filter("l_quantity > 45")
    out, m = collect_with_metrics(
        q, "qa", n="n()", max_qty="max(l_quantity)",
        null_keys="sum(as_integer(ismissing(l_orderkey)))",
    )
    assert m["n"] == len(out)
    assert m["max_qty"] == out["l_quantity"].max()
    assert m["null_keys"] == 0


def test_semi_reduce(tables):
    from tidierdb_jl_spark.operators.skew import semi_reduce

    big = tables["lineitem"]
    small = tables["orders"].filter("o_orderpriority = '1-URGENT'")
    red = semi_reduce(big, small, "l_orderkey == o_orderkey")
    # equals the inner-join-restricted row set, without duplication
    want = (
        big.df.join(
            small.df.select("o_orderkey").distinct(),
            big.df["l_orderkey"] == small.df.select("o_orderkey").distinct()["o_orderkey"],
        ).count()
    )
    assert red.df.count() == want
    assert red.columns == big.columns
    # keys survive the reduction
    keys_in = {r[0] for r in small.df.select("o_orderkey").distinct().collect()}
    keys_out = {r[0] for r in red.df.select("l_orderkey").distinct().collect()}
    assert keys_out <= keys_in


def test_semi_reduce_plan_is_broadcast(tables):
    from tidierdb_jl_spark.operators.skew import semi_reduce
    from tidierdb_jl_spark.plans.show import show_query

    red = semi_reduce(
        tables["lineitem"], tables["orders"].head(100), "l_orderkey == o_orderkey"
    )
    plan = show_query(red)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_split_by_hash(tables, ddb):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    from tidierdb_jl_spark.llm.pipeline import split_by_hash

    q = split_by_hash(tables["documents"], "doc_id", train_frac=0.9).select(
        "doc_id", "split"
    )
    assert_matches_duckdb(q, ddb, entry.oracle_sql()["t60_hash_split"])
    out = q.collect()
    frac = (out["split"] == "train").mean()
    assert 0.8 < frac < 0.97  # ~0.9 with 500-doc noise
    # determinism across runs and independence across salts
    again = split_by_hash(tables["documents"], "doc_id", 0.9).collect()
    assert (out.sort_values("doc_id")["split"].values
            == again.sort_values("doc_id")["split"].values).all()
    other = split_by_hash(tables["documents"], "doc_id", 0.9, salt="v2").collect()
    assert (out.sort_values("doc_id")["split"].values
            != other.sort_values("doc_id")["split"].values).any()
    import pytest

    with pytest.raises(ValueError, match="train_frac"):
        split_by_hash(tables["documents"], "doc_id", 1.5)


def test_write_file_cluster_by(spark, tables):
    import os
    import tempfile

    from tidierdb_jl_spark import db_table, write_file

    d = tempfile.mkdtemp(prefix="clustered_")
    p = os.path.join(d, "li.parquet")
    write_file(tables["lineitem"], p, cluster_by="l_orderkey")
    back = db_table(spark, p)
    assert back.df.count() == tables["lineitem"].df.count()
    # each data file covers a disjoint l_orderkey range (range partitioning)
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    ranges = []
    for f in files:
        md = pq.ParquetFile(os.path.join(p, f)).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index("l_orderkey")
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, hi2)}"


def test_refresh_rollup_incremental(spark, tables):
    """Continuous-aggregate maintenance: initial build on early data, then
    an incremental refresh with the full table must converge to the
    direct full rollup — recomputing only the recent day partitions."""
    import os
    import tempfile

    from tidierdb_jl_spark.operators.timeagg import refresh_rollup, time_rollup

    d = tempfile.mkdtemp(prefix="rollup_")
    path = os.path.join(d, "hourly")
    ev = tables["events"]
    cut = ev.df.selectExpr("date_add(min(to_date(ts)), 7)").first()[0]

    early = ev.filter(f"to_date(ts) < '{cut}'")
    refresh_rollup(early, path, "ts", "1 hour", keys=["event_type"],
                   n="n()", total="sum(value)")
    n_days_initial = len([f for f in os.listdir(path) if f.startswith("bucket_day=")])

    # late + new data arrives; refresh with the full table
    refreshed = refresh_rollup(ev, path, "ts", "1 hour", keys=["event_type"],
                               n="n()", total="sum(value)")
    n_days_after = len([f for f in os.listdir(path) if f.startswith("bucket_day=")])
    assert n_days_after > n_days_initial

    want = (
        time_rollup(ev, "ts", "1 hour", keys=["event_type"],
                    n="n()", total="sum(value)")
        .arrange("bucket", "event_type").collect()
    )
    got = (
        refreshed.select("bucket", "event_type", "n", "total")
        .arrange("bucket", "event_type").collect()
    )
    assert (got["bucket"].values == want["bucket"].values).all()
    assert (got["n"].values == want["n"].values).all()
    assert abs(got["total"] - want["total"]).max() < 1e-6


def test_freq_items_and_approx_quantile(tables):
    li = tables["lineitem"]
    fi = li.freq_items("l_returnflag", support=0.2)
    items = set(fi["l_returnflag_freqItems"][0])
    assert items <= {"A", "N", "R"} and items  # all true heavy hitters
    qs = li.approx_quantile("l_quantity", [0.0, 0.5, 1.0], rel_err=0.01)
    lo, med, hi = qs
    assert lo == li.df.selectExpr("min(l_quantity)").first()[0]
    assert hi == li.df.selectExpr("max(l_quantity)").first()[0]
    assert lo <= med <= hi


def test_persist_and_checkpoint(tables):
    li = tables["lineitem"].filter("l_quantity > 40").persist()
    try:
        n1 = li.df.count()
        assert li.df.count() == n1
    finally:
        li.unpersist()
    cp = tables["nation"].checkpoint()
    assert cp.df.count() == 25
    # lineage truncated: plan no longer references the parquet scan
    assert "FileScan" not in cp.df._jdf.queryExecution().executedPlan().toString()


def test_gapfill_locf_interp_exact(spark):
    """Hand-checked gapfill semantics: grid densification, locf carrying,
    linear interpolation, NULL outside the observed range, constant fill."""
    import datetime as dt

    from tidierdb_jl_spark.core import TidyFrame
    from tidierdb_jl_spark.operators.timeagg import gapfill

    h = lambda i: dt.datetime(2025, 1, 1, i)  # noqa: E731
    df = spark.createDataFrame(
        [("a", h(0), 10.0, 1), ("a", h(3), 40.0, 2), ("b", h(1), 5.0, 3)],
        "k string, bucket timestamp, v double, n int",
    )
    out = (
        gapfill(
            TidyFrame(df.selectExpr("k", "bucket", "v AS locf", "v AS li", "n")),
            "bucket", "1 hour", keys=["k"],
            fill={"locf": "locf", "li": "interp", "n": 0},
        )
        .df.orderBy("k", "bucket")
        .collect()
    )
    rows = [(r["k"], r["bucket"].hour, r["locf"], r["li"], r["n"]) for r in out]
    assert rows == [
        ("a", 0, 10.0, 10.0, 1),
        ("a", 1, 10.0, 20.0, 0),   # interp 1/3 of the way 10→40
        ("a", 2, 10.0, 30.0, 0),
        ("a", 3, 40.0, 40.0, 2),
        ("b", 0, None, None, 0),   # before first observation: NULL
        ("b", 1, 5.0, 5.0, 3),
        ("b", 2, 5.0, None, 0),    # locf carries; interp has no right edge
        ("b", 3, 5.0, None, 0),
    ]


def test_gapfill_matches_duckdb(tables, ddb):
    """Differential: sparse hourly rollup gap-filled (locf + interp + const)
    against the same densification in DuckDB SQL."""
    from tidierdb_jl_spark.operators.timeagg import gapfill, time_rollup

    roll = time_rollup(
        tables["events"].filter("value > 95"), "ts", "1 hour",
        keys=["event_type"], total="sum(value)", n="n()",
    )
    filled = gapfill(
        roll.ungroup()
        .mutate(total_locf="total", total_interp="total")
        .select("bucket", "event_type", "n", "total_locf", "total_interp"),
        "bucket", "1 hour", keys=["event_type"],
        fill={"n": 0, "total_locf": "locf", "total_interp": "interp"},
    )
    assert_matches_duckdb(
        filled,
        ddb,
        """
        WITH roll AS (
          SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
                 sum(value) AS total, CAST(count(*) AS BIGINT) AS n
          FROM events WHERE value > 95 GROUP BY 1, 2),
        bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM roll),
        grid AS (
          SELECT k.event_type, g.bucket
          FROM (SELECT DISTINCT event_type FROM roll) k
          CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                       (SELECT hi FROM bounds), INTERVAL '1 hour')) AS bucket) g),
        j AS (SELECT grid.bucket, grid.event_type, roll.total, roll.n
              FROM grid LEFT JOIN roll USING (bucket, event_type)),
        f AS (SELECT bucket, event_type, n, total,
          last_value(total IGNORE NULLS) OVER
            (PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_locf,
          last_value(CASE WHEN total IS NOT NULL
                          THEN struct_pack(t := epoch(bucket), v := total) END
                     IGNORE NULLS) OVER
            (PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
          first_value(CASE WHEN total IS NOT NULL
                           THEN struct_pack(t := epoch(bucket), v := total) END
                      IGNORE NULLS) OVER
            (PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
          FROM j)
        SELECT bucket, event_type, coalesce(n, 0) AS n, total_locf,
          CASE WHEN total IS NOT NULL THEN total
               WHEN nxt.t = prev.t THEN prev.v
               ELSE prev.v + (nxt.v - prev.v) * (epoch(bucket) - prev.t)
                    / (nxt.t - prev.t) END AS total_interp
        FROM f
        """,
    )


def test_kll_quantile_rollup_rank_error(tables):
    """Mergeable quantiles through the rollup path: hourly KLL sketches,
    daily merge, quantile read.  KLL is randomized, so assert the
    DataSketches rank guarantee (±1.65% at k=200; we allow 5%) instead of
    exact values: the true rank of the estimated median must sit near 0.5."""
    from pyspark.sql import functions as F

    from tidierdb_jl_spark.operators.timeagg import (
        kll_measure,
        kll_merge,
        kll_quantile,
        merge_rollup,
        time_rollup,
    )

    hourly = time_rollup(
        tables["events"], "ts", "1 hour", keys=["event_type"],
        sk=kll_measure("value"),
    )
    daily = merge_rollup(
        hourly.ungroup(), "1 day", keys=["event_type"], skm=kll_merge("sk")
    )
    est = daily.ungroup().mutate(med=kll_quantile("skm", 0.5)).select(
        "bucket", "event_type", "med"
    )
    raw = tables["events"].mutate(
        bucket="timestamp_seconds(CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) * 86400)"
    )
    joined = raw.df.join(est.df, ["bucket", "event_type"])
    rank = (
        joined.groupBy("bucket", "event_type")
        .agg(
            F.avg((F.col("value") <= F.col("med")).cast("double")).alias("r"),
            F.count(F.lit(1)).alias("n"),
        )
        .toPandas()
    )
    assert len(rank) > 0
    # 5% sketch tolerance + 1/n discretization (the estimate is an actual
    # data value — with n points the closest achievable rank to 0.5 is off
    # by up to 1/n)
    tol = 0.05 + 1.0 / rank["n"]
    assert ((rank["r"] - 0.5).abs() <= tol).all(), rank[
        (rank["r"] - 0.5).abs() > tol
    ]


def test_kll_merged_equals_direct_capacity(tables):
    """Below sketch capacity nothing compacts, so a merged daily sketch and
    a direct daily sketch must agree exactly despite KLL randomness."""
    from tidierdb_jl_spark.operators.timeagg import (
        kll_measure,
        kll_merge,
        kll_quantile,
        merge_rollup,
        time_rollup,
    )

    # sf0.001/sf0.01 daily groups are far below k=4096 capacity
    hourly = time_rollup(
        tables["events"], "ts", "1 hour", keys=["event_type"],
        sk=kll_measure("value", k=4096),
    )
    daily = merge_rollup(
        hourly.ungroup(), "1 day", keys=["event_type"], skm=kll_merge("sk")
    )
    merged = (
        daily.ungroup().mutate(q="round(" + kll_quantile("skm", 0.9) + ", 6)")
        .select("bucket", "event_type", "q").collect()
        .sort_values(["bucket", "event_type"]).reset_index(drop=True)
    )
    direct = (
        time_rollup(
            tables["events"], "ts", "1 day", keys=["event_type"],
            skd=kll_measure("value", k=4096),
        )
        .ungroup().mutate(q="round(" + kll_quantile("skd", 0.9) + ", 6)")
        .select("bucket", "event_type", "q").collect()
        .sort_values(["bucket", "event_type"]).reset_index(drop=True)
    )
    assert merged.equals(direct)


def test_tpch_contract_plans_are_scale_healthy(spark):
    """Plan-quality gate over the TPC-H-shaped contract queries: no
    nested-loop joins anywhere (every join is key-based), and every
    equality/range-filtered scan keeps its pushdown.  Guards against a
    refactor silently degrading a join into a cartesian/BNLJ — the
    failure mode that is invisible at sf0.01 and fatal at 100 TB."""
    import __spark_entry__ as entry_mod
    from tidierdb_jl_spark.plans.show import plan_summary

    qs = entry_mod.queries()
    tpch = [n for n in qs if n.startswith("q") and "tpch" in n]
    assert len(tpch) >= 12
    for name in tpch:
        tf = qs[name](spark, "/root/testdata/sf0.001")
        from tidierdb_jl_spark.core import TidyFrame

        tf = TidyFrame(tf) if not hasattr(tf, "df") else tf
        summary = plan_summary(tf)
        # with_scalar attaches a 1-row broadcast via BNLJ — O(n), the right
        # plan for a scalar subquery; anything else nested-loop is a bug
        scalar_attaches = {"q76_tpch_q22": 2, "q96_tpch_q11": 2}
        assert summary["nested_loop_joins"] == scalar_attaches.get(name, 0), (
            name, summary,
        )
        from tidierdb_jl_spark.plans.show import show_query

        assert "CartesianProduct" not in show_query(tf), name


def test_refresh_rollup_week_bucket_boundary(spark, tables):
    """ADVICE r01: for widths coarser than the day partition grain, the
    recompute cutoff must floor to the BUCKET boundary or the spanning
    bucket is rewritten from a partial slice."""
    import os
    import tempfile

    from tidierdb_jl_spark.operators.timeagg import refresh_rollup, time_rollup

    d = tempfile.mkdtemp(prefix="rollup_wk_")
    path = os.path.join(d, "weekly")
    ev = tables["events"]
    # cut mid-week (10 days in) so the spanning week straddles the cutoff
    cut = ev.df.selectExpr("date_add(min(to_date(ts)), 10)").first()[0]
    early = ev.filter(f"to_date(ts) < '{cut}'")
    refresh_rollup(early, path, "ts", "1 week", keys=["event_type"],
                   n="n()", total="sum(value)")
    refreshed = refresh_rollup(ev, path, "ts", "1 week", keys=["event_type"],
                               n="n()", total="sum(value)")
    got = refreshed.df.select("bucket", "event_type", "n", "total").toPandas()
    want = (
        time_rollup(ev, "ts", "1 week", keys=["event_type"],
                    n="n()", total="sum(value)")
        .collect()
    )
    key = lambda pdf: sorted(  # noqa: E731
        map(tuple, pdf[sorted(pdf.columns)].astype(str).values)
    )
    assert key(got) == key(want)


def test_zorder_key_bounds_every_column(spark, tables, tmp_path):
    """Z-order clustering must give the SECOND column file-level locality
    a lexicographic cluster_by cannot: per-file min/max spans of
    l_partkey shrink well below full-range when files are cut along the
    Morton curve. Verified from real parquet footer statistics."""
    import glob as _glob

    import pyarrow.parquet as pq

    from tidierdb_jl_spark.operators.zorder import with_zorder_key
    from tidierdb_jl_spark.sources.writers import write_file

    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_quantity")

    def spans(path, col):
        out = []
        for f in _glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mn, mx = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics:
                        s = c.statistics
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
            if mn is not None:
                out.append(mx - mn)
        return out

    lin = str(tmp_path / "linear")
    write_file(li, f"{lin}", cluster_by=["l_orderkey", "l_partkey"], cluster_files=8)
    zo = str(tmp_path / "zorder")
    zli = with_zorder_key(li, ["l_orderkey", "l_partkey"])
    write_file(zli, f"{zo}", cluster_by="zorder_key", cluster_files=8)

    full = li.collect()
    full_span = full["l_partkey"].max() - full["l_partkey"].min()
    lin_spans, zo_spans = spans(lin, "l_partkey"), spans(zo, "l_partkey")
    assert len(zo_spans) >= 4  # enough files for skipping to mean anything
    avg = lambda xs: sum(xs) / len(xs)
    # lexicographic: later sort columns stay full-range per file;
    # z-order: each file covers a hyper-rectangle — materially tighter
    assert avg(zo_spans) < 0.8 * avg(lin_spans), (avg(zo_spans), avg(lin_spans), full_span)

    # the key must be deterministic and cover all rows
    k1 = zli.collect()["zorder_key"]
    k2 = with_zorder_key(li, ["l_orderkey", "l_partkey"]).collect()["zorder_key"]
    assert (k1 == k2).all() and k1.notna().all()


def test_diagnose_skew(spark, tables):
    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.operators.skew import diagnose_skew

    # synthetic skew: one hot key holding half the rows
    df = spark.range(0, 10000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'hot' ELSE CAST(id AS STRING) END AS k"
    )
    rep = diagnose_skew(TidyFrame(df), "k")
    assert rep.iloc[0]["k"] == "hot"
    assert rep.iloc[0]["share"] == 0.5
    assert rep.iloc[0]["suggested_salt"] > 100  # vs mean group size ~2
    # uniform key: no salting suggested
    uni = diagnose_skew(tables["orders"], "o_orderpriority")
    assert uni["suggested_salt"].max() <= 2


def test_zorder_all_null_column(spark):
    """An all-NULL listed column buckets every row to 0 instead of
    failing analysis on a 'None'-interpolated expression (ADVICE r4)."""
    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.operators.zorder import with_zorder_key

    df = spark.range(0, 8).selectExpr("id AS a", "CAST(NULL AS DOUBLE) AS b")
    out = with_zorder_key(TidyFrame(df), ["a", "b"]).collect()
    assert out["zorder_key"].notna().all()
    # with b constant (all bucket-0), the key must still order by a
    ordered = out.sort_values("a")["zorder_key"].tolist()
    assert ordered == sorted(ordered)


def test_diagnose_skew_empty_frame(spark):
    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.operators.skew import diagnose_skew

    df = spark.range(0, 100).selectExpr("CAST(id AS STRING) AS k").filter("1=0")
    rep = diagnose_skew(TidyFrame(df), "k")
    assert rep.empty
    assert list(rep.columns) == ["k", "count", "share", "suggested_salt"]


def test_new_ann_and_incremental_plans_are_scale_healthy(tables):
    """Plan guards for the r5 ops: PQ search and incremental embedding
    dedup must never plan a cartesian/nested-loop join — candidate
    generation stays equi-join/broadcast shaped, top-k gets the
    map-side WindowGroupLimit."""
    from tidierdb_jl_spark import plan_summary
    from tidierdb_jl_spark.llm.dedup import embedding_dedup_incremental
    from tidierdb_jl_spark.llm.simsearch import pq_cosine_topk

    emb = tables["embeddings"]
    pq = pq_cosine_topk(emb, emb.filter("vec_id < 5"), k=10)
    ps = plan_summary(pq)
    assert ps["nested_loop_joins"] == 0
    assert ps["window_group_limits"] > 0  # map-side top-k before shuffle
    assert "CartesianProduct" not in pq.df._jdf.queryExecution().executedPlan().toString()

    inc = embedding_dedup_incremental(
        emb.filter("vec_id >= 300"), emb.filter("vec_id < 300"), threshold=0.4
    )
    pi = plan_summary(inc)
    assert pi["nested_loop_joins"] == 0
    assert "CartesianProduct" not in inc.df._jdf.queryExecution().executedPlan().toString()


def test_r5_ops_plans_are_scale_healthy(spark, tables):
    """lint_plan gate over the round-5 surface: bloom joins, URL
    normalization, vocab/TF-IDF, cosine pairs, histogram, row index —
    no cartesian, no nested-loop joins, no row-at-a-time Python, no
    lost pushdown."""
    from tidierdb_jl_spark import TidyFrame, lint_plan, release_caches
    from tidierdb_jl_spark.llm.urls import normalize_url
    from tidierdb_jl_spark.llm.vocab import tfidf_cosine_pairs, token_frequencies
    from tidierdb_jl_spark.operators.bloom import bloom_anti_join, bloom_build
    from tidierdb_jl_spark.operators.histogram import histogram
    from tidierdb_jl_spark.operators.rowindex import with_row_index

    docs = tables["documents"]
    seen = TidyFrame(docs.df.filter("doc_id % 7 = 0").select("doc_id"))
    bf = bloom_build(seen, "cast(doc_id as string)", expected_items=100)
    plans = {
        "bloom_anti": bloom_anti_join(
            docs, seen, "cast(doc_id as string)",
            keys_key="cast(doc_id as string)", bloom=bf,
        ),
        "url_norm": normalize_url(docs.mutate(u="concat('http://x.com/', doc_id)"), "u"),
        "token_freq": token_frequencies(docs),
        "tfidf_cos": tfidf_cosine_pairs(docs, threshold=0.9),
        "histogram": histogram(tables["events"], "value", bins=8),
        "row_index": with_row_index(tables["region"], order_by="r_regionkey"),
    }
    for name, tf in plans.items():
        findings = [f for f in lint_plan(tf) if f["severity"] == "error"]
        assert findings == [], (name, findings)
        warns = [f for f in lint_plan(tf) if f["rule"] == "nested_loop"]
        assert warns == [], (name, warns)
    release_caches()


def test_r5c_ops_plans_are_scale_healthy(spark, tables):
    """lint_plan gate over the round-5c surface: BPE encoding, SemDeDup,
    snapshot diff, leakage-safe split — no cartesian/nested-loop joins,
    no row-at-a-time Python, no lost pushdown."""
    from tidierdb_jl_spark import lint_plan, release_caches
    from tidierdb_jl_spark.llm.bpe import BpeModel, bpe_encode
    from tidierdb_jl_spark.llm.dedup import ngram_jaccard_pairs, semantic_dedup
    from tidierdb_jl_spark.llm.pipeline import leakage_safe_split
    from tidierdb_jl_spark.operators.diff import snapshot_diff

    docs, emb = tables["documents"], tables["embeddings"]
    model = BpeModel(merges=[("t", "h"), ("th", "e</w>")], vocab=["t", "h", "e"])
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3,
                                block_cols=("lang",))
    plans = {
        "bpe_encode": bpe_encode(docs, model),
        "semantic_dedup": semantic_dedup(emb, "vec_id", threshold=0.4, nlist=8),
        "snapshot_diff": snapshot_diff(
            tables["orders"].filter("o_orderkey % 7 != 0"),
            tables["orders"].filter("o_orderkey % 5 != 0"),
            "o_orderkey",
        ),
        "leakage_split": leakage_safe_split(docs, pairs, "doc_id"),
    }
    for name, tf in plans.items():
        findings = [f for f in lint_plan(tf) if f["severity"] == "error"]
        assert findings == [], (name, findings)
        warns = [f for f in lint_plan(tf) if f["rule"] == "nested_loop"]
        assert warns == [], (name, warns)
    release_caches()


def test_r5e_ops_plans_are_scale_healthy(spark, tables, tmp_path):
    """lint_plan gate over the round-5e surface: classifier scoring,
    sentence split, importance sampling, FFD packing, equi-depth
    histogram counts, media ingest — no row-at-a-time Python, no lost
    pushdown, no unexpected join shapes (hard-negatives' broadcast-tiny
    BNLJ is the sanctioned scalar-attach pattern and is exercised by its
    own oracle row instead)."""
    import numpy as np

    from tidierdb_jl_spark import lint_plan, release_caches
    from tidierdb_jl_spark.llm.classifier import QualityModel, score_quality
    from tidierdb_jl_spark.llm.mixing import importance_sample
    from tidierdb_jl_spark.llm.multimodal import _encode_ppm, read_media_files
    from tidierdb_jl_spark.llm.packing import pack_documents_ffd
    from tidierdb_jl_spark.llm.textstats import split_sentences

    docs = tables["documents"]
    (tmp_path / "x.ppm").write_bytes(_encode_ppm(np.zeros((2, 2, 3))))
    model = QualityModel(weights=[0.0] * 64, bias=0.0, dim=64)
    plans = {
        "classifier_score": score_quality(docs, model),
        "sentences": split_sentences(docs),
        "importance": importance_sample(docs, "n_chars", 0.5, "doc_id"),
        "ffd": pack_documents_ffd(docs, "doc_id", 128),
        "media": read_media_files(spark, str(tmp_path), path_glob="*.ppm"),
    }
    for name, tf in plans.items():
        findings = [f for f in lint_plan(tf) if f["severity"] == "error"]
        assert findings == [], (name, findings)
    release_caches()


def test_dynamic_partition_pruning_read_side(spark, tables, tmp_path):
    """The READ-side payoff of partition_by at 100 TB: a selective join
    against a date/key-partitioned table must (a) plan a
    dynamicpruningexpression on the fact scan and (b) at runtime read
    only the surviving partitions' files — proven from the SQL status
    store's files-read metric, pruned vs unpruned."""
    from pyspark.sql import functions as F

    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.plans.metrics import run_with_scan_metrics
    from tidierdb_jl_spark.plans.show import plan_summary
    from tidierdb_jl_spark.sources.writers import write_file

    fact_path = str(tmp_path / "orders_by_year")
    write_file(tables["orders"].mutate(o_year="year(o_orderdate)"),
               fact_path, partition_by="o_year")
    dim_path = str(tmp_path / "year_dim")
    spark.createDataFrame(
        [(y, "keep" if y == 1997 else "drop") for y in range(1995, 2002)],
        "d_year int, tag string",
    ).write.parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter("tag = 'keep'")
    joined = TidyFrame(fact.join(dim, fact.o_year == dim.d_year))

    # (a) plan: DPP subquery present on the partitioned scan
    assert plan_summary(joined)["dpp_filters"] >= 1

    # (b) runtime: files read drops to the selected partition only
    n_pruned, scans = run_with_scan_metrics(joined)
    fact_scan = max((s for s in scans if s["files"]), key=lambda s: s["rows"])
    assert fact_scan["partitions"] == 1

    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try:
        unpruned = TidyFrame(fact.join(dim, fact.o_year == dim.d_year))
        assert plan_summary(unpruned)["dpp_filters"] == 0
        n_full, scans_full = run_with_scan_metrics(unpruned)
        full_scan = max((s for s in scans_full if s["files"]), key=lambda s: s["rows"])
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")

    assert n_pruned == n_full  # same answer,
    assert fact_scan["files"] < full_scan["files"]  # a fraction of the I/O
    assert full_scan["partitions"] == 7
    assert fact_scan["rows"] < full_scan["rows"]

    # static partition pruning on a literal filter prunes too (baseline)
    lit = TidyFrame(fact.filter(F.col("o_year") == 1997))
    _, lit_scans = run_with_scan_metrics(lit)
    assert max(s["partitions"] or 0 for s in lit_scans) == 1


def test_lint_flags_unbounded_following_frame(spark, tables):
    """The unbounded_following_frame lint rule: flags per-row-recomputed
    frames (O(n²) per partition), stays quiet on whole-partition frames
    (computed once) and on the fixed as-of join plan (which expresses its
    forward fill as a descending running frame precisely to avoid this)."""
    from pyspark.sql import Window, functions as F

    from tidierdb_jl_spark import TidyFrame, lint_plan

    df = spark.range(10).withColumn("k", F.col("id") % 2)
    w_bad = (
        Window.partitionBy("k").orderBy("id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_whole = (
        Window.partitionBy("k").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    bad = TidyFrame(df.withColumn("x", F.first("id").over(w_bad)))
    whole = TidyFrame(df.withColumn("x", F.max("id").over(w_whole)))
    assert "unbounded_following_frame" in {f["rule"] for f in lint_plan(bad)}
    assert "unbounded_following_frame" not in {f["rule"] for f in lint_plan(whole)}

    q12 = (
        tables["orders"].mutate(uid="o_custkey % 50")
        .select("o_orderkey", "uid", "o_orderdate")
        .asof_join(
            tables["events"].select("user_id", "ts", "value").rename(ev_value="value"),
            by=["uid == user_id", "closest(o_orderdate <= ts)"],
        )
    )
    assert "unbounded_following_frame" not in {f["rule"] for f in lint_plan(q12)}


def test_lint_flags_tokenizer_in_lambda(spark, tables):
    """The tokenizer_in_lambda lint rule: flags the per-element-retokenize
    shingle form (split(...) ends up inside the transform lambda once the
    tokenizer chain is inlined — O(words²) per row, measured 33.5s → ~1s
    at sf1 on the t96 postings build), stays quiet on the zip form
    (ngram_array_expr / _shingle_expr) and the let-binding window form
    (passages), where every retained copy references the tokenizer only
    at top level."""
    from pyspark.sql import functions as F

    from tidierdb_jl_spark import TidyFrame, lint_plan
    from tidierdb_jl_spark.llm.dedup import _shingle_expr, tokenize_expr
    from tidierdb_jl_spark.llm.passages import passage_windows

    docs = tables["documents"].df
    toks = tokenize_expr("text")
    old_form = (
        f"CASE WHEN size({toks}) < 3 THEN array(concat_ws(' ', {toks})) "
        f"ELSE array_distinct(transform(sequence(1, size({toks}) - 2), "
        f"i -> concat_ws(' ', slice({toks}, i, 3)))) END"
    )
    bad = TidyFrame(
        docs.withColumn("__sh", F.expr(old_form))
        .select("doc_id", F.explode("__sh"))
    )
    assert "tokenizer_in_lambda" in {f["rule"] for f in lint_plan(bad)}

    good = TidyFrame(
        docs.withColumn("__sh", F.expr(_shingle_expr(toks, 3)))
        .select("doc_id", F.explode("__sh"))
    )
    assert "tokenizer_in_lambda" not in {f["rule"] for f in lint_plan(good)}

    pw = passage_windows(tables["documents"], "doc_id", "text",
                         window=8, stride=2)
    assert "tokenizer_in_lambda" not in {f["rule"] for f in lint_plan(pw)}


def test_driver_prefix_plans_lint_clean(spark):
    """Full lint sweep over the driver-checked prefix (the 50 queries the
    correctness gate runs): no error-severity findings (cartesian) and no
    per-row-recomputed UNBOUNDED FOLLOWING frames in ANY of their plans.
    Warn-level nested-loop findings are allowed — the with_scalar 1-row
    broadcast attach is the intended bounded plan — but quadratic frame
    regressions anywhere in the verified surface fail here first."""
    import __spark_entry__ as entry_mod
    from tidierdb_jl_spark.core import TidyFrame
    from tidierdb_jl_spark.plans.show import lint_plan

    qs = entry_mod.queries()
    prefix = entry_mod._DRIVER_PRIORITY
    assert len(prefix) == 50
    bad = {}
    for name in prefix:
        tf = qs[name](spark, "/root/testdata/sf0.001")
        tf = TidyFrame(tf) if not hasattr(tf, "df") else tf
        findings = [
            f for f in lint_plan(tf)
            if f["severity"] == "error"
            or f["rule"] in ("unbounded_following_frame", "tokenizer_in_lambda")
        ]
        if findings:
            bad[name] = findings
    assert not bad, bad


def test_gapfill_and_mutate_weird_column_names(spark):
    """Generated SQL must backtick-quote every identifier: column names
    with spaces, dots, hyphens, backticks and unicode flow through
    mutate's flat projection and gapfill's window/fill SQL unchanged."""
    import datetime as dt

    from tidierdb_jl_spark.core import TidyFrame
    from tidierdb_jl_spark.operators.timeagg import gapfill

    h = lambda i: dt.datetime(2025, 1, 1, i)  # noqa: E731
    df = spark.createDataFrame(
        [("a", h(0), 10.0, 10.0, 1), ("a", h(2), 30.0, 30.0, 2)],
        ["the key", "time bucket", "lo cf", "in-terp.v", "naïve`n"],
    )
    out = (
        gapfill(
            TidyFrame(df),
            "time bucket", "1 hour", keys=["the key"],
            fill={"lo cf": "locf", "in-terp.v": "interp", "naïve`n": 0},
        )
        .df.orderBy("the key", "time bucket")
        .collect()
    )
    rows = [
        (r["the key"], r["time bucket"].hour, r["lo cf"], r["in-terp.v"],
         r["naïve`n"])
        for r in out
    ]
    assert rows == [
        ("a", 0, 10.0, 10.0, 1),
        ("a", 1, 10.0, 20.0, 0),
        ("a", 2, 30.0, 30.0, 2),
    ]
    # mutate fast path (flat selectExpr projection) with the same names
    m = (
        TidyFrame(df)
        .mutate(**{"doub led": "`lo cf` * 2"})
        .df.orderBy("time bucket")
        .collect()
    )
    assert [r["doub led"] for r in m] == [20.0, 60.0]
