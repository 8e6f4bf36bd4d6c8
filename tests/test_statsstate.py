"""Persistent corpus statistics state (llm/statsstate.py).

Beyond-reference, so correctness is differential: the exact components
replay against independent recomputation (pandas/DuckDB-style, and the
d49 driver row's SQL oracle), and the sketch is held to its PAPER
guarantees (Misra-Gries undercount bound, PODS'12 merge bound) against
exact token counts — the sketch may only ever undercount, and by no
more than N/(capacity+1).
"""

import pytest

from tidierdb_jl_spark import TidyFrame
from tidierdb_jl_spark.llm.statsstate import CorpusStatsState


def _docs(tables, lo, hi):
    return tables["documents"].filter(
        f"doc_id >= {lo} AND doc_id < {hi}"
    ).select("doc_id", "text", "lang", "source")


def _exact_token_counts(pdf):
    from collections import Counter

    c = Counter()
    for t in pdf["text"]:
        if t and t.strip():
            c.update(t.strip().lower().split())
    return c


def test_exact_components_match_recompute(spark, tables, tmp_path):
    st = CorpusStatsState.create(spark, str(tmp_path / "st"))
    st.ingest(_docs(tables, 0, 200))
    st.ingest(_docs(tables, 200, 500))
    rep = st.report().collect()
    pdf = _docs(tables, 0, 500).collect()

    got = {(r.kind, r.key): r.n for r in rep.itertuples(index=False)}
    toks = _exact_token_counts(pdf)
    assert got[("total", "docs")] == len(pdf)
    assert got[("total", "tokens")] == sum(toks.values())
    assert got[("total", "chars")] == int(pdf["text"].str.len().sum())
    for lang, n in pdf["lang"].value_counts().items():
        assert got[("lang", lang)] == n
    for src, n in pdf["source"].value_counts().items():
        assert got[("source", src)] == n
    nw = pdf["text"].str.strip().str.lower().str.split().str.len()
    for i in range(12):
        lo, hi = i * 10, (i + 1) * 10
        want = int(((nw >= lo) & ((nw < hi) | (i == 11))).sum())
        key = f"[{lo},{hi})" if i < 11 else f"[{lo},inf)"
        assert got[("hist", key)] == want, key


def test_sketch_holds_mg_guarantees(spark, tables, tmp_path):
    """Every sketch count is a true undercount by <= N/(c+1); every token
    whose true frequency clears threshold+bound appears GUARANTEED; and
    heavy_hitters' intervals contain the true count."""
    st = CorpusStatsState.create(spark, str(tmp_path / "st"),
                                 threshold_frac=0.01)
    for lo, hi in ((0, 150), (150, 300), (300, 500)):
        st.ingest(_docs(tables, lo, hi))
    truth = _exact_token_counts(_docs(tables, 0, 500).collect())
    n_total = sum(truth.values())
    assert st.stats()["n_tokens"] == n_total
    bound = st.stats()["mg_undercount_bound"]
    hh = st.heavy_hitters().collect()
    got = {r.token: r for r in hh.itertuples(index=False)}
    for tok, r in got.items():
        assert r.count_lo <= truth[tok] <= r.count_hi, tok
    import math

    need = math.ceil(0.01 * n_total)
    for tok, n in truth.items():
        if n >= need + bound:  # above the undecided band -> must be found
            assert tok in got and got[tok].guaranteed, tok
    # refuse a finer threshold than the sketch can resolve
    with pytest.raises(ValueError, match="resolution"):
        st.heavy_hitters(threshold_frac=0.0001)


def test_merge_from_equals_single_build_exact_parts(spark, tables, tmp_path):
    a = CorpusStatsState.create(spark, str(tmp_path / "a"))
    b = CorpusStatsState.create(spark, str(tmp_path / "b"))
    one = CorpusStatsState.create(spark, str(tmp_path / "one"))
    a.ingest(_docs(tables, 0, 250))
    b.ingest(_docs(tables, 250, 500))
    one.ingest(_docs(tables, 0, 500))
    a.merge_from(b)
    ra = a.report().collect().sort_values(["kind", "key"]).reset_index(drop=True)
    ro = one.report().collect().sort_values(["kind", "key"]).reset_index(drop=True)
    assert ra.equals(ro)
    # merged sketch still honors the bound against exact truth
    truth = _exact_token_counts(_docs(tables, 0, 500).collect())
    for r in a.heavy_hitters().collect().itertuples(index=False):
        assert r.count_lo <= truth[r.token] <= r.count_hi
    # geometry mismatch refuses
    g = CorpusStatsState.create(spark, str(tmp_path / "g"), hist_width=20)
    with pytest.raises(ValueError, match="geometry"):
        a.merge_from(g)


def test_reopen_empty_batch_and_file_scheme(spark, tables, tmp_path):
    st = CorpusStatsState.create(spark, "file://" + str(tmp_path / "st"))
    st.ingest(_docs(tables, 0, 100))
    before = st.stats()
    st.ingest(_docs(tables, 0, 0))  # empty batch: clean no-op
    assert st.stats() == before
    re = CorpusStatsState.open(spark, "file://" + str(tmp_path / "st"))
    assert re.stats() == before
    assert re.report().collect().equals(st.report().collect())
    with pytest.raises(ValueError, match="already exists"):
        CorpusStatsState.create(spark, "file://" + str(tmp_path / "st"))


def test_stream_ingest_exactly_once_under_crash(spark, tables, tmp_path):
    """Kill the SECOND micro-batch after its sketch write but before the
    meta commit, restart on the same checkpoint: the replayed batch is
    re-ingested once (meta never advanced), totals equal the sequential
    batch build exactly — no double count, no drop.  Then replay a batch
    whose meta DID commit (crash after meta, before the checkpoint
    commit): it must be skipped."""
    from tidierdb_jl_spark.streaming.stream import read_stream

    src = str(tmp_path / "src")
    _docs(tables, 0, 150).df.coalesce(1).write.parquet(src)
    _docs(tables, 150, 300).df.coalesce(1).write.mode("append").parquet(src)

    st = CorpusStatsState.create(spark, str(tmp_path / "st"))
    real_commit = st._commit
    calls = {"n": 0}

    def bomb(nm):
        calls["n"] += 1
        if calls["n"] == 2:  # second batch: sketch written, meta not
            raise RuntimeError("injected crash: sketch written, meta not")
        real_commit(nm)

    st._commit = bomb
    q = st.stream_ingest(
        read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1"),
        str(tmp_path / "ck"), trigger="availableNow",
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
    st._commit = real_commit
    # commit staged into a copy: the live object is still consistent
    # with disk after the failed commit (a restart could also re-open)
    assert st._meta["last_stream_batch"] == 0
    assert st._meta == CorpusStatsState.open(spark, st.path)._meta

    q2 = st.stream_ingest(
        read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1"),
        str(tmp_path / "ck"), trigger="availableNow",
    )
    q2.awaitTermination(120)

    ref = CorpusStatsState.create(spark, str(tmp_path / "ref"))
    ref.ingest(_docs(tables, 0, 150))
    ref.ingest(_docs(tables, 150, 300))
    assert st.report().collect().equals(ref.report().collect())

    # crash-after-meta shape: re-deliver batch id 1 -> skipped
    n_before = st.stats()
    st._meta["last_stream_batch"] = 5
    st.stream_ingest(
        read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1"),
        str(tmp_path / "ck2"), trigger="availableNow",
    ).awaitTermination(120)
    assert st.stats()["n_docs"] == n_before["n_docs"]  # all ids <= 5 skipped


def test_quantile_sketch_guarantee_and_merge(spark, tables, tmp_path, ddb):
    """r10 quantile sketch: (a) every estimate equals Q(exact order
    statistic) — the monotone-quantization identity, checked against an
    independent numpy recompute; (b) the one-sided band 0 <= true - est
    <= true * 2**-q_bits holds vs BOTH quantile_disc and DuckDB's
    interpolating quantile_cont (within one quantization step of the
    straddling order stats); (c) shard-built states merge to exactly the
    single-build sketch (additive contract); (d) geometry mismatch
    refuses."""
    import math

    import numpy as np

    st = CorpusStatsState.create(spark, str(tmp_path / "st"))
    for lo, hi in ((0, 200), (200, 500)):
        st.ingest(_docs(tables, lo, hi))
    got = {r["q"]: r["est"]
           for r in st.quantiles((0.25, 0.5, 0.75, 0.9, 0.99)).df.collect()}

    pdf = _docs(tables, 0, 500).collect()
    nw = np.array([len(t.strip().lower().split()) if t and t.strip() else 0
                   for t in pdf["text"]])
    nw.sort()
    bits = st._meta["q_bits"]

    def quantize(v):
        if v <= 0:
            return 0
        s = max(0, int(v).bit_length() - 1 - bits)
        return (int(v) >> s) << s

    for q, est in got.items():
        true_disc = int(nw[max(1, math.ceil(q * len(nw))) - 1])
        assert est == quantize(true_disc), (q, est, true_disc)
        assert 0 <= true_disc - est <= true_disc * 2 ** -bits + 1e-9
        # vs DuckDB quantile_cont: within the band plus one quantization
        # step of the straddling order statistics
        cont = ddb.execute(
            "SELECT quantile_cont(CASE WHEN text IS NULL OR trim(text) = '' "
            "THEN 0 ELSE len(string_split_regex(lower(trim(text)), '\\s+')) "
            f"END, {q}) FROM documents WHERE doc_id < 500"
        ).fetchone()[0]
        hi_stat = int(nw[min(len(nw) - 1, max(1, math.ceil(q * len(nw))))])
        assert est <= cont + 1e-9 <= hi_stat + 1e-9, (q, est, cont, hi_stat)
        assert cont - est <= cont * 2 ** -bits + (hi_stat - true_disc) + 1e-9

    # (c) shard merge == single build
    a = CorpusStatsState.create(spark, str(tmp_path / "a"))
    a.ingest(_docs(tables, 0, 250))
    b = CorpusStatsState.create(spark, str(tmp_path / "b"))
    b.ingest(_docs(tables, 250, 500))
    a.merge_from(b)
    assert a._meta["q_counts"] == st._meta["q_counts"]
    got_merged = {r["q"]: r["est"] for r in a.quantiles().df.collect()}
    assert got_merged == {r["q"]: r["est"] for r in st.quantiles().df.collect()}

    # (d) geometry gate
    c = CorpusStatsState.create(spark, str(tmp_path / "c"), quantile_bits=5)
    c.ingest(_docs(tables, 0, 10))
    with pytest.raises(ValueError, match="q_bits"):
        a.merge_from(c)
