"""Property-based differential testing: generate random tidy pipelines
(filter → mutate → group/summarize) over lineitem and require exact
agreement with DuckDB running the equivalent SQL — the randomized
extension of the reference's TidierData-vs-TidierDB comparison scheme."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from tests.helpers import assert_matches_duckdb

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]
# (l_orderkey, l_linenumber) is NOT unique in the synthetic data; a ROWS
# frame needs a total order or the result is nondeterministic
ORDER_COLS = [
    "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice",
]
AGGS = [("sum", "sum"), ("mean", "avg"), ("min", "min"), ("max", "max")]


@st.composite
def arith_expr(draw):
    """A (tidy, sql) pair for a numeric expression — same text in both
    dialects by construction."""
    a = draw(st.sampled_from(NUM_COLS))
    b = draw(st.sampled_from(NUM_COLS))
    op = draw(st.sampled_from(["+", "-", "*"]))
    k = draw(st.integers(min_value=1, max_value=9))
    e = f"({a} {op} {b}) * {k}"
    return e, e


@st.composite
def predicate(draw):
    col = draw(st.sampled_from(NUM_COLS + INT_COLS))
    op = draw(st.sampled_from([">", "<", ">=", "<=", "=", "!="]))
    v = draw(st.integers(min_value=0, max_value=50))
    p = f"{col} {op} {v}"
    return p, p


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_pipeline_matches_duckdb(tables, ddb, data):
    (expr_t, expr_s) = data.draw(arith_expr())
    (pred_t, pred_s) = data.draw(predicate())
    group = data.draw(st.sampled_from(STR_COLS))
    agg_t, agg_s = data.draw(st.sampled_from(AGGS))

    q = (
        tables["lineitem"]
        .filter(pred_t)
        .mutate(x=expr_t)
        .group_by(group)
        .summarize(v=f"{agg_t}(x)", n="n()")
    )
    sql = f"""
        SELECT {group}, {agg_s}(x) AS v, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT *, {expr_s} AS x FROM lineitem WHERE {pred_s})
        GROUP BY {group}
    """
    assert_matches_duckdb(q, ddb, sql, f"pipeline: {pred_s} | {expr_s} | {agg_s}")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_window_matches_duckdb(tables, ddb, data):
    val = data.draw(st.sampled_from(NUM_COLS))
    part = data.draw(st.sampled_from(STR_COLS))
    lo = data.draw(st.integers(min_value=-5, max_value=0))
    agg_t, agg_s = data.draw(st.sampled_from(AGGS))

    order = ", ".join(ORDER_COLS)
    q = (
        tables["lineitem"]
        .group_by(part)
        .window_order(*ORDER_COLS)
        .window_frame(lo, 0)
        .mutate(w=f"{agg_t}({val})")
        .select("l_orderkey", "l_linenumber", "w")
    )
    sql = f"""
        SELECT l_orderkey, l_linenumber,
               {agg_s}({val}) OVER (PARTITION BY {part}
                 ORDER BY {order}
                 ROWS BETWEEN {-lo} PRECEDING AND CURRENT ROW) AS w
        FROM lineitem
    """
    assert_matches_duckdb(q, ddb, sql, f"window: {agg_s}({val}) part {part} lo {lo}")


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_string_literal_detect_matches_duckdb(tables, ddb, data):
    """str_detect with arbitrary literal patterns — including quotes and
    LIKE wildcards — must agree with DuckDB's LIKE '%pat%' semantics
    (the pattern interpolates literally; '' escapes an apostrophe on both
    sides).  Hardens the r03 quoting fix beyond hand-picked cases."""
    alphabet = "abN7 _%'.#"
    pat = data.draw(
        st.text(alphabet=alphabet, min_size=1, max_size=6).filter(
            lambda s: not s.isspace()
        )
    )
    tidy_lit = pat.replace("'", "''")
    q = tables["customer"].mutate(
        hit=f"str_detect(c_name, '{tidy_lit}')"
    ).select("c_custkey", "hit")
    sql_lit = pat.replace("'", "''")
    assert_matches_duckdb(
        q,
        ddb,
        f"SELECT c_custkey, c_name LIKE '%{sql_lit}%' AS hit FROM customer",
        f"detect[{pat!r}]",
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_case_when_matches_duckdb(tables, ddb, data):
    """Randomized conditional buckets: case_when with 2 random numeric
    cut points + if_else on a random predicate must agree with DuckDB's
    CASE WHEN on every row."""
    col = data.draw(st.sampled_from(NUM_COLS))
    c1 = data.draw(st.integers(min_value=1, max_value=25))
    c2 = c1 + data.draw(st.integers(min_value=1, max_value=25))
    pcol = data.draw(st.sampled_from(INT_COLS))
    pv = data.draw(st.integers(min_value=0, max_value=100))

    q = (
        tables["lineitem"]
        .mutate(
            bucket=f"case_when({col} < {c1}, 'lo', {col} < {c2}, 'mid', 'hi')",
            flag=f"if_else({pcol} % 7 > {pv % 7}, 1, 0)",
        )
        .select("l_orderkey", "l_linenumber", "l_partkey", "bucket", "flag")
    )
    sql = f"""
        SELECT l_orderkey, l_linenumber, l_partkey,
               CASE WHEN {col} < {c1} THEN 'lo'
                    WHEN {col} < {c2} THEN 'mid' ELSE 'hi' END AS bucket,
               CASE WHEN {pcol} % 7 > {pv % 7} THEN 1 ELSE 0 END AS flag
        FROM lineitem
    """
    assert_matches_duckdb(q, ddb, sql, f"case_when[{col} {c1}/{c2}; {pcol}%7>{pv%7}]")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_date_arithmetic_matches_duckdb(tables, ddb, data):
    """Random date truncation grain + interval offset over l_shipdate
    must agree with DuckDB (both engines speak ANSI date_trunc /
    INTERVAL)."""
    grain = data.draw(st.sampled_from(["year", "quarter", "month", "week"]))
    n = data.draw(st.integers(min_value=1, max_value=24))
    unit = data.draw(st.sampled_from(["DAY", "MONTH"]))

    # compare as ISO strings: pandas renders DuckDB DATEs as midnight
    # timestamps, so a raw DATE column false-mismatches on type
    q = (
        tables["lineitem"]
        .mutate(
            g=f"CAST(CAST(date_trunc('{grain}', l_shipdate) AS DATE) AS STRING)",
            shifted=f"CAST(CAST(l_shipdate + INTERVAL {n} {unit} AS DATE) AS STRING)",
        )
        .group_by("g")
        .summarize(n_rows="n()", max_shift="max(shifted)")
    )
    sql = f"""
        SELECT CAST(CAST(date_trunc('{grain}', l_shipdate) AS DATE) AS VARCHAR) AS g,
               CAST(count(*) AS BIGINT) AS n_rows,
               max(CAST(CAST(l_shipdate + INTERVAL {n} {unit} AS DATE) AS VARCHAR)) AS max_shift
        FROM lineitem GROUP BY 1
    """
    assert_matches_duckdb(q, ddb, sql, f"date[{grain} +{n} {unit}]")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_histogram_matches_duckdb(tables, ddb, data):
    """Random bin counts and optional winsorizing bounds: the histogram's
    double-arithmetic bucket contract must agree with DuckDB exactly."""
    from tidierdb_jl_spark.operators.histogram import histogram

    bins = data.draw(st.integers(min_value=1, max_value=40))
    col = data.draw(st.sampled_from(["value", "user_id", "event_id"]))
    explicit = data.draw(st.booleans())
    lo, hi = (None, None)
    if explicit:
        lo = float(data.draw(st.integers(min_value=-5, max_value=3)))
        hi = lo + float(data.draw(st.integers(min_value=1, max_value=10)))
    h = histogram(tables["events"], col, bins=bins, lo=lo, hi=hi)
    if not explicit:
        bounds = f"(SELECT min(CAST({col} AS DOUBLE)) AS lo, max(CAST({col} AS DOUBLE)) AS hi FROM events)"
    else:
        bounds = f"(SELECT CAST({lo} AS DOUBLE) AS lo, CAST({hi} AS DOUBLE) AS hi)"
    oracle = f"""
        WITH b AS {bounds},
        assigned AS (
          SELECT CASE WHEN v >= hi THEN {bins} - 1
                      WHEN v <= lo THEN 0
                      ELSE CAST(floor((v - lo) / (hi - lo) * {bins}) AS INT) END AS bucket
          FROM (SELECT CAST({col} AS DOUBLE) AS v FROM events
                WHERE {col} IS NOT NULL) CROSS JOIN b),
        counts AS (SELECT bucket, count(*) AS n FROM assigned GROUP BY bucket),
        grid AS (SELECT CAST(g AS INT) AS bucket,
                        lo + g * ((hi - lo) / {bins}) AS lo_edge,
                        lo + (g + 1) * ((hi - lo) / {bins}) AS hi_edge
                 FROM generate_series(0, {bins} - 1) AS t(g) CROSS JOIN b)
        SELECT grid.bucket, lo_edge, hi_edge, COALESCE(counts.n, 0) AS n
        FROM grid LEFT JOIN counts USING (bucket)
    """
    assert_matches_duckdb(h, ddb, oracle, f"hist:{col}:{bins}:{lo}:{hi}")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_bloom_never_false_negative(tables, data):
    """Random key expressions, sizings, and member subsets: a bloom probe
    must NEVER miss a member, and the exact anti-join recovery must equal
    the plain anti-join regardless of FPR (even a deliberately tiny,
    FP-heavy filter)."""
    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.operators.bloom import bloom_anti_join, bloom_build, bloom_mark

    mod = data.draw(st.integers(min_value=2, max_value=13))
    key = data.draw(st.sampled_from(
        ["cast(doc_id as string)", "concat(lang, '-', doc_id)", "cast(doc_id % 100 as string)"]
    ))
    num_bits = data.draw(st.sampled_from([128, 1024, 4096]))
    k = data.draw(st.integers(min_value=1, max_value=8))
    docs = tables["documents"]
    seen = TidyFrame(docs.df.filter(f"doc_id % {mod} = 0").selectExpr(f"{key} AS k"))
    bf = bloom_build(seen, "k", num_bits=num_bits, num_hashes=k)
    marked = bloom_mark(docs, key, bf)
    assert marked.df.filter(f"doc_id % {mod} = 0 AND NOT bloom_hit").count() == 0
    aj = bloom_anti_join(docs, seen, key, keys_key="k", bloom=bf)
    want = (
        docs.df.selectExpr("doc_id", f"{key} AS __k")
        .join(seen.df.withColumnRenamed("k", "__k").distinct(), "__k", "left_anti")
        .count()
    )
    assert aj.df.count() == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_corpus_bigram_lm_matches_reference(spark, data):
    """Random tiny corpora through train_ngram_lm + score_perplexity must
    agree with a from-scratch Python bigram LM (counts exact, per-doc
    cross-entropy to 1e-9)."""
    import math

    from tidierdb_jl_spark.core import TidyFrame
    from tidierdb_jl_spark.llm.lm import _BOS, score_perplexity, train_ngram_lm

    ngram = data.draw(st.sampled_from([2, 3]))
    docs = data.draw(st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), max_size=10),
        min_size=1, max_size=6,
    ))
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    tf = TidyFrame(spark.createDataFrame(rows, "doc_id INT, text STRING"))

    model, meta = train_ngram_lm(tf, n=ngram)

    def doc_pairs(text):
        toks = [w for w in text.split() if w]
        if not toks:
            return []
        padded = [_BOS] * (ngram - 1) + toks
        return [(" ".join(padded[i:i + ngram - 1]), padded[i + ngram - 1])
                for i in range(len(padded) - ngram + 1)]

    pairs = [p for _, text in rows for p in doc_pairs(text)]
    from collections import Counter
    pc, cc = Counter(pairs), Counter(c for c, _ in pairs)
    vocab = {w for _, w in pairs}
    got_model = {(r["c"], r["w"]): (r["pair_count"], r["ctx_count"])
                 for r in model.df.collect()}
    assert got_model == {k: (n, cc[k[0]]) for k, n in pc.items()}
    assert meta["vocab_size"] == max(len(vocab), 1)

    k, v = meta["k"], meta["vocab_size"]
    scored = {r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
              for r in score_perplexity(tf, model, meta).df.collect()}
    for i, text in rows:
        ps = doc_pairs(text)
        n, ce = scored[i]
        assert n == len(ps)
        if not ps:
            assert ce is None
            continue
        ref = -sum(math.log2((pc[p] + k) / (cc[p[0]] + k * v)) for p in ps) / len(ps)
        assert abs(ce - ref) < 1e-9, (i, ngram, ce, ref)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_corpus_passage_stats_match_reference(spark, data):
    """Random corpora through repeated_passage_stats must agree with a
    brute-force Python window census (window=3, stride drawn 1-2)."""
    from collections import Counter

    from tidierdb_jl_spark.core import TidyFrame
    from tidierdb_jl_spark.llm.passages import repeated_passage_stats

    stride = data.draw(st.sampled_from([1, 2]))
    docs = data.draw(st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), max_size=9),
        min_size=1, max_size=6,
    ))
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    tf = TidyFrame(spark.createDataFrame(rows, "doc_id INT, text STRING"))

    def windows(toks):
        return [" ".join(toks[i:i + 3]) for i in range(0, len(toks) - 2, stride)]

    per_doc = {i: windows(t.split()) for i, t in rows}
    doc_freq = Counter()
    for i, ws in per_doc.items():
        for w in set(ws):
            doc_freq[w] += 1
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
           for r in repeated_passage_stats(tf, window=3, stride=stride).df.collect()}
    for i, ws in per_doc.items():
        dup = sum(1 for w in ws if doc_freq[w] >= 2)
        assert got[i] == (len(ws), dup), (i, got[i], (len(ws), dup))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_snapshot_diff_matches_duckdb(tables, ddb, data):
    """snapshot_diff under random version pairs: random key filters on
    each side and a random price perturbation — the full-outer
    classification and changed-column list must match DuckDB."""
    from tidierdb_jl_spark.operators.diff import snapshot_diff

    m_old = data.draw(st.integers(min_value=2, max_value=9))
    m_new = data.draw(st.integers(min_value=2, max_value=9))
    m_chg = data.draw(st.integers(min_value=2, max_value=5))
    bump = data.draw(st.sampled_from(["1.0", "0.5", "100.0"]))

    old = tables["orders"].filter(f"o_orderkey % {m_old} != 0").select(
        "o_orderkey", "o_totalprice"
    )
    new = (
        tables["orders"]
        .filter(f"o_orderkey % {m_new} != 0")
        .mutate(
            o_totalprice=f"if_else(o_orderkey % {m_chg} == 0, o_totalprice + {bump}, o_totalprice)"
        )
        .select("o_orderkey", "o_totalprice")
    )
    out = snapshot_diff(old, new, "o_orderkey").mutate(
        changed_cols="array_join(changed_cols, ',')"
    )
    sql = f"""
        WITH old AS (SELECT o_orderkey, o_totalprice FROM orders
                     WHERE o_orderkey % {m_old} != 0),
        new AS (SELECT o_orderkey,
                       CASE WHEN o_orderkey % {m_chg} = 0
                            THEN o_totalprice + {bump} ELSE o_totalprice END
                       AS o_totalprice
                FROM orders WHERE o_orderkey % {m_new} != 0)
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
                    ELSE 'unchanged' END AS status,
               CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                         AND o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'o_totalprice' ELSE '' END AS changed_cols
        FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    """
    assert_matches_duckdb(out, ddb, sql, f"diff %{m_old}/%{m_new}/%{m_chg}+{bump}")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_kfold_matches_duckdb(tables, ddb, data):
    """kfold_by_hash for random k and salt: the hex-threshold-count rule
    recomputed verbatim in DuckDB."""
    from tidierdb_jl_spark.llm.pipeline import kfold_by_hash

    k = data.draw(st.integers(min_value=2, max_value=12))
    salt = data.draw(st.sampled_from(["", "v2", "epoch3"]))
    out = kfold_by_hash(tables["documents"], "doc_id", k=k, salt=salt).select(
        "doc_id", "fold"
    )
    cases = " + ".join(
        "CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '" + salt + "'), 1, 8)"
        f" >= '{format(int(i / k * 0xFFFFFFFF), '08x')}' THEN 1 ELSE 0 END"
        for i in range(1, k)
    )
    assert_matches_duckdb(
        out, ddb,
        f"SELECT doc_id, CAST({cases} AS INT) AS fold FROM documents",
        f"kfold k={k} salt={salt!r}",
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_html_strip_matches_duckdb(tables, ddb, data):
    """strip_html over randomized markup templates built from corpus text:
    Spark (Java regex) and DuckDB (RE2) must extract identical text —
    the cross-engine guard for the (?is)/non-greedy pattern subset."""
    from tests.test_scrub_extras import _duck_strip_html_expr
    from tidierdb_jl_spark.llm.scrub import strip_html

    # NOTE: fragments must be valid single-quoted SQL literals in BOTH
    # engines (escape rules differ: Spark backslash vs DuckDB doubling),
    # so attribute quotes are spelled with double quotes
    pre = data.draw(st.sampled_from([
        '<div class="a">', "<script>if (1<2) { x(); }</script>",
        "<style>a{b:c}</style>", "<!-- <p>ghost</p> -->", "&amp;&nbsp;",
    ]))
    post = data.draw(st.sampled_from([
        "</div>", "<br/>tail", "&lt;tag&gt;", "<SCRIPT>s</SCRIPT>", "",
    ]))
    html = f"concat('{pre}', text, '{post}')"
    out = strip_html(
        tables["documents"].select("doc_id", "text").mutate(h=html), "h"
    ).select("doc_id", "h")
    assert_matches_duckdb(
        out, ddb,
        f"SELECT doc_id, {_duck_strip_html_expr(html)} AS h FROM documents",
        f"html {pre!r}..{post!r}",
    )


def test_token_budget_random_budgets(spark, tables, ddb):
    """Property sweep for take_token_budget: 12 budgets spanning the full
    cumulative range (plus both exact boundaries and off-by-ones around a
    random kept-set edge) all hash-match DuckDB's literal global-window
    cumsum.  The boundary is where a partition-parallel prefix-sum
    implementation would break first."""
    import random

    from tidierdb_jl_spark.llm.mixing import take_token_budget

    rng = random.Random(61)
    total = int(ddb.execute("SELECT SUM(n_chars) FROM documents").fetchone()[0])
    edges = ddb.execute(
        "SELECT CAST(SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c FROM documents"
    ).df()["c"].tolist()
    k = rng.randrange(1, len(edges) - 1)
    budgets = {edges[k], edges[k] - 1, edges[k] + 1, 0, total, total + 7}
    while len(budgets) < 12:
        budgets.add(rng.randrange(1, total))
    for b in sorted(budgets):
        got = (
            take_token_budget(tables["documents"], b, tokens="n_chars",
                              order_by=["-n_chars", "doc_id"], into="cum")
            .select("doc_id", "cum").collect().sort_values("doc_id")
        )
        want = ddb.execute(
            "SELECT doc_id, cum FROM (SELECT doc_id, "
            "CAST(SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM documents) "
            f"WHERE cum <= {b} ORDER BY doc_id"
        ).df()
        assert len(got) == len(want), b
        assert (got["doc_id"].values == want["doc_id"].values).all(), b
        assert (got["cum"].astype("int64").values
                == want["cum"].astype("int64").values).all(), b


def test_main_content_random_pages(spark, ddb):
    """Property sweep for extract_main_content: 40 randomly composed
    pages (random block tags, link densities, entities, nesting, empty
    blocks, unicode) must decode IDENTICALLY through the Spark and
    DuckDB formulations emitted by the one expression builder — the
    regex/HOF dialect seams are exactly where the two engines could
    silently drift."""
    import random

    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.llm.scrub import extract_main_content, main_content_expr

    rng = random.Random(17)
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima café naïve &amp; x").split()
    tags = ["p", "div", "li", "h2", "td", "section", "blockquote"]

    def block():
        tag = rng.choice(tags)
        n = rng.randrange(0, 12)
        toks = [rng.choice(words) for _ in range(n)]
        # sprinkle anchors over a random subset of tokens
        out = []
        for w in toks:
            if rng.random() < 0.4:
                out.append(f'<a href="/{rng.randrange(9)}">{w}</a>')
            else:
                out.append(w)
        inner = " ".join(out)
        if rng.random() < 0.15:
            inner += "<script>junk()</script>"
        if rng.random() < 0.15:
            inner = f"<!-- {rng.choice(words)} -->" + inner
        return f"<{tag}>{inner}</{tag}>"

    pages = [
        (i, "<html><body>" + "".join(block() for _ in range(rng.randrange(1, 9)))
            + "</body></html>")
        for i in range(40)
    ]
    df = spark.createDataFrame(pages, "i long, text string")
    got = extract_main_content(TidyFrame(df)).collect().set_index("i")["text"]

    ddb.execute("CREATE OR REPLACE TABLE __mcp (i BIGINT, text VARCHAR)")
    ddb.executemany("INSERT INTO __mcp VALUES (?, ?)", pages)
    want = ddb.execute(
        f"SELECT i, {main_content_expr('text', dialect='duckdb')} AS m "
        "FROM __mcp ORDER BY i"
    ).df().set_index("i")["m"]
    for i, _ in pages:
        assert got.loc[i] == want.loc[i], (i, got.loc[i], want.loc[i])
