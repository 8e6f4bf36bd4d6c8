"""strip_html, normalize_text, compact_files."""

import os

import pytest

from tests.helpers import assert_matches_duckdb
from tidierdb_jl_spark.core import TidyFrame


def _docs(spark, texts):
    return TidyFrame(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
        )
    )


def test_strip_html_unit_cases(spark):
    from tidierdb_jl_spark.llm.scrub import strip_html

    cases = {
        "<p>hello <b>world</b></p>": "hello world",
        "<script>var x = '<p>not text</p>';</script>after": "after",
        "<STYLE type='x'>p { color: red }</STYLE>kept": "kept",
        "a<!-- hidden -->b": "a b",
        "x &amp; y &lt;z&gt; &quot;q&quot; &#39;s&#39; &nbsp;w": "x & y <z> \"q\" 's' w",
        "&amp;lt;": "&lt;",  # double-encoded stays encoded once
        "no markup at all": "no markup at all",
        "": "",
        None: None,
    }
    out = strip_html(_docs(spark, list(cases)), "text").collect()
    got = dict(zip(out["doc_id"], out["text"]))
    for i, (src, want) in enumerate(cases.items()):
        assert got[i] == want, f"{src!r}: {got[i]!r} != {want!r}"


def _duck_strip_html_expr(col: str) -> str:
    """The same pattern chain as strip_html_expr, spelled for DuckDB
    (explicit 'g' flag on regexp_replace; plain single-backslash escapes)."""
    from tidierdb_jl_spark.llm.scrub import _HTML_BLOCK_PATTERNS, _HTML_ENTITIES

    expr = col
    for pat in _HTML_BLOCK_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        c = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{c}')"
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


def test_strip_html_matches_duckdb(tables, ddb):
    from tidierdb_jl_spark.llm.scrub import strip_html

    html = (
        "concat('<html><head><script>var x=1;</script><style>p{}</style></head>"
        "<body><h1>T</h1><p>', text, '</p><!-- c --> &amp; tail</body></html>')"
    )
    out = strip_html(
        tables["documents"].select("doc_id", "text").mutate(h=html), "h"
    ).select("doc_id", "h")
    ddb_expr = _duck_strip_html_expr(html)
    assert_matches_duckdb(out, ddb, f"SELECT doc_id, {ddb_expr} AS h FROM documents")


def test_normalize_text_forms(spark):
    from tidierdb_jl_spark.llm.scrub import normalize_text

    decomposed = "café"          # e + combining acute
    composed = "café"
    fullwidth = "Ｈｉ"          # Ｈｉ
    ligature = "ﬁn"                # ﬁn
    texts = [decomposed, composed, fullwidth, ligature, None]

    nfc = normalize_text(_docs(spark, texts), "text").collect()
    got = dict(zip(nfc["doc_id"], nfc["text"]))
    assert got[0] == composed == got[1]
    assert got[2] == fullwidth          # NFC keeps compatibility chars
    assert got[4] is None

    nfkc = normalize_text(_docs(spark, texts), "text", form="NFKC").collect()
    g2 = dict(zip(nfkc["doc_id"], nfkc["text"]))
    assert g2[2] == "Hi"
    assert g2[3] == "fin"

    stripped = normalize_text(
        _docs(spark, texts), "text", strip_accents=True, lowercase=True
    ).collect()
    g3 = dict(zip(stripped["doc_id"], stripped["text"]))
    assert g3[0] == g3[1] == "cafe"
    assert g3[2] == fullwidth.lower()

    with pytest.raises(ValueError):
        normalize_text(_docs(spark, texts), "text", form="NFX")


def test_compact_files_roundtrip_and_in_place(spark, tables, tmp_path):
    from tidierdb_jl_spark.sources.writers import compact_files, dataset_size_bytes

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    orders = tables["orders"].df
    orders.repartition(8).write.parquet(src)
    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_in == 8
    size = dataset_size_bytes(spark, src)
    assert size > 0

    # pick a target that forces exactly one output file
    tf, n_out = compact_files(spark, src, dst, target_mb=max(1, size * 2 // 2**20))
    assert n_out == 1
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == 1
    want = sorted(map(tuple, orders.collect()))
    assert sorted(map(tuple, tf.df.collect())) == want

    # in-place: same rows, fewer files, original path
    tf2, n2 = compact_files(spark, src, target_mb=max(1, size * 2 // 2**20))
    assert n2 == 1
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 1
    assert sorted(map(tuple, tf2.df.collect())) == want

    with pytest.raises(ValueError):
        compact_files(spark, src, target_mb=0)
    with pytest.raises(FileNotFoundError):
        dataset_size_bytes(spark, str(tmp_path / "missing"))


def test_split_sentences_unit_and_duckdb(spark, tables, ddb):
    from tidierdb_jl_spark.llm.textstats import split_sentences

    cases = {
        "One. Two! Three? Four": ["One.", "Two!", "Three?", "Four"],
        "No trailing punct": ["No trailing punct"],
        # a simple segmenter treats ellipsis as a sentence end — fine for
        # dedup granularity, and identical across engines
        "Dots... everywhere. End": ["Dots...", "everywhere.", "End"],
        "  spaced .  out  ": ["spaced .", "out"],
        "": [],
        None: [],
    }
    out = split_sentences(_docs(spark, list(cases)), "text").collect()
    got = dict(zip(out["doc_id"], out["sentences"]))
    for i, (src, want) in enumerate(cases.items()):
        assert list(got[i]) == want, f"{src!r}: {list(got[i])} != {want}"

    # cross-engine: same logic, RE2 backreference spelling
    res = split_sentences(tables["documents"], "text").select("doc_id", "sentences")
    from tests.helpers import assert_matches_duckdb

    assert_matches_duckdb(
        res.mutate(sentences="array_join(sentences, char(30))"),
        ddb,
        r"""
        SELECT doc_id,
               coalesce(array_to_string(
                 list_filter(list_transform(
                   string_split(regexp_replace(coalesce(text, ''),
                                              '([.!?])\s+', '\1' || chr(30), 'g'),
                   chr(30)), s -> trim(s)), s -> s != ''), chr(30)), '') AS sentences
        FROM documents
        """,
    )


def test_sentence_segment_dedup_composes(tables):
    from tidierdb_jl_spark.llm.dedup import segment_dedup
    from tidierdb_jl_spark.llm.textstats import sentence_expr

    out = segment_dedup(
        tables["documents"], "doc_id", "text",
        segments_expr=sentence_expr("text"), joiner=" ",
    ).collect()
    assert len(out) > 0
    assert (out["n_seg_kept"] <= out["n_seg_total"]).all()


def test_extract_main_content(spark, ddb):
    """Boilerplate removal: body prose and headings survive, link-
    dominated nav/tag-cloud/footer blocks drop, plain text passes
    through, and the DuckDB formulation emitted by the SAME builder
    (main_content_expr(dialect='duckdb')) is value-identical on every
    case — including the empty-list traps (all-boilerplate page, empty
    string, NULL)."""
    import pandas as pd

    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.llm.scrub import extract_main_content, main_content_expr

    html = (
        '<html><head><script>nav()</script><style>a{}</style></head><body>'
        '<div class="nav"><a href="/">Home</a> | <a href="/a">About</a> | '
        '<a href="/c">Contact</a></div>'
        '<h1>The Article Title Here</h1>'
        '<p>This is the first real paragraph of body prose with enough words '
        'to keep.</p>'
        '<p>Second paragraph &amp; more content, including an inline '
        '<a href="x">link</a> inside prose text here.</p>'
        '<ul><li><a href="1">tag1</a></li><li><a href="2">tag2</a></li></ul>'
        '<footer><a href="p">Privacy</a> <a href="t">Terms</a> copyright</footer>'
        '</body></html>'
    )
    cases = [
        (1, html),
        (2, "plain text with no markup at all here"),
        (3, None),
        (4, '<div><a href="a">only</a> <a href="b">links</a> '
            '<a href="c">here now</a></div>'),
        (5, ""),
    ]
    df = spark.createDataFrame(cases, "i long, text string")
    got = (
        extract_main_content(TidyFrame(df))
        .collect()
        .set_index("i")["text"]
    )

    kept = got.loc[1].split("\n")
    assert kept[0] == "The Article Title Here"
    assert kept[1].startswith("This is the first real paragraph")
    assert "Second paragraph & more content" in kept[2]  # entity decoded
    assert "Home" not in got.loc[1] and "Privacy" not in got.loc[1]
    assert "tag1" not in got.loc[1]
    assert got.loc[2] == "plain text with no markup at all here"
    assert got.loc[4] == "" and got.loc[5] == ""  # all-boilerplate / empty

    ddb.execute("CREATE OR REPLACE TABLE __mc (i BIGINT, text VARCHAR)")
    ddb.executemany("INSERT INTO __mc VALUES (?, ?)", cases)
    want = ddb.execute(
        f"SELECT i, {main_content_expr('text', dialect='duckdb')} AS m "
        "FROM __mc ORDER BY i"
    ).df().set_index("i")["m"]
    for i, _ in cases:
        a = got.loc[i] if i in got.index else None
        b = want.loc[i]
        a = None if pd.isna(a) else a
        b = None if pd.isna(b) else b
        assert a == b, (i, a, b)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        main_content_expr("text", dialect="postgres")
