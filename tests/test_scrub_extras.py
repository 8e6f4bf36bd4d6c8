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
