"""PII scrubbing for LLM training corpora (beyond the reference —
north-star family): redact emails, IPs, phone numbers, and other
identifier-shaped spans before training, the standard C4/RefinedWeb-style
hygiene pass.

Every redaction is a chained ``regexp_replace`` — pure JVM expressions
that fuse into the scan with zero shuffles, so scrubbing N patterns over
100 TB costs exactly one pass.  Patterns stay in the common
Java-regex/RE2 subset (no lookaround, no backreferences) so the DuckDB
oracle applies the very same strings.
"""

from __future__ import annotations

__all__ = [
    "PII_PATTERNS", "scrub_pii", "scrub_expr",
    "strip_html", "strip_html_expr", "normalize_text",
    "extract_main_content", "main_content_expr",
]

# (name, pattern, replacement) applied in order.  Longest/most-specific
# first so e.g. an email is not half-eaten by a later pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
        "<PHONE>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
)


def scrub_expr(col: str, patterns=PII_PATTERNS) -> str:
    """SQL expression chaining one ``regexp_replace`` per pattern over
    ``col`` (innermost applied first == first pattern wins overlaps)."""
    expr = col
    for _, pat, repl in patterns:
        quoted = pat.replace("\\", "\\\\").replace("'", "''")
        expr = f"regexp_replace({expr}, '{quoted}', '{repl}')"
    return expr


def scrub_pii(tf, col: str = "text", out: str | None = None, patterns=PII_PATTERNS):
    """Redact PII spans in ``col`` (in place unless ``out`` names a new
    column).  See ``PII_PATTERNS`` for the default pattern set; pass your
    own ``(name, regex, replacement)`` triples to extend — the regex must
    avoid lookaround to stay portable across engines."""
    return tf.mutate(**{out or col: scrub_expr(col, patterns)})


# ---------------------------------------------------------------------------
# HTML stripping (web-corpus text extraction)
# ---------------------------------------------------------------------------

# Applied in order; all patterns live in the common Java-regex/RE2 subset
# (inline (?is) flags + non-greedy quantifiers are fine, backreferences and
# lookaround are not) so the DuckDB oracle runs the identical strings.
_HTML_BLOCK_PATTERNS: tuple[str, ...] = (
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"<[^>]+>",
)
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so "&amp;lt;" decodes to "&lt;" not "<"
)


def strip_html_expr(col: str) -> str:
    """SQL expression extracting visible text from HTML: drop
    script/style/comment blocks, then all tags, decode the common
    entities, collapse whitespace, trim."""
    expr = col
    for pat in _HTML_BLOCK_PATTERNS:
        quoted = pat.replace("\\", "\\\\").replace("'", "''")
        expr = f"regexp_replace({expr}, '{quoted}', ' ')"
    for ent, ch in _HTML_ENTITIES:
        c = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{c}')"
    return f"trim(regexp_replace({expr}, '\\\\s+', ' '))"


def strip_html(tf, col: str = "text", out: str | None = None):
    """Extract visible text from an HTML column — the first step of a
    web-corpus pipeline (C4/RefinedWeb operate on extracted text, not
    raw markup).  Script/style/comment payloads are REMOVED (their
    content is not prose); remaining tags become spaces so adjacent text
    does not concatenate; the six standard entities decode; whitespace
    collapses.

    Pure chained JVM ``regexp_replace``/``replace`` — fuses into the
    scan, zero shuffles, and every pattern is RE2-compatible so the
    DuckDB oracle applies the same strings.  This is a lightweight
    regex extractor, not a full HTML5 parser: pathological markup
    (unclosed script tags, CDATA) degrades to extra whitespace, never to
    dropped documents.
    """
    target = out or col
    return tf.mutate(**{target: strip_html_expr(col)})


# ---------------------------------------------------------------------------
# Unicode normalization
# ---------------------------------------------------------------------------


def normalize_text(
    tf,
    col: str = "text",
    out: str | None = None,
    form: str = "NFC",
    strip_accents: bool = False,
    lowercase: bool = False,
):
    """Unicode-normalize a text column — the canonicalization pass that
    makes dedup fingerprints and token counts stable across sources that
    encode the "same" text differently (composed vs decomposed accents,
    fullwidth forms, ligatures).

    ``form`` is any of NFC/NFD/NFKC/NFKD; ``strip_accents`` removes
    combining marks after NFD (``café`` → ``cafe``); ``lowercase``
    applies Python's full casefold-free ``str.lower``.  Spark has no
    built-in Unicode normalizer, so this is a vectorized Arrow pass over
    ``unicodedata`` (stdlib) — the sanctioned Pandas-UDF slow path; at
    100 TB run it ONCE at ingest and persist the normalized column.
    NULLs pass through.
    """
    import unicodedata

    from pyspark.sql import functions as F
    import pandas

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC|NFD|NFKC|NFKD, got {form!r}")

    def norm_one(s):
        if s is None:
            return None
        t = unicodedata.normalize(form, s)
        if strip_accents:
            t = "".join(
                ch
                for ch in unicodedata.normalize("NFD", t)
                if not unicodedata.combining(ch)
            )
            t = unicodedata.normalize(form, t)
        return t.lower() if lowercase else t

    def norm(s: pandas.Series) -> pandas.Series:
        return s.map(norm_one)

    norm.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    udf = F.pandas_udf("string")(norm)
    target = out or col
    from ..core import TidyFrame

    return TidyFrame(tf.df.withColumn(target, udf(F.col(col))))


# ---------------------------------------------------------------------------
# Main-content extraction (boilerplate removal)
# ---------------------------------------------------------------------------

# Block-level boundary tags: HTML splits into candidate text blocks at
# these.  One leading (?i) governs the whole alternation.  Kept in the
# Java-regex/RE2 common subset (see _HTML_BLOCK_PATTERNS note).
_BLOCK_SPLIT_PATTERN = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|"
    r"section|article|header|footer|nav|aside|blockquote|main|form|figure|"
    r"fieldset|pre)[^>]*>|(?i)<br[^>]*>"
)
_LINK_TEXT_PATTERN = r"(?is)<a[^>]*>(.*?)</a>"


def main_content_expr(
    col: str,
    min_words: int = 3,
    max_link_density: float = 0.33,
    dialect: str = "spark",
) -> str:
    """SQL expression for jusText/trafilatura-style boilerplate removal:

    1. drop script/style/comment payloads;
    2. split the page into blocks at block-level tag boundaries;
    3. score each block: word count and LINK DENSITY (chars of anchor
       text / chars of visible text — navigation chrome, footers and
       tag clouds are mostly links, body prose is not);
    4. keep blocks with ≥ ``min_words`` words and link density ≤
       ``max_link_density``; join the survivors with newlines.

    Entirely JVM expressions (split + higher-order filter/transform over
    the block array) — fuses into the scan, zero shuffles, no UDF.  The
    same builder emits the DuckDB formulation (``dialect="duckdb"``) so
    oracles run ONE definition, not a hand-kept mirror.  Heuristic, not
    a DOM parser: the published extractors (jusText, Pomikálek 2011;
    trafilatura) are heuristics over the same two signals.
    """
    duck = dialect == "duckdb"
    if not duck and dialect != "spark":
        raise ValueError(f"dialect must be spark|duckdb, got {dialect!r}")
    g = ", 'g'" if duck else ""
    ws = r"\s+" if duck else r"\\s+"

    cleaned = col
    for pat in _HTML_BLOCK_PATTERNS[:3]:  # script / style / comments
        q = pat if duck else pat.replace("\\", "\\\\")
        cleaned = f"regexp_replace({cleaned}, '{q}', ' '{g})"
    split_pat = _BLOCK_SPLIT_PATTERN
    blocks = (
        f"regexp_split_to_array({cleaned}, '{split_pat}')"
        if duck
        else f"split({cleaned}, '{split_pat}')"
    )

    # visible text of one block (lambda var b): tags → space, entities,
    # whitespace collapse
    t = "regexp_replace(b, '<[^>]+>', ' '{})".format(g)
    for ent, ch in _HTML_ENTITIES:
        t = f"replace({t}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    t = f"trim(regexp_replace({t}, '{ws}', ' '{g}))"

    link_list = f"regexp_extract_all(b, '{_LINK_TEXT_PATTERN}', 1)"
    # DuckDB's array_to_string returns NULL for an empty list (Spark's
    # concat_ws/array_join return '') — coalesce to keep the two
    # formulations value-identical
    lk = (
        f"coalesce(length(array_to_string({link_list}, '')), 0)"
        if duck
        else f"length(concat_ws('', {link_list}))"
    )
    nwords = (
        f"len(string_split_regex({t}, '{ws}'))"
        if duck
        else f"size(split({t}, '{ws}'))"
    )
    keep = (
        f"b -> length({t}) > 0 AND {nwords} >= {int(min_words)} "
        f"AND {lk} <= {max_link_density} * length({t})"
    )
    if duck:
        kept = f"list_filter({blocks}, {keep})"
        joined = f"array_to_string(list_transform({kept}, b -> {t}), chr(10))"
        return (
            f"CASE WHEN {col} IS NULL THEN NULL ELSE coalesce({joined}, '') END"
        )
    kept = f"filter({blocks}, {keep})"
    return f"array_join(transform({kept}, b -> {t}), chr(10))"


def extract_main_content(
    tf,
    col: str = "text",
    out: str | None = None,
    min_words: int = 3,
    max_link_density: float = 0.33,
):
    """Boilerplate removal for web pages — keep body prose, drop nav /
    footer / link-farm blocks (see :func:`main_content_expr`).  The step
    between raw WARC HTML and :func:`strip_html`-grade clean text in a
    C4/RefinedWeb-style pipeline; scan-fused, zero shuffles."""
    target = out or col
    return tf.mutate(
        **{target: main_content_expr(col, min_words, max_link_density)}
    )
