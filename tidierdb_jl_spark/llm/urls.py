"""URL analysis for web-corpus pipelines: parts extraction, canonical
normalization (the dedup key), and domain blocklist filtering.

Common-Crawl-style ingest dedupes and filters by URL before ever touching
document text: normalize → exact-dedup on the canonical form → drop
blocklisted domains → (optionally) anti-join yesterday's seen-set with a
bloom filter (``operators.bloom``).  Everything here is pure JVM
expressions (regexp + array ops) so the whole stage fuses into the scan —
zero shuffles, whole-stage codegen, and every rule is expressible in
ANSI-ish SQL for differential oracles.

Normalization contract (deliberately boring and deterministic):
1. trim, drop the ``#fragment``;
2. lowercase scheme and authority (path/query case is significant);
3. drop a leading ``www.``;
4. drop explicit default ports (``:80`` for http, ``:443`` for https);
5. collapse trailing ``/`` on the path;
6. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``,
   ``ref``), sort the survivors byte-wise for order-independence, drop the
   ``?`` when none survive.

``registered_domain`` uses the standard 2-label rule with a small
public-suffix heuristic for common 3-label country registries
(``co.uk``-style) — a full PSL lookup is a broadcast-join against the
published list, which callers can layer on; the heuristic is deterministic
and oracle-able.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = [
    "with_url_parts",
    "normalize_url",
    "filter_url_blocklist",
]

# second-level registries where the registered domain takes three labels
_SLD = ("co", "com", "org", "net", "ac", "gov", "edu")
_SLD_TLD = ("uk", "au", "jp", "nz", "za", "in", "br", "kr", "mx")

_TRACKING = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"


def _host(url):
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)


def _registered_domain(host):
    """Last two labels, or three when label -2 is a known second-level
    registry under a known ccTLD (heuristic PSL subset)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    sld = F.when(n >= 2, F.element_at(labels, -2)).otherwise(F.lit(""))
    three = (
        (n >= 3)
        & sld.isin(*_SLD)
        & tld.isin(*_SLD_TLD)
    )
    two = F.when(n >= 2, F.concat_ws(".", sld, tld)).otherwise(host)
    return F.when(
        three, F.concat_ws(".", F.element_at(labels, -3), sld, tld)
    ).otherwise(two)


def with_url_parts(tf, url, prefix: str = "url_"):
    """Append ``{prefix}scheme/host/domain/path`` columns extracted with
    anchored regexps (identical semantics in RE2/Java, so DuckDB oracles
    run the same patterns).  Malformed URLs yield empty strings, never
    errors — corpus data is hostile."""
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    u = F.expr(url) if isinstance(url, str) else url
    host = F.lower(_host(u))
    out = (
        sdf.withColumn(prefix + "scheme", F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)))
        .withColumn(prefix + "host", host)
        .withColumn(prefix + "domain", _registered_domain(host))
        .withColumn(prefix + "path", F.regexp_extract(u, _AUTH_RE + r"([^?#]*)", 1))
    )
    return TidyFrame(out, groups=getattr(tf, "groups", None))


def normalize_url(tf, url, into: str = "url_norm"):
    """Append the canonical URL (see module docstring for the contract) —
    the key for exact URL dedup and seen-set joins.  Pure expression
    chain: regexp splits, one array filter+sort for the query params, no
    UDFs, no shuffle."""
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    u = F.trim(F.expr(url) if isinstance(url, str) else url)
    nofrag = F.regexp_replace(u, r"#.*$", "")
    base = F.regexp_replace(nofrag, r"\?.*$", "")
    qs = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    # lowercase scheme://authority, keep path case
    auth = F.regexp_extract(base, _AUTH_RE, 0)
    base = F.concat(
        F.lower(auth), F.substring(base, F.length(auth) + F.lit(1), F.lit(1 << 30))
    )
    base = F.regexp_replace(base, r"^(https?://)www\.", "$1")
    base = F.regexp_replace(base, r"^(http://[^/:]*):80(/|$)", "$1$2")
    base = F.regexp_replace(base, r"^(https://[^/:]*):443(/|$)", "$1$2")
    base = F.regexp_replace(base, r"(.)/+$", "$1")
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING),
        )
    )
    norm = F.when(F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))).otherwise(base)
    out = sdf.withColumn(into, norm)
    return TidyFrame(out, groups=getattr(tf, "groups", None))


def filter_url_blocklist(tf, url, blocked_domains, keep: bool = False):
    """Drop (or with ``keep=True``, retain only) rows whose registered
    domain is in ``blocked_domains``.  Small lists become an ``isin``
    literal (scan-side filter, zero shuffle); a DataFrame of domains
    becomes a broadcast anti/semi join.  For 10⁸+ domain lists use
    ``operators.bloom.bloom_anti_join`` on the domain column instead."""
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    u = F.expr(url) if isinstance(url, str) else url
    dom = _registered_domain(F.lower(_host(u)))
    if isinstance(blocked_domains, (list, tuple, set)):
        hit = dom.isin(*[d.lower() for d in blocked_domains])
        out = sdf.where(hit if keep else ~hit)
    else:
        bdf = blocked_domains.df if hasattr(blocked_domains, "df") else blocked_domains
        bl = bdf.selectExpr(f"lower({bdf.columns[0]}) AS __bl_domain").distinct()
        how = "left_semi" if keep else "left_anti"
        out = sdf.join(F.broadcast(bl), dom == F.col("__bl_domain"), how)
    return TidyFrame(out, groups=getattr(tf, "groups", None))
