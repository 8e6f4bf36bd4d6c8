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

__all__ = ["PII_PATTERNS", "scrub_pii", "scrub_expr"]

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
