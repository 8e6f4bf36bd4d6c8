"""Reshape operators: pivot_wider/longer, unnest_wider/longer, separate, unite.

Reference: ``/root/reference/src/pivots.jl`` (dynamic pivot via eager
DISTINCT + ``ANY_VALUE(...) FILTER`` per value; longer via UNION ALL),
``/root/reference/src/unnest.jl`` (STRUCT expansion / array explosion),
``/root/reference/src/sep_unite.jl`` (split_part with remainder / CONCAT_WS).

Spark mapping: ``groupBy().pivot()`` (same eager-distinct behavior when
values aren't supplied — pass ``values=`` to avoid the extra job, exactly
like the reference's tuple form), ``DataFrame.unpivot``, ``col.*`` struct
expansion, ``explode``/``arrays_zip``, ``split`` with a limit (Spark's
``split(str, re, limit)`` keeps the remainder in the last element — the
reference's remainder semantics for free).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .selection import resolve_selection

__all__ = [
    "pivot_wider",
    "pivot_longer",
    "unnest_wider",
    "unnest_longer",
    "separate",
    "unite",
]


def pivot_wider(tf, names_from: str, values_from, values=None, id_cols=None):
    """(``/root/reference/src/pivots.jl:9-169``).  Without ``values`` Spark
    runs the same eager distinct the reference does
    (``/root/reference/src/pivots.jl:1-7``); pass values at 100 TB.

    ``values_from`` may be a list of columns; output columns are then
    named ``{pivot_value}_{value_col}`` — the reference's convention
    (``/root/reference/src/pivots.jl:20-24``), which Spark's multi-agg
    pivot produces natively."""
    from ..core import TidyFrame

    vals = [values_from] if isinstance(values_from, str) else list(values_from)
    df = tf.df
    ids = (
        resolve_selection([id_cols] if isinstance(id_cols, str) else list(id_cols), df.columns)
        if id_cols is not None
        else [c for c in df.columns if c != names_from and c not in vals]
    )
    gb = df.groupBy(*ids)
    piv = gb.pivot(names_from, list(values) if values is not None else None)
    if len(vals) == 1:
        out = piv.agg(F.any_value(F.col(vals[0])))
    else:
        out = piv.agg(*[F.any_value(F.col(v)).alias(v) for v in vals])
    return TidyFrame(out)


def pivot_longer(tf, cols, names_to: str = "variable", values_to: str = "value"):
    """(``/root/reference/src/pivots.jl:172-274``)."""
    from ..core import TidyFrame

    df = tf.df
    value_cols = resolve_selection([cols] if isinstance(cols, str) else list(cols), df.columns)
    ids = [c for c in df.columns if c not in value_cols]
    # Harmonize value types like the reference's UNION ALL would (least
    # common type); unpivot requires it explicitly.
    dtypes = dict(df.dtypes)
    kinds = {dtypes[c] for c in value_cols}
    if len(kinds) > 1:
        numeric = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}
        target = "double" if all(k.split("(")[0] in numeric for k in kinds) else "string"
        df = df.withColumns({c: F.col(c).cast(target) for c in value_cols})
    out = df.unpivot(ids, value_cols, names_to, values_to)
    return TidyFrame(out)


def unnest_wider(tf, cols, names_sep: str | None = None):
    """Expand STRUCT columns into fields, in place
    (``/root/reference/src/unnest.jl:1-85``)."""
    from ..core import TidyFrame

    df = tf.df
    targets = resolve_selection(list(cols), df.columns)
    sel = []
    for c in df.columns:
        if c in targets:
            dt = df.schema[c].dataType
            if not isinstance(dt, T.StructType):
                raise TypeError(f"unnest_wider: {c} is {dt.simpleString()}, not a struct")
            for f_ in dt.names:
                out_name = f"{c}{names_sep}{f_}" if names_sep else f_
                sel.append(F.col(f"{c}.{f_}").alias(out_name))
        else:
            sel.append(F.col(c))
    return TidyFrame(df.select(*sel))


def unnest_longer(tf, cols):
    """Explode array columns; multiple columns explode positionally in
    parallel (``/root/reference/src/unnest.jl:90-138``)."""
    from ..core import TidyFrame

    df = tf.df
    targets = resolve_selection(list(cols), df.columns)
    if len(targets) == 1:
        c = targets[0]
        sel = [F.col(x) if x != c else F.col("__u").alias(c) for x in df.columns]
        out = df.select("*", F.explode(F.col(c)).alias("__u")).select(*sel)
        return TidyFrame(out)
    zipped = df.select("*", F.explode(F.arrays_zip(*targets)).alias("__u"))
    sel = [
        F.col(f"__u.{c}").alias(c) if c in targets else F.col(c) for c in df.columns
    ]
    return TidyFrame(zipped.select(*sel))


def separate(tf, col: str, into: list[str], sep: str):
    """Split a string column into n columns; the last keeps the remainder
    (``/root/reference/src/sep_unite.jl:1-66``).  ``sep`` is treated as a
    literal, like the reference's split_part."""
    from ..core import TidyFrame

    df = tf.df
    n = len(into)
    parts = F.split(F.col(col), re.escape(sep), n)
    sel = []
    for c in df.columns:
        if c == col:
            for i, name in enumerate(into):
                sel.append(F.get(parts, i).alias(name))
        else:
            sel.append(F.col(c))
    return TidyFrame(df.select(*sel))


def unite(tf, new_col: str, cols, sep: str = "_", remove: bool = True):
    """CONCAT_WS of the columns, placed at the first source's position
    (``/root/reference/src/sep_unite.jl:68-110``)."""
    from ..core import TidyFrame

    df = tf.df
    sources = resolve_selection(list(cols), df.columns)
    united = F.concat_ws(sep, *[F.col(c) for c in sources]).alias(new_col)
    sel, placed = [], False
    for c in df.columns:
        if c in sources:
            if not placed:
                sel.append(united)
                placed = True
            if not remove:
                sel.append(F.col(c))
        else:
            sel.append(F.col(c))
    return TidyFrame(df.select(*sel))
