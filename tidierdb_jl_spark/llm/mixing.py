"""Corpus-mixing operators for training-data pipelines (beyond the
reference, which has no corpus tooling; north-star family per SURVEY §2).

Three deterministic building blocks for composing a training mix:

- ``cap_per_key`` — bound over-represented groups (e.g. at most N docs per
  domain) so one crawl source can't dominate the corpus;
- ``sample_strata`` — per-group Bernoulli sampling by content hash, for
  down-weighting groups proportionally;
- ``upsample_by_weight`` — replicate rows per group weight (epochs per
  source), fractional weights resolved by content hash.

Everything is hash-deterministic (md5 of the id, compared as hex strings —
the same idiom as ``pipeline.split_by_hash``): stable under re-runs,
repartitioning, and incremental appends, and reproducible in any engine
with md5 — which is what makes these oracle-testable and, more
importantly, what makes a 100 TB pipeline re-runnable without corpus
drift.  No UDFs anywhere: every op is pure JVM expressions.
"""

from __future__ import annotations

from ..core import TidyFrame

__all__ = [
    "cap_per_key",
    "sample_strata",
    "upsample_by_weight",
    "deterministic_shuffle",
    "curriculum_order",
    "importance_sample",
    "take_token_budget",
]


def _sql_str(v) -> str:
    """A VALUE as a safe SQL string literal.  Mixture keys reach these
    CASE expressions from two directions — caller dicts AND data-derived
    distinct values (``temperature_mix`` feeds corpus ``source`` strings
    straight in) — so quoting is a correctness/injection boundary, not a
    formality: an unescaped quote in crawl metadata would break parsing
    or silently change which rows replicate."""
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _hash_u32(id_col: str, salt: str) -> str:
    """First 8 hex chars of md5(id||salt) — a uniform 32-bit draw as a hex
    string; comparisons stay string-vs-string (portable, no bigint casts)."""
    return f"substring(md5(concat(CAST({id_col} AS STRING), '{salt}')), 1, 8)"


def deterministic_shuffle(
    tf: TidyFrame,
    id_col: str,
    seed: str = "",
    key_col: str = "shuffle_key",
) -> TidyFrame:
    """Reproducible global shuffle for training-epoch ordering: sort by
    md5(id||seed).  Different ``seed`` values give independent orders;
    the order is stable under re-runs, appends, and repartitioning (an
    ``orderBy(rand())`` shuffle is none of those).  The hash key column
    is kept (``key_col``) so shards written downstream carry their sort
    proof.

    Scale shape: one range-partitioned global sort — the same cost as any
    total ordering; no single-partition window or driver collect.
    """
    from pyspark.sql import functions as F

    df = tf.df.withColumn(key_col, F.expr(_hash_u32(id_col, seed)))
    return TidyFrame(df.orderBy(key_col, id_col))


def curriculum_order(
    tf: TidyFrame,
    score_col: str,
    id_col: str,
    n_stages: int = 4,
    ascending: bool = True,
    seed: str = "",
    stage_col: str = "stage",
    key_col: str = "shuffle_key",
    approx: bool | int = False,
) -> TidyFrame:
    """Curriculum training order: bucket the corpus into ``n_stages``
    difficulty stages by EXACT score quantiles, then shuffle
    deterministically within each stage — easy examples first
    (``ascending=True``: low scores → stage 0), hard later, with the
    within-stage order as reproducible as :func:`deterministic_shuffle`
    (same md5(id||seed) key; a new ``seed`` reshuffles within stages
    without moving anything across stages).

    Scale shape: the n-1 cut points come from ONE ``percentile``
    aggregation attached as a lazy 1-row broadcast — NOT a global
    ``ntile`` window, which would funnel the whole corpus through a
    single-task sort.  Stage assignment is a pure JVM fold over the
    broadcast cut array (ties at a cut go to the lower stage); the final
    ordering is one range-partitioned sort on (stage, hash, id).  NULL
    scores compare false against every cut and land in the first stage
    emitted.
    """
    from pyspark.sql import functions as F

    if n_stages < 2:
        raise ValueError(f"n_stages must be >= 2, got {n_stages}")
    fracs = ", ".join(f"{i / n_stages}D" for i in range(1, n_stages))
    # approx=True (or an int accuracy): percentile_approx's bounded-memory
    # sketch instead of the exact value-buffering aggregate — the 100 TB
    # setting (stage boundaries shift by the sketch's rank error; oracle
    # rows keep exact mode)
    acc = 10000 if approx is True else int(approx) if approx else 0
    pct = (
        f"percentile_approx({score_col}, array({fracs}), {acc})" if acc
        else f"percentile({score_col}, array({fracs}))"
    )
    cuts = tf.summarize(__cuts=pct)
    rank = f"aggregate(__cuts, 0, (acc, c) -> acc + IF({score_col} > c, 1, 0))"
    if not ascending:
        rank = f"{n_stages - 1} - ({rank})"
    df = (
        tf.with_scalar(__cuts=cuts)
        .df.withColumn(stage_col, F.expr(rank))
        .drop("__cuts")
        .withColumn(key_col, F.expr(_hash_u32(id_col, seed)))
    )
    return TidyFrame(df.orderBy(stage_col, key_col, id_col))


def cap_per_key(
    tf: TidyFrame,
    key: str,
    n: int,
    id_col: str,
    keep_col: str | None = None,
) -> TidyFrame:
    """Keep at most ``n`` rows per ``key`` group (domain caps: stop one
    source from dominating the mix).  Which rows survive is deterministic —
    groups rank by md5(id), a stable pseudo-random order uncorrelated with
    any data attribute, so the cap is an unbiased sample of the group.

    Scale shape: one hash-partitioned window (row_number, no full sort of
    anything but each group).  Heavily skewed keys (one giant domain) are
    exactly the rows this op deletes, and AQE's skew-split handles the
    sort; for pathological cases pre-filter with an aggregate count first.
    ``keep_col``: if given, add a boolean instead of filtering (useful for
    audit passes).
    """
    if n < 1:
        raise ValueError(f"cap must be >= 1, got {n}")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key).orderBy(
        F.expr(_hash_u32(id_col, "")), F.col(id_col)
    )
    out = TidyFrame(tf.df.withColumn("__rn", F.row_number().over(w)))
    if keep_col:
        return out.mutate(**{keep_col: f"__rn <= {n}"}).select("!__rn")
    return out.filter(f"__rn <= {n}").select("!__rn")


def sample_strata(
    tf: TidyFrame,
    key: str,
    fracs: dict[str, float],
    id_col: str,
    default_frac: float = 1.0,
    salt: str = "",
) -> TidyFrame:
    """Per-group Bernoulli sampling: keep a row when its 32-bit content
    hash falls under its group's fraction threshold.  ``fracs`` maps key
    values to keep-fractions; unlisted groups use ``default_frac``.

    Unlike ``df.sampleBy`` (seeded RNG over the partition iterator — the
    kept set changes when partitioning changes), the hash rule gives every
    row a permanent verdict: appends and re-runs never reshuffle the
    sample.  Zero shuffles — the filter fuses into the scan.
    """
    for k, f in {**fracs, None: default_frac}.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {f}")
    u = _hash_u32(id_col, salt)
    branches = " ".join(
        f"WHEN {key} = {_sql_str(k)} THEN "
        f"'{format(int(f * 0xFFFFFFFF), '08x')}'"
        for k, f in fracs.items()
    )
    thr = (
        f"CASE {branches} ELSE '{format(int(default_frac * 0xFFFFFFFF), '08x')}' END"
    )
    return tf.filter(f"{u} < {thr}")


def upsample_by_weight(
    tf: TidyFrame,
    key: str,
    weights: dict[str, float],
    id_col: str,
    copy_col: str = "copy_n",
    default_weight: float = 1.0,
    salt: str = "upsample",
) -> TidyFrame:
    """Replicate rows per group weight — "epochs per source" corpus mixing
    (e.g. wiki×3.5, web×1).  Integer part duplicates every row; the
    fractional part keeps one extra copy for the hash-chosen fraction of
    rows.  ``copy_col`` numbers the copies (0-based) so downstream shuffles
    can decorrelate them.

    Scale shape: a JVM ``explode(sequence(...))`` — map-side row
    generation, no shuffle, no UDF.  Weight 0 drops the group.
    """
    for k, w in {**weights, None: default_weight}.items():
        if w is None or w < 0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {w}")
    u = _hash_u32(id_col, salt)

    def n_copies(w: float) -> str:
        whole, frac = int(w), w - int(w)
        if frac == 0.0:
            return str(whole)
        thr = format(int(frac * 0xFFFFFFFF), "08x")
        return f"{whole} + if_else({u} < '{thr}', 1, 0)"

    branches = " ".join(
        f"WHEN {key} = {_sql_str(k)} THEN {n_copies(w)}"
        for k, w in weights.items()
    )
    n_expr = f"CASE {branches} ELSE {n_copies(default_weight)} END"
    # sequence(1, 0) is DESCENDING [1, 0] in Spark — guard n = 0 before
    # building the per-row copy array
    out = tf.mutate(__n=n_expr).filter("__n > 0")
    return (
        out.mutate(**{copy_col: f"explode(sequence(0, __n - 1))"})
        .select("!__n")
    )


def temperature_mix(
    tf: TidyFrame,
    key: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.7,
    target_total: int | None = None,
    copy_col: str = "copy_n",
    salt: str = "tmix",
    max_keys: int = 10_000,
) -> TidyFrame:
    """Temperature-based source rebalancing — the multilingual-corpus
    recipe (mT5 / XLM-R / CCNet): source ``s`` with ``n_s`` rows gets an
    expected output share of ``n_s^alpha / Σ n^alpha``.  ``alpha = 1``
    keeps natural proportions; ``alpha = 0`` equalizes sources;
    in-between damps the head and amplifies the tail.

    The per-row replication factor ``f_s = target · p_s / n_s`` feeds
    :func:`upsample_by_weight` — so thinning (``f < 1``) and replication
    (``f > 1``) are both the documented md5-deterministic rules: stable
    under re-runs, appends, and repartitioning, never a ``rand()``.

    Scale shape: ONE tiny per-source count aggregation (collected —
    bounded by the number of sources, capped at ``max_keys``), then a
    map-side CASE + ``explode(sequence(...))`` — no shuffle of the
    corpus, no UDF.  ``target_total`` defaults to the input size (pure
    rebalancing)."""
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    cnt_df = tf.df.groupBy(key).count().limit(max_keys + 1).collect()
    if len(cnt_df) > max_keys:
        raise ValueError(
            f"temperature_mix saw > {max_keys} distinct {key!r} values; "
            "mixture keys are sources/domains, not ids — aggregate first "
            "or raise max_keys"
        )
    counts = {r[0]: int(r[1]) for r in cnt_df}
    if None in counts:
        raise ValueError(f"{key!r} has NULL values; fill or filter them first")
    if not counts:
        return tf.mutate(**{copy_col: "CAST(0 AS INT)"}).filter("1 = 0")
    total = sum(counts.values())
    target = int(target_total) if target_total is not None else total
    # deterministic float evaluation order (sorted keys) so the embedded
    # CASE thresholds are identical run-to-run
    z = sum(n ** alpha for _, n in sorted(counts.items()))
    weights = {
        k: (target * (n ** alpha) / z) / n for k, n in sorted(counts.items())
    }
    return upsample_by_weight(
        tf, key, weights, id_col, copy_col=copy_col, default_weight=0.0,
        salt=salt,
    )


def importance_sample(
    tf: TidyFrame,
    weight_col: str,
    target_frac: float,
    id_col: str,
    out: str = "sampled",
    salt: str = "",
) -> TidyFrame:
    """Deterministic IMPORTANCE sampling: keep row *i* with probability
    ``p_i = min(1, target_frac * w_i / mean(w))`` — the DSIR-style
    quality-weighted downsampling move (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"; public method): keep
    ~``target_frac`` of the corpus, high-weight documents
    proportionally more often.

    The accept decision is the house hash rule — md5(id||salt) as a
    32-bit hex draw compared against the per-row threshold
    ``hex(p_i * (2^32-1))`` — so the sample is stable under re-runs,
    repartitions, and appends, reproducible in any md5 engine, and a new
    ``salt`` draws an independent sample.  NULL/negative weights count
    as 0 (never kept).  Rows at the ``p=1`` cap are kept modulo the
    2^-32 top-of-range edge shared with ``split_by_hash``; when many
    rows cap, realized fraction drops below ``target_frac`` (the mass
    has nowhere to go) — exactly the standard algorithm's behavior.

    Scale shape: mean weight attaches as a lazy 1-row broadcast
    (:meth:`TidyFrame.with_scalar`) and everything else is scan-fused
    JVM expressions — one aggregation job, zero shuffles of the corpus.
    Adds boolean ``out``; filter it to materialize the sample.
    """
    from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

    if not (0.0 < target_frac <= 1.0):
        raise ValueError(f"target_frac must be in (0, 1], got {target_frac}")
    w = f"greatest(0.0D, coalesce(CAST({weight_col} AS DOUBLE), 0.0D))"
    # decimal-summed mean (the repo's bit-stability pattern): a plain
    # avg() sums doubles in partition order, and a 1-ulp drift flips the
    # verdict of threshold-adjacent rows across engines/runs
    mw = tf.summarize(
        __mw=f"CAST(sum(CAST({w} AS DECIMAL(28,10))) AS DOUBLE) / count(*)"
    )
    p = f"least(1.0D, {target_frac}D * {w} / __mw)"
    # explicit floor: Spark's double->bigint CAST truncates but DuckDB's
    # rounds, so the cast alone is not engine-portable
    thr = f"lpad(lower(hex(CAST(floor({p} * 4294967295.0D) AS BIGINT))), 8, '0')"
    flagged = tf.with_scalar(__mw=mw).mutate(
        **{out: f"{_hash_u32(id_col, salt)} < {thr}"}
    )
    return flagged.select("!__mw")


def take_token_budget(
    tf,
    budget: int,
    tokens: str = "n_tokens",
    order_by=(),
    into: str = "cum_tokens",
):
    """Fill a training-token budget greedily by priority: keep each
    document whose INCLUSIVE running token total, in ``order_by`` order,
    is ≤ ``budget`` — SQL's ``SUM(tokens) OVER (ORDER BY ...) <= budget``.

    That window, written naively, is the same 100 TB trap as global
    ``row_number()``: no PARTITION BY → Catalyst plans a single-partition
    window and the whole corpus funnels through one task.  This uses the
    :mod:`..operators.rowindex` two-pass shape instead: range-partition +
    local sort by the priority keys (the one shuffle any global order
    costs), per-partition token sums prefix-summed on the driver
    (``n_partitions`` longs), then a local Arrow cumsum + filter — full
    parallelism, no second shuffle.

    ``order_by``: priority columns, ``"-col"`` for descending (highest
    quality first).  Include a unique tie-break key (e.g. ``doc_id``) —
    ties are otherwise kept in an arbitrary engine order, which is
    correctness-relevant exactly at the budget boundary.  ``tokens`` may
    be any SQL expression.  The kept rows carry ``into`` = their
    inclusive cumulative total (useful for auditing the cut).
    """
    from pyspark.sql import functions as F, types as T

    from ..cache import track
    from ..core import TidyFrame

    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    if not keys:
        raise ValueError("take_token_budget needs order_by priority keys")
    cols = [
        F.col(k[1:]).desc() if k.startswith("-") else F.col(k).asc() for k in keys
    ]

    sdf = tf.df.withColumn("__tb_n", F.expr(f"CAST(({tokens}) AS BIGINT)"))
    sdf = sdf.repartitionByRange(*cols).sortWithinPartitions(*cols)
    # pin the layout: the sum pass and the cumsum pass must see identical
    # partitions (AQE may otherwise re-plan between jobs)
    pinned = track(sdf.withColumn("__tb_pid", F.spark_partition_id()))
    sums = {
        r["__tb_pid"]: r["s"]
        for r in pinned.groupBy("__tb_pid").agg(F.sum("__tb_n").alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0

    out_schema = T.StructType(
        [f for f in pinned.schema.fields if f.name != "__tb_pid"]
        + [T.StructField(into, T.LongType())]
    )
    names = [f.name for f in out_schema.fields]

    def cut(batches):
        import pandas as pd  # noqa: F401

        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__tb_pid"].iloc[0])]
            if base >= budget:  # whole partition past the cut: emit nothing
                return
            cum = base + seen + pdf["__tb_n"].cumsum()
            seen += int(pdf["__tb_n"].sum())
            pdf[into] = cum.astype("int64")
            kept = pdf[cum <= budget]
            if len(kept):
                yield kept[names]
            if seen + base > budget:
                return

    out = pinned.mapInPandas(cut, schema=out_schema).drop("__tb_n")
    return TidyFrame(out, groups=getattr(tf, "groups", None))
