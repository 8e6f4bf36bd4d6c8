#!/usr/bin/env python
"""sf1 correctness evidence: hash-match representative queries against the
DuckDB oracle on the locally-generated sf1 data (tools/gen_sf.py), plus
ground-truth recall checks for the dedup family whose SQL oracles are
quadratic all-pairs joins (infeasible at 50k docs = 2.5B candidate pairs).

Two evidence classes:

1. ORACLE rows — the same queries()/oracle_sql() contract the driver runs
   at sf0.01, re-run at sf1: row count + sorted-canonical cell compare.
   Quadratic-oracle queries (d35/d36/d37/d98/t96/d86/d88, embedding
   all-pairs) are excluded here and covered by class 2.

2. PLANTED ground truth — gen_sf.py plants 100 exact-dup and 1000
   near-dup (~3% token perturbation) document pairs and records them in
   _planted_dups.json.  This is STRONGER than the sf0.01 SQL oracle for
   dedup: known-answer recall, not just self-consistency.
     - d35_minhash_pairs: must find 100% of planted exact pairs
       (identical signatures -> identical buckets, deterministic), and
       >=95% of planted near pairs whose true 2-token-shingle Jaccard
       clears the 0.8 threshold (banding recall); plus precision spot
       check (returned jaccard values are exact by verify="exact").
     - t96_leakage_split: planted exact pairs sharing a lang (the
       blocking key) must land in the same cluster AND the same split —
       the no-leakage contract.

Writes SF1_CORRECTNESS.json.  Usage: python tools/verify_sf1.py  (~6 min)

Also parameterized for other locally-generated scale factors:
  python tools/verify_sf1.py --sf-dir testdata_sf10 --sf 10 \
      --out SF10_CORRECTNESS.json --queries q01_tpch_q1,... --t96-pairs lsh
`--t96-pairs lsh` runs the no-leakage ground-truth check over the
minhash-LSH pair source (the corpus-scale configuration — the exact
n-gram source is all-pairs on this vocabulary at 500k docs, see
BENCH_SCALING.md); the planted-pair contract checked is identical.

Big-SF digest rows (closing the former q12/q13 sf10 exclusions):
- q12d_asof_digest — the q12 as-of join with the PROBE side cut to a
  deterministic md5 1/256 key sample (as-of is per-probe-row, so the
  kept rows' matches are unchanged).  Bounds DuckDB's ASOF (its 15M x
  10M run at sf10 was >17 min and did not honor interrupt()) AND the
  driver compare.
- q13d_windows_digest — the q13s dual-window suite computed over ALL
  rows in both engines, then the same md5 1/256 l_orderkey slice kept,
  so the ~60M-row sf10 result compares as ~230k rows instead of
  blowing spark.driver.maxResultSize.
The full-result q12/q13 rows remain oracle-checked at sf0.01/sf1 where
the compare is feasible.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from helpers import canonical_rows  # noqa: E402

SF1 = os.path.join(REPO, "testdata_sf1")

# Representative oracle-feasible set: one per plan family.  Excluded on
# purpose: quadratic-oracle dedup (class-2 evidence instead), and raw
# top-k rows (invariant-backed via s39_ann_suite).
ORACLE_QUERIES = [
    "q01_tpch_q1",          # scan-agg
    "q55_tpch_q3",          # 3-way join + topk
    "q56_tpch_q5",          # 6-way join
    "q57_tpch_q10",         # join + group
    "q62_tpch_q6",          # selective scan
    "q63_tpch_q4",          # semi-join
    "q72_tpch_q13",         # outer join + histogram
    "q75_tpch_q18",         # having-in subquery
    "q76_tpch_q22",         # anti-join + scalar subquery
    "q12_asof_join",        # as-of
    "q13_windows",          # window functions
    "q12d_asof_digest",     # as-of md5-sample digest (the sf10 row)
    "q13d_windows_digest",  # dual-window md5-sample digest (the sf10 row)
    "q16_slice_suite",      # WindowGroupLimit
    "q22_pivot_roundtrip",  # reshape
    "q45_grouping_suite",   # rollup/cube
    "q97_row_index",        # distributed row index
    "t52_clean_corpus",     # C4-style cleaning
    "d34_dedup_exact",      # exact dedup
    "t68_segment_dedup",    # inverted-index segment dedup
    "t86_lm_perplexity",    # bigram LM train+score
    "t94_trigram_lm",       # trigram LM
    "t85_tfidf",            # sparse TF-IDF
    "e53_time_rollup",      # time-bucket rollup
    "e56_equi_depth",       # equi-depth histogram
    "e77_gapfill",          # gap-fill
    "e81_json_props",       # JSON extraction
    "s38_cosine_topk",      # brute-force ANN baseline
    "s39_ann_suite",        # LSH/IVF/PQ + persistent-index recall (r8)
    "s44_knn_join",         # large-vs-large kNN join, full-probe exact (r8)
    "s42_hard_negatives",   # DPR-style mining
    "t66_importance_sample",# DSIR
    "t67_pack_ffd",         # FFD packing
    "d61_training_prep_e2e",# end-to-end corpus prep
    "t74_token_budget",     # scale-safe global-cumsum budget cut (r6)
    "t75_main_content",     # boilerplate removal, dual-dialect expr (r6)
    "w50_warc_ingest",      # WARC/WARC.GZ roundtrip (r6)
    "m43_r6_ops_suite",     # round-6 ops union + web-pipeline e2e (r7)
    "d45_dedup_state",      # persistent bloom-gated dedup state (r8)
    "t98_heavy_hitters",    # two-pass Misra-Gries, exact answer (r8)
    "t77_temperature_mix",  # n^alpha source rebalancing (r8)
    "d48_corpus_prep_state",# incremental corpus-prep composition (r8)
    "d49_corpus_stats_state",# persistent corpus-stats exact report (r9)
    "w53_delta_roundtrip",  # jar-free Delta log replay (r9)
    "w54_iceberg_roundtrip",# jar-free Iceberg metadata traversal (r9)
    "w55_delta_dv_roundtrip",   # Delta deletion vectors (r10)
    "w56_iceberg_posdelete",    # Iceberg v2 position deletes (r10)
    "w57_iceberg_v3_deletes",   # Iceberg v3 DVs + equality deletes (r10)
    "w58_iceberg_resolution",   # field-id renames/defaults/null-fill (r11)
    "w59_delta_write_roundtrip",  # jar-free Delta writer (r11)
    "w60_stream_delta_sink",    # exactly-once streaming Delta sink (r11)
    "w61_delta_row_ops",        # copy-on-write DELETE + MERGE (r11)
    "w62_delta_lifecycle",      # optimize+checkpoint+vacuum cycle (r11)
    "w63_iceberg_write_roundtrip",  # jar-free Iceberg writer (r11)
    "w64_delta_dv_rowops",      # CoW DELETE/MERGE materializing DVs (r12)
    "w65_iceberg_partitioned_write",  # identity-partitioned writes (r12)
    "w66_delta_mapped_writes",  # column-mapped writes + row ops (r12)
    "w67_delta_cdf",            # Change Data Feed read + cdc emission (r12)
    "w68_iceberg_row_ops",      # Iceberg CoW delete/merge/compact/rollback (r12)
    "w69_delta_restore",        # RESTORE TO VERSION AS OF (r12)
    "w70_delta_stream_source",  # Delta streaming source, version offsets (r12)
    "w71_iceberg_stream_source",  # Iceberg streaming source, seq offsets (r12)
    "w72_iceberg_nested_write",  # array<float>/struct writes + row ops (r12)
    "w73_delta_mor_delete",     # merge-on-read deletes via DVs (r12)
    "w74_iceberg_mor_delete",   # Iceberg MOR position deletes (r12)
    "w75_row_updates",          # UPDATE SET on both formats (r12)
    "w76_dynamic_overwrite",    # dynamic partition overwrite (r12)
]


def _shingles(text: str) -> set:
    toks = text.lower().strip().split()
    if len(toks) < 3:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}


def _true_jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def main() -> None:
    import argparse

    from tidierdb_jl_spark import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF1)
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="SF1_CORRECTNESS.json")
    ap.add_argument("--queries", default=None,
                    help="comma list; default = the representative set")
    ap.add_argument("--t96-pairs", choices=("exact", "lsh"), default="exact")
    ap.add_argument("--oracle-budget", type=int, default=420,
                    help="seconds before a DuckDB oracle is interrupted "
                         "(raise for big SFs: Spark distributes, the "
                         "oracle is one process)")
    args = ap.parse_args()
    sf_dir = os.path.abspath(args.sf_dir)
    queries = args.queries.split(",") if args.queries else ORACLE_QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app="tidierdb-sf1", cpus=cpus, shuffle_partitions=int(cpus))
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    out_path = os.path.join(REPO, args.out)
    # a targeted --queries run MERGES into the existing artifact (its
    # other rows stay), so a single-row re-check never erases the full
    # evidence; full runs still rewrite everything they re-measure
    prior: dict[str, dict] = {}
    if args.queries and os.path.exists(out_path):
        with open(out_path) as fh:
            prior = json.load(fh).get("results", {})

    def checkpoint():
        merged = {**prior, **results}
        n_ok = sum(1 for r in merged.values()
                   if r.get("hash_match") or r.get("pass"))
        with open(out_path, "w") as fh:
            json.dump({"sf": args.sf, "sf_dir": sf_dir, "n_checks": len(merged),
                       "n_ok": n_ok, "results": merged}, fh, indent=1)
        from _evidence import stage

        stage(out_path)
        return n_ok

    def oracle_with_watchdog(sql, budget_s=None):
        """DuckDB has no statement timeout; interrupt() from a watchdog
        thread bounds a pathological oracle so one query can't eat the
        whole run."""
        import threading

        budget_s = budget_s or args.oracle_budget

        done = threading.Event()

        def watchdog():
            if not done.wait(budget_s):
                con.interrupt()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        try:
            return con.execute(sql).fetchdf()
        finally:
            done.set()

    for name in queries:
        t0 = time.perf_counter()
        try:
            ours = qs[name](spark, sf_dir).toPandas()
            t_spark = time.perf_counter() - t0
            print(f"... {name}: spark {t_spark:.1f}s, oracle running",
                  file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            oracle = oracle_with_watchdog(osql[name])
            t_ddb = time.perf_counter() - t0
            ocols, orows = canonical_rows(ours)
            dcols, drows = canonical_rows(oracle)
            results[name] = {
                "rows_match": len(orows) == len(drows),
                "schema_match": ocols == dcols,
                "hash_match": orows == drows,
                "spark_rows": len(orows),
                "oracle_rows": len(drows),
                "spark_sec": round(t_spark, 2),
                "duckdb_sec": round(t_ddb, 2),
                "err": None,
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"{type(e).__name__}: {e}"[:300]}
        r = results[name]
        status = "OK" if r.get("hash_match") else "FAIL"
        print(f"{status} {name}: {json.dumps(r)}", file=sys.stderr, flush=True)
        checkpoint()

    # ---- class 2: planted ground truth ------------------------------
    with open(os.path.join(sf_dir, "_planted_dups.json")) as fh:
        planted = json.load(fh)
    docs = {
        int(r[0]): (r[1], r[2])
        for r in con.execute(
            "SELECT doc_id, text, lang FROM documents WHERE doc_id IN ("
            + ",".join(str(i) for pair in planted["exact"] + planted["near"] for i in pair)
            + ")").fetchall()
    }

    t0 = time.perf_counter()
    found = {
        (min(a, b), max(a, b))
        for a, b in qs["d35_minhash_pairs"](spark, sf_dir)
        .select("id_a", "id_b").toPandas().itertuples(index=False, name=None)
    }
    t_d35 = time.perf_counter() - t0
    exact_pairs = [tuple(sorted(p)) for p in planted["exact"]]
    exact_found = sum(1 for p in exact_pairs if tuple(p) in found)
    eligible_near = [
        tuple(sorted(p)) for p in planted["near"]
        if _true_jaccard(docs[p[0]][0], docs[p[1]][0]) >= 0.85
    ]
    near_found = sum(1 for p in eligible_near if tuple(p) in found)
    near_recall = near_found / max(1, len(eligible_near))
    results["d35_planted_recall"] = {
        "exact_planted": len(exact_pairs), "exact_found": exact_found,
        "near_eligible_j085": len(eligible_near), "near_found": near_found,
        "near_recall": round(near_recall, 4),
        "pairs_returned": len(found),
        "spark_sec": round(t_d35, 2),
        "pass": exact_found == len(exact_pairs) and near_recall >= 0.95,
    }
    print(f"d35_planted_recall: {json.dumps(results['d35_planted_recall'])}",
          file=sys.stderr, flush=True)
    checkpoint()

    t0 = time.perf_counter()
    if args.t96_pairs == "exact":
        split_pdf = qs["t96_leakage_split"](spark, sf_dir).toPandas()
        # exact pairs are lang-blocked, so only same-lang planted pairs
        # are guaranteed clustered
        checked_pairs = [p for p in exact_pairs
                         if docs[p[0]][1] == docs[p[1]][1]]
    else:
        # corpus-scale configuration: split over minhash-LSH pairs
        # (unblocked — identical texts pair regardless of lang, so EVERY
        # planted exact pair must land in one cluster and one split)
        from tidierdb_jl_spark.llm.dedup import minhash_dedup_pairs
        from tidierdb_jl_spark.llm.pipeline import leakage_safe_split
        from tidierdb_jl_spark.sources.readers import db_table

        docs_tf = db_table(spark, os.path.join(sf_dir, "documents.parquet"))
        lsh_pairs = minhash_dedup_pairs(docs_tf, "doc_id", "text", threshold=0.8)
        split_pdf = (
            leakage_safe_split(docs_tf, lsh_pairs, "doc_id", train_frac=0.8)
            .select("doc_id", "cluster_id", "split").df.toPandas()
        )
        checked_pairs = exact_pairs
    t_t96 = time.perf_counter() - t0
    smap = {int(r.doc_id): (int(r.cluster_id), r.split)
            for r in split_pdf.itertuples(index=False)}
    leaks = [p for p in checked_pairs
             if smap[p[0]][1] != smap[p[1]][1] or smap[p[0]][0] != smap[p[1]][0]]
    results["t96_no_leakage"] = {
        "pair_source": args.t96_pairs,
        "checked_exact_pairs": len(checked_pairs),
        "leaked": len(leaks), "spark_sec": round(t_t96, 2),
        "pass": len(leaks) == 0 and len(checked_pairs) > 0,
    }
    print(f"t96_no_leakage: {json.dumps(results['t96_no_leakage'])}",
          file=sys.stderr, flush=True)

    n_ok = checkpoint()
    n_total = len({**prior, **results})
    print(f"\n{n_ok}/{n_total} checks green -> {args.out}")
    if n_ok != n_total:
        sys.exit(1)


if __name__ == "__main__":
    main()
