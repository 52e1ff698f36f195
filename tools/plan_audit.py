"""Physical-plan audit: assert the plans we ship are the plans we want.

    python tools/plan_audit.py [sf_dir]

Checks, over the driver testdata:
  - scan_filter: predicate + projection reach the parquet scan
    (PushedFilters non-empty, ReadSchema pruned to the selected columns)
  - join_broadcast: small dim joins as BroadcastHashJoin (no SMJ shuffle)
  - KG pipeline: no CartesianProduct/BroadcastNestedLoopJoin anywhere in
    the triple-construction plan; the events scan is read once per branch
    from the InMemoryRelation (cache), not re-derived
  - corpus text ops: single-stage WholeStageCodegen (no row-at-a-time
    python in the hot path)
Exits non-zero listing any violated invariant.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from git_prov_spark.pipeline.build import build_triples  # noqa: E402
from git_prov_spark.session import get_spark  # noqa: E402

FAIL: list[str] = []


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def check(name: str, ok: bool, detail: str = "") -> None:
    print(("OK  " if ok else "FAIL") + f" {name}" + (f": {detail}" if detail else ""))
    if not ok:
        FAIL.append(name)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit", cores=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries()

    # -- pushdown & pruning ------------------------------------------------
    p = formatted(qs["scan_filter"](spark, sf_dir))
    check("scan_filter pushes predicate",
          "PushedFilters: [" in p and "PushedFilters: []" not in p)
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    check("scan_filter prunes columns",
          bool(rs) and "l_comment" not in rs[0],
          rs[0].strip()[:120] if rs else "no ReadSchema")

    # -- broadcast joins ---------------------------------------------------
    p = plan_of(qs["join_broadcast"](spark, sf_dir))
    check("join_broadcast uses BroadcastHashJoin",
          "BroadcastHashJoin" in p and "SortMergeJoin" not in p)

    # -- KG pipeline plan hygiene -----------------------------------------
    # replicate=1: no crossJoin replicator in the adapter — the audit is of
    # the PIPELINE's joins (with replicate>1 the adapter's deliberate
    # broadcast-range fan-out shows up as BNLJ in every scan branch)
    files, commits, contributors = entry._docs_as_repo_tables(
        spark, sf_dir, replicate=1
    )
    triples = build_triples(files, commits, contributors)
    p = plan_of(triples)
    check("kg plan has no cartesian product", "CartesianProduct" not in p)
    check("kg plan joins are hash/broadcast",
          p.count("BroadcastNestedLoopJoin") == 0,
          f"BNLJ x{p.count('BroadcastNestedLoopJoin')}")
    check("kg plan reuses the events cache", "InMemoryTableScan" in p)
    # under AQE the unexecuted plan shows no codegen spans (isFinalPlan=
    # false); toggle AQE off just to render the static physical plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t2 = build_triples(files, commits, contributors,
                           persist_events=False)
        ps = t2._sc._jvm.PythonSQLUtils.explainString(
            t2._jdf.queryExecution(), "simple"
        )
        # simple mode prints codegen'd operators as "*(id) Node"
        n_codegen = ps.count("*(")
        n_nodes = sum(1 for ln in ps.splitlines() if "- " in ln)
        check("kg plan stays in codegen",
              n_codegen >= 10,
              f"{n_codegen} codegen ops / ~{n_nodes} plan nodes")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    # -- corpus hot paths are JVM-side ------------------------------------
    for q in ("text_quality", "text_tokens", "dedup_exact"):
        p = plan_of(qs[q](spark, sf_dir))
        check(f"{q} has no python row UDF",
              "BatchEvalPython" not in p and "PythonUDF" not in p)

    # -- no partition-less windows anywhere (the single-task scale-killer) --
    # A Window over an un-partitioned spec plans as Exchange SinglePartition
    # -> every row through ONE task. Queries that rank within a key partition
    # (query_id, user_id, ...) never produce that exchange.
    #
    # -- and no cartesian/nested-loop joins outside DECLARED exceptions:
    # the brute-force correctness baselines (quadratic by design; their
    # scale twins are the LSH/IVF variants, which must stay equi-join-only)
    # and the IVF quantizer's K-row broadcast fan-out (cost K*N, linear).
    NONEQUI_DECLARED = {
        "dedup_embedding_cosine": "quadratic baseline (scale twin: minhash/simhash LSH)",
        "ann_topk": "brute-force baseline (scale twin: ann_topk_lsh/multiprobe)",
        "ann_topk_pandas": "brute-force baseline (mapInPandas matmul)",
        "ann_topk_ivf": "trained K(√N)-centroid broadcast fan-out — linear K*N, candidate search itself is an equi-join on capped cluster lists",
        "dedup_semantic": "same trained-centroid broadcast fan-out as ann_topk_ivf (linear K*N assignment); the epsilon-ball prune itself is an equi-join on capped cluster lists",
        "corpus_dsir": "1-row scalar broadcast (max log-weight) — Spark's own scalar-subquery shape, cost O(N); every data-bearing join is an equi-join",
        "text_tfidf": "1-row scalar broadcast (corpus doc count) joined onto narrow (doc, token) rows — linear",
        "text_surprisal": "1-row scalar broadcast (total token count) onto the vocabulary — linear; the bucket rank is the range-partitioned global_row_number, never a single-partition window",
        "sketch_hll_estimate": "1-row sketch readout crossJoined with the 1-row exact count — two single-row sides, cost O(1)",
        "graph_triangles": "1-row scalar broadcast (global triangle count) onto per-vertex counts — linear; triangle enumeration itself is two equi-joins on the oriented edge list",
        "text_pmi": "1-row scalar broadcast (total bigram count N) onto the vocabulary-sized pair table — linear; margins join as equi-joins on the word keys",
        "text_surprisal_lm": "1-row scalar broadcast (train token total T) onto per-transition rows — linear; the LM lookups are equi-joins on pair/word keys",
        "embed_centroid_sim": "label-centroid pair matrix (l1 < l2) — labels^2 rows, dashboard-sized by definition; the data-bearing centroid aggregation is a plain hash-aggregate",
        "text_bm25": "1-row scalar broadcast (corpus N docs / S tokens) onto the query-filtered (doc, term) rows — linear; tf/df are hash-aggregates",
        "kg_rdfs_closure": "1-row schema-repo broadcast tagging the closed-schema pairs — the instance-side rules are all broadcast EQUI-joins",
        "kg_rdfs_delta": "same 1-row schema-repo broadcast (closure applied to the delta); the store subtraction is an equi anti-join",
        "kg_negative_samples": "1-row scalar broadcast (entity count) onto positives — linear; the draw joins entities by the computed dense index, an equi-join",
    }
    # Queries whose returned DataFrame is driver-materialized during
    # construction (streaming folds, iterative closures ending in a
    # createDataFrame/localCheckpoint): auditing that final plan would run
    # the whole job to inspect a LocalRelation on which every check is
    # vacuous. Their INTERNAL plans are covered by the targeted sections
    # above and their pytest suites.
    MATERIALIZED_SKIP = {
        "kg_streaming_build": "foreachBatch fold; internal plans audited via kg_build_triples",
        "sort_commits": "range-partitioned sequence materializes offsets; its window is partitioned by construction (operators.global_row_number)",
        "dedup_near_groups": "iterative components localCheckpoint; pair-generation plan audited via dedup_minhash_lsh",
        "corpus_manifest": "near gate runs components (as above); gate joins are plain equi-joins",
        "corpus_manifest_incr": "probes the LSH index (equi-joins); shares gates with corpus_manifest",
        "sparql_path": "closure iterations localCheckpoint; per-round plan is one self-equi-join",
        "corpus_stream_dedup": "availableNow streaming drain materializes verdicts; the stateful plan (groupBy sha -> applyInPandasWithState) is fixed by construction and covered by tests/test_stateful_dedup.py",
    }
    for q, fn in qs.items():
        if q in MATERIALIZED_SKIP:
            print(f"SKIP {q}: {MATERIALIZED_SKIP[q]}")
            continue
        p = plan_of(fn(spark, sf_dir))
        if "Window" in p:
            check(f"{q} has no global (single-partition) window",
                  "Exchange SinglePartition" not in p)
        if q not in NONEQUI_DECLARED:
            check(f"{q} has no cartesian/nested-loop join",
                  "CartesianProduct" not in p
                  and "BroadcastNestedLoopJoin" not in p)

    print()
    if FAIL:
        print("VIOLATIONS:", FAIL)
        sys.exit(1)
    print("all plan invariants hold")


if __name__ == "__main__":
    main()
