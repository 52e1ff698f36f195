"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship metric is the KG-construction pipeline (files/commits/
contributors → PROV triples), reported as wall seconds plus triples/sec;
the rest are the headline operator queries from __spark_entry__.py, each
timed to completion (count() — no driver collect).

Quadratic correctness-baselines (brute-force cosine all-pairs) are
deliberately NOT in the bench set; their scale-path variants (LSH) are.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from git_prov_spark.pipeline.build import build_triples  # noqa: E402
from git_prov_spark.session import get_spark  # noqa: E402

# FROZEN round-2 core set (kg_build_triples + these): core_wall is computed
# over exactly this list every round so round-over-round regression detection
# is mechanical even as the bench set grows. Do not edit; extend
# EXTRA_QUERIES instead.
CORE_QUERIES = [
    "scan_filter",
    "agg_count",
    "join_broadcast",
    "window_lag",
    "dedup_first",
    "agg_collect",
    "union_all",
    "udf_diffstats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_wide",
    "dedup_near_groups",
    "corpus_manifest",
    "corpus_manifest_incr",
    "corpus_chunks",
    "dedup_simhash64",
    "ann_topk_lsh",
    "ann_topk_multiprobe",
    "ann_topk_ivf",
    "ann_topk_pandas",
    "sort_commits",
    "sparql_select",
    "sparql_agg",
    "sparql_construct",
    "sparql_path",
    "text_quality",
    "text_fingerprint",
    "mm_features",
]

# round-3+ additions (seeded/ops property paths, FILTER range/regex,
# BIND/VALUES — the widened SPARQL surface)
EXTRA_QUERIES = [
    "sparql_path_seeded",
    "sparql_path_ops",
    "sparql_filter_range",
    "sparql_regex",
    "sparql_bind_values",
    "sparql_filter_expr",
    "sparql_exists",
    "corpus_decontam",
    "text_pii",
    "sparql_subquery",
    "sparql_group_concat",
    "sparql_arith",
    "sparql_path_in_optional",
    "corpus_mix",
    # round-4 additions: scalar builtins, datetime accessors, path ?/!(),
    # GRAPH ?g, isIRI/isLiteral
    "sparql_funcs",
    "sparql_datetime",
    "sparql_path_optmod",
    "sparql_path_neg",
    "sparql_graph",
    "sparql_termfns",
    # round-4 additions, second batch: numeric/hash/encode builtins,
    # DATATYPE + isNumeric term typing
    "sparql_scalar_math",
    "sparql_datatype",
    # round-4 additions, third batch: SemDeDup-style embedding-cluster dedup,
    # the per-source anti-spam quota cap, and keyed-state streaming dedup
    "dedup_semantic",
    "corpus_quota",
    "corpus_stream_dedup",
    # round-4 additions, fourth batch: SPARQL bag-semantics demos (plain
    # SELECT is one-row-per-solution now; these exercise the multiplicity)
    "sparql_bag_projection",
    "sparql_distinct",
    "sparql_bag_union",
    "sparql_bag_path_seq",
    # round-4 additions, fifth batch: semantic cluster-balanced sampling
    "corpus_cluster_sample",
    # round-4 additions, sixth batch: language/timezone builtin family
    "sparql_lang_tz",
    # round-5 additions: typed literal terms (lang tags + datatypes through
    # solutions), FILTER-in-OPTIONAL left-join conditions, seeded
    # NOW/RAND/UUID, and token-window exact-substring dedup
    "sparql_typed_terms",
    "sparql_typed_group",
    "sparql_typed_inline",
    "sparql_describe_where",
    "sparql_agg_expr",
    "sparql_strlang",
    "sparql_opt_filter",
    "sparql_now_seeded",
    "dedup_substr",
    "dedup_url",
    # round-5 additions, second batch: inline HAVING/ORDER BY aggregates
    "sparql_having_inline",
    "sparql_order_agg",
    "sparql_agg_distinct",
    "sparql_construct_where",
    "corpus_vocab",
    "corpus_shuffle",
    # round-5 additions, third batch: path quantifiers, expression group
    # keys, quality gate, bigram stats, graph analytics, event-time ops
    "sparql_path_range",
    "sparql_group_expr",
    "text_quality_gate",
    "corpus_bigrams",
    "graph_degree",
    "graph_pagerank",
    "events_sessionize",
    "events_asof",
    "events_windowed",
    # round-5 additions, fourth batch: data-selection passes — DSIR
    # importance resampling, integer-quantized TF-IDF keywords,
    # perplexity-proxy surprisal buckets
    "corpus_dsir",
    "text_tfidf",
    "text_surprisal",
    "text_novelty",
    "corpus_semantic_decontam",
    "graph_triangles",
    "corpus_bpe_merges",
    "sketch_hll_estimate",
    "sketch_cms_topk",
    # round-5 additions, fifth batch: the membership/distribution sketches,
    # collocations, blocklist curation, winnowing, the bigram LM scorer,
    # streaming sketch maintenance, k-core/components, interval join
    "sketch_bloom_fpr",
    "sketch_hist_quantiles",
    "text_pmi",
    "corpus_blocklist",
    "text_winnow",
    "corpus_report",
    "text_surprisal_lm",
    "sketch_stream_hll",
    "graph_coreness",
    "graph_components",
    "events_interval",
    "sketch_hll_groups",
    "text_nfc",
    "dedup_containment",
    "events_stream_windowed",
    "events_funnel",
    "events_retention",
    "sketch_hist_groups",
    "graph_ppr",
    "embed_centroids",
    "embed_centroid_sim",
    "corpus_dq",
    "events_funnel_rates",
    "corpus_zorder",
    "events_scd2",
    "events_anomaly",
    "dedup_editdist",
    "corpus_topk_source",
    "events_hopping",
    "events_salted",
    "corpus_ntile",
    # round-5 additions, session-2 batch: KG inference & maintenance
    # (RDFS closure, sameAs rewrite, SHACL, schema summary, NT ingest
    # round trip, store delta), SPARQL UPDATE, BFS levels, BM25, kNN graph
    "kg_rdfs_closure",
    "kg_sameas_rewrite",
    "kg_shacl_report",
    "kg_schema_summary",
    "kg_ntriples_roundtrip",
    "kg_store_delta",
    "sparql_update_modify",
    "sparql_update_delete_where",
    "sparql_update_insert_where",
    "graph_bfs_levels",
    "text_bm25",
    "ann_knn_graph",
    "kg_asof_snapshot",
    "kg_rdfs_delta",
    "dedup_keep_best",
    "kg_streaming_entailed",
    "sparql_entailed",
    "kg_compacted_store",
    "kg_agent_fuzzy_links",
    "kg_negative_samples",
    "corpus_split_leakage",
    "kg_char_sets",
    "corpus_decontam_spans",
    "corpus_bpe_encode",
    "sparql_update_graph_copy",
    "kg_star_estimate",
    "kg_blame",
]

BENCH_QUERIES = CORE_QUERIES + EXTRA_QUERIES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(
        "bench", cores=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    qs = entry.queries()
    timings: dict[str, float] = {}

    # flagship: full KG construction over the documents-derived repo tables,
    # replicated so throughput reflects steady-state work, not stage overhead
    # 128 -> ~10M triples at sf0.1: large enough that throughput reflects
    # steady-state work (at 8 the 19s run was ~90% plan/stage overhead and
    # under-reported triples/sec by ~10x), small enough to finish in ~30s
    replicate = int(os.environ.get("SPARK_GRAFT_KG_REPLICATE", "128"))
    # best of 2: the first run pays one-time JVM JIT + parquet page-cache
    # warmup (measured 30 s cold vs 11 s warm for the identical job on an
    # idle host) — steady-state throughput is what the 100 TB story needs;
    # both samples are reported.
    kg_runs = []
    for _ in range(2):
        t0 = time.time()
        files, commits, contributors = entry._docs_as_repo_tables(
            spark, sf_dir, replicate=replicate
        )
        n_triples = build_triples(files, commits, contributors).count()
        kg_runs.append(time.time() - t0)
    kg_sec = min(kg_runs)
    timings["kg_build_triples"] = round(kg_sec, 3)

    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    core_wall = round(
        timings["kg_build_triples"] + sum(timings[q] for q in CORE_QUERIES), 3
    )
    print(json.dumps({
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "core_wall": core_wall,
        "queries": timings,
        "sf": sf,
        "cores": cores,
        "kg_triples": n_triples,
        "kg_triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec > 0 else None,
        "kg_runs_sec": [round(s, 3) for s in kg_runs],
    }))


if __name__ == "__main__":
    main()
