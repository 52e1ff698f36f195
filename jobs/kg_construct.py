"""Production entry point: KG construction via spark-submit.

    spark-submit --py-files git_prov_spark.zip jobs/kg_construct.py \
        --files <dir> --commits <dir> --contributors <dir> --out <dir> \
        [--buckets 16] [--resume] [--metrics <path>]

Reads the source tables (parquet here; Iceberg `spark.table(...)` names
work the same — pass table identifiers with --format table), builds the
PROV triple graph, and materializes the partitioned store. With --resume,
work proceeds in per-bucket-group checkpoints (store.materialize_resumable)
so a killed run restarts where it left off; per-group lineage + metrics go
to the manifest and, with --metrics, to a JSON file.

The SparkSession is created plain (no master hardcoded): cluster master,
executor count/memory, AQE and shuffle-partition sizing come from
spark-submit --conf, as on any real cluster. session.get_spark is only the
local/test convenience factory.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession

from git_prov_spark.metrics import StageMetrics
from git_prov_spark.pipeline.build import build_triples
from git_prov_spark.store import materialize_resumable, write_triples


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--files", required=True)
    p.add_argument("--commits", required=True)
    p.add_argument("--contributors", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--format", choices=["parquet", "table"], default="parquet")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--metrics", default=None)
    p.add_argument(
        "--canonicalize-agents", action="store_true",
        help="merge agent aliases (login/email connected components) into "
             "one canonical agent per component before emission",
    )
    p.add_argument(
        "--entail-schema", default=None,
        help="path (or table, with --format table) of an RDFS schema "
             "triple relation; when given, the job adds a reasoning "
             "stage after construction: the rho-df closure of the built "
             "store materializes to <out>_entailed with the same "
             "partitioned layout (inference.rdfs_closure — batch-time "
             "materialized entailment, never per-query reasoning)",
    )
    args = p.parse_args()

    spark = (
        SparkSession.builder.appName("kg_construct")
        # task-side output commit (v2): no serial driver rename pass over
        # the salted sink's file fan-out (BENCH §R5.12-R5.13 measured the
        # v1 pass as a fixed Amdahl term). Safe here: every writer is
        # either whole-store overwrite or per-group dynamic partition
        # overwrite, so a retried group replaces any partial output.
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        .getOrCreate()
    )
    read = (
        spark.table if args.format == "table"
        else spark.read.parquet
    )
    files = read(args.files)
    commits = read(args.commits)
    contributors = read(args.contributors)

    def build(f, c, k):
        return build_triples(
            f, c, k, canonicalize_agents=args.canonicalize_agents
        )

    metrics = StageMetrics()
    t0 = time.time()
    if args.resume:
        stats = materialize_resumable(
            build, files, commits, contributors, args.out,
            n_buckets=args.buckets,
            on_group_done=lambda g, m: metrics.record(
                f"bucket_group_{g[0]}-{g[-1]}", m.get("rows"),
                m["seconds"]
            ),
        )
        metrics.record("total", None, time.time() - t0,
                       resumed_skipped=stats["resumed_skipped"])
    else:
        triples = build(files, commits, contributors)
        write_triples(triples, args.out, n_buckets=args.buckets)
        metrics.record("total", None, time.time() - t0)

    if args.entail_schema:
        from git_prov_spark.inference import rdfs_closure
        from git_prov_spark.store import read_triples

        t1 = time.time()
        schema = read(args.entail_schema)
        stored = read_triples(spark, args.out).select(
            "repo", "subj", "pred", "obj", "obj_type")
        closed = rdfs_closure(stored, schema)
        write_triples(closed, args.out + "_entailed",
                      n_buckets=args.buckets)
        metrics.record("entail", None, time.time() - t1)

    metrics.log()
    if args.metrics:
        with open(args.metrics, "w") as f:
            f.write(metrics.to_json())
    spark.stop()


if __name__ == "__main__":
    main()
