"""One full corpus-curation job (training_manifest: exact-dup → LSH near-dup
→ components → lang/quality gates → parquet manifest) at a given parallelism
level — the unit run for the corpus-side two-cluster-size scaling evidence.
Prints one JSON line {spec, replicate, wall_sec, docs, tps}.

Usage: python tools/corpus_job.py <spec> [replicate] [sf_dir]

Replication salt: copy 0 is the raw corpus (its natural dup structure
intact); copy i>0 suffixes EVERY token with ~i, which makes its shingles
disjoint from every other copy — the replicated corpus behaves like a
genuinely larger one (work scales ~linearly in R), instead of synthesizing
R-sized near-dup cliques whose candidate-pair lists grow quadratically and
would measure the replication artifact, not the pipeline.

Like kg_job, the input is materialized to parquet once per replicate level so
the timed region is scan → curate → manifest sink.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from git_prov_spark.corpus.curate import training_manifest  # noqa: E402
from git_prov_spark.session import get_spark  # noqa: E402


def materialize_input(spark, sf_dir: str, replicate: int, base: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    in_dir = os.path.join(base, f"corpus_input_{tag}_rep{replicate}")
    marker = os.path.join(in_dir, "_READY")
    if os.path.exists(marker):
        return in_dir
    shutil.rmtree(in_dir, ignore_errors=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    reps = spark.range(replicate)
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda t: F.concat(t, F.lit("~"), F.col("id").cast("string")),
        ),
        " ",
    )
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("id") * 10_000_000).alias("doc_id"),
        F.when(F.col("id") == 0, F.col("text")).otherwise(salted).alias("text"),
    )
    corpus.repartition(64).write.parquet(os.path.join(in_dir, "documents"))
    open(marker, "w").close()
    return in_dir


def main() -> None:
    spec = sys.argv[1] if len(sys.argv) > 1 else "32"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out = f"/tmp/corpus_scaling_manifest_{spec.replace('x', '_')}"
    shutil.rmtree(out, ignore_errors=True)

    conf = {"spark.ui.showConsoleProgress": "false"}
    if "x" in spec:
        n_exec, exec_cores = (int(v) for v in spec.split("x"))
        master = f"local-cluster[{n_exec},{exec_cores},8192]"
        conf["spark.executor.memory"] = "6g"
        cores = None
    else:
        cores = int(spec)
        master = None

    spark = get_spark(
        "corpus_scaling", cores=cores, master=master, shuffle_partitions=64,
        extra_conf=conf,
    )
    in_dir = materialize_input(spark, sf_dir, replicate, "/tmp")
    docs = spark.read.parquet(os.path.join(in_dir, "documents"))
    n_docs = docs.count()

    t0 = time.monotonic()
    training_manifest(docs).write.mode("overwrite").parquet(out)
    wall = time.monotonic() - t0

    spark.stop()
    print(json.dumps({
        "spec": spec, "replicate": replicate, "wall_sec": round(wall, 1),
        "docs": n_docs, "tps": int(n_docs / wall),
    }))


if __name__ == "__main__":
    main()
