"""One full KG-construction job (extract → link → triples → partitioned sink)
at a given parallelism level — the unit run for the two-cluster-size scaling
evidence. Prints one JSON line {cores, replicate, wall_sec, triples, tps}.

Usage: python tools/kg_job.py <cores> [replicate] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from git_prov_spark.pipeline.build import build_triples  # noqa: E402
from git_prov_spark.session import get_spark  # noqa: E402
from git_prov_spark.store import write_triples  # noqa: E402


def main() -> None:
    # <cores spec>: "8"/"32" -> local[N] (threads in one JVM);
    # "NxC" e.g. "1x8", "4x8" -> local-cluster[N,C,mem] (N real executor
    # JVMs x C cores — the faithful N-vs-4N-executors stand-in)
    spec = sys.argv[1] if len(sys.argv) > 1 else "32"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out = f"/tmp/kg_scaling_triples_{spec.replace('x', '_')}"
    shutil.rmtree(out, ignore_errors=True)

    conf = {"spark.ui.showConsoleProgress": "false"}
    if "x" in spec:
        n_exec, exec_cores = (int(v) for v in spec.split("x"))
        # worker memory > executor memory: the worker JVM just hosts the
        # executor; spark.executor.memory is what sizes the executor heap
        # (local-cluster's M operand alone leaves the 1g default -> OOM)
        master = f"local-cluster[{n_exec},{exec_cores},8192]"
        conf["spark.executor.memory"] = "6g"
        cores = None
    else:
        cores = int(spec)
        master = None

    # shuffle partitions held constant across levels: same logical job, same
    # plan — only executor count varies (the N vs 4N stand-in)
    spark = get_spark(
        "kg_scaling", cores=cores, master=master, shuffle_partitions=64,
        extra_conf=conf,
    )

    t0 = time.time()
    files, commits, contributors = entry._docs_as_repo_tables(
        spark, sf_dir, replicate=replicate
    )
    triples = build_triples(files, commits, contributors)
    write_triples(triples, out)
    wall = time.time() - t0
    n = spark.read.parquet(out).count()

    print(json.dumps({
        "cores": spec, "replicate": replicate, "sf_dir": sf_dir,
        "wall_sec": round(wall, 2), "triples": n,
        "tps": round(n / wall, 1),
    }))


if __name__ == "__main__":
    main()
