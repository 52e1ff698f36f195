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
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out = f"/tmp/kg_scaling_triples_{cores}"
    shutil.rmtree(out, ignore_errors=True)

    # shuffle partitions held constant across levels: same logical job, same
    # plan — only executor-thread count varies (the N vs 4N stand-in)
    spark = get_spark(
        "kg_scaling", cores=cores, shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
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
        "cores": cores, "replicate": replicate, "sf_dir": sf_dir,
        "wall_sec": round(wall, 2), "triples": n,
        "tps": round(n / wall, 1),
    }))


if __name__ == "__main__":
    main()
