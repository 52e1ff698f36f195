"""Straggler/skew evidence (BASELINE.md: no straggler partition > 4x median
task time on the hot-repo fixture): run the full KG job with event logging
on a skewed input, then report per-stage max-task/median-task ratios.

    python tools/skew_report.py [spec] [replicate] [hot_factor]

hot_factor > 1 makes one repo carry hot_factor x the files of every other
repo (the hot-repo fixture). Output: one JSON line with the worst stages and
the overall verdict.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from git_prov_spark.pipeline.build import build_triples  # noqa: E402
from git_prov_spark.session import get_spark  # noqa: E402
from git_prov_spark.store import write_triples  # noqa: E402


def hot_repo_tables(spark, sf_dir: str, replicate: int, hot_factor: int):
    """Replicated corpus where every replica of doc rows ALSO lands in one
    shared hot repo — one repo with hot_factor x median files."""
    files, commits, contributors = entry._docs_as_repo_tables(
        spark, sf_dir, replicate=replicate
    )
    if hot_factor <= 1:
        return files, commits, contributors
    # route a 1/hot share of every repo's paths into repo 'hotspot': same
    # rows, one giant repo alongside many normal ones
    hot_files = (
        files.where(F.crc32(F.col("path")) % hot_factor == 0)
        .withColumn("repo", F.lit("hotspot"))
        .withColumn("path", F.concat(F.col("path"), F.lit(".hot")))
    )
    hot_commits = (
        commits.withColumn("repo", F.lit("hotspot"))
        .dropDuplicates(["repo", "commit_seq"])
    )
    hot_contrib = (
        contributors.withColumn("repo", F.lit("hotspot"))
        .dropDuplicates(["repo", "login"])
    )
    # hot commit shas must match the per-repo minted ones -> remint via the
    # same rule the adapter uses: sha is md5(repo[/1]) prefixed; rebuild
    c0 = F.concat(F.lit("c0000"), F.md5(F.col("repo")))
    c1 = F.concat(F.lit("c0001"), F.md5(F.concat(F.col("repo"), F.lit("/1"))))
    hot_commits = hot_commits.withColumn(
        "commit", F.when(F.col("commit_seq") == 0, c0).otherwise(c1)
    ).withColumn(
        "parents",
        F.when(F.col("commit_seq") == 0, F.array().cast("array<string>"))
        .otherwise(F.array(c0)),
    )
    hot_files = hot_files.withColumn(
        "commit", F.when(F.substring("commit", 1, 5) == "c0000", c0).otherwise(c1)
    )
    return (
        files.unionByName(hot_files),
        commits.unionByName(hot_commits),
        contributors.unionByName(hot_contrib),
    )


def stage_skew(ev_dir: str) -> list[dict]:
    fs = [p for p in glob.glob(ev_dir + "/*/events_*") if "appstatus" not in p]
    rows: dict[int, list[float]] = {}
    names: dict[int, str] = {}
    for line in open(fs[0]):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        if e.get("Event") == "SparkListenerTaskEnd":
            m = e.get("Task Metrics") or {}
            srm = m.get("Shuffle Read Metrics") or {}
            recs = srm.get("Total Records Read", 0) or (
                (m.get("Input Metrics") or {}).get("Records Read", 0)
            )
            rows.setdefault(e["Stage ID"], []).append(
                (m.get("Executor Run Time", 0) / 1000, recs)
            )
        elif e.get("Event") == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            # RDD scope names give a readable operator hint
            ops = [r["Name"] for r in si.get("RDD Info", [])
                   if r.get("Scope")]
            scopes = []
            for r in si.get("RDD Info", []):
                try:
                    scopes.append(json.loads(r["Scope"])["name"])
                except (KeyError, json.JSONDecodeError, TypeError):
                    pass
            names[si["Stage ID"]] = ",".join(dict.fromkeys(scopes))[:60] or (
                ",".join(ops)[:60]
            )
    out = []
    for sid, pairs in rows.items():
        if len(pairs) < 4:  # ratio meaningless for 1-task stages
            continue
        ts = [p[0] for p in pairs]
        rec = [p[1] for p in pairs]
        med = statistics.median(ts)
        # sub-second medians: max/median is scheduler + co-tenant noise, not
        # data skew — the data-skew signal for those is the record ratio
        if med < 1.0:
            continue
        med_r = statistics.median(rec)
        out.append(
            {
                "stage": sid,
                "op": names.get(sid, ""),
                "tasks": len(pairs),
                "median_s": round(med, 2),
                "max_s": round(max(ts), 2),
                "ratio": round(max(ts) / med, 2),
                "record_ratio": round(max(rec) / med_r, 2) if med_r else None,
            }
        )
    return sorted(out, key=lambda r: -r["ratio"])


def main() -> None:
    spec = sys.argv[1] if len(sys.argv) > 1 else "4x4"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    hot_factor = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    ev_dir = "/tmp/skew-events"
    shutil.rmtree(ev_dir, ignore_errors=True)
    os.makedirs(ev_dir)
    out = "/tmp/skew_triples"
    shutil.rmtree(out, ignore_errors=True)

    conf = {
        "spark.ui.showConsoleProgress": "false",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": ev_dir,
        "spark.eventLog.compress": "false",
    }
    if "x" in spec:
        n_exec, exec_cores = (int(v) for v in spec.split("x"))
        master = f"local-cluster[{n_exec},{exec_cores},8192]"
        conf["spark.executor.memory"] = "6g"
        spark = get_spark("skew", master=master, shuffle_partitions=64,
                          extra_conf=conf)
    else:
        spark = get_spark("skew", cores=int(spec), shuffle_partitions=64,
                          extra_conf=conf)

    files, commits, contributors = hot_repo_tables(
        spark, "/root/testdata/sf0.1", replicate, hot_factor
    )
    triples = build_triples(files, commits, contributors)
    write_triples(triples, out)
    n = spark.read.parquet(out).count()
    hot_n = (
        spark.read.parquet(out).where(F.col("repo") == "hotspot").count()
    )
    spark.stop()

    stages = stage_skew(ev_dir)
    worst = stages[0]["ratio"] if stages else None
    print(json.dumps({
        "metric": "straggler_ratio_max_over_median",
        "spec": spec, "replicate": replicate, "hot_factor": hot_factor,
        "triples": n, "hotspot_triples": hot_n,
        "worst_ratio": worst,
        "passes_4x": bool(worst is not None and worst <= 4.0),
        "worst_stages": stages[:6],
    }))


if __name__ == "__main__":
    main()
