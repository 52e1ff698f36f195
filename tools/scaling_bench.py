"""Two-cluster-size scaling evidence (north_rule): run the identical full KG
job (extract → link → triples → partitioned sink) at N and 4N executors on
the same input, alternating best-of-N to suppress shared-host noise, and
report throughput at both levels + scaling efficiency.

    python tools/scaling_bench.py [n_rounds] [replicate] [specA] [specB] [job]

`job` selects the unit run: kg (tools/kg_job.py, default) or corpus
(tools/corpus_job.py — the training_manifest curation pipeline).

Default specs: "1x8" vs "4x8" — local-cluster mode with 1 vs 4 real executor
JVMs of 8 cores each, the faithful sandbox stand-in for N vs 4N executors
(a single shared JVM at local[32] serializes GC / python forks / allocation
bandwidth in ways a real cluster does not). Plain ints ("8", "32") select
local[N] threads instead.

Writes BENCH/BASELINE.md section data to stdout (one JSON line).
"""

from __future__ import annotations

import json
import subprocess
import sys


def run(job: str, spec: str, replicate: int) -> dict:
    r = subprocess.run(
        [sys.executable, f"tools/{job}_job.py", spec, str(replicate)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"{job}_job {spec} produced no result:\n{r.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    spec_a = sys.argv[3] if len(sys.argv) > 3 else "1x8"
    spec_b = sys.argv[4] if len(sys.argv) > 4 else "4x8"
    job = sys.argv[5] if len(sys.argv) > 5 else "kg"
    runs: dict[str, list[dict]] = {spec_a: [], spec_b: []}
    for i in range(n_rounds):
        for spec in (spec_a, spec_b):
            res = run(job, spec, replicate)
            runs[spec].append(res)
            print(f"# round {i} spec={spec}: {res['wall_sec']}s "
                  f"{res['tps']} t/s", file=sys.stderr)
    best_a = min(runs[spec_a], key=lambda r: r["wall_sec"])
    best_b = min(runs[spec_b], key=lambda r: r["wall_sec"])
    eff = best_b["tps"] / (4 * best_a["tps"])
    print(json.dumps({
        "metric": f"{job}_scaling_efficiency",
        "n_rounds": n_rounds,
        "replicate": replicate,
        "items": best_b.get("triples", best_b.get("docs")),
        spec_a: {"wall_sec": best_a["wall_sec"], "tps": best_a["tps"]},
        spec_b: {"wall_sec": best_b["wall_sec"], "tps": best_b["tps"]},
        "speedup_NtoN4": round(best_a["wall_sec"] / best_b["wall_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "all_runs": {k: [r["wall_sec"] for r in v] for k, v in runs.items()},
    }))


if __name__ == "__main__":
    main()
