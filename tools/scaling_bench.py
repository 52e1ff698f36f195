"""Two-cluster-size scaling evidence (north_rule): run the identical full KG
job (extract → link → triples → partitioned sink) at local[8] and local[32]
on the same input, alternating best-of-N to suppress shared-host noise, and
report throughput at both levels + scaling efficiency.

    python tools/scaling_bench.py [n_rounds] [replicate]

Writes BENCH.md section data to stdout (one JSON line) for pasting.
"""

from __future__ import annotations

import json
import subprocess
import sys


def run(cores: int, replicate: int) -> dict:
    r = subprocess.run(
        [sys.executable, "tools/kg_job.py", str(cores), str(replicate)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    runs: dict[int, list[dict]] = {8: [], 32: []}
    for i in range(n_rounds):
        for cores in (8, 32):
            res = run(cores, replicate)
            runs[cores].append(res)
            print(f"# round {i} cores={cores}: {res['wall_sec']}s "
                  f"{res['tps']} t/s", file=sys.stderr)
    best8 = min(runs[8], key=lambda r: r["wall_sec"])
    best32 = min(runs[32], key=lambda r: r["wall_sec"])
    eff = best32["tps"] / (4 * best8["tps"])
    print(json.dumps({
        "metric": "kg_scaling_efficiency",
        "n_rounds": n_rounds,
        "replicate": replicate,
        "triples": best32["triples"],
        "local8": {"wall_sec": best8["wall_sec"], "tps": best8["tps"]},
        "local32": {"wall_sec": best32["wall_sec"], "tps": best32["tps"]},
        "speedup_8_to_32": round(best8["wall_sec"] / best32["wall_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "all_runs": {str(k): [r["wall_sec"] for r in v] for k, v in runs.items()},
    }))


if __name__ == "__main__":
    main()
