"""Per-stage lineage + throughput metrics (SURVEY.md §2.4 A5; north_rule).

Lightweight driver-side stage journal: wall time, row counts, rows/sec. The
resumable materializer feeds per-bucket-group entries in via its callback, so
each checkpoint group carries its own lineage record.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class StageMetrics:
    stages: list[dict] = field(default_factory=list)

    def record(self, name: str, rows: int | None, seconds: float, **extra) -> dict:
        entry = {
            "stage": name,
            "rows": rows,
            "seconds": round(seconds, 3),
            "rows_per_sec": round(rows / seconds, 1) if rows and seconds > 0 else None,
            **extra,
        }
        self.stages.append(entry)
        return entry

    def timed_count(self, df, name: str, **extra) -> int:
        t0 = time.time()
        n = df.count()
        self.record(name, n, time.time() - t0, **extra)
        return n

    def to_json(self) -> str:
        return json.dumps({"stages": self.stages})

    def log(self, printer=print) -> None:
        for s in self.stages:
            printer(
                f"[stage {s['stage']}] rows={s['rows']} sec={s['seconds']} "
                f"rows/s={s['rows_per_sec']}"
            )
