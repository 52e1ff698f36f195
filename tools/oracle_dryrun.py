"""Dry-run of the driver's correctness gate: for every oracle_sql() entry,
run the Spark query and the DuckDB oracle on the same sf parquet tables,
sort columns by name and rows by value, and compare (row count, schema
width, values with float tolerance).

    python tools/oracle_dryrun.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from git_prov_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_dryrun", cores=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        sdf = qs[name](spark, sf_dir)
        s_cols = [c.lower() for c in sdf.columns]
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(sql)
        d_cols = [d[0].lower() for d in res.description]
        d_rows = res.fetchall()
        status = []
        if len(s_rows) != len(d_rows):
            status.append(f"ROWS {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            status.append(f"COLS {sorted(s_cols)} vs {sorted(d_cols)}")
        if not status:
            a = rowset(s_cols, s_rows)
            b = rowset(d_cols, d_rows)
            if a != b:
                bad = next(
                    (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
                ) if len(a) == len(b) else ("n/a", None, None)
                status.append(f"VALUES first-diff {bad}")
        tag = "OK " if not status else "FAIL"
        print(f"{tag} {name}: rows={len(s_rows)} {'; '.join(status)[:300]}")
        if status:
            failures.append(name)
    skipped = sorted(set(qs) - set(oracles))
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} match; "
          f"no-oracle (rows-only in driver): {skipped}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
