"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on DuckDB
at the given sf dir, compare row count, column names, and exact values
(order-insensitive). Usage:

    python tools/check_queries.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from git_prov_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("∅")
            elif isinstance(v, float):
                row.append(repr(v))
            elif isinstance(v, pd.Timestamp):
                row.append(v.isoformat())
            elif hasattr(v, "tolist"):
                row.append(str(v.tolist()))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return rows


def main() -> int:
    # --json FILE: additionally write a CORRECTNESS-style JSON file with one
    # entry per registered query (the in-repo full-registry evidence the
    # driver's ~50-entry recording window cannot hold)
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    # data-dependent oracles (trained IVF centroids) must train on the sf
    # under test, not the driver's default sf0.01
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    spark = get_spark("check_queries")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        record[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            rec["spark_rows"] = len(spdf)
        except Exception as e:
            rec["err"] = f"spark error {type(e).__name__}: {e}"
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        if name not in oracles:
            rec["err"] = "rows-only (no oracle twin)"
            print(f"ok   {name}: rows-only ({len(spdf)} rows, "
                  f"{time.time()-t0:.1f}s, cols={sorted(spdf.columns)})")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
            rec["oracle_rows"] = len(odf)
        except Exception as e:
            rec["err"] = f"duckdb error {type(e).__name__}: {e}"
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        problems = []
        rec["schema_match"] = sorted(spdf.columns) == sorted(odf.columns)
        if not rec["schema_match"]:
            problems.append(f"cols spark={sorted(spdf.columns)} duck={sorted(odf.columns)}")
        rec["rows_match"] = len(spdf) == len(odf)
        if not rec["rows_match"]:
            problems.append(f"rows spark={len(spdf)} duck={len(odf)}")
        if not problems:
            a, b = normalize(spdf), normalize(odf)
            rec["hash_match"] = a == b
            if a != b:
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                sample = [(a[i], b[i]) for i in diff]
                problems.append(f"values differ at {len([1 for x,y in zip(a,b) if x!=y])} rows; sample={sample}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spdf)} rows, {time.time()-t0:.1f}s)")
    if json_out:
        import json as _json

        with open(json_out, "w") as fh:
            _json.dump({"sf_dir": sf_dir, "n_queries": len(record),
                        "n_fail": n_fail, "results": record}, fh, indent=1)
        print(f"wrote {json_out} ({len(record)} entries)")
    print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
