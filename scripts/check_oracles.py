"""Local replica of the driver's correctness harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
order-insensitive values (sorted rows, columns sorted by name). Exits
non-zero on any mismatch. Usage:

    python scripts/check_oracles.py [--json=OUT] [sf_dir] [query ...]

``--json=OUT`` additionally records one entry per checked query
(status, rows, seconds) to OUT — used for the sf0.1 scale gate artifact
(BENCH/gate_sf0.1.json).
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from haskellpagerank_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    for a in list(args):
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    import __spark_entry__ as E

    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    records = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {ex}"))
            records[name] = {"status": f"spark error: {ex}"}
            print(f"FAIL {name}: spark error: {ex}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            records[name] = {"status": "rows-only", "rows": len(sdf),
                             "seconds": round(dt, 1)}
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {dt:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"duckdb error: {ex}"))
            records[name] = {"status": f"duckdb error: {ex}"}
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append((name, f"schema {list(s.columns)} != {list(o.columns)}"))
            records[name] = {"status": "schema mismatch"}
            print(f"FAIL {name}: schema {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append((name, f"rows {len(s)} != {len(o)}"))
            records[name] = {"status": "row-count mismatch"}
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            continue
        if not s.equals(o):
            neq = (s != o).any(axis=1)
            failures.append((name, f"{int(neq.sum())} differing rows"))
            records[name] = {"status": "value mismatch"}
            print(f"FAIL {name}: {int(neq.sum())}/{len(s)} differing rows")
            print(pd.concat([s[neq].head(3), o[neq].head(3)]))
            continue
        records[name] = {"status": "exact", "rows": len(s),
                         "seconds": round(dt, 1)}
        print(f"ok   {name}: exact match ({len(s)} rows, {dt:.1f}s)")
    if json_out:
        import json as _json
        with open(json_out, "w") as fh:
            _json.dump({"sf_dir": sf_dir, "failures": len(failures),
                        "queries": records}, fh, indent=1)
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
