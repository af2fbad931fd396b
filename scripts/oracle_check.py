"""Driver-contract parity probe: run selected __spark_entry__ queries
AND their DuckDB oracles side-by-side, compare sorted rows (the same
compare the round driver performs, minus its value-hash packaging).

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
       (no query args = every query that has an oracle entry)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    # every value wrapped as (tag, payload) so sort keys stay
    # homogeneous per column even when NULLs mix with ints/strings
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, int(v))
    if isinstance(v, float) or str(type(v).__name__) == "Decimal":
        v = float(v)
        if math.isnan(v):
            return (1, "NaN")
        return (1, round(v, 9))
    if isinstance(v, list):
        return (1, tuple(_norm(x) for x in v))
    return (1, v)


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from json_ld_spark.plans.session import build_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    oracles = E.oracle_sql()
    queries = E.queries()
    if not names:
        names = [n for n in queries if n in oracles]

    spark = build_session(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # per-process spill directory: two concurrent probes sharing the
    # default ".tmp" corrupt each other's temp files (seen as an
    # IOException mid-sweep on the k-core oracle's spill)
    con.execute(
        f"PRAGMA temp_directory='/tmp/duckdb_spill_{os.getpid()}'"
    )
    for t in ["documents", "embeddings", "lineitem", "orders", "customer",
              "nation", "supplier", "events", "part", "region"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    failures = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE")
            failures += 1
            continue
        try:
            sdf = queries[name](spark, sf)
            scols = sdf.columns
            srows = sorted(
                tuple(_norm(v) for v in row)
                for row in ((r[c] for c in sorted(scols)) for r in sdf.collect())
            )
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            fetched = cur.fetchall()
            idx = [ocols.index(c) for c in sorted(ocols)]
            orows = sorted(
                tuple(_norm(row[i]) for i in idx) for row in fetched
            )
        except Exception as exc:  # surface, keep probing the rest
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            failures += 1
            continue
        schema_ok = sorted(scols) == sorted(ocols)
        rows_ok = len(srows) == len(orows)
        vals_ok = srows == orows
        status = "OK" if (schema_ok and rows_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"schema={'ok' if schema_ok else f'{sorted(scols)} vs {sorted(ocols)}'}"
        )
        if not vals_ok and rows_ok and schema_ok:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            for a, b in diff:
                print(f"  spark : {a}\n  oracle: {b}")
        elif not rows_ok:
            sset, oset = set(srows), set(orows)
            print(f"  only-spark : {list(sset - oset)[:2]}")
            print(f"  only-oracle: {list(oset - sset)[:2]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
