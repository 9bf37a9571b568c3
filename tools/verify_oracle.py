"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values. Usage:

    python tools/verify_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bda_spark.schemas import TESTDATA_TABLES
from bda_spark.session import get_spark


def normalize(rows, colnames):
    """Sort columns by name, canonicalize values, sort rows.

    Values are tagged with their fetched Python TYPE, not just
    stringified — the driver hashes at the dtype level, so an int vs
    Decimal vs float disagreement must fail here even when str(v)
    matches (the stringified version of this function let the HUGEINT
    class survive two rounds undetected)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            ty = type(v).__name__
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    if v == -0.0:
                        v = 0.0
            vals.append(f"{ty}:{v}")
        out.append(tuple(vals))
    return sorted(out), [colnames[i] for i in order]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    if vanilla:
        # Mimic the driver exactly: default confs (200 shuffle
        # partitions, no tuned knobs) — catches results that only hold
        # under our session's partitioning/summation order.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("verify_oracle_vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    if only:
        unknown = sorted(set(only) - set(qs))
        if unknown:
            # a typo'd name silently matching nothing would print
            # "0 pass, 0 fail" and exit 0 — a fake green
            print(f"ERROR: unknown query name(s): {', '.join(unknown)}")
            return 2
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        s_n, s_c = normalize([tuple(r) for r in srows], scols)
        o_n, o_c = normalize(orows, ocols)
        if s_c != o_c:
            print(f"FAIL  {name}: columns differ spark={s_c} oracle={o_c}")
            n_fail += 1
        elif len(s_n) != len(o_n):
            print(f"FAIL  {name}: rowcount spark={len(s_n)} oracle={len(o_n)}")
            n_fail += 1
        elif s_n != o_n:
            diffs = [i for i, (a, b) in enumerate(zip(s_n, o_n)) if a != b][:3]
            print(f"FAIL  {name}: values differ at sorted rows {diffs}")
            for i in diffs:
                print(f"      spark : {s_n[i]}")
                print(f"      oracle: {o_n[i]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_n)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
