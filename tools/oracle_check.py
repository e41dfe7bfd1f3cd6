"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at
the given sf dir, then compares row-count, column names, and an
order-insensitive value comparison.  Use while iterating so mismatches
are caught before the driver records CORRECTNESS_r{N}.json.

Usage:
    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def rows_multiset(df_pandas):
    cols = sorted(df_pandas.columns)
    out = [tuple(norm_cell(v) for v in row) for row in df_pandas[cols].itertuples(index=False, name=None)]
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from aiesec_guc_spark.session import get_spark

    spark = get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spark_pd = sdf.toPandas()
        t_spark = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"  {name:36s} rows={len(spark_pd):7d}  (rows-only, no oracle)  {t_spark:5.1f}s")
            continue
        duck_pd = con.execute(sql).fetchdf()
        status = []
        if len(spark_pd) != len(duck_pd):
            status.append(f"ROWCOUNT {len(spark_pd)} vs {len(duck_pd)}")
        s_cols, d_cols = sorted(spark_pd.columns), sorted(duck_pd.columns)
        if s_cols != d_cols:
            status.append(f"COLUMNS {s_cols} vs {d_cols}")
        if not status:
            a, b = rows_multiset(spark_pd), rows_multiset(duck_pd)
            if a != b:
                status.append("VALUES")
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        status.append(f"first diff row {i}: spark={x!r} duck={y!r}")
                        break
        if status:
            failures += 1
            print(f"✗ {name:36s} {'; '.join(status[:3])}")
        else:
            print(f"✓ {name:36s} rows={len(spark_pd):7d}  {t_spark:5.1f}s")
    print(f"\n{'FAIL' if failures else 'OK'}: {failures} mismatching queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
