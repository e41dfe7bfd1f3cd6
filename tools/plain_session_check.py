"""Driver-environment replica: run queries in a PLAIN SparkSession.

`tools/oracle_check.py` uses the tuned session factory; the external
driver does NOT — it builds its own SparkSession and calls
`queries()[name]` directly, so any correctness dependence on a tuned
config (timezone, AQE, arrow) would pass the local replica and fail
at the gate.  This harness compares against DuckDB with a deliberately
untouched `SparkSession.builder.master("local[8]")` session.

With ``--master`` the same comparison runs under a different
scheduler — in particular ``--master local-cluster[2,8,4096]``
launches REAL separate executor JVMs (own heaps, own Python workers,
closure serialization over the wire), the strongest local stand-in
for a multi-executor cluster: anything that silently leans on
driver-shared JVM/Python state passes local[8] and fails here.
local-cluster runs get ``spark.executorEnv.PYTHONPATH`` pointed at
the repo so executor-side Python workers can unpickle the package's
pandas UDFs by module reference.

Usage:
    python tools/plain_session_check.py [--master M] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.oracle_check import (  # noqa: E402
    TABLES,
    canon,
    dtype_report,
    frames_equal,
    unhashable_columns,
)


def main() -> int:
    master = "local[8]"
    rest: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        try:
            if a == "--master" or a.startswith("--master="):
                master = a.split("=", 1)[1] if "=" in a else argv[(i := i + 1)]
            elif a.startswith("--"):
                print(__doc__, file=sys.stderr)
                print(f"unrecognized argument: {a}", file=sys.stderr)
                return 2
            else:
                rest.append(a)
        except IndexError:
            print(__doc__, file=sys.stderr)
            print(f"missing value for {a}", file=sys.stderr)
            return 2
        i += 1
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    only = set(rest[1:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    builder = SparkSession.builder.master(master)
    if master.startswith("local-cluster"):
        # executor JVMs run their own Python workers; the package must
        # be importable there for pickled-by-reference pandas UDFs
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH", REPO
        ).config("spark.ui.enabled", "false")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = sorted(set(only) - set(qs))
    if unknown:
        # A typo'd name must not yield "OK: 0 mismatching" from a gate
        # that never ran anything (same convention as oracle_check).
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    names = [n for n in qs if not only or n in only]
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                want = con.execute(oracles[name]).fetchdf()
                ok = (
                    not unhashable_columns(got, "spark")
                    and not unhashable_columns(want, "duck")
                    and len(got) == len(want)
                    and sorted(got.columns) == sorted(want.columns)
                    and not dtype_report(got, want)
                    and (
                        len(got) == 0
                        or frames_equal(canon(got), canon(want)) is None
                    )
                )
            else:
                # rows-only: no oracle, but the frame must still be
                # driver-hashable — an unhashable object column here
                # sails through a len() check and dies at the real
                # gate (the CORRECTNESS_r01 multimodal crash class).
                ok = not unhashable_columns(got, "spark")
            status = "✓" if ok else "✗"
        except Exception as ex:  # noqa: BLE001
            ok, status = False, f"✗ ERROR {type(ex).__name__}: {ex}"
        bad += not ok
        print(f"{status} {name:35s} {time.time() - t0:5.1f}s", flush=True)
    print(f"\n{'OK' if not bad else 'FAIL'}: {bad} mismatching queries")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
