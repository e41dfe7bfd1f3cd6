"""Dump the physical plan of any registered query.

    python tools/explain_query.py NAME [SF_DIR] [--adaptive]

Prints ``explain("formatted")`` output — scan pushdowns/ReadSchema,
join strategies, aggregate modes, codegen spans.  With ``--adaptive``
the query is executed first and the AQE FINAL plan is printed (the
join strategies actually used at runtime).  Lists all query names
when called without arguments.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from aiesec_guc_spark.queries import spark_queries

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    adaptive = "--adaptive" in sys.argv
    qs = spark_queries()
    if not args:
        print("registered queries:")
        for n in qs:
            print(f"  {n}")
        return 0
    name = args[0]
    if name not in qs:
        print(f"unknown query {name!r}; run without arguments for the list")
        return 1
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from aiesec_guc_spark.plans.explain import final_adaptive_plan, formatted_plan
    from aiesec_guc_spark.session import get_spark

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[name](spark, sf_dir)
    print(final_adaptive_plan(df) if adaptive else formatted_plan(df))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
