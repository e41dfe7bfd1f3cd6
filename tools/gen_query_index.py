"""Regenerate QUERIES.md — an auto-generated index of every
registered query: name, module (family), first docstring line, and
whether its correctness gate is a DuckDB oracle or rows-only.

    python tools/gen_query_index.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from aiesec_guc_spark.queries import registry

    reg = registry()
    print("# QUERIES — auto-generated registry index")
    print()
    print(f"{len(reg)} registered queries (tools/gen_query_index.py; do not")
    print("edit by hand).  Every query is a callable `(spark, sf_dir) ->")
    print("DataFrame` plus, where SQL-expressible, the DuckDB oracle the")
    print("driver compares against at sf0.01.")
    print()
    print("| query | family | gate | summary |")
    print("|---|---|---|---|")
    for name, q in sorted(reg.items()):
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        gate = "oracle" if q.oracle else "rows-only"
        para = (q.doc or "").strip().split("\n\n", 1)[0]
        joined = " ".join(line.strip() for line in para.splitlines())
        summary = joined.split(". ", 1)[0].strip().rstrip(".")
        summary = summary.replace("|", "\\|")
        print(f"| `{name}` | {mod} | {gate} | {summary} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
