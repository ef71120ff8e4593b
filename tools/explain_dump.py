"""Dump .explain("formatted") for named catalog queries to files.

Usage: python tools/explain_dump.py <out_dir> <suffix> [sf_dir] name...

Writes <out_dir>/<name>_<suffix>.txt for each query name (the
OPTIMIZATION-round evidence artifact: plans/r15/<q>_before.txt /
_after.txt). Memoized-substrate parents are built first when a
consumer is requested, so the dumped plan is the one the bench
actually times (post-checkpoint subtrees show as Scan ExistingRDD,
exactly as they execute).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from explain_audit import formatted_plan  # noqa: E402


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    args = sys.argv[3:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    os.makedirs(out_dir, exist_ok=True)

    from xero_api_etl_utilities_spark.plans import catalog
    from xero_api_etl_utilities_spark.session import get_spark

    spark = get_spark(
        app_name="explain_dump",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = catalog.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
