"""Dump the optimized + physical plan of any registered query.

Usage: python tools/explain.py <query_name> [sf_dir] [--run]
  --run  execute first so AQE's final plan (with codegen spans) is shown
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run = "--run" in sys.argv
    if not args:
        from matrix_multiplication_bigdata_ind_assignments_spark import registry

        print("queries:", ", ".join(sorted(registry.queries())))
        return 0
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    from matrix_multiplication_bigdata_ind_assignments_spark import registry
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    qs = registry.queries()
    if name not in qs:
        print(f"unknown query {name!r}; run with no args to list")
        return 1
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[name](spark, sf_dir)
    if run:
        df.collect()
    df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
