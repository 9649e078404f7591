"""Capture `.explain("formatted")` for declared queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
With no query names, dumps every registered query plus the bench's
deployment-lane variants. Queries whose construction itself runs jobs
(iceberg write lanes, k-means training) still work — the dump captures
the plan of the RETURNED DataFrame, which is what the timed collect
executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    import icelake_spark
    from bench import _bench_variants
    from icelake_spark.queries import queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = icelake_spark.default_session("icelake_spark_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**queries(), **_bench_variants()}
    todo = names if names else sorted(qs)
    failed = []
    for name in todo:
        if name not in qs:
            print(f"# unknown query: {name}", file=sys.stderr)
            failed.append(name)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"# {name}: {len(plan)} bytes -> {path}", file=sys.stderr)
        except Exception as e:
            failed.append(name)
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
    spark.stop()
    if failed:
        print(f"# FAILED: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
