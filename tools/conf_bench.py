"""Config A/B bench: run a set of queries under extra session confs.

Usage:
    python tools/conf_bench.py <sf_dir> <runs> "<k=v,k=v|...>" q1 q2 ...

The conf string is a comma-separated k=v list ('' for baseline). Prints
one JSON line {"conf": ..., "loadavg": ..., "timings": {...}, "total": N}.
Same measurement protocol as bench.py (noop write, best-of-N,
clearCache between queries, warm JVM + Arrow pool).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir, runs, conf_s = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    names = sys.argv[4:]
    extra = {}
    if conf_s:
        for kv in conf_s.split(","):
            k, v = kv.split("=", 1)
            extra[k] = v

    from pedri_analysis_spark.plans import all_queries
    from pedri_analysis_spark.session import get_spark

    spark = get_spark(app_name="conf-bench", extra_conf=extra)
    queries = all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    from bench import _warm_udf

    spark.range(1024).select(_warm_udf()("id")).collect()
    try:
        from pedri_analysis_spark.plans.layout_queries import ensure_bucketed_tables

        ensure_bucketed_tables(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(f"conf_bench: bucketed warmup failed: {exc}", file=sys.stderr)

    from bench import run_bench

    timings, failures = run_bench(spark, {n: queries[n] for n in names}, sf_dir, runs)
    out = {
        "conf": conf_s or "baseline",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "total": round(sum(timings.values()), 3),
        "n_failed": len(failures),
        "timings": timings,
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
