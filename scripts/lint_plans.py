"""Registry-wide physical-plan lint CLI: no unpartitioned WindowExec
over an unbounded frame anywhere in the registry -- the rule lives in
capex_data_pipeline_spark/planlint.py. Usage:
``python scripts/lint_plans.py [prefix ...]``; prints
``PLAN-LINT FAILS: []`` on success."""

from __future__ import annotations


def main() -> int:
    import os
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    from capex_data_pipeline_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    prefixes = sys.argv[1:]
    from capex_data_pipeline_spark.planlint import (
        unbounded_global_windows,
    )

    qs = E.queries()
    names = [
        n
        for n in qs
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    fails = []
    t0 = time.time()
    for name in names:
        try:
            df = qs[name](spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - report, don't mask
            fails.append((name, f"build error: {exc}"))
            continue
        for off in unbounded_global_windows(plan):
            fails.append((name, off))
            print(f"{name}: UNBOUNDED GLOBAL WINDOW: {off}")
    print(
        f"linted {len(names)} queries in {time.time() - t0:.1f}s"
    )
    print("PLAN-LINT FAILS:", [n for n, _ in fails])
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
