"""Break a query's COLD run into driver phases: Python build, analysis,
optimization, physical planning, and execution — to see whether the
cold-minus-warm gap is Catalyst/codegen (driver) or execution.

Usage: python tools/profile_cold.py q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import __spark_entry__ as entrymod
    from caspr_spark import get_spark
    from caspr_spark.cache import cache_scope

    spark = get_spark("profile-cold")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # generic warmup (mirror bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in sys.argv[1:]:
        for run in ("cold", "warm"):
            with cache_scope():
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                t_build = time.time()
                qe = df._jdf.queryExecution()
                qe.analyzed()
                t_ana = time.time()
                qe.optimizedPlan()
                t_opt = time.time()
                qe.executedPlan()
                t_phys = time.time()
                df.count()
                t_exec = time.time()
                print(f"{name:28s} {run:4s} build={t_build-t0:6.2f} "
                      f"analyze={t_ana-t_build:6.2f} optimize={t_opt-t_ana:6.2f} "
                      f"plan={t_phys-t_opt:6.2f} exec={t_exec-t_phys:6.2f} "
                      f"total={t_exec-t0:6.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
