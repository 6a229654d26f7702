"""Round-16 trace for ``stream_dedup_corpus_near`` (r15 verdict item 3):
count the Spark JOBS and wall-clock of the full certified query, so a
fold-path change can show its job-count drop with event-level evidence
(the AppStatusStore job counter, not guesswork).

Usage: python tools/near_trace_r16.py [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _job_count(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    try:
        jsc.listenerBus().waitUntilEmpty()
    except Exception:
        pass
    cls = spark._jvm.java.lang.Class.forName(
        "org.apache.spark.status.JobDataWrapper")
    return int(jsc.statusStore().store().count(cls))


def main() -> None:
    import __spark_entry__ as em
    from caspr_spark import get_spark
    from caspr_spark.cache import cache_scope

    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("near-trace")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = em.queries()
    out = {"runs": []}
    for r in range(n_runs):
        with cache_scope():
            j0 = _job_count(spark)
            t0 = time.time()
            qs["stream_dedup_corpus_near"](spark,
                                           "/root/testdata/sf0.1").count()
            wall = round(time.time() - t0, 3)
            j1 = _job_count(spark)
        out["runs"].append({"wall_sec": wall, "jobs": j1 - j0})
        print(f"run {r}: wall {wall}s  jobs {j1 - j0}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
