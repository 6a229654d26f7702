"""Alternating-A/B helper: time a subset of bench queries (cold+warm per
cache_scope pair, same methodology as bench.py) plus the smalljob
calibration probe, print one JSON line. Run alternately on two git states.

Usage: python tools/ab_subset.py tag q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag, names = sys.argv[1], sys.argv[2:]
    import __spark_entry__ as entrymod
    from caspr_spark import get_spark
    from caspr_spark.cache import cache_scope

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-subset")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import statistics

    def _smalljob():
        for _ in range(24):
            (spark.range(0, 10_000, 1, 8)
                  .withColumn("g", F.col("id") % 7)
                  .groupBy("g").count().collect())

    def _median3(fn):
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        return round(statistics.median(runs), 3)

    calib0 = _median3(_smalljob)
    qs = entrymod.queries()
    cold, warm = {}, {}
    for name in names:
        with cache_scope():
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            cold[name] = round(time.time() - t0, 3)
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            warm[name] = round(time.time() - t0, 3)
    calib1 = _median3(_smalljob)
    print(json.dumps({"tag": tag, "calib": [calib0, calib1],
                      "cold": cold, "warm": warm,
                      "cold_total": round(sum(cold.values()), 3),
                      "warm_total": round(sum(warm.values()), 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
