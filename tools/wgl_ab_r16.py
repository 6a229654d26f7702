"""Round-16 A/B: prove the Partial WindowGroupLimit shuffle cut on
LONG-HISTORY data (r15 verdict item 1).

The r15 change (commit 95d7759: padding resolved post-aggregation, bare
``row_number`` ranking) was committed on plan evidence — the
``WindowGroupLimit ... Partial`` below the featurization Exchange — but
never MEASURED, because every driver SF has ~4 rows/key ≈ seq_len
(nothing to prune). This tool runs the array-layout featurization on a
``gen_sf.py --mode longhist`` directory (same entities, K× the events
per entity) and records, per run:

- wall-clock of the featurization job alone (fit jobs excluded — the
  snapshot brackets only the noop write of the wide result);
- SHUFFLE BYTES WRITTEN during that job, from the cumulative executor
  summaries (execution metrics, not plan text — the SCALING_r15
  discipline);
- whether the executed plan contains a ``Partial`` WindowGroupLimit.

Run it under BOTH trees (old = 95d7759^, new = 95d7759 or HEAD) via
PYTHONPATH to A/B the structural claim:

    git worktree add /tmp/wgl_old 95d7759^
    PYTHONPATH=/tmp/wgl_old  python tools/wgl_ab_r16.py DIR
    PYTHONPATH=/root/repo    python tools/wgl_ab_r16.py DIR

The tool only imports the caspr_spark library surface that exists in
both trees (SequenceFeaturizer, ColumnRoles, cache_scope).

Usage: python tools/wgl_ab_r16.py <sf_dir> [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_longhist"
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

# PYTHONPATH decides which tree's caspr_spark runs; fall back to this
# repo when unset
if not os.environ.get("PYTHONPATH"):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _io_snapshot(spark):
    jsc = spark.sparkContext._jsc.sc()
    try:
        jsc.listenerBus().waitUntilEmpty()
    except Exception:
        pass
    lst = jsc.statusStore().executorList(True)
    sw = rec = 0
    for i in range(lst.size()):
        e = lst.apply(i)
        sw += e.totalShuffleWrite()
    return sw


def main() -> None:
    from pyspark.sql import functions as F

    from caspr_spark import get_spark
    from caspr_spark.cache import cache_scope
    from caspr_spark.pipeline import SequenceFeaturizer
    from caspr_spark.roles import ColumnRoles
    from caspr_spark.sources import read_parquet_table

    spark = get_spark("wgl-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()   # warmup

    roles = ColumnRoles(tgt_id=["user_id"], activity_date="ts",
                        cat_cols=["event_type"], cont_cols=["value"],
                        seq_cols=["event_type", "value", "ts"],
                        date_cols=["ts"], order_tiebreak=["event_id"])
    out = {"sf_dir": sf_dir, "runs": []}
    plan_flags = None
    for r in range(n_runs):
        with cache_scope():
            ev = read_parquet_table(spark, f"{sf_dir}/events.parquet")
            pred = ev.agg(F.max("ts")).collect()[0][0]
            ev = ev.withColumn("prediction_date", F.lit(pred))
            feat = SequenceFeaturizer(roles=roles, history_days=14,
                                      seq_len=5, interval=True,
                                      scaling="min_max", layout="array")
            wide, _model = feat.fit_transform(ev)
            sw0 = _io_snapshot(spark)
            spark.sparkContext.setJobDescription("wgl-ab: featurization")
            t0 = time.time()
            wide.write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 3)
            sw1 = _io_snapshot(spark)
            spark.sparkContext.setJobDescription(None)
            if plan_flags is None:
                plan = wide._jdf.queryExecution().executedPlan().toString()
                plan_flags = {
                    "window_group_limit": "WindowGroupLimit" in plan,
                    "wgl_partial": ("WindowGroupLimit" in plan
                                    and "Partial" in plan),
                }
            out["runs"].append({"wall_sec": wall,
                                "shuffle_write_bytes": int(sw1 - sw0)})
            print(f"run {r}: wall {wall}s  shuffle_write "
                  f"{(sw1 - sw0) / 1e6:.2f} MB", flush=True)
    out.update(plan_flags)
    in_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    out["input_rows"] = int(in_rows)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
