"""Time-series analytics: hypertable-style rollups and event funnels.

The reference's aggregation layer is entity-centric (SURVEY §2.4); these
are the time-centric extensions a large-scale event store needs:

- ``time_bucket``: truncate timestamps to fixed-width buckets (the
  TimescaleDB ``time_bucket`` / Flink tumbling-window primitive).
- ``continuous_rollup``: the continuous-aggregate pattern — aggregate
  once at a fine granularity, then answer every coarser granularity by
  re-aggregating the (tiny) fine-level table instead of the raw events.
  At 100 TB this is the difference between one scan per dashboard tile
  and one scan total: the hourly layer is ~|keys|·24·365 rows/year, so
  the daily/weekly/monthly rollups never touch the raw table. Counts
  re-aggregate as sums of counts; sums as sums of sums (both algebraic);
  for non-algebraic stats (distinct, percentiles) keep a sketch column
  at the fine level instead.
- ``funnel``: ordered multi-stage conversion (stage k strictly after
  stage k-1 per entity). Every shuffle keys on the entity column and the
  per-stage frontier shrinks monotonically, so stages after the first
  join against ever-smaller (often broadcast-able) frontiers.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKET_SECONDS = {
    "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def time_bucket(ts, width: str = "hour", n: int = 1):
    """Column expr: ``ts`` truncated to ``n`` × ``width`` buckets.

    ``n == 1`` uses ``date_trunc`` (stays a native timestamp op);
    arbitrary ``n`` floors the epoch (epoch arithmetic, still codegen'd).
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    if n == 1:
        return F.date_trunc(width, ts)
    sec = F.lit(_BUCKET_SECONDS[width] * n).cast("long")
    return F.timestamp_seconds(
        (F.unix_timestamp(ts) / sec).cast("long") * sec)


def hourly_aggregate(df: DataFrame, ts_col: str = "ts",
                     keys: list[str] | None = None,
                     value_col: str = "value") -> DataFrame:
    """Fine-granularity layer of a continuous aggregate: per (hour, keys)
    row count + value sum. The value sum is carried as ``decimal(18,4)``
    so coarser rollups re-aggregate EXACTLY (decimal addition is
    associative-exact; double addition is not, and a rollup that changes
    the answer when re-aggregated defeats the pattern)."""
    keys = keys or []
    return (df.groupBy(time_bucket(ts_col, "hour").alias("bucket_hour"),
                       *keys)
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.col(value_col).cast("decimal(18,4)"))
                    .alias("sum_value")))


def continuous_rollup(fine: DataFrame, width: str = "day",
                      keys: list[str] | None = None,
                      bucket_col: str = "bucket_hour") -> DataFrame:
    """Coarse layer re-aggregated FROM the fine layer (never the raw
    table): counts sum, sums sum. Input column contract is
    ``hourly_aggregate``'s output."""
    keys = keys or []
    return (fine.groupBy(time_bucket(bucket_col, width).alias(f"bucket_{width}"),
                         *keys)
                .agg(F.sum("n_events").alias("n_events"),
                     F.sum("sum_value").alias("sum_value")))


def distinct_sketch_layer(df: DataFrame, key_col: str, ts_col: str = "ts",
                          keys: list[str] | None = None,
                          width: str = "hour", lgk: int = 12) -> DataFrame:
    """Fine layer of a continuous COUNT DISTINCT: an HLL sketch per
    (bucket, keys).

    Distinct counts are the one aggregate the decimal-sum hypertable
    pattern cannot re-aggregate (distincts don't add), and re-scanning
    100 TB of raw events for every weekly-uniques query is exactly what
    the layer pattern exists to avoid. Datasketches HLL closes the gap:
    sketches are tiny (2^lgk bytes-ish), order-independent, and union
    losslessly at the same precision — so the persisted hourly layer
    answers distinct-users-over-ANY-range via :func:`distinct_rollup`
    without touching raw data. ~±1.6% relative error at lgk=12.
    """
    keys = keys or []
    return (df.groupBy(time_bucket(ts_col, width).alias(f"bucket_{width}"),
                       *keys)
              .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lgk))
                    .alias("distinct_sketch"),
                   F.count(F.lit(1)).alias("n_events")))


def distinct_rollup(fine: DataFrame, width: str = "day",
                    keys: list[str] | None = None,
                    bucket_col: str = "bucket_hour",
                    out_col: str = "n_distinct") -> DataFrame:
    """Coarse distinct-count layer re-aggregated FROM the sketch layer:
    sketches union (map-side combined like any agg), then estimate.
    Input column contract is ``distinct_sketch_layer``'s output; pass
    ``width=None``-like usage by grouping only on ``keys`` is spelled
    ``distinct_total``."""
    keys = keys or []
    return (fine.groupBy(time_bucket(bucket_col, width)
                         .alias(f"bucket_{width}"), *keys)
                .agg(F.hll_sketch_estimate(
                        F.hll_union_agg("distinct_sketch")).alias(out_col),
                     F.sum("n_events").alias("n_events")))


def distinct_total(fine: DataFrame, keys: list[str] | None = None,
                   out_col: str = "n_distinct") -> DataFrame:
    """Grand-total distinct estimate from the sketch layer (no time
    bucket): one union per key group."""
    keys = keys or []
    gb = fine.groupBy(*keys) if keys else fine.groupBy()
    return gb.agg(F.hll_sketch_estimate(
        F.hll_union_agg("distinct_sketch")).alias(out_col))


def funnel(df: DataFrame, stages: list[str], entity_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           max_gap_days: int | None = None) -> DataFrame:
    """Ordered funnel: per entity, reach stage k only via an event of
    ``stages[k]`` STRICTLY after the stage-k-1 timestamp (and within
    ``max_gap_days`` of it, when set — the conversion window); first such
    event is the stage time. Returns one row per stage:
    ``(stage_idx, stage, n_entities)`` — one lazy plan, no driver-side
    counting.

    Plan shape: stage 0 is a filtered groupBy on the entity; each later
    stage left-joins the raw events (filtered to one type) against the
    previous frontier on the entity key and re-groups, so an entity that
    stalls keeps a NULL stage time instead of dropping out. Every
    exchange hashes on ``entity_col`` and the per-type event slices only
    shrink, so AQE broadcasts the later stages at scale; the final
    counts are one tiny global agg fanned to one row per stage.
    """
    ent = (df.filter(F.col(type_col) == stages[0])
             .groupBy(entity_col).agg(F.min(ts_col).alias("__t0")))
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (df.filter(F.col(type_col) == stage)
                 .select(entity_col, F.col(ts_col).alias("__ts")))
        ok = F.col("__ts") > F.col(f"__t{i-1}")
        if max_gap_days is not None:
            ok = ok & (F.col("__ts") <= F.col(f"__t{i-1}")
                       + F.expr(f"INTERVAL {int(max_gap_days)} DAY"))
        ent = (ent.join(nxt, on=entity_col, how="left")
                  .groupBy(entity_col, *[f"__t{j}" for j in range(i)])
                  .agg(F.min(F.when(ok, F.col("__ts"))).alias(f"__t{i}")))
    stage_cols = [
        F.sum(F.when(F.col(f"__t{i}").isNotNull(), 1).otherwise(0))
         .alias(f"__n{i}") for i in range(len(stages))]
    agg = ent.agg(*stage_cols)
    per_stage = [agg.select(F.lit(i).alias("stage_idx"),
                            F.lit(s).alias("stage"),
                            F.col(f"__n{i}").cast("bigint")
                             .alias("n_entities"))
                 for i, s in enumerate(stages)]
    return reduce(lambda a, b: a.unionByName(b), per_stage)


def merge_rollup_delta(base: DataFrame, delta: DataFrame,
                       keys: list[str] | None = None,
                       bucket_col: str = "bucket_hour") -> DataFrame:
    """Incremental view maintenance for the continuous aggregate: fold a
    DELTA batch's fine layer into the BASE fine layer without touching
    the raw history.

    Counts and decimal sums are commutative monoids, so
    ``merge(hourly(old), hourly(new)) == hourly(old ∪ new)`` exactly —
    the property the decimal-sum carrier in ``hourly_aggregate`` exists
    to guarantee (double sums would drift on re-merge). One union + one
    keyed agg over aggregate-sized (not raw-sized) relations: the
    incremental refresh cost is proportional to the delta's bucket
    count, never the history.
    """
    keys = keys or []
    return (base.unionByName(delta)
            .groupBy(bucket_col, *keys)
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value").alias("sum_value")))


def attribute_conversions(df: DataFrame, entity_col: str = "user_id",
                          ts_col: str = "ts",
                          type_col: str = "event_type",
                          conversion_type: str = "purchase",
                          touch_types: tuple[str, ...] = ("view", "click"),
                          model: str = "last",
                          tiebreak: list[str] | None = None) -> DataFrame:
    """Marketing-attribution join: credit each conversion event to the
    first- or last-preceding touch event of the same entity.

    The companion of :func:`funnel` (that counts stage reach; this
    assigns per-conversion credit). ``model='last'`` is last-touch
    (credit the most recent touch strictly before the conversion),
    ``'first'`` first-touch (the touch that originated the journey).
    Conversions with no prior touch keep null attribution (direct
    conversions — dropping them silently would overstate channel ROI).

    Plan shape: ONE window over (entity, time) — the touch columns are
    carried forward with ``last/first(..., ignorenulls=True)`` over the
    preceding-rows frame, so attribution at any scale is one keyed
    sort-shuffle, never a range self-join of conversions against
    touches (the naive formulation, quadratic in touches per entity).
    """
    if model not in ("first", "last"):
        raise ValueError(f"model must be 'first' or 'last', got {model!r}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    order = [F.col(ts_col).asc()] + [F.col(t).asc()
                                     for t in (tiebreak or [])]
    w = (Window.partitionBy(entity_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, -1))
    is_touch = F.col(type_col).isin(*touch_types)
    touch = F.when(is_touch, F.struct(F.col(ts_col).alias("ts"),
                                      F.col(type_col).alias("type")))
    pick = (F.last(touch, ignorenulls=True)
            if model == "last" else F.first(touch, ignorenulls=True))
    attributed = pick.over(w)
    return (df.withColumn("__attr", attributed)
              .filter(F.col(type_col) == conversion_type)
              .withColumn("touch_ts", F.col("__attr.ts"))
              .withColumn("touch_type", F.col("__attr.type"))
              .drop("__attr"))


def resample_entities(df: DataFrame, entity_col: str = "user_id",
                      ts_col: str = "ts", value_cols: list[str] | None = None,
                      step: str = "1 day", agg: str = "sum",
                      fill: str = "zero") -> DataFrame:
    """Regularize each entity's event stream onto a fixed time grid —
    the ``resample``/``GROUP BY time bucket FILL`` primitive every
    time-series store exposes (gap-free per-entity series are what
    sequence models and rolling features assume; the featurizer's
    pad-shift handles MISSING STEPS AT THE ENDS, this handles holes).

    Per entity: aggregate ``value_cols`` into ``step``-wide buckets
    (``agg`` in sum/avg/min/max/count), then materialize EVERY grid
    bucket between that entity's first and last event via
    ``sequence()`` + explode, filling holes with ``fill``:

    - ``"zero"`` — 0 (count-like semantics),
    - ``"null"`` — leave missing,
    - ``"ffill"`` — carry the last observed bucket forward
      (state-of-the-world semantics).

    Scale shape: two keyed exchanges (the (entity, bucket) aggregation
    and the entity-level span aggregation over the already-reduced
    bucket relation — the second moves bucket counts, not events) plus
    the grid join, which AQE broadcasts while the bucket relation fits
    and plans entity-keyed otherwise; the ffill window shares the grid
    join's entity partitioning. The grid explode is ``span/step`` rows
    per entity (the output's own size — nothing quadratic), and the
    grid is entity-local (first..last event), so one ancient entity
    cannot blow up every entity's series length.
    """
    if agg not in ("sum", "avg", "min", "max", "count"):
        raise ValueError(f"agg must be sum/avg/min/max/count, got {agg!r}")
    if fill not in ("zero", "null", "ffill"):
        raise ValueError(f"fill must be zero/null/ffill, got {fill!r}")
    value_cols = list(value_cols or [])
    if agg != "count" and not value_cols:
        raise ValueError("value_cols required unless agg='count'")
    bucket = F.date_trunc(_norm_width(step), F.col(ts_col))
    aggs = ([F.count(F.lit(1)).alias("n_events")] if agg == "count" else
            [getattr(F, agg if agg != "avg" else "avg")(F.col(c)).alias(c)
             for c in value_cols])
    out_cols = ["n_events"] if agg == "count" else value_cols
    buckets = (df.withColumn("__b", bucket)
                 .groupBy(entity_col, F.col("__b").alias("bucket"))
                 .agg(*aggs))
    parts = step.split()
    step_expr = F.expr(f"interval {step}" if len(parts) == 2
                       else f"interval 1 {step}")
    grid = (buckets.groupBy(entity_col)
            .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
            .select(entity_col,
                    F.explode(F.sequence(F.col("__lo"), F.col("__hi"),
                                         step_expr)).alias("bucket")))
    filled = grid.join(buckets, on=[entity_col, "bucket"], how="left")
    if fill == "zero":
        filled = filled.na.fill(0, subset=out_cols)
    elif fill == "ffill":
        w = (Window.partitionBy(entity_col).orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, 0))
        for c in out_cols:
            filled = filled.withColumn(
                c, F.last(F.col(c), ignorenulls=True).over(w))
    return filled


def _norm_width(step: str) -> str:
    """'1 day' -> 'day' for date_trunc (only unit steps are griddable
    with date_trunc alignment; multi-unit steps would need epoch
    arithmetic and are rejected loudly)."""
    parts = step.split()
    if len(parts) == 2 and parts[0] == "1":
        return parts[1]
    if len(parts) == 1:
        return parts[0]
    raise ValueError(f"only unit steps supported ('1 day', '1 hour'), "
                     f"got {step!r}")


def attribute_multitouch(df: DataFrame, entity_col: str = "user_id",
                         ts_col: str = "ts", type_col: str = "event_type",
                         conversion_type: str = "purchase",
                         touch_types: tuple[str, ...] = ("view", "click"),
                         model: str = "linear",
                         half_life: float = 604800.0,
                         tiebreak: list[str] | None = None) -> DataFrame:
    """Multi-touch conversion attribution — split each conversion's unit
    of credit across EVERY touch in its journey (the stretch of touches
    since the entity's previous conversion), not just the first/last one
    that :func:`attribute_conversions` picks.

    Models (credit always sums to 1.0 per conversion):

    - ``"linear"``    — equal split, ``1/n`` per touch.
    - ``"position"``  — U-shaped: 40% first touch, 40% last touch, the
      middle 20% split across the interior (1 touch -> 1.0; 2 -> .5/.5).
    - ``"time_decay"`` — weight ``0.5^(Δseconds/half_life)`` per touch,
      normalized within the journey (recency-weighted ROI).

    Conversions with no prior touch are DIRECT: one row with null touch
    columns and credit 1.0, so channel totals still add up to the
    conversion count.

    Plan shape: journeys come from a running conversion count over ONE
    (entity, time) window — no conversions-x-touches range self-join —
    then one keyed join of the conversion rows to their journey's
    touches on (entity, journey) and one window over the (reduced)
    joined relation for positions/normalization. Everything shuffles on
    the entity key; relation sizes are touches+conversions, never the
    raw event table squared.
    """
    if model not in ("linear", "position", "time_decay"):
        raise ValueError(
            f"model must be linear/position/time_decay, got {model!r}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if conversion_type in touch_types:
        raise ValueError(
            f"conversion_type {conversion_type!r} must not appear in "
            "touch_types — a conversion would otherwise join its own "
            "journey as a zero-delta touch and steal credit")
    order = [F.col(ts_col).asc()] + [F.col(t).asc()
                                     for t in (tiebreak or [])]
    is_conv = (F.col(type_col) == conversion_type).cast("long")
    w_cum = (Window.partitionBy(entity_col).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, 0))
    ev = (df.filter(F.col(type_col).isin(*touch_types)
                    | (F.col(type_col) == conversion_type))
            .withColumn("__cc", F.sum(is_conv).over(w_cum))
            # a touch's journey = conversions seen so far; the closing
            # conversion row itself counts one extra -> subtract it
            .withColumn("__journey", F.col("__cc") - is_conv))
    convs = (ev.filter(F.col(type_col) == conversion_type)
               .select(entity_col, "__journey",
                       F.col(ts_col).alias("__conv_ts"),
                       *[F.col(c).alias(f"__conv_{c}")
                         for c in df.columns
                         if c not in (entity_col, ts_col, type_col)]))
    touches = (ev.filter(F.col(type_col).isin(*touch_types))
                 .select(entity_col, "__journey",
                         F.col(ts_col).alias("touch_ts"),
                         F.col(type_col).alias("touch_type")))
    j = convs.join(touches, on=[entity_col, "__journey"], how="left")
    w_j = (Window.partitionBy(entity_col, "__journey")
           .orderBy(F.col("touch_ts").asc(), F.col("touch_type").asc()))
    w_all = Window.partitionBy(entity_col, "__journey")
    pos = F.row_number().over(w_j)
    n = F.count("touch_ts").over(w_all)
    if model == "linear":
        credit = F.lit(1.0) / n
    elif model == "position":
        credit = (F.when(n == 1, F.lit(1.0))
                   .when(n == 2, F.lit(0.5))
                   .when(pos == 1, F.lit(0.4))
                   .when(pos == n, F.lit(0.4))
                   .otherwise(F.lit(0.2) / (n - F.lit(2))))
    else:  # time_decay
        delta = (F.col("__conv_ts").cast("long")
                 - F.col("touch_ts").cast("long")).cast("double")
        weight = F.pow(F.lit(0.5), delta / F.lit(float(half_life)))
        credit = weight / F.sum(weight).over(w_all)
    out = (j.withColumn(
               "credit",
               F.when(F.col("touch_ts").isNull(), F.lit(1.0))
                .otherwise(F.round(credit, 9)))
            .withColumnRenamed("__conv_ts", "conversion_ts"))
    renames = [F.col(entity_col)] + \
        [F.col(f"__conv_{c}").alias(c) for c in df.columns
         if c not in (entity_col, ts_col, type_col)] + \
        [F.col("conversion_ts"), F.col("touch_ts"), F.col("touch_type"),
         F.col("credit")]
    return out.select(*renames)


def rolling_features(df: DataFrame, entity_col: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     window: str = "7 days",
                     include_current: bool = False,
                     suffix: str | None = None,
                     fixed_point_scale: int | None = 100) -> DataFrame:
    """Trailing time-window aggregates per entity, one row per event —
    the feature-store primitive ("purchases in the last 7 days",
    "average order value over the trailing 30 days") that the
    featurizer's last-n-EVENTS pivot cannot express (n rows != a time
    span when activity rates differ per entity).

    Adds ``count_/sum_/avg_/min_/max_{suffix}`` columns computed over a
    ``RANGE`` frame of the trailing ``window`` (exclusive of the current
    row unless ``include_current`` — exclusive is the leak-safe choice
    for training features: the label row's own value never enters its
    feature). Empty frames yield count 0 and null sum/avg/min/max.

    Plan shape: ONE (entity)-keyed sort-shuffle; all five aggregates
    share the same window frame, so Catalyst evaluates them in a single
    Window node over a single exchange at any scale. Sums accumulate in
    fixed-point integers so distributed evaluation order cannot drift
    the float result (the same discipline as the pipelines' label sums).

    ``fixed_point_scale`` (default 100 = integer cents) controls the
    quantization: values are rounded to ``1/scale`` before summing, so
    inputs with more decimal places than the scale covers LOSE that
    precision in sum/avg (min/max are never quantized). Raise the scale
    for finer data, or pass ``None`` for plain double accumulation
    (exact input values, but the float sum order is then
    partition-dependent — don't hash-compare it across engines). A
    map-side ``assert_true`` guard raises loudly when any single
    ``|value|·scale`` eats into the 2^62 accumulator headroom budgeted
    for million-row frames, instead of letting Spark wrap the long
    silently (same guard discipline as the tf-idf fixed-point path).
    """
    parts = window.split()
    if len(parts) != 2:
        raise ValueError(f"window must look like '7 days', got {window!r}")
    unit_secs = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                 "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
                 "week": 604800, "weeks": 604800}
    if parts[1] not in unit_secs:
        raise ValueError(f"unsupported window unit {parts[1]!r}")
    if not parts[0].isdigit() or int(parts[0]) < 1:
        raise ValueError(f"window span must be a positive integer, got "
                         f"{window!r} (a zero/negative span would build "
                         "an inverted or FORWARD-looking frame)")
    # exact MICROSECOND range arithmetic: the events carry sub-second
    # timestamps, and a seconds-granularity ordering key would need a
    # floor that Spark (cast truncates) and SQL oracles (epoch() is a
    # double) disagree on at the knife edge
    span_us = int(parts[0]) * unit_secs[parts[1]] * 1_000_000
    sfx = suffix or (parts[0] + parts[1][0])     # '7 days' -> '7d'
    hi = 0 if include_current else -1
    w = (Window.partitionBy(entity_col)
         .orderBy(F.unix_micros(F.col(ts_col)))
         .rangeBetween(-span_us, hi))
    cnt = F.count(F.col(value_col)).over(w)
    if fixed_point_scale is None:
        total = F.sum(F.col(value_col)).over(w)
    else:
        if fixed_point_scale < 1:
            raise ValueError(f"fixed_point_scale must be >= 1 or None, "
                             f"got {fixed_point_scale}")
        scale = float(fixed_point_scale)
        fx = F.round(F.col(value_col) * scale).cast("long")
        # loud per-row overflow guard: assert_true yields NULL when the
        # condition holds (adding 0 after coalesce), raises otherwise —
        # stays inside codegen, no extra pass over the data
        headroom = (1 << 62) // 1_000_000
        fx = fx + F.coalesce(
            F.assert_true(
                F.abs(fx) <= F.lit(headroom),
                F.concat(F.lit("rolling_features: |value|*"
                               f"{fixed_point_scale} exceeds the fixed-"
                               "point accumulator headroom (2^62 budgeted "
                               "over 1e6-row frames); lower "
                               "fixed_point_scale or pass None for double "
                               "accumulation. value="),
                         F.col(value_col).cast("string"))).cast("long"),
            F.lit(0))
        total = F.sum(fx).over(w) / scale
    # ONE select so CollapseWindow keeps all five aggregates in a single
    # Window node (chained withColumn left five sequential passes over
    # the sorted partition)
    return df.select(
        "*",
        cnt.alias(f"count_{sfx}"),
        F.round(total, 2).alias(f"sum_{sfx}"),
        F.round(total / cnt, 6).alias(f"avg_{sfx}"),
        F.min(F.col(value_col)).over(w).alias(f"min_{sfx}"),
        F.max(F.col(value_col)).over(w).alias(f"max_{sfx}"))


def ewma_smooth(df: DataFrame, entity_col: str = "user_id",
                ts_col: str = "ts", value_col: str = "value",
                alpha: float = 0.5, lags: int = 8,
                tiebreak: list[str] | None = None,
                out_col: str = "ewma", round_dp: int = 9) -> DataFrame:
    """Per-entity exponentially-weighted moving average — the classic
    smoothing feature ("decayed recent activity level") the trailing
    flat-window :func:`rolling_features` cannot express.

    Bounded-lag formulation (pandas ``ewm(adjust=True)`` semantics,
    truncated at ``lags``): for weights ``w_j = (1-alpha)^j``,

        ewma_t = Σ_{j=0..K} w_j · x_{t-j} / Σ_{j : row exists} w_j

    built as a FIXED chain of ``lag(value, j)`` expressions over one
    entity-ordered window — K+1 lags all share the frame, so Catalyst
    evaluates a single Window node over a single keyed exchange, and
    the truncation bound makes the operator's state per row O(K)
    instead of the unbounded recursive EWMA (which no engine-portable
    window can express).

    Determinism contract: the weights are Python-float literals baked
    into the plan, the sum is the literal left-to-right ``+`` chain,
    and ties in ``ts_col`` are broken by ``tiebreak`` — an oracle that
    writes the SAME chain reproduces the result bit-for-bit (rounded
    at ``round_dp``), any ``alpha``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if lags < 0:
        raise ValueError(f"lags must be >= 0, got {lags}")
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    weights = [(1.0 - alpha) ** j for j in range(lags + 1)]
    num = None
    den = None
    for j, wj in enumerate(weights):
        xj = F.col(value_col) if j == 0 else F.lag(value_col, j).over(w)
        term = F.coalesce(xj * F.lit(wj), F.lit(0.0))
        have = F.when(xj.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = have if den is None else den + have
    return df.withColumn(out_col, F.round(num / den, round_dp))


def quantile_sketch_layer(df: DataFrame, value_col: str = "value",
                          id_col: str = "event_id", ts_col: str = "ts",
                          keys: list[str] | None = None,
                          width: str = "hour",
                          reservoir: int = 64) -> DataFrame:
    """Fine layer of a continuous QUANTILE: a deterministic bottom-k
    value sample per (bucket, keys) — the percentile companion of
    :func:`distinct_sketch_layer` (quantiles, like distincts, don't
    re-aggregate from sums; re-scanning raw events for every weekly-p99
    tile is what the layer pattern avoids).

    The sketch is a KMV-style bottom-k: rank rows by ``md5(id)`` (a
    uniform pseudo-random but DETERMINISTIC order) and keep the
    ``reservoir`` smallest ``(hash, value)`` pairs. Two properties make
    it the right layer sketch:

    - it is a uniform without-replacement sample, so the sample quantile
      estimates the true quantile with rank error ~sqrt(p(1-p)/R);
    - bottom-k MERGES EXACTLY: the union's bottom-k is contained in the
      union of the parts' bottom-ks, so :func:`quantile_rollup` over
      hourly sketches reproduces bit-for-bit the sketch a direct
      day-level pass would build (tested, and what makes a raw-events
      SQL oracle possible).

    Plan shape — skew-hardened: a naive window over (bucket, keys)
    funnels EVERY row of a bucket through one task's sort, and the
    bucket key space is tiny (hours × types) while buckets can hold
    billions of rows at 100 TB. Instead the bottom-k runs TWO-PHASE:
    rows first shuffle by (bucket, keys, salt) — ``salt_parts``-way —
    and each salted slice keeps its own bottom-k; the global bottom-k
    is then the bottom-k of the ``salt_parts·R`` survivors (exact, same
    merge property as the rollup). The exact row count comes from a
    hash aggregation (map-side combined, skew-free), never a
    whole-partition window frame.
    """
    keys = keys or []
    bcol = f"bucket_{width}"
    base = df.select(time_bucket(ts_col, width).alias(bcol), *keys,
                     F.col(value_col).cast("double").alias("__v"),
                     F.md5(F.col(id_col).cast("string")).alias("__h"))
    salt_parts = 64
    counts = base.groupBy(bcol, *keys).agg(F.count(F.lit(1))
                                           .alias("n_events"))
    w1 = (Window.partitionBy(bcol, *keys, "__salt").orderBy("__h"))
    cand = (base.withColumn("__salt",
                            F.pmod(F.xxhash64("__h"), F.lit(salt_parts)))
                .withColumn("__rn", F.row_number().over(w1))
                .filter(F.col("__rn") <= reservoir)
                .drop("__rn", "__salt"))
    w2 = Window.partitionBy(bcol, *keys).orderBy("__h")
    layer = (cand.withColumn("__rn", F.row_number().over(w2))
                 .filter(F.col("__rn") <= reservoir)
                 .groupBy(bcol, *keys)
                 .agg(F.sort_array(F.collect_list(F.struct("__h", "__v")))
                       .alias("value_sample")))
    return layer.join(counts, on=[bcol, *keys])


def quantile_rollup(layer: DataFrame, width: str = "day",
                    keys: list[str] | None = None,
                    bucket_col: str = "bucket_hour",
                    reservoir: int = 64,
                    probs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
    """Coarse quantile layer re-aggregated FROM the sketch layer: merge
    the per-fine-bucket bottom-k samples (flatten, re-sort by hash, keep
    the coarse bottom-k — exact, see :func:`quantile_sketch_layer`),
    then read type-1 sample quantiles ``s[ceil(p*m)]`` off the sorted
    values. ``reservoir`` must match the layer's. Exact ``n_events``
    re-aggregates as a sum like any hypertable count."""
    keys = keys or []
    bcol = f"bucket_{width}"
    merged = (layer.select(time_bucket(bucket_col, width).alias(bcol),
                           *keys, "value_sample", "n_events")
              .groupBy(bcol, *keys)
              .agg(F.slice(F.sort_array(
                       F.flatten(F.collect_list("value_sample"))),
                       1, reservoir).alias("__s"),
                   F.sum("n_events").alias("n_events")))
    vals = F.array_sort(F.expr("transform(__s, x -> x.__v)"))
    m = F.size(vals)
    qcols = [F.element_at(vals, F.greatest(
                 F.lit(1), F.ceil(F.lit(float(p)) * m)).cast("int"))
              .alias(f"p{round(p * 100)}") for p in probs]
    return merged.select(bcol, *keys, F.col("n_events"), *qcols)


def transition_matrix(df: DataFrame, entity_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      tiebreak: list[str] | None = None) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: for each ordered (from_type, to_type) pair, the count of
    consecutive occurrences and the row-normalized transition
    probability — the behavioral sanity check run before training any
    sequence model on an event log (is 'purchase -> error' really 30%?),
    and the generator of negative-sampling distributions.

    Plan shape: ONE entity-keyed sort-shuffle for the ``lead`` window;
    the (from, to) aggregation map-side combines, and the row
    normalization is a window over the aggregated |types|² relation —
    a few hundred rows no matter how many events went in.
    """
    order = [F.col(ts_col).asc()] + [F.col(t).asc()
                                     for t in (tiebreak or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    counts = (df.withColumn("__next", F.lead(type_col).over(w))
                .filter(F.col("__next").isNotNull())
                .groupBy(F.col(type_col).alias("from_type"),
                         F.col("__next").alias("to_type"))
                .agg(F.count(F.lit(1)).alias("n")))
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") / F.sum("n").over(w_from), 9).alias("p"))


# --------------------------------------------------------------------------
# Count-Min frequency sketch layer (mergeable, deterministic, oracle-exact)
# --------------------------------------------------------------------------


def _cm_cell(key_col: str, d: int, w: int):
    """Row d's cell for a key: md5-derived (NOT xxhash64) so every
    engine reproduces the table bit-for-bit — the same portability
    choice as the hashed-BoW bucketing."""
    return (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                          F.lit(str(d)))), 1, 8), 16, 10)
        .cast("long") % w)


def cm_sketch_layer(df: DataFrame, key_col: str, ts_col: str = "ts",
                    width: str = "hour", depth: int = 4,
                    w: int = 256) -> DataFrame:
    """Per-time-bucket COUNT-MIN sketch: frequency estimation joining
    the mergeable-sketch family (HLL distinct, bottom-k quantiles,
    Misra-Gries heavy hitters). Each row hashes into ``depth`` cells of
    ``w`` columns; the layer is the (bucket, d, cell) count table —
    ``depth·w`` longs per time bucket regardless of key cardinality,
    the whole point at 1e9-key scale.

    DETERMINISTIC by construction (md5-derived cells, integer counts),
    so unlike classic randomized CM the layer, its rollups, and its
    point estimates all carry EXACT SQL oracles. Estimates carry the
    standard CM guarantee: ``est >= true``, over-counting only on cell
    collisions (bounded by depth independent trials).

    Returns ``(bucket_<width>, d, cell, cnt)``.
    """
    if depth < 1 or w < 2:
        raise ValueError(f"need depth >= 1 and w >= 2, got {depth}, {w}")
    bucket = F.date_trunc(width, F.col(ts_col)).alias(f"bucket_{width}")
    cells = F.array(*[_cm_cell(key_col, d, w) for d in range(depth)])
    return (df.select(bucket, F.posexplode(cells).alias("d", "cell"))
            .groupBy(f"bucket_{width}", "d", "cell")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cm_rollup(layer: DataFrame, width: str = "day",
              bucket_col: str = "bucket_hour") -> DataFrame:
    """Coarse CM layer from the fine layer WITHOUT rescanning raw rows:
    Count-Min merges cell-wise by addition (counts are integers, so the
    merge is EXACT — the day sketch equals the sketch built from raw).
    Returns ``(bucket_<width>, d, cell, cnt)``."""
    bucket = F.date_trunc(width, F.col(bucket_col)).alias(f"bucket_{width}")
    return (layer.select(bucket, "d", "cell", "cnt")
            .groupBy(f"bucket_{width}", "d", "cell")
            .agg(F.sum("cnt").alias("cnt")))


def cm_estimate(sketch: DataFrame, probes: DataFrame, key_col: str,
                depth: int = 4, w: int = 256,
                bucket_col: str = "bucket_day") -> DataFrame:
    """Point-frequency estimates per (bucket, probe key): the MIN over
    the key's ``depth`` cells, where a cell ABSENT from the sketch
    counts 0 (the key hashed to a cell no row of that bucket touched,
    so its true count is 0 and the min is exactly 0). Every
    (bucket, probe) pair is emitted — a key that never appeared in a
    bucket reports ``est_cnt = 0`` instead of vanishing or picking up a
    collision-only estimate.

    Plan shape: the probe side (a handful of watched keys) explodes to
    its cells and equi-joins the sketch — the sketch itself never
    reshuffles. Absent cells are then recovered WITHOUT outer-joining
    the big sketch: the inner join also counts how many of the key's
    ``depth`` cells were present, and any pair with fewer than
    ``depth`` hits is floored to 0 via a left join from the tiny
    (distinct buckets × probe keys) grid.

    A sketch that is a UNION of partial layers (the incremental path:
    per-source or per-file layers concatenated without a rollup) is
    handled EXACTLY: cell counts are summed per (bucket, key, hash row)
    BEFORE the min over hash rows — CM merges by cell-wise addition, so
    the estimate equals the one from the rolled-up sketch. Min-ing the
    raw rows instead would take the smallest partial layer's count and
    UNDERESTIMATE, breaking the CM overcount-only guarantee.

    Returns ``(bucket, <key_col>, est_cnt)``."""
    cells = F.array(*[_cm_cell(key_col, d, w) for d in range(depth)])
    probe_keys = probes.select(key_col).distinct()
    probe_cells = probe_keys.select(
        F.col(key_col), F.posexplode(cells).alias("d", "cell"))
    hits = (sketch.join(F.broadcast(probe_cells), on=["d", "cell"])
            .groupBy(bucket_col, key_col, "d")
            .agg(F.sum("cnt").alias("__cnt"))     # exact merge of layers
            .groupBy(bucket_col, key_col)
            .agg(F.min("__cnt").alias("__min_present"),
                 F.count(F.lit(1)).alias("__n_present")))
    grid = (sketch.select(bucket_col).distinct()
            .crossJoin(F.broadcast(probe_keys)))
    # after the per-d merge each hash row appears once, so the present-
    # cell tally is exact: fewer than depth rows means some cell of the
    # key was never touched in that bucket -> true count is 0
    est = F.when(F.col("__n_present") >= depth,
                 F.col("__min_present")).otherwise(F.lit(0))
    return (grid.join(hits, on=[bucket_col, key_col], how="left")
            .select(F.col(bucket_col).alias("bucket"), key_col,
                    est.cast("long").alias("est_cnt")))
