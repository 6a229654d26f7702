"""Latest-wins upsert compaction — MERGE semantics as one window pass.

A training-data lake ingests change streams (re-crawls, relabels, GDPR
deletes) next to its base snapshots; the compaction that resolves them
is the lakehouse MERGE (Delta/Hudi/Iceberg upsert). The reference has
no counterpart (CASPR assumes immutable inputs) — this extends the
engine with the standard Spark formulation: union the base snapshot
with the update batch, elect one winner per key by version, honor
delete tombstones.

Plan shape: ONE hash exchange on the merge keys (the row_number
window); no join at all — the union is free (both legs scan in the same
stage). At 100 TB the per-key group is bounded by that key's update
count, so the window never materializes more than a handful of rows per
key; hot keys are AQE-skew-splittable since row_number only needs the
partition-local group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str],
                 version_cols: list[str],
                 delete_col: str | None = None) -> DataFrame:
    """Compact ``base`` + ``updates`` to one current row per key.

    - ``keys`` — the merge identity (e.g. primary key, or entity id for
      latest-state tables).
    - ``version_cols`` — ordering that decides "latest"; MUST totally
      order the rows within a key (append a unique id as the last
      column) or the winner is nondeterministic. Higher wins.
    - ``delete_col`` — optional boolean tombstone column on ``updates``;
      a key whose winning row is a tombstone disappears from the output
      (the GDPR/retraction path). Base rows without the column are
      treated as live.

    Ties on all ``version_cols`` resolve toward ``updates`` (the CDC
    convention: a same-version update supersedes the snapshot).
    """
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    if not version_cols:
        raise ValueError("merge_upsert needs at least one version column")
    b, u = base, updates
    if delete_col is not None:
        if delete_col not in u.columns:
            raise ValueError(f"delete_col {delete_col!r} not in updates")
        if delete_col not in b.columns:
            b = b.withColumn(delete_col, F.lit(False))
    tagged = (b.withColumn("__src", F.lit(0))
               .unionByName(u.withColumn("__src", F.lit(1))))
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(v).desc() for v in version_cols], F.col("__src").desc())
    out = (tagged.withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") == 1)
                 .drop("__rn", "__src"))
    if delete_col is not None:
        out = out.filter(~F.coalesce(F.col(delete_col), F.lit(False))) \
                 .drop(delete_col)
    return out


def diff_snapshots(old: DataFrame, new: DataFrame, keys: list[str],
                   compare_cols: list[str] | None = None,
                   change_col: str = "change_type") -> DataFrame:
    """Change-data feed between two snapshots of the same table: one row
    per key that was ``inserted``, ``deleted``, or ``updated`` —
    the audit/replication complement of :func:`merge_upsert` (what Delta
    calls the change data feed, computed lakehouse-agnostically).

    ``compare_cols`` limits which columns define "changed" (default:
    every shared non-key column). Output carries the keys, the change
    type, and both versions of each compared column (``<c>_old`` /
    ``<c>_new``, null on the missing side). Unchanged keys are absent.

    Plan: ONE full-outer hash equi-join on the keys plus a row-local
    comparison — change detection at any scale is exactly one shuffle
    per side. Null-safe equality (``<=>``) so a null->value flip counts
    as a change rather than vanishing.
    """
    if not keys:
        raise ValueError("diff_snapshots needs at least one key column")
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in new.columns and c not in keys]
    missing = [c for c in compare_cols
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare_cols not in both snapshots: {missing}")
    o = old.select(*keys, *compare_cols,
                   F.lit(True).alias("__in_old"))
    for c in compare_cols:
        o = o.withColumnRenamed(c, f"{c}_old")
    n = new.select(*keys, *compare_cols,
                   F.lit(True).alias("__in_new"))
    for c in compare_cols:
        n = n.withColumnRenamed(c, f"{c}_new")
    j = o.join(n, on=keys, how="full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    ctype = (F.when(F.col("__in_old").isNull(), F.lit("inserted"))
              .when(F.col("__in_new").isNull(), F.lit("deleted"))
              .when(changed, F.lit("updated")))
    return (j.withColumn(change_col, ctype)
             .filter(F.col(change_col).isNotNull())
             .drop("__in_old", "__in_new"))


def scd2_history(changes: DataFrame, keys: list[str], ts_col: str,
                 attr_cols: list[str],
                 tiebreak: list[str] | None = None,
                 from_col: str = "valid_from", to_col: str = "valid_to",
                 current_col: str = "is_current") -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change log.

    Input: after-image rows (full attribute state per observation, e.g.
    CDC events or periodic snapshots), any number per key. Output: one
    row per (key, attribute-state interval) — ``valid_from`` (the first
    observation of that state), ``valid_to`` (exclusive; the next
    state's start, null while current) and ``is_current`` — the
    standard dimension-table versioning (Kimball SCD type 2) that lets
    a fact row join to the attributes AS OF its own timestamp.

    Consecutive observations with identical ``attr_cols`` collapse into
    one interval (null-safe comparison, so null -> value transitions
    open a new version); re-appearing states re-open (A -> B -> A is
    three intervals — history, not a distinct on state).

    Plan shape: ONE hash exchange on the key — both windows (the lag
    change-detector and the lead interval-closer) share the
    (key, ts)-sorted partition Catalyst plans once. Never a self-join;
    at 100 TB the cost is the one sort-shuffle any per-entity
    history pass pays. ``tiebreak`` must make (ts, tiebreak) unique per
    key or version order is nondeterministic.
    """
    if not keys:
        raise ValueError("scd2_history needs at least one key column")
    if not attr_cols:
        raise ValueError("scd2_history needs at least one attribute column")
    order = [F.col(ts_col).asc()] + [F.col(t).asc() for t in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c), 1).over(w))
    first = F.row_number().over(w) == 1
    points = (changes.withColumn("__new_version", first | changed)
                     .filter(F.col("__new_version"))
                     .drop("__new_version"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (points
            .withColumn(from_col, F.col(ts_col))
            .withColumn(to_col, F.lead(F.col(ts_col), 1).over(w2))
            .withColumn(current_col, F.col(to_col).isNull())
            .select(*keys, *attr_cols, from_col, to_col, current_col))
