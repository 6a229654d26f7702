"""Parquet sources/sinks (SURVEY §2.1).

``read_parquet_table`` papers over one real-world wart: Spark 4 refuses
parquet ``TIMESTAMP(NANOS)`` columns outright. We detect them from the
file footer (pyarrow, driver-side — no data read), flip the
``nanosAsLong`` legacy conf for the read, and rebuild proper microsecond
timestamps with *integer* division (nanosecond epochs exceed 2^53, so
float division would corrupt them). Truncation toward zero matches how
DuckDB / pyarrow downcast ns -> us, which keeps oracle comparisons exact.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _table_files(path: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) if os.path.isdir(path) else [path]
    return files or [path]


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Column names stored as TIMESTAMP(NANOS) in the parquet footer."""
    schema = pq.read_schema(_table_files(path)[0])
    out = []
    for name, typ in zip(schema.names, schema.types):
        if str(typ) == "timestamp[ns]":
            out.append(name)
    return out


# (path, (file, mtime)×N, applicationId) -> inferred Spark schema.
# ``spark.read.parquet(path)`` pays ~90 ms of driver work per call
# (eager footer schema inference + file listing on the JVM); with the
# schema pinned the read costs ~14 ms (measured, sf0.1 documents). The
# engine's entry queries construct the same base-table frames once or
# twice per query, so across a bench pass this is tens of seconds of
# pure driver latency. The memo key includes every parquet file's
# (name, mtime) — a re-written or appended path misses and re-infers —
# and the applicationId so a fresh application never reuses a stale
# schema. The pinned schema is exactly what inference returned for the
# same file set under the same nanosAsLong conf state, so the resulting
# DataFrame is identical.
_SCHEMA_CACHE: dict[tuple, object] = {}
_SCHEMA_CACHE_MAX = 1024


def _read_with_schema_memo(spark: SparkSession, path: str):
    try:
        key = (path,
               tuple((f, os.path.getmtime(f)) for f in _table_files(path)),
               spark.sparkContext.applicationId)
    except OSError:
        return spark.read.parquet(path)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        return spark.read.schema(cached).parquet(path)
    df = spark.read.parquet(path)
    if len(_SCHEMA_CACHE) >= _SCHEMA_CACHE_MAX:
        _SCHEMA_CACHE.clear()
    _SCHEMA_CACHE[key] = df.schema
    return df


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Read one parquet table, transparently fixing ns-timestamp columns."""
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return _read_with_schema_memo(spark, path)
    prev = spark.conf.get(_NANOS_CONF, "false")
    spark.conf.set(_NANOS_CONF, "true")
    try:
        # the memo key is conf-independent but the cached schema was
        # captured under nanosAsLong=true for ns tables (this branch
        # always sets it before reading), so reuse is self-consistent
        df = _read_with_schema_memo(spark, path)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    finally:
        spark.conf.set(_NANOS_CONF, prev)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Read the driver's test tables under ``sf_dir`` into a dict."""
    return {n: read_parquet_table(spark, f"{sf_dir}/{n}.parquet") for n in names}


# (canonicalized-plan string, applicationId) -> (n_partitions, sizeInBytes).
# The partition-count probe below costs ~50 ms of driver-side PHYSICAL
# PLANNING per fresh DataFrame (r15 "not yet optimized" item; dozens of
# probes per bench pass, most over identical plans — the same base-table
# scan probed by every operator that consumes it). Two semantically equal
# plans in one application yield the same scan partitioning (same files,
# same session confs), so the probe result is memoizable by the CANONICAL
# plan text — the full string, not a 32-bit semanticHash, because a hash
# collision here would silently change a repartition decision and with it
# the float-summation order of certified queries. The memo changes NO
# decisions: cache hits return exactly what the probe would have (and did)
# return. Contract (holds engine-wide): parquet dirs are immutable once
# written — versioned state frames supersede-then-delete under NEW paths,
# corpus output dirs are write-once — so a path's file set never changes
# under one application while a same-plan re-read occurs.
_NPARTS_CACHE: dict[tuple[str, str], tuple[int, int | None]] = {}
_NPARTS_CACHE_MAX = 1024
# probe telemetry (driver-side ints, no jobs): calls vs physical-planning
# probes actually paid — the r16 done-criterion evidence ("probe count in
# a bench trace drops to ≤ once per source relation")
_NPARTS_STATS = {"calls": 0, "misses": 0}


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None,
                       cpu_light: bool = False) -> DataFrame:
    """Repartition up if the plan has fewer partitions than cores.

    Small single-file inputs (one parquet row-group) otherwise pin
    CPU-heavy per-row stages (shingling, hashing, regex, Python kernels)
    to one task. No-op when the input is already wide — at 100 TB the
    scan naturally yields thousands of partitions and this never fires.

    ``cpu_light=True`` declares the downstream per-row work cheap (a
    vectorized matmul, simple exprs): the target is then capped by the
    optimizer's size estimate (~2 MB of input per task, floor 4), since
    fanning a 1 MB relation out to 32 tasks of a few dozen rows buys no
    CPU and pays 32 task schedules per downstream stage. CPU-bound
    kernels (the default) always get the full core count — for them the
    bytes-per-task heuristic under-parallelizes badly (shingling 5k docs
    is minutes of CPU on single-digit MB of input).

    Probe results are memoized per canonical plan (``_NPARTS_CACHE``):
    repeat probes of a semantically identical frame skip the physical
    planning, returning the identical count — the repartition DECISION
    (and hence certified partition layouts) is unchanged by construction.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    _NPARTS_STATS["calls"] += 1
    key = None
    try:
        key = (df._jdf.queryExecution().analyzed().canonicalized()
               .toString(),
               df.sparkSession.sparkContext.applicationId)
    except Exception:
        pass
    hit = _NPARTS_CACHE.get(key) if key is not None else None
    n = hit[0] if hit is not None else None
    size = hit[1] if hit is not None else None
    if min_partitions is None and cpu_light:
        if size is None:
            try:
                size = int(df._jdf.queryExecution().optimizedPlan()
                           .stats().sizeInBytes())
            except Exception:
                pass  # stats unavailable (e.g. streaming plan): keep cores
        if size is not None:
            target = max(4, min(target, size // (2 << 20) + 1))
    if n is None:
        _NPARTS_STATS["misses"] += 1
        try:
            # Same physical-plan RDD ``df.rdd`` wraps, minus the Python-
            # serialization stages that wrapper prepends — identical
            # partition count by construction, ~25 ms less driver work per
            # probe (this fires on every fresh DataFrame handed to a
            # shingling/hash path).
            n = df._jdf.queryExecution().toRdd().getNumPartitions()
        except Exception:
            n = df.rdd.getNumPartitions()
        if key is not None:
            if len(_NPARTS_CACHE) >= _NPARTS_CACHE_MAX:
                _NPARTS_CACHE.clear()
            _NPARTS_CACHE[key] = (n, size)
    if n < target:
        return df.repartition(target)
    return df


def write_bucketed_table(df: DataFrame, name: str, bucket_cols: list[str],
                         num_buckets: int = 32,
                         sort_cols: list[str] | None = None) -> DataFrame:
    """Persist ``df`` bucketed (and optionally sorted) by join/agg keys.

    Bucketing pre-shuffles the data once at write time: any later
    equi-join or aggregation on ``bucket_cols`` between tables bucketed
    the same way runs with NO exchange — at 100 TB this converts every
    repeated entity-key join from a shuffle into a local merge. (Parquet
    self-describing buckets need the session catalog: ``saveAsTable``.)
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    return df.sparkSession.table(name)


def write_parquet_handover(df: DataFrame, path: str, partitions: int | None = None,
                           block_size: int = 128 * 1024 * 1024) -> str:
    """Repartition + write parquet for downstream consumers (S1).

    Reference ``petastorm_handover`` (caspr/utils/spark/preprocess.py:47-62)
    used 1 MiB row groups to widen Petastorm streaming parallelism; for
    pure-Spark consumers the 128 MiB default here is the right row-group
    size — pass ``block_size=1 << 20`` to reproduce the Petastorm tuning.
    """
    writer = (df.repartition(partitions) if partitions else df).write
    writer.mode("overwrite").option("parquet.block.size", block_size).parquet(path)
    return path


def write_table(df: DataFrame, path: str, format: str = "csv",
                mode: str = "overwrite", compression: str | None = None,
                **options) -> str:
    """Write ``df`` as csv (header on) or json (JSON-lines) — the
    interchange formats the parquet-native reference never speaks.

    CSV/JSONL are row formats with no column pruning or predicate
    pushdown, so they are HANDOVER formats here (exports to other
    stacks), not storage formats; the scale path stays parquet. Pass
    ``compression`` ('gzip', 'zstd', ...) for wire-size-sensitive
    exports — note gzip'd csv is not splittable, so one file = one read
    task downstream.
    """
    if format not in ("csv", "json"):
        raise ValueError(f"format must be csv or json, got {format!r}")
    writer = df.write.mode(mode)
    if format == "csv":
        writer = writer.option("header", "true")
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    getattr(writer, format)(path)
    return path


def read_table(spark: SparkSession, path: str, format: str = "csv",
               schema=None, **options) -> DataFrame:
    """Read a csv/json table written by :func:`write_table`.

    ALWAYS pass ``schema`` in production — schema inference runs an
    extra full scan of the data and infers per-file types that can
    disagree across files; with an explicit schema the read is
    single-pass and stable. (Falls back to inference when omitted, for
    exploration only.)
    """
    if format not in ("csv", "json"):
        raise ValueError(f"format must be csv or json, got {format!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif format == "csv":
        options.setdefault("inferSchema", "true")
    if format == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader, format)(path)


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          id_col: str, sort_cols: list[str] | None = None,
                          seed: int = 42) -> dict:
    """Export a training corpus as ``n_shards`` DETERMINISTIC shards +
    a manifest — the handover format a multi-node data loader consumes
    (each worker reads ``shard = rank % n_shards``, exactly once, no
    coordination).

    Shard assignment is ``md5(seed ‖ id) mod n_shards`` — the portable
    keyed-hash discipline of ``operators.sampling`` (stable across
    Spark versions, partitionings, and engines, unlike ``hash()``), so
    re-exporting the same table yields byte-identical shard membership.
    Rows sort by ``sort_cols`` (default: the id) INSIDE each shard —
    deterministic iteration order without any global sort. The manifest
    (``_manifest.json``) records per-shard row counts and an
    order-insensitive id checksum, which ``read_training_shards``
    re-verifies — torn/partial exports fail loudly at read time, not
    as silently-shorter epochs.

    Scale shape: one hash exchange into ``n_shards`` write tasks
    (``repartition`` on the shard id), sort within partitions only.
    """
    from caspr_spark.operators.sampling import _hash_col
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # the portable keyed hash is operators.sampling's — ONE definition
    # of the md5 discipline, not a re-rolled variant
    shard = F.pmod(
        F.conv(F.substring(_hash_col([id_col], seed), 1, 15), 16, 10)
        .cast("long"), F.lit(n_shards)).cast("int")
    out = df.withColumn("__shard", shard)
    sort_cols = list(sort_cols or [id_col])
    (out.repartition(n_shards, F.col("__shard"))
        .sortWithinPartitions("__shard", *sort_cols)
        .write.mode("overwrite").partitionBy("__shard").parquet(path))
    # manifest stats come from the FILES JUST WRITTEN, not a second
    # scan of the source plan: a non-bit-stable plan (sample/limit/
    # rand-derived columns) would otherwise produce a manifest for a
    # different row set than the export — the exact torn-export
    # confusion the manifest exists to rule out
    written = df.sparkSession.read.parquet(path)
    per_shard = {int(r["__shard"]): {"rows": int(r["rows"]),
                                     "id_xor": int(r["id_xor"])}
                 for r in written.groupBy("__shard").agg(
                     F.count(F.lit(1)).alias("rows"),
                     # order-insensitive checksum: XOR of id hashes
                     F.bit_xor(F.conv(F.substring(F.md5(
                         F.col(id_col).cast("string")), 1, 15), 16, 10)
                         .cast("long")).alias("id_xor")).collect()}
    manifest = {
        "n_shards": n_shards, "id_col": id_col, "seed": seed,
        "total_rows": sum(v["rows"] for v in per_shard.values()),
        "shards": {str(k): per_shard.get(k, {"rows": 0, "id_xor": 0})
                   for k in range(n_shards)},
    }
    import json as _json
    import os as _os
    with open(_os.path.join(path, "_manifest.json"), "w") as fh:
        _json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def read_training_shards(spark: SparkSession, path: str,
                         verify: bool = True) -> DataFrame:
    """Read a shard export back (all shards), verifying the manifest's
    per-shard row counts and id checksums when ``verify`` (one
    aggregation over the ids — cheap next to the read itself)."""
    import json as _json
    import os as _os
    with open(_os.path.join(path, "_manifest.json")) as fh:
        manifest = _json.load(fh)
    df = spark.read.parquet(path)
    if verify:
        id_col = manifest["id_col"]
        got = {int(r["__shard"]): (int(r["rows"]), int(r["id_xor"]))
               for r in df.groupBy("__shard").agg(
                   F.count(F.lit(1)).alias("rows"),
                   F.bit_xor(F.conv(F.substring(F.md5(
                       F.col(id_col).cast("string")), 1, 15), 16, 10)
                       .cast("long")).alias("id_xor")).collect()}
        for k, want in manifest["shards"].items():
            if want["rows"] == 0:
                continue
            g = got.get(int(k))
            if g != (want["rows"], want["id_xor"]):
                raise ValueError(
                    f"shard {k} fails manifest verification: "
                    f"got rows/checksum {g}, manifest says "
                    f"({want['rows']}, {want['id_xor']}) — partial or "
                    "torn export")
    return df
