"""Source/sink seam — Iceberg when available, parquet otherwise.

The reference has no storage layer at all (caller passes in-memory terms,
``/root/reference/src/evalidate.erl:19``); the north rule targets Iceberg
tables.  This sandbox has no ``iceberg-spark-runtime`` jar, so the seam
detects the runtime and degrades to parquet with identical call sites:
swap the table ref from a path to ``catalog.db.table`` and the same
pipeline runs against Iceberg (hidden partitioning, snapshot reads,
dynamic overwrite all come from the format, not from us).

Refs:

* ``"iceberg:db.tbl"`` or any dotted name with the Iceberg extension
  loaded → ``spark.read.format("iceberg").load`` / ``writeTo`` API
* a filesystem path → parquet (``spark.read.parquet`` / ``write.parquet``)

Snapshot pinning: ``read_table(..., snapshot_id=...)`` maps to Iceberg's
``snapshot-id`` read option; the parquet fallback honors it when the path
is a :class:`SnapshotLog` directory (append/overwrite snapshot chain with
atomic JSON manifests, same commit protocol as the checkpoint layer) and
raises on a bare parquet path — checkpoint manifests
(:mod:`evalidate_spark.checkpoint`) provide the resume story either way.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

ICEBERG_PREFIX = "iceberg:"

# catalog identifier: dotted bare words, no path separators, and the last
# segment is not a data-file extension (data.parquet is a PATH, not a table)
_TABLE_IDENT = re.compile(r"^[A-Za-z_]\w*(\.[A-Za-z_]\w*)+$")
_FILE_EXTS = ("parquet", "orc", "csv", "json", "avro")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath (the
    DataSource can be instantiated)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def _is_iceberg_ref(ref: str, spark: SparkSession) -> bool:
    if ref.startswith(ICEBERG_PREFIX):
        return True
    # bare dotted identifier (db.tbl) — but never a dotted FILENAME like
    # 'data.parquet', which is a relative filesystem path
    return (
        _TABLE_IDENT.match(ref) is not None
        and ref.rsplit(".", 1)[-1].lower() not in _FILE_EXTS
        and iceberg_available(spark)
    )


def _strip(ref: str) -> str:
    return ref[len(ICEBERG_PREFIX):] if ref.startswith(ICEBERG_PREFIX) else ref


def has_snapshot_log(path: str) -> bool:
    """True iff *path* is a directory with at least one PUBLISHED
    snapshot manifest.  The mere existence of a ``snapshots/`` subdir is
    not enough: an unrelated folder of that name (or a SnapshotLog
    skeleton created before any commit) must not hijack a plain parquet
    directory into the snapshot code path — that would silently read (or
    validate) nothing."""
    import os

    d = os.path.join(path, "snapshots")
    try:
        return any(f.endswith(".json") for f in os.listdir(d))
    except OSError:
        return False


def read_table(
    spark: SparkSession,
    ref: str,
    snapshot_id: Optional[int] = None,
    fmt: str = "parquet",
) -> DataFrame:
    """E5 — the engine's only scan.  Iceberg table identifier or
    parquet/ORC path; ``snapshot_id`` pins a snapshot (time-travel read)
    — Iceberg's ``snapshot-id`` read option, or the :class:`SnapshotLog`
    manifest chain when the path is a snapshot-logged parquet directory.
    ``fmt='orc'`` reads an ORC path (columnar like parquet — predicate
    pushdown and column pruning work the same; snapshot logging stays
    parquet-only)."""
    import os

    if fmt not in ("parquet", "orc"):
        raise ValueError("fmt must be 'parquet' or 'orc'")
    if _is_iceberg_ref(ref, spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(_strip(ref))
    if fmt == "orc":
        if snapshot_id is not None:
            raise ValueError("snapshot reads are not supported for ORC paths")
        return spark.read.orc(ref)
    if has_snapshot_log(ref):
        return SnapshotLog(ref).read(spark, snapshot_id)
    if snapshot_id is not None:
        raise ValueError(
            "snapshot reads need the Iceberg runtime or a SnapshotLog "
            "directory; this parquet path has neither (resume via "
            "checkpoint manifests instead)"
        )
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "append",
    partition_by: Sequence[str] = (),
    fmt: str = "parquet",
) -> None:
    """E6 — violations/verdicts/metrics sink.  ``mode`` is ``append`` |
    ``overwrite`` (dynamic partition overwrite on every format);
    ``fmt`` is ``parquet`` (default) | ``orc``."""
    if fmt not in ("parquet", "orc"):
        raise ValueError("fmt must be 'parquet' or 'orc'")
    spark = df.sparkSession
    if _is_iceberg_ref(ref, spark):
        name = _strip(ref)
        if partition_by:
            # Iceberg partitioning is a TABLE property, fixed at creation —
            # it cannot be applied per-append.  Honor it only on a full
            # replace; reject the silent-ignore combination otherwise.
            if mode != "overwrite":
                raise ValueError(
                    "partition_by with an Iceberg append is not applicable: "
                    "partitioning is set when the table is created "
                    "(use mode='overwrite' to createOrReplace with the spec)"
                )
            from pyspark.sql.functions import col

            df.writeTo(name).partitionedBy(
                *[col(c) for c in partition_by]
            ).createOrReplace()
            return
        w = df.writeTo(name)
        if mode == "overwrite":
            w.overwritePartitions()
        else:
            w.append()
        return
    writer = df.write.mode(mode)
    if partition_by:
        # per-write override: Spark's default partitionOverwriteMode=static
        # would drop ALL existing partitions on overwrite, not just the
        # ones being rewritten — dynamic matches the incremental-rewrite
        # contract in the docstring (and Iceberg's overwritePartitions)
        writer = writer.partitionBy(*partition_by).option(
            "partitionOverwriteMode", "dynamic"
        )
    if fmt == "orc":
        writer.orc(ref)
    else:
        writer.parquet(ref)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
):
    """Schema-enforced JSONL ingestion — the raw-crawl entry path of a
    training-data pipeline — returning ``(clean_df, corrupt_df)``.

    *schema* (StructType or DDL string) is REQUIRED: schema inference is a
    second full scan of the corpus at 100 TB.  ``mode`` is Spark's reader
    mode — PERMISSIVE (default) captures each malformed line verbatim in
    *corrupt_col* and parses what it can (a type-mismatched field NULLs
    that field, keeps the rest, and still flags the row); DROPMALFORMED
    silently drops; FAILFAST raises on first error.

    ``clean_df`` carries exactly the schema's columns, malformed rows
    excluded.  ``corrupt_df`` carries the partially-parsed columns PLUS
    the raw line in ``raw_record``.  Corruption is detected by a
    full-schema expression parse, so it is stable under any downstream
    projection (see :func:`_read_malformed_capture` for why the native
    reader is not).  Blank lines are skipped."""
    return _read_malformed_capture(spark, path, schema, "json", mode, corrupt_col)


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    **options,
):
    """Schema-enforced CSV/TSV ingestion with malformed-row capture —
    same contract as :func:`read_jsonl` (``(clean_df, corrupt_df)``,
    PERMISSIVE keeps the raw line in ``raw_record``).  Extra reader
    options pass through (``sep='\\t'``, ``quote``, ``nullValue``, ...;
    ``header``/``multiLine`` are rejected — per-line parse).  CSV marks a
    row corrupt on type mismatch or token-count mismatch vs the FULL
    schema, independent of what downstream queries project."""
    return _read_malformed_capture(
        spark, path, schema, "csv", mode, corrupt_col, **options
    )


def _read_malformed_capture(
    spark, path, schema, fmt, mode, corrupt_col, **options
):
    """Line-oriented ingestion with FAITHFUL malformed-row capture:
    ``spark.read.text`` + ``from_json``/``from_csv`` expressions, NOT the
    native json/csv readers.  The native readers re-detect corruption
    against the REQUIRED (column-pruned) schema, so a downstream
    projection of the corrupt side (e.g. ``select(id, raw_record)``)
    silently re-parses with fewer columns and UN-corrupts rows — a
    "c,solo" row that is corrupt under a 3-column schema parses fine when
    pruned to ``doc_id`` and vanishes from the violation channel.  An
    expression-level parse is over the whole line by construction, so
    what is corrupt cannot depend on which columns a query touches.
    Cost: the clean side loses parse-time column pruning (the same bytes
    are scanned either way); callers that want a clean-only fast path and
    accept pruned-schema corruption semantics can use the native reader
    directly.

    ``header``/``multiLine`` are rejected: a per-line parse has no
    per-file first-line or cross-line context (strip headers upstream)."""
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
        raise ValueError("mode must be PERMISSIVE | DROPMALFORMED | FAILFAST")
    for k in ("header", "multiLine"):
        if str(options.get(k, "")).lower() == "true":
            raise ValueError(
                "%s is not supported by the malformed-capture reader "
                "(per-line parse; strip headers / flatten records upstream)" % k
            )
    opts = {k: str(v) for k, v in options.items()}
    data_cols = [f.name for f in schema.fields]
    # whitespace-only lines are skipped, matching the native readers
    # (rlike, not trim: trim strips only spaces, and a tab-only line would
    # otherwise parse to an all-NULL phantom clean row)
    lines = spark.read.text(path).filter(~F.col("value").rlike(r"^\s*$"))

    def ddl(target_schema):
        # simpleString() doesn't backtick-quote field names, so non-plain
        # identifiers ("doc id") would break from_csv's schema parse
        return ", ".join(
            "`%s` %s" % (f.name.replace("`", "``"), f.dataType.simpleString())
            for f in target_schema.fields
        )

    def parse(target_schema, parse_opts):
        if fmt == "json":
            return F.from_json(F.col("value"), target_schema, parse_opts)
        return F.from_csv(F.col("value"), F.lit(ddl(target_schema)), parse_opts)

    if mode == "FAILFAST":
        parsed = lines.select(parse(schema, {**opts, "mode": "FAILFAST"}).alias("__p"))
        clean = parsed.select(*["__p.`%s`" % c for c in data_cols])
        empty = clean.filter(F.lit(False)).withColumn(
            "raw_record", F.lit(None).cast("string")
        )
        return clean, empty
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    parse_opts = {**opts, "mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col}
    parsed = lines.select(
        F.col("value").alias("__raw"), parse(full, parse_opts).alias("__p")
    )
    is_bad = F.col("__p.`%s`" % corrupt_col).isNotNull()
    cols = [F.col("__p.`%s`" % c).alias(c) for c in data_cols]
    clean = parsed.filter(~is_bad).select(*cols)
    bad = F.lit(False) if mode == "DROPMALFORMED" else is_bad
    corrupt = parsed.filter(bad).select(*cols, F.col("__raw").alias("raw_record"))
    return clean, corrupt


def jsonl_violations(
    corrupt_df: DataFrame, id_col: Optional[str] = None, fmt: str = "jsonl"
) -> DataFrame:
    """Reshape :func:`read_jsonl`/:func:`read_csv` corrupt rows into the
    engine's typed violation schema ``(doc_id, rule_seq, rule_id,
    key_path, span_index, message, value_repr)`` so source-level parse
    failures flow through the same sinks/verdicts as rule violations.

    ``doc_id`` comes from the partially-parsed *id_col* when given (a
    type-mismatch row usually still parses its id); ``value_repr`` is the
    raw line under the engine's message contract — ``<``/``>`` escaped and
    cut at 128 chars (``/root/reference/src/evv.erl:233-234``,
    ``include/ev_errors.hrl:17-22``)."""
    from .compiler import c_maybe_cut, c_unscriptize

    did = (
        F.col("`%s`" % id_col).cast("string")
        if id_col
        else F.lit(None).cast("string")
    )
    label = {"jsonl": "JSON", "csv": "CSV"}.get(fmt, fmt.upper())
    return corrupt_df.select(
        did.alias("doc_id"),
        F.lit(0).alias("rule_seq"),
        F.lit("source:%s" % fmt).alias("rule_id"),
        F.lit("none").alias("key_path"),
        F.lit(None).cast("int").alias("span_index"),
        F.lit("Malformed %s record" % label).alias("message"),
        c_maybe_cut(c_unscriptize(F.col("raw_record"))).alias("value_repr"),
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Bucketed managed table (``bucketBy`` + ``saveAsTable``) — the
    co-located-join layout: two tables bucketed by the same key with the
    same bucket count join WITHOUT any exchange (Spark matches bucket
    spec to the join key; with ``sort`` the sort-merge join also skips the
    sort).  This is the pre-shuffle you pay ONCE at ingest so every
    subsequent referential / enrichment join on the key is shuffle-free —
    the right trade at 10^12 rows where the fact table is joined
    repeatedly.  (Iceberg's ``bucket(N, key)`` hidden partitioning plays
    the same role through the seam above.)"""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    order_cols=None,
) -> None:
    """Bounded training shards: every output parquet file holds at most
    ``rows_per_shard`` rows (``maxRecordsPerFile`` — the writer rolls
    files, so a skewed partition can't produce a 50 GB shard that stalls
    one loader worker).  With ``order_cols`` the data is range-partitioned
    and sorted so shard N's key range precedes shard N+1's — a globally
    ordered layout loaders can seek by shard index.  Note the range
    BOUNDARIES are sampled per run (Spark's RangePartitioner seeds its
    reservoir from the RDD id), so two sessions may split the same input
    at different keys: the ordering contract holds per run, byte-identical
    re-sharding does not.  For cross-run-stable boundaries, pre-bucket by
    an explicit key range (e.g. ``write_bucketed`` or a computed shard
    column) instead.

    This is a per-write option, not a session conf, so concurrent writers
    with different shard sizes don't interfere."""
    if rows_per_shard <= 0:
        raise ValueError("rows_per_shard must be positive")
    out = df
    if order_cols:
        out = df.repartitionByRange(*[F.col("`%s`" % c) for c in order_cols])
        out = out.sortWithinPartitions(*[F.col("`%s`" % c) for c in order_cols])
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .parquet(path)
    )


def file_stats(
    spark: SparkSession, path: str, with_rows: bool = False
) -> DataFrame:
    """Per-file layout stats for a parquet table: one row ``(file, bytes
    [, n_rows])`` per data file.  Sizes come from the ``binaryFile``
    source with only ``path``/``length`` projected — a pure file-status
    listing, NO file content is read, so at 10^12 docs this costs
    O(#files) driver-free metadata work, not a data scan.  ``with_rows``
    adds per-file row counts via a ``groupBy(input_file_name())`` count —
    that IS a full scan (columnless, so parquet reads only footers+
    rowgroup headers); keep it off for routine health sweeps.

    The small-file problem this feeds is the top operational failure mode
    of a 100 TB table: a day of streaming commits can leave millions of
    KB-sized files whose per-file open/footer cost dwarfs the data read.
    Pair with :func:`storage_health` to get the compaction verdict, and
    :meth:`SnapshotLog.compact` to fix it."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("file"),
            F.col("length").alias("bytes"),
        )
    )
    if not with_rows:
        return files
    rows = (
        spark.read.parquet(path)
        .groupBy(
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file")
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # both sides are one row per FILE — tiny; let AQE broadcast
    return files.join(rows, "file", "left").select(
        "file", "bytes", F.coalesce("n_rows", F.lit(0)).alias("n_rows")
    )


def storage_health(
    stats: DataFrame, target_bytes: int = 256 << 20
) -> DataFrame:
    """One-row compaction verdict from :func:`file_stats` output:
    ``(n_files, total_bytes, min_bytes, max_bytes, small_files,
    recommended_files, needs_compaction)``.  A file is "small" under half
    the *target_bytes* (the classic Iceberg/Delta compaction trigger);
    ``recommended_files = ceil(total/target)`` is the file count a
    rewrite should aim for, and ``needs_compaction`` fires when more than
    half the files are small AND a rewrite would at least halve the file
    count.  Single aggregate over file-level rows — metadata-scale."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    half = target_bytes // 2
    agg = stats.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.min("bytes").alias("min_bytes"),
        F.max("bytes").alias("max_bytes"),
        F.sum((F.col("bytes") < half).cast("long")).alias("small_files"),
    )
    rec = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("total_bytes") / F.lit(int(target_bytes))).cast("long"),
    )
    return agg.select(
        "n_files",
        "total_bytes",
        "min_bytes",
        "max_bytes",
        "small_files",
        rec.alias("recommended_files"),
        (
            (F.col("small_files") * 2 > F.col("n_files"))
            & (rec * 2 <= F.col("n_files"))
        ).alias("needs_compaction"),
    )


def zorder_bounds(df: DataFrame, columns):
    """1-row bounds DataFrame ``(__lo_<c>, __hi_<c>, …)`` for
    :func:`zorder_key` — crossJoin-broadcast it onto the data first."""
    aggs = []
    for c in columns:
        v = F.col("`%s`" % c).cast("double")
        aggs += [F.min(v).alias("__lo_%s" % c), F.max(v).alias("__hi_%s" % c)]
    return df.agg(*aggs)


def zorder_key(columns, bits: int = 16):
    """Z-order (Morton) key Column over *columns*: each value is
    min-max-normalised to ``[0, 2^bits)`` using ``__lo_<c>``/``__hi_<c>``
    columns (crossJoin-broadcast :func:`zorder_bounds` output first), then
    the bit strings are interleaved.  Rows close in EVERY dimension get
    numerically close keys, so range-partitioning by the key clusters
    multi-dimensional neighbourhoods into the same files — parquet
    min/max stats then prune scans filtered on ANY of the dimensions, not
    just a leading sort key.  Pure integer shift/or expressions
    (whole-stage codegen); NULL in any dimension → NULL key (sorts first
    — a dedicated NULL file region).  ``bits × len(columns)`` must fit
    the 63 value bits of a signed long: beyond that, shifts would hit the
    sign bit (negative keys range-partitioning FIRST) or wrap mod 64
    (bits of different columns silently colliding)."""
    n = len(columns)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(
            "bits * len(columns) = %d exceeds the 63 usable bits of a signed "
            "long key - lower bits (e.g. bits=%d for %d columns)"
            % (bits * n, 63 // n, n)
        )
    cells = []
    not_null = None
    for c in columns:
        v = F.col("`%s`" % c).cast("double")
        lo, hi = F.col("__lo_%s" % c), F.col("__hi_%s" % c)
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        cells.append(
            F.least(
                F.lit((1 << bits) - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((v - lo) / span * (1 << bits)).cast("long"),
                ),
            )
        )
        nn = v.isNotNull()
        not_null = nn if not_null is None else (not_null & nn)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for j, cell in enumerate(cells):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * n + j
                )
            )
    # least/greatest SKIP nulls, so a NULL dimension would otherwise be
    # silently folded into cell 0 — mask to honour the NULL-key contract
    return F.when(not_null, key)


def write_zordered(
    df: DataFrame,
    path: str,
    columns,
    bits: int = 16,
    num_files: int = 32,
) -> None:
    """Write *df* as parquet clustered by the Z-order of *columns* —
    multi-dimensional data-skipping layout: one tiny bounds agg
    (broadcast), the key projection, ``repartitionByRange`` on the key
    (one range shuffle — the once-at-ingest cost), key dropped before
    write.  Filters on any clustered column then prune files via parquet
    min/max stats instead of scanning everything."""
    bounds = zorder_bounds(df, columns)
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__zkey", zorder_key(columns, bits)
    )
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__lo_{c}" for c in columns], *[f"__hi_{c}" for c in columns])
        .write.mode("overwrite")
        .parquet(path)
    )


@dataclass
class ResultSink:
    """Writes a ValidationResult's three outputs as tables under one root
    (or three Iceberg tables when *root* is ``iceberg:db`` — the north
    rule's violations/verdicts/metrics tables)."""

    root: str

    def _ref(self, name: str) -> str:
        # dotted table refs only for an EXPLICIT iceberg root; any other
        # root is a filesystem directory (relative roots included)
        if self.root.startswith(ICEBERG_PREFIX):
            return f"{self.root}.{name}"
        return f"{self.root.rstrip('/')}/{name}"

    def write(self, result, mode: str = "append") -> dict:
        """result: :class:`evalidate_spark.engine.ValidationResult`.

        The three outputs derive from one lazy validated plan — it is
        persisted across the writes so the corpus is scanned and validated
        ONCE, not three times, and metrics cannot diverge from the written
        violations (same pitfall fixed in checkpoint.py)."""
        refs = {
            "violations": self._ref("violations"),
            "verdicts": self._ref("verdicts"),
            "metrics": self._ref("metrics"),
        }
        ann = result.annotated
        ann.persist()
        try:
            write_table(result.violations, refs["violations"], mode)
            write_table(result.verdicts, refs["verdicts"], mode)
            write_table(result.metrics(), refs["metrics"], mode)
        finally:
            ann.unpersist()
        return refs


# ------------------------------------------------------------ snapshot log
# A minimal Iceberg-shaped snapshot layer for the PARQUET fallback: every
# commit writes its data files under an isolated subdirectory, then
# atomically publishes a JSON manifest naming (snapshot_id, operation,
# parent, file list).  Readers resolve a snapshot to its file list by
# walking parents (append = parent files + own; overwrite = own only), so
# - reads are repeatable: a concurrent append can never change what an
#   already-resolved snapshot returns (files are immutable once published);
# - time travel is a constructor argument, exactly like Iceberg's
#   snapshot-id read option that read_table maps to when the jar exists.
# Commit protocol is the same temp-file + os.replace claim the checkpoint
# manifests use: a crash mid-write leaves an unpublished data directory,
# never a half-readable snapshot.

class SnapshotLog:
    """Append/overwrite snapshots over a parquet directory with
    time-travel reads.  One writer at a time (single-driver pipelines —
    the checkpoint runner — not a multi-writer catalog; Iceberg itself
    is the answer once the runtime jar is present)."""

    def __init__(self, path: str):
        import os

        self.path = path
        self._snap_dir = os.path.join(path, "snapshots")
        os.makedirs(self._snap_dir, exist_ok=True)

    # ---- log state
    def snapshots(self):
        """All published snapshots, oldest first: list of dicts
        ``(snapshot_id, operation, parent, n_files, ts)``."""
        import json
        import os

        out = []
        for f in sorted(os.listdir(self._snap_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self._snap_dir, f)) as fh:
                    out.append(json.load(fh))
        return out

    def latest_id(self):
        snaps = self.snapshots()
        return snaps[-1]["snapshot_id"] if snaps else None

    # ---- write path
    def commit(
        self, df: DataFrame, operation: str = "append", compaction: bool = False
    ) -> int:
        """Write *df* as a new snapshot; returns its snapshot id.
        ``operation``: ``append`` (new snapshot = parent's files + these)
        or ``overwrite`` (new snapshot = these files only).
        ``compaction`` marks the manifest as a pure REWRITE of
        already-published rows — consumers that process snapshots as
        increments (``checkpoint.list_units``) skip it."""
        import json
        import os
        import time as _time

        if operation not in ("append", "overwrite"):
            raise ValueError("operation must be append|overwrite")
        parent = self.latest_id()
        sid = (parent or 0) + 1
        data_dir = os.path.join(self.path, "data", "snap-%05d" % sid)
        # a crash between data write and manifest publish leaves an
        # ORPHAN data dir for this very sid (it is unpublished by
        # construction: publish is atomic and sid = latest+1, so no
        # manifest can reference it) — clear it or every future commit
        # would wedge on PATH_ALREADY_EXISTS (review finding)
        if os.path.isdir(data_dir):
            import shutil

            shutil.rmtree(data_dir)
        df.write.mode("error").parquet(data_dir)
        files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        rec = {
            "snapshot_id": sid,
            "operation": operation,
            "compaction": bool(compaction),
            "parent": parent,
            "files": files,
            "n_files": len(files),
            "ts": _time.time(),
        }
        tmp = os.path.join(self._snap_dir, ".%05d.tmp" % sid)
        with open(tmp, "w") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self._snap_dir, "%05d.json" % sid))
        return sid

    # ---- read path
    def files(self, snapshot_id: Optional[int] = None):
        """Resolve a snapshot (default: latest) to its immutable file
        list by walking the parent chain back to the nearest overwrite."""
        snaps = {s["snapshot_id"]: s for s in self.snapshots()}
        if not snaps:
            return []
        sid = snapshot_id if snapshot_id is not None else max(snaps)
        if sid not in snaps:
            raise ValueError(
                "unknown snapshot %r (have %s)" % (snapshot_id, sorted(snaps))
            )
        out = []
        cur = snaps[sid]
        while True:
            out = list(cur["files"]) + out
            if cur["operation"] == "overwrite" or cur["parent"] is None:
                break
            cur = snaps[cur["parent"]]
        return out

    def read(self, spark: SparkSession, snapshot_id: Optional[int] = None) -> DataFrame:
        files = self.files(snapshot_id)
        if not files:
            raise ValueError("snapshot log at %r has no snapshots" % self.path)
        return spark.read.parquet(*files)

    # ---- maintenance
    def compact(self, spark: SparkSession, target_files: int = 8) -> int:
        """Rewrite the CURRENT table state as one ``overwrite`` snapshot
        with ~*target_files* data files — the small-file remedy: a long
        append chain accumulates one file set per commit, and at scale
        the per-file open cost starts to dominate the scan.  Published
        history is untouched (snapshots are immutable; time travel to
        pre-compaction ids still works), the parent chain simply
        restarts at the compacted snapshot.  Returns the new snapshot
        id."""
        df = self.read(spark)
        return self.commit(
            df.coalesce(int(target_files)), operation="overwrite", compaction=True
        )

    def schema(self, spark: SparkSession, snapshot_id: Optional[int] = None):
        """The resolved StructType of a snapshot's file set (default:
        latest) — what a reader of that snapshot actually sees."""
        return self.read(spark, snapshot_id).schema

    def expire(self, keep_last: int = 5) -> dict:
        """Expire history older than the last *keep_last* snapshots and
        physically delete data files nothing retained references — the
        Iceberg ``expireSnapshots`` maintenance op: without it an
        append-per-increment table keeps every byte it has ever written.

        Retained snapshots must stay readable after their ancestors'
        manifests disappear, so the OLDEST retained snapshot is first
        rewritten in place as a self-contained ``overwrite`` manifest
        (its fully-resolved file list, ``parent: null``) — the chain is
        flattened at the retention boundary, file paths unchanged, no
        data rewrite.  Publication order makes a crash safe at every
        step: the boundary rewrite is an atomic ``os.replace`` that
        preserves the snapshot's resolution; manifests are deleted
        before data files, so a partial delete leaves only unreferenced
        garbage for the next ``expire`` — never a dangling reference.

        Returns ``{"expired_snapshots": [...], "deleted_files": n,
        "boundary": sid}``.  ``keep_last`` must be >= 1; expiring
        nothing is a no-op."""
        import json
        import os

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1, got %r" % keep_last)
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return {"expired_snapshots": [], "deleted_files": 0,
                    "boundary": self.latest_id()}
        kept = snaps[-keep_last:]
        expired = snaps[:-keep_last]
        boundary = kept[0]
        # 1. flatten the boundary: resolve its file set THROUGH the
        # soon-to-die ancestors, republish self-contained
        resolved = self.files(boundary["snapshot_id"])
        rec = dict(boundary)
        rec.update(
            operation="overwrite", parent=None,
            files=resolved, n_files=len(resolved),
        )
        name = "%05d.json" % boundary["snapshot_id"]
        tmp = os.path.join(self._snap_dir, "." + name + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self._snap_dir, name))
        # 2. drop expired manifests (readers can no longer reach them)
        for s in expired:
            p = os.path.join(self._snap_dir, "%05d.json" % s["snapshot_id"])
            if os.path.exists(p):
                os.remove(p)
        # 3. delete data files no retained snapshot resolves to
        live = set()
        for s in self.snapshots():
            live.update(self.files(s["snapshot_id"]))
        deleted = 0
        for s in expired:
            for f in s["files"]:
                if f not in live and os.path.exists(f):
                    os.remove(f)
                    deleted += 1
        # sweep now-empty snapshot data dirs (cosmetic; files are gone)
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                full = os.path.join(data_root, d)
                if os.path.isdir(full) and not any(
                    f.endswith(".parquet") for f in os.listdir(full)
                ):
                    import shutil

                    shutil.rmtree(full)
        return {
            "expired_snapshots": [s["snapshot_id"] for s in expired],
            "deleted_files": deleted,
            "boundary": boundary["snapshot_id"],
        }


def schema_drift(
    spark: SparkSession,
    log: "SnapshotLog",
    from_snapshot: int,
    to_snapshot: Optional[int] = None,
) -> DataFrame:
    """Schema evolution between two snapshots of a :class:`SnapshotLog` —
    one row per changed column: ``(column, change, from_type, to_type)``
    with ``change`` ∈ ``added`` / ``removed`` / ``type_changed``.

    A column silently vanishing or flipping type between ingest commits is
    the schema-level twin of distribution drift — rules keyed on it stop
    firing (soft mode) or everything fails at once (hard mode), and both
    are cheaper to catch at the manifest than in the violation counts.
    Pure metadata: two footer-level schema resolutions and an O(columns)
    driver-side diff; no data is scanned.  Types compare by Spark simple
    string (``bigint``, ``array<string>``, …), nested struct/array
    changes therefore surface as a single ``type_changed`` row on the top
    column."""
    from pyspark.sql import types as T

    a = {f.name: f.dataType.simpleString() for f in log.schema(spark, from_snapshot)}
    # None passes through: read()'s own default already resolves latest
    b = {f.name: f.dataType.simpleString() for f in log.schema(spark, to_snapshot)}
    rows = []
    for name in sorted(set(a) | set(b)):
        if name not in b:
            rows.append((name, "removed", a[name], None))
        elif name not in a:
            rows.append((name, "added", None, b[name]))
        elif a[name] != b[name]:
            rows.append((name, "type_changed", a[name], b[name]))
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("change", T.StringType()),
            T.StructField("from_type", T.StringType()),
            T.StructField("to_type", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
