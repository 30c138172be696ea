"""Delta tables as a registrable Spark DATA SOURCE — batch and
Structured Streaming — via PySpark 4's Python Data Source API
(``pyspark.sql.datasource``), so the engine's Delta layer plugs into
the stock reader surfaces:

    spark.dataSource.register(DeltaLogDataSource)
    spark.read.format("deltalog").load(path)                  # snapshot
    spark.readStream.format("deltalog").load(path)            # commits

The STREAMING reader is the piece Spark itself has no Python-native
answer for: offsets are Delta log versions ({"version": N} = all
commits ≤ N consumed), each micro-batch covers the commit window
(start, end], and its partitions are exactly the window's added files —
one task per file, cost ∝ new data, never a snapshot rescan. That is
the Delta streaming-source contract at any table size: a 100 TB table
with a trickle of appends streams the trickle.

Semantics mirror delta-spark's streaming source:
- append-only by default: a commit carrying dataChange removes
  (UPDATE/DELETE/MERGE rewrites) raises, because its row-level effect
  cannot be represented as an append;
- ``option("skipChangeCommits", "true")`` skips such commits wholesale
  (delta-spark's same-named option);
- ``option("startingVersion", N)`` begins at commit N instead of 0;
  ``option("startingVersion", "latest")`` streams only NEW commits;
  ``option("startingTimestamp", ts)`` (round-11) begins at the first
  commit whose monotonized clock is >= ts (epoch ms or ISO-8601, the
  same resolution rule as ``table_changes``; a ts past the latest
  commit raises, like delta-spark) — batch CDF reads additionally take
  ``endingTimestamp``, and plain batch reads take
  ``option("timestampAsOf", ts)`` next to ``versionAsOf`` (both
  resolved via ``version_at_timestamp``);
- a mid-stream ``metaData`` action (schema change) raises — restart
  the stream to pick up the new schema, as with real Delta;
- ``option("readChangeFeed", "true")`` (round-10) streams CHANGE ROWS
  instead — table columns + _change_type/_commit_version/
  _commit_timestamp, rendered per commit from cdc actions when present
  (exclusively, per the spec) else derived insert/delete — so DML
  commits flow as their row-level effects; the same option on a BATCH
  read with startingVersion/endingVersion is the data-source twin of
  ``deltalog.table_changes``.

Reads run on executors from pyarrow: each partition value carries the
file path, its deletion-vector descriptor (applied by row index), the
hive partitionValues to materialize, and the physical→logical column
mapping — so DV tables and column-mapped (name or id mode) tables
stream correctly. NESTED column-mapping renames work too (round-10):
struct fields, array-of-struct elements and (round-11) map-interior
fields all resolve their ``delta.columnMapping.physicalName`` at every
level via a recursive arrow rebuild (``_to_logical_arrow`` — the
executor-side twin of deltalog's ``_to_logical_columns``).

Reference precedent: Delta is the reference's declared storage plane
(notebooks/benchmarking_medallion.py:98-104); this source makes its
tables consumable by the standard readStream machinery instead of a
bespoke loop.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _strip_field_metadata(schema: StructType) -> StructType:
    """The consumer-facing schema: Delta's columnMapping bookkeeping in
    field metadata is an implementation detail and must not surface
    (it would also break StructType equality against the native read
    path's output)."""
    from pyspark.sql.types import StructField

    return StructType(
        [
            StructField(f.name, f.dataType, f.nullable)
            for f in schema.fields
        ]
    )


def _file_task(
    table_path: str,
    rel: str,
    add: dict[str, Any],
    schema: StructType,
    cm_mode: str,
    partition_cols: list[str],
) -> dict[str, Any]:
    """The self-contained, picklable description of one file-read task:
    everything ``_read_file_batches`` needs on an executor."""
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _physical_name,
    )

    phys_of = {
        f.name: (_physical_name(f) if cm_mode in ("name", "id") else f.name)
        for f in schema.fields
    }
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _data_file,
    )

    return {
        "file": _data_file(table_path, rel),
        "table": table_path,
        "dv": add.get("deletionVector"),
        # hive partition values are keyed by PHYSICAL name in the log;
        # re-key to logical here so the executor needs no mapping logic
        "pvals": {
            f.name: add.get("partitionValues", {}).get(phys_of[f.name])
            for f in schema.fields
            if f.name in partition_cols
        },
        # (physical name, logical name, columnMapping id) — in id mode
        # the executor resolves the parquet column by FIELD ID, because
        # id-mode parquet names match neither logical nor physical
        "rename": [
            (
                phys_of[f.name],
                f.name,
                int(f.metadata["delta.columnMapping.id"])
                if cm_mode == "id" and "delta.columnMapping.id" in f.metadata
                else None,
            )
            for f in schema.fields
            if f.name not in partition_cols
        ],
        "schema_json": schema.json(),
        "partition_cols": list(partition_cols),
    }


def _contains_struct(dt) -> bool:
    from pyspark.sql import types as T

    if isinstance(dt, (T.StructType, T.VariantType)):
        # VariantType rides the same rebuild: its physical spelling is a
        # struct<value, metadata> whose children must be selected BY
        # NAME and re-emitted in canonical order (round-12)
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_struct(dt.elementType)
    if isinstance(dt, T.MapType):
        return _contains_struct(dt.keyType) or _contains_struct(dt.valueType)
    return False


def _to_logical_arrow(col, dt, where: str):
    """Executor-side twin of deltalog's ``_to_logical_columns`` for
    ARROW data (round-10, nested column mapping): rebuild struct /
    array-of-struct arrays so every nesting level's field names follow
    the LOGICAL schema, resolving ``delta.columnMapping.physicalName``
    per field. The rebuild reuses the existing child buffers (struct
    reassembly is metadata-level; values are never copied), so cost is
    O(nesting), not O(rows). Value-type casts (e.g. int32→int64) stay
    with the caller's final ``cast(target)`` — names are the only thing
    fixed here, which is exactly what the by-name struct cast needs.
    Maps with renamed descendants rebuild the same way (round-11):
    keys/items convert recursively and the MapArray reassembles over
    the original offsets, nulls preserved."""
    import pyarrow as pa
    from pyspark.sql import types as T

    def convert(arr, dt):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if isinstance(dt, T.VariantType):
            # variant's UNANNOTATED physical spelling (round-12): a
            # plain struct group with binary children named value /
            # metadata (the spec fixes the names; external writers may
            # order them either way). Select by NAME and emit in the
            # canonical (value, metadata) order Spark's arrow mapping
            # expects; the bytes ARE the Variant binary encoding and
            # pass through untouched.
            iv = arr.type.get_field_index("value")
            im = arr.type.get_field_index("metadata")
            if iv < 0 or im < 0:
                raise ValueError(
                    f"variant column of Delta file {where}: physical "
                    "struct lacks value/metadata children — not a "
                    "spec-shaped variant group"
                )
            mask = arr.is_null() if arr.null_count else None
            # Spark's arrow mapping declares the children NON-NULLABLE
            # (a non-null variant always has both) — emit that exact
            # type or the final cast refuses nullable→non-nullable
            return pa.StructArray.from_arrays(
                [arr.field(iv), arr.field(im)],
                fields=[
                    pa.field("value", pa.binary(), nullable=False),
                    pa.field("metadata", pa.binary(), nullable=False),
                ],
                mask=mask,
            )
        if isinstance(dt, T.StructType):
            kids, names = [], []
            for sf in dt.fields:
                phys = sf.metadata.get(
                    "delta.columnMapping.physicalName", sf.name
                )
                idx = arr.type.get_field_index(phys)
                if idx < 0:
                    raise ValueError(
                        f"column-mapped Delta file {where}: nested "
                        f"struct has no physical field {phys!r} for "
                        f"logical {sf.name!r} — refusing to guess"
                    )
                kids.append(convert(arr.field(idx), sf.dataType))
                names.append(sf.name)
            mask = arr.is_null() if arr.null_count else None
            return pa.StructArray.from_arrays(kids, names=names, mask=mask)
        if isinstance(dt, T.ArrayType) and _contains_struct(dt.elementType):
            values = convert(arr.values, dt.elementType)
            mask = arr.is_null() if arr.null_count else None
            return type(arr).from_arrays(arr.offsets, values, mask=mask)
        if isinstance(dt, T.MapType) and (
            _contains_struct(dt.keyType) or _contains_struct(dt.valueType)
        ):
            # round-11: maps rebuild like lists — keys/items convert
            # recursively, the MapArray reassembles over the original
            # offsets. MapArray.from_arrays has no mask parameter, so
            # nulls survive via offsets whose null slots mark null rows
            # (pyarrow's documented null encoding for list-likes).
            keys = convert(arr.keys, dt.keyType)
            items = convert(arr.items, dt.valueType)
            offsets = arr.offsets
            if arr.null_count:
                import numpy as np

                off = offsets.to_numpy(zero_copy_only=False)
                null_rows = np.concatenate(
                    [np.asarray(arr.is_null()), [False]]
                )
                offsets = pa.array(off, mask=null_rows)
            return pa.MapArray.from_arrays(offsets, keys, items)
        return arr

    return convert(col, dt) if _contains_struct(dt) else col


CDF_FIELDS = [
    ("_change_type", "string"),
    ("_commit_version", "long"),
    ("_commit_timestamp", "timestamp"),
]


def _cdf_suffix_schema() -> StructType:
    from pyspark.sql import types as T

    return StructType(
        [
            T.StructField("_change_type", T.StringType(), True),
            T.StructField("_commit_version", T.LongType(), True),
            T.StructField("_commit_timestamp", T.TimestampType(), True),
        ]
    )


def _with_cdf_columns(schema: StructType) -> StructType:
    return StructType(
        list(schema.fields) + list(_cdf_suffix_schema().fields)
    )


def _read_file_batches(task: dict[str, Any]) -> Iterator[Any]:
    """Executor-side file read: pyarrow batches, deletion vector applied
    by global row index, hive partition columns materialized, physical
    names mapped to logical, and the result cast to the table schema's
    arrow shape (column order AND types).

    Change-feed tasks (round-10) carry ``task["change"]``: the batch
    grows the three CDF columns — ``_change_type`` either constant
    (derived insert/delete) or read from the cdc file itself
    (``task["is_cdc"]``), plus the commit version and its
    (ICT-preferring) timestamp as constants."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deletion_vectors import (
        deleted_row_indexes,
    )

    schema = StructType.fromJson(json.loads(task["schema_json"]))
    target = to_arrow_schema(schema)
    deleted = (
        deleted_row_indexes(task["table"], task["dv"])
        if task["dv"]
        else np.empty(0, dtype=np.int64)
    )
    try:
        pf = pq.ParquetFile(task["file"])
    except OSError as e:
        if "LogicalType" in str(e):
            # a Spark-written file inside an otherwise-readable table:
            # its footer carries the parquet VARIANT logical type this
            # pyarrow cannot parse — same guidance as the planning probe
            raise ValueError(
                f"Delta file {task['file']} uses the parquet VARIANT "
                "logical type (Spark-written), which executor-side "
                "pyarrow cannot open — use read_delta for this table"
            ) from e
        raise
    # resolve each logical column to the parquet column NAME to fetch:
    # by field id when the task says so (id-mode), by physical name
    # otherwise
    by_id: dict[int, str] = {}
    if any(fid is not None for _p, _l, fid in task["rename"]):
        for f in pf.schema_arrow:
            meta = f.metadata or {}
            raw = meta.get(b"PARQUET:field_id")
            if raw is not None:
                by_id[int(raw)] = f.name
    fetch: dict[str, str] = {}  # logical -> parquet column name
    for phys, logical, fid in task["rename"]:
        if fid is not None:
            if fid not in by_id:
                raise ValueError(
                    f"id-mode Delta file {task['file']} has no parquet "
                    f"column with field id {fid} — refusing to guess by "
                    "name"
                )
            fetch[logical] = by_id[fid]
        else:
            fetch[logical] = phys
    phys_cols = list(dict.fromkeys(fetch.values()))
    if task.get("is_cdc"):
        phys_cols.append("_change_type")
    offset = 0
    for batch in pf.iter_batches(columns=phys_cols or None):
        n = batch.num_rows
        tbl = pa.Table.from_batches([batch])
        if deleted.size:
            local = deleted[(deleted >= offset) & (deleted < offset + n)]
            if local.size:
                keep = np.ones(n, dtype=bool)
                keep[local - offset] = False
                tbl = tbl.filter(pa.array(keep))
        offset += n
        if tbl.num_rows == 0:
            continue
        cols: dict[str, Any] = {}
        dt_of = {f.name: f.dataType for f in schema.fields}
        for logical, src in fetch.items():
            cols[logical] = _to_logical_arrow(
                tbl.column(src), dt_of[logical], task["file"]
            )
        for name in task["partition_cols"]:
            raw = task["pvals"].get(name)
            arrow_type = target.field(name).type
            cols[name] = pa.array([raw] * tbl.num_rows, pa.string()).cast(
                arrow_type
            )
        out = pa.table(
            {f.name: cols[f.name] for f in schema.fields}
        ).cast(target)
        change = task.get("change")
        if change:
            import numpy as _np

            n_out = out.num_rows
            cdf_target = to_arrow_schema(_cdf_suffix_schema())
            if task.get("is_cdc"):
                ct = tbl.column("_change_type")
            else:
                ct = pa.array([change["type"]] * n_out, pa.string())
            ver = pa.array(
                _np.full(n_out, int(change["version"]), dtype=_np.int64)
            ).cast(cdf_target.field("_commit_version").type)
            # int64 µs-since-epoch casts to the timestamp type exactly
            ts = pa.array(
                _np.full(n_out, int(change["ts_ms"]) * 1000, dtype=_np.int64)
            ).cast(cdf_target.field("_commit_timestamp").type)
            out = (
                out.append_column(cdf_target.field("_change_type"), ct)
                .append_column(cdf_target.field("_commit_version"), ver)
                .append_column(cdf_target.field("_commit_timestamp"), ts)
            )
        yield from out.to_batches()


def _change_partitions(
    path: str, lo: int, hi: int, bound: StructType
) -> list[InputPartition]:
    """One task per change-bearing file for commits in ``(lo, hi]`` —
    the change-feed twin of the append-only window (round-10). Per the
    CDF spec, a commit with ANY cdc action is rendered EXCLUSIVELY from
    its cdc files; otherwise add-only commits derive as inserts and
    removes as deletes (each removed file read with ITS deletion vector
    so already-dead rows never re-report). A same-commit remove+re-add
    of one path without cdc (an external DV dance) needs bitmap diffs —
    the batch ``table_changes`` surface owns that; here it refuses.
    dataChange=false commits (OPTIMIZE) contribute nothing. Cost ∝
    changed files, never a snapshot."""
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _prev_commit_timestamp,
        _read_actions,
        _replay,
    )

    _active, schema, pcols, cm_mode = _replay_for_source(path, hi)
    parts: list[InputPartition] = []
    for v in range(lo + 1, hi + 1):
        actions = _read_actions(path, v)
        for a in actions:
            if "metaData" in a and (
                _strip_field_metadata(
                    StructType.fromJson(
                        json.loads(a["metaData"]["schemaString"])
                    )
                )
                != bound
            ):
                raise ValueError(
                    f"Delta change feed at {path}: schema changed at "
                    f"version {v} — restart the stream to adopt it"
                )
        # the shared commit clock (ICT > commitInfo.timestamp > mtime) —
        # same helper table_changes and timestampAsOf resolve with, so
        # the streaming and batch CDF surfaces can never disagree
        t = _prev_commit_timestamp(path, v)
        change_base = {"version": v, "ts_ms": max(t, 0)}
        cdcs = [a["cdc"] for a in actions if "cdc" in a]
        if cdcs:
            phys_of = {
                f.name: f.metadata.get(
                    "delta.columnMapping.physicalName", f.name
                )
                if cm_mode in ("name", "id")
                else f.name
                for f in schema.fields
            }
            for c in cdcs:
                t = _file_task(path, c["path"], c, schema, cm_mode, pcols)
                # cdc partitionValues may be keyed physically (our own
                # writer) or logically (lenient external) — re-resolve
                pv = c.get("partitionValues") or {}
                t["pvals"] = {
                    f.name: pv.get(phys_of[f.name], pv.get(f.name))
                    for f in schema.fields
                    if f.name in pcols
                }
                t["is_cdc"] = True
                t["change"] = dict(change_base, type=None)
                parts.append(InputPartition(t))
            continue
        adds = [
            a["add"]
            for a in actions
            if "add" in a and a["add"].get("dataChange", True)
        ]
        removes = [
            a["remove"]
            for a in actions
            if "remove" in a and a["remove"].get("dataChange", True)
        ]
        re_added = {a["path"] for a in adds} & {r["path"] for r in removes}
        if re_added:
            raise ValueError(
                f"Delta change feed at {path}: version {v} re-adds "
                f"{sorted(re_added)[:3]} with no cdc action (an external "
                "deletion-vector rewrite) — row-level diffing needs the "
                "batch surface; use deltalog.table_changes"
            )
        prev_active: dict[str, dict] | None = None
        if removes:
            prev_active, _, _, _ = _replay(path, v - 1)
        for a in adds:
            t = _file_task(path, a["path"], a, schema, cm_mode, pcols)
            t["change"] = dict(change_base, type="insert")
            parts.append(InputPartition(t))
        for r in removes:
            src = (prev_active or {}).get(r["path"], r)
            t = _file_task(path, r["path"], src, schema, cm_mode, pcols)
            t["change"] = dict(change_base, type="delete")
            parts.append(InputPartition(t))
    return parts


def _replay_for_source(path: str, version: int | None = None):
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _column_mapping_mode,
        _replay,
        _schema_has_variant,
    )

    active, schema, partition_cols, meta = _replay(path, version)
    if _schema_has_variant(schema) and active:
        # variant columns read through this source when the files spell
        # variant as an UNANNOTATED struct<value, metadata> group (the
        # external-writer shape; _to_logical_arrow reshapes it,
        # round-12). Spark-WRITTEN variant files annotate the group
        # with the parquet VARIANT logical type, which this pyarrow
        # cannot even open the footer of — probe ONE file at planning
        # time so the refusal is upfront and names the working path,
        # instead of an opaque mid-scan Thrift error. (Mixed tables
        # fail executor-side with the same guidance.)
        import pyarrow.parquet as pq

        from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
            _data_file,
        )

        probe = _data_file(path, sorted(active)[0])
        try:
            pq.read_schema(probe)
        except OSError as e:
            raise ValueError(
                f"Delta table at {path} carries a VARIANT column whose "
                "files use the parquet VARIANT logical type "
                "(Spark-written), which executor-side pyarrow cannot "
                f"open ({e}) — use read_delta for these"
            ) from e
    return active, schema, partition_cols, _column_mapping_mode(meta)


class _SnapshotReader(DataSourceReader):
    """Batch form: the current (or ``versionAsOf``) snapshot, one
    partition per active file."""

    def __init__(self, options: dict[str, str], schema: StructType) -> None:
        self._path = options["path"]
        self._version = _as_of_version(options)
        self._schema = schema
        self._pushed: list[tuple[str, str, Any]] = []

    def partitions(self):
        from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
            _may_satisfy,
            _physical_name,
        )

        active, schema, pcols, cm_mode = _replay_for_source(
            self._path, self._version
        )
        if self._pushed:
            # stats/partitionValues keys are PHYSICAL names under
            # column mapping — translate the pushed logical columns
            phys_of = {
                f.name: (
                    _physical_name(f) if cm_mode in ("name", "id") else f.name
                )
                for f in schema.fields
            }
            active = {
                rel: a
                for rel, a in active.items()
                if all(
                    _may_satisfy(a, (phys_of.get(c, c), op, v))
                    for c, op, v in self._pushed
                )
            }
        return [
            InputPartition(
                _file_task(self._path, rel, active[rel], schema, cm_mode, pcols)
            )
            for rel in sorted(active)
        ]

    def read(self, partition: InputPartition):
        yield from _read_file_batches(partition.value)


class _PruningSnapshotReader(_SnapshotReader):
    """``option("filterPushdown", "true")``: ``pushFilters`` (Spark
    4.1) turns query predicates into FILE pruning — each pushed
    comparison is checked against every add action's footer stats and
    partitionValues (the same ``_may_satisfy`` lever read_delta uses),
    so a filtered scan of a 100 TB table plans tasks only for files
    that can match. Every filter is yielded back: skipping bounds IO,
    Spark still evaluates the predicate row-level (stats pruning is
    conservative, never a correctness gate).

    A SEPARATE subclass because Spark refuses to initialize a reader
    that merely IMPLEMENTS pushFilters while
    ``spark.sql.python.filterPushdown.enabled`` (default false) is off
    — the plain reader must keep working on default-conf sessions, so
    opting in takes both the session conf and this option."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "==",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            op = ops.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self._pushed.append((f.attribute[0], op, f.value))
            yield f  # partial pushdown: Spark re-applies every filter


def _as_of_version(options: dict[str, str]) -> int | None:
    """Batch time-travel version from ``versionAsOf`` /
    ``timestampAsOf`` (round-11; mutually exclusive, like delta-spark).
    timestampAsOf resolves through the same ICT-preferring commit clock
    as ``read_delta(timestamp_as_of=...)``."""
    v = options.get("versionasof")
    ts = options.get("timestampasof")
    if v is not None and ts is not None:
        raise ValueError("pass versionAsOf OR timestampAsOf, not both")
    if ts is not None:
        from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
            version_at_timestamp,
        )

        return version_at_timestamp(options["path"], ts)
    return int(v) if v is not None else None


def _version_before_timestamp(path: str, ts) -> int:
    """``startingTimestamp`` → exclusive version lower bound — the ONE
    resolution rule, owned by ``deltalog.version_before_timestamp`` and
    shared with ``table_changes(since_timestamp=...)`` so stream and
    batch never diverge."""
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        version_before_timestamp,
    )

    return version_before_timestamp(path, ts, label="startingTimestamp")


class _CommitStreamReader(DataSourceStreamReader):
    """Streaming form: offsets are log versions; a micro-batch's
    partitions are the (start, end] window's dataChange adds."""

    def __init__(self, options: dict[str, str], schema: StructType) -> None:
        from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
            _list_versions,
        )

        self._path = options["path"]
        self._skip_changes = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )
        self._schema = schema
        start = options.get("startingversion")
        start_ts = options.get("startingtimestamp")
        if start is not None and start_ts is not None:
            raise ValueError(
                "pass startingVersion OR startingTimestamp, not both"
            )
        if start_ts is not None:
            self._initial = _version_before_timestamp(self._path, start_ts)
        elif start is None:
            self._initial = -1
        elif str(start).lower() == "latest":
            self._initial = _list_versions(self._path)[-1]
        else:
            self._initial = int(start) - 1

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
            _list_versions,
        )

        return {"version": _list_versions(self._path)[-1]}

    def partitions(self, start: dict, end: dict):
        from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
            _read_actions,
        )

        lo, hi = int(start["version"]), int(end["version"])
        _active, replay_schema, pcols, cm_mode = _replay_for_source(
            self._path, hi
        )
        bound = _strip_field_metadata(self._schema)
        # schema drift inside the window breaks the stream's contract
        # (the query is bound to the start schema) — detect via any
        # metaData action in (lo, hi] whose logical schema differs
        # (field metadata like columnMapping bookkeeping is not drift)
        parts: list[InputPartition] = []
        for v in range(lo + 1, hi + 1):
            actions = _read_actions(self._path, v)
            for a in actions:
                if "metaData" in a and (
                    _strip_field_metadata(
                        StructType.fromJson(
                            json.loads(a["metaData"]["schemaString"])
                        )
                    )
                    != bound
                ):
                    raise ValueError(
                        f"Delta source at {self._path}: schema changed at "
                        f"version {v} — restart the stream to adopt it"
                    )
            has_change = any(
                "remove" in a and a["remove"].get("dataChange", True)
                for a in actions
            )
            if has_change:
                if self._skip_changes:
                    continue
                raise ValueError(
                    f"Delta source at {self._path}: version {v} contains "
                    "data-changing removes (UPDATE/DELETE/MERGE) which an "
                    "append-only stream cannot represent — set "
                    "option('skipChangeCommits', 'true') to skip such "
                    "commits, as with delta-spark"
                )
            for a in actions:
                if "add" in a and a["add"].get("dataChange", True):
                    parts.append(
                        InputPartition(
                            _file_task(
                                self._path,
                                a["add"]["path"],
                                a["add"],
                                replay_schema,  # carries columnMapping metadata
                                cm_mode,
                                pcols,
                            )
                        )
                    )
        return parts

    def read(self, partition: InputPartition):
        yield from _read_file_batches(partition.value)

    def commit(self, end: dict) -> None:
        pass  # progress is tracked by the query's own checkpoint


def _data_schema_of(schema: StructType) -> StructType:
    """The table schema under a CDF-extended reader schema (drop the
    three metadata columns Spark bound the query to)."""
    cdf_names = {n for n, _t in CDF_FIELDS}
    return StructType([f for f in schema.fields if f.name not in cdf_names])


class _ChangeFeedStreamReader(_CommitStreamReader):
    """``option("readChangeFeed", "true")`` (round-10): micro-batches
    carry CHANGE ROWS — the table columns plus
    _change_type/_commit_version/_commit_timestamp — so UPDATE/DELETE/
    MERGE commits stream as their row-level effects instead of raising
    the append-only error. Rendering rules live in
    ``_change_partitions`` (cdc actions exclusive per commit; derived
    insert/delete otherwise; dataChange=false commits contribute
    nothing). delta-spark's same-named streaming option."""

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        return _change_partitions(
            self._path, lo, hi, _strip_field_metadata(_data_schema_of(self._schema))
        )


class _ChangesBatchReader(DataSourceReader):
    """Batch CDF (round-10): ``option("readChangeFeed", "true")`` +
    ``startingVersion`` (required) / ``endingVersion`` (default latest)
    — the data-source twin of ``deltalog.table_changes``, rendered by
    the same per-commit rules as the streaming form."""

    def __init__(self, options: dict[str, str], schema: StructType) -> None:
        self._path = options["path"]
        start = options.get("startingversion")
        start_ts = options.get("startingtimestamp")
        if start is not None and start_ts is not None:
            raise ValueError(
                "pass startingVersion OR startingTimestamp, not both"
            )
        if start_ts is not None:
            self._lo = _version_before_timestamp(self._path, start_ts)
        elif start is not None:
            self._lo = int(start) - 1
        else:
            raise ValueError(
                "readChangeFeed batch reads require "
                "option('startingVersion', N) or "
                "option('startingTimestamp', ts) — where the included "
                "changes begin"
            )
        end = options.get("endingversion")
        end_ts = options.get("endingtimestamp")
        if end is not None and end_ts is not None:
            raise ValueError("pass endingVersion OR endingTimestamp, not both")
        if end_ts is not None:
            from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
                version_at_timestamp,
            )

            self._hi = version_at_timestamp(self._path, end_ts)
        else:
            self._hi = int(end) if end is not None else None
        self._schema = schema

    def partitions(self):
        from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
            _list_versions,
        )

        hi = (
            self._hi
            if self._hi is not None
            else _list_versions(self._path)[-1]
        )
        return _change_partitions(
            self._path,
            self._lo,
            hi,
            _strip_field_metadata(_data_schema_of(self._schema)),
        )

    def read(self, partition: InputPartition):
        yield from _read_file_batches(partition.value)


# ---------------------------------------------------------------------------
# Write path: df.write.format("deltalog") and writeStream.format("deltalog")
# ---------------------------------------------------------------------------

# Spark's ExternalCatalogUtils.escapePathName character set — hive dir
# names for partition values must match what Spark/Hive write, or an
# external reader resolves different partitions than this log declares.
_HIVE_ESCAPE = set('"#%\'*/:=?\\{[]^\x7f') | {chr(c) for c in range(0x20)}


def _hive_escape(val: str) -> str:
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPE else ch for ch in val
    )


class _DeltaWriteMessage(WriterCommitMessage):
    """Per-task result: the add-action payloads for every file the task
    wrote (rel path, size, stats json, LOGICAL partitionValues)."""

    def __init__(self, adds: list) -> None:
        self.adds = adds


def _write_task(
    iterator,
    schema_json: str,
    partition_cols: list[str],
    table_path: str,
    skip_minmax: list[str] | None = None,
    stats_cols: list[str] | None = None,
):
    """Executor-side write: stream arrow batches into one parquet file
    per hive partition this task holds (unpartitioned: one file). Files
    land DIRECTLY in the table dir under uuid-unique part names —
    Delta's isolation means uncommitted files are invisible until the
    driver's commit publishes them, exactly how real writers stage."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _collated_top_columns,
        _file_stats,
    )

    schema = StructType.fromJson(json.loads(schema_json))
    # collations-preview writer duty: binary-order min/max must never
    # land for collated columns (this writer refuses CM tables, so the
    # stats keys are the logical names). The skip set comes from the
    # TABLE schema via preflight — a plain-typed frame appended into a
    # collated column carries no collation itself — unioned with the
    # frame's own collated columns (the new-table case).
    skip = frozenset(skip_minmax or ()) | _collated_top_columns(
        schema, "none"
    )
    target = to_arrow_schema(schema)
    data_fields = [f for f in target if f.name not in partition_cols]
    data_schema = pa.schema(data_fields)
    task_id = _uuid.uuid4().hex
    writers: dict[tuple, Any] = {}  # pvals tuple -> (ParquetWriter, rel)
    seq = 0

    def _str_pval(val) -> str:
        # Delta stores logical partition values as strings: booleans
        # lowercase (delta-spark), everything else via str() (dates and
        # timestamps are python date/datetime here — ISO rendering)
        if isinstance(val, bool):
            return "true" if val else "false"
        return str(val)

    def _dir_for(pvals: tuple) -> str:
        comps = []
        for col, val in pvals:
            raw = (
                "__HIVE_DEFAULT_PARTITION__"
                if val is None
                else _hive_escape(_str_pval(val))
            )
            comps.append(f"{col}={raw}")
        return "/".join(comps)

    def _sink_for(pvals: tuple):
        nonlocal seq
        if pvals not in writers:
            rel_dir = _dir_for(pvals)
            fname = f"part-{seq:05d}-{task_id}-c000.snappy.parquet"
            seq += 1
            rel = f"{rel_dir}/{fname}" if rel_dir else fname
            dest = os.path.join(table_path, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            writers[pvals] = (
                pq.ParquetWriter(dest, data_schema, compression="snappy"),
                rel,
            )
        return writers[pvals][0]

    for batch in iterator:
        tbl = pa.Table.from_batches([batch]).cast(target)
        if not partition_cols:
            if tbl.num_rows:
                _sink_for(()).write_table(tbl.select(data_schema.names))
            continue
        # group rows by partition-value combination (pandas groupby
        # keeps null keys with dropna=False; per-batch cardinality is
        # small — the hive partitions this task's rows span). Values
        # come back from ARROW via as_py() so dates stay dates and
        # bools stay bools — pandas would mangle both into
        # Timestamp/numpy shapes whose str() breaks hive naming.
        keys = tbl.select(partition_cols).to_pandas()
        groups = keys.groupby(
            partition_cols, dropna=False, sort=False
        ).indices
        for idx in groups.values():
            first = int(idx[0])
            pvals = tuple(
                (c, tbl.column(c)[first].as_py()) for c in partition_cols
            )
            sub = tbl.take(pa.array(idx)).select(data_schema.names)
            if sub.num_rows:
                _sink_for(pvals).write_table(sub)

    adds = []
    for pvals, (writer, rel) in writers.items():
        writer.close()
        dest = os.path.join(table_path, rel)
        stats = _file_stats(
            dest,
            skip_minmax=skip,
            stats_cols=(
                frozenset(stats_cols) if stats_cols is not None else None
            ),
        )
        adds.append(
            {
                "path": rel,
                "partitionValues": {
                    c: (None if v is None else _str_pval(v)) for c, v in pvals
                },
                "size": os.path.getsize(dest),
                "stats": stats,
            }
        )
    return _DeltaWriteMessage(adds)


def _writer_preflight(
    path: str, df_schema: StructType, overwrite: bool, options: dict[str, str]
) -> list[str]:
    """Driver-side planning checks shared by the batch and stream
    writers; returns (partition columns, collated-skip columns,
    indexed-stats columns | None) the write must use. Fails
    fast on everything the commit choke point would reject anyway
    (feature gates) plus what it cannot evaluate (CHECK constraints
    need a SparkSession; column-mapping writes need physical naming)."""
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _CONSTRAINT_PREFIX,
        _check_write_protocol,
        _column_mapping_mode,
        _latest_metadata,
        _latest_protocol,
        _list_versions,
        _replay,
    )

    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _plain_type,
        _schema_has_variant,
    )

    # VariantType flows through (round-12): Spark hands the writer
    # variant columns as the arrow struct<value, metadata> pair, and
    # the pyarrow sink writes them as a PLAIN struct group — the spec's
    # unannotated physical spelling, which read_delta and this source's
    # own reader both resolve. New variant tables declare the
    # variantType feature in _commit_write's v0 protocol.
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _indexed_stats_columns,
    )

    versions = _list_versions(path)
    if not versions:
        opt = options.get("partitionby")
        idx_new = _indexed_stats_columns(df_schema, {}, "none")
        return (
            [c.strip() for c in opt.split(",") if c.strip()] if opt else [],
            [],
            sorted(idx_new) if idx_new is not None else None,
        )
    _active, schema, pcols, meta = _replay(path, versions[-1])
    # rowTracking is upheld: _commit_write routes through the same
    # re-stamp loop write_delta uses (fresh baseRowIds + high-water
    # mark), so the gate may accept it here. changeDataFeed is upheld
    # for appends vacuously (add-only commits derive as inserts, no
    # cdc action required) and for OVERWRITES by _commit_write's
    # driver-side pyarrow cdc staging (round-11 — old rows render as
    # deletes, new rows as inserts, spec cdc actions on the commit).
    _check_write_protocol(
        _latest_protocol(path, versions[-1]),
        path,
        extra_features=frozenset(
            {"rowTracking", "domainMetadata", "changeDataFeed"}
        ),
        meta=meta,
    )
    if _column_mapping_mode(meta) in ("name", "id"):
        raise ValueError(
            f"Delta table at {path} uses column mapping — this data "
            "source writes logical parquet names; use write_delta-"
            "compatible tooling or drop column mapping"
        )
    config = dict(meta.get("configuration", {}))
    if any(k.startswith(_CONSTRAINT_PREFIX) for k in config):
        raise ValueError(
            f"Delta table at {path} declares CHECK constraints, which "
            "this data source cannot evaluate executor-side — use "
            "write_delta (it validates staged data with Spark)"
        )
    if config.get("delta.appendOnly") == "true" and overwrite:
        raise ValueError(
            f"Delta table at {path} is delta.appendOnly=true: overwrite "
            "is blocked"
        )
    # _plain_type: collation (comparison metadata, not bytes) never
    # blocks an append — the same normalization write_delta applies
    if [(f.name, _plain_type(f.dataType)) for f in df_schema.fields] != [
        (f.name, _plain_type(f.dataType)) for f in schema.fields
    ]:
        raise ValueError(
            f"schema mismatch vs Delta table at {path}: "
            f"table={schema.simpleString()} df={df_schema.simpleString()}"
        )
    opt = options.get("partitionby")
    if opt:
        wanted = [c.strip() for c in opt.split(",") if c.strip()]
        if wanted != pcols:
            raise ValueError(
                f"partition columns fixed at table creation: "
                f"table={pcols} write={wanted}"
            )
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _collated_top_columns,
    )

    idx = _indexed_stats_columns(
        schema, dict(meta.get("configuration", {})), "none"
    )
    return (
        list(pcols),
        sorted(_collated_top_columns(schema, "none")),
        sorted(idx) if idx is not None else None,
    )


def _stage_cdc_overwrite_arrow(
    path: str,
    prior_active: dict[str, dict],
    new_adds: list[dict[str, Any]],
) -> list[dict[str, Any]]:
    """Driver-side (pure pyarrow, no SparkSession — this writer's commit
    runs in the data-source Python runner) staging of an OVERWRITE's
    change rows into ``_change_data/`` (round-11, closes the data
    source's CDF-overwrite refusal): per the CDF spec the commit must
    describe its changes exclusively through cdc actions, so every
    prior snapshot row renders as ``delete`` and every new row as
    ``insert`` — exactly what ``write_delta``'s Spark-side staging
    emits. One cdc file per source file keeps partition values exact
    (they ride on each action, authoritative per the spec) and the
    memory bound at one file. Prior files' deletion vectors are applied
    (a DV-hidden row was never logically present, so it must not render
    as deleted). Cost ∝ old + new rows — the same extra pass
    ``write_delta`` pays for a CDF overwrite."""
    import uuid as _uuid

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deletion_vectors import (
        deleted_row_indexes,
    )
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _data_file,
    )

    cdc: list[dict[str, Any]] = []
    out_dir = os.path.join(path, "_change_data")
    os.makedirs(out_dir, exist_ok=True)

    def emit(rel: str, pvals: dict, change_type: str, dv) -> None:
        tbl = pq.read_table(_data_file(path, rel))
        if dv:
            idx = deleted_row_indexes(path, dv)
            if len(idx):
                keep = np.ones(tbl.num_rows, dtype=bool)
                keep[idx] = False
                tbl = tbl.filter(pa.array(keep))
        if tbl.num_rows == 0:
            return
        tbl = tbl.append_column(
            "_change_type",
            pa.array([change_type] * tbl.num_rows, pa.string()),
        )
        name = f"cdc-{_uuid.uuid4().hex}.parquet"
        dest = os.path.join(out_dir, name)
        pq.write_table(tbl, dest, compression="snappy")
        cdc.append(
            {
                "cdc": {
                    "path": f"_change_data/{name}",
                    "partitionValues": dict(pvals or {}),
                    "size": os.path.getsize(dest),
                    "dataChange": False,
                }
            }
        )

    try:
        for rel in sorted(prior_active):
            a = prior_active[rel]
            emit(
                rel,
                a.get("partitionValues"),
                "delete",
                a.get("deletionVector"),
            )
        for act in new_adds:
            a = act["add"]
            emit(a["path"], a.get("partitionValues"), "insert", None)
    except Exception:
        for a in cdc:
            try:
                os.remove(os.path.join(path, a["cdc"]["path"]))
            except OSError:
                pass
        raise
    return cdc


def _commit_write(
    path: str,
    df_schema: StructType,
    partition_cols: list[str],
    messages,
    overwrite: bool,
    operation: str,
    op_params: dict,
    extra_actions: list | None = None,
) -> int:
    """Driver-side publish: one atomic Delta commit for every file the
    tasks wrote. Pure filesystem — no SparkSession needed (the data
    files already exist; the O_EXCL log create is the atomicity point,
    with version races retried by _commit_with_retry)."""
    import time as _time

    from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
        _commit_row_tracking,
        _commit_with_retry,
        _discard_cdc_files,
        _latest_metadata,
        _latest_protocol,
        _list_versions,
        _remove_action,
        _replay,
    )

    now_ms = int(_time.time() * 1000)
    actions: list[dict[str, Any]] = []
    versions = _list_versions(path)
    version = (versions[-1] + 1) if versions else 0
    if version == 0:
        import uuid as _uuid

        from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
            _schema_has_collation,
            _schema_has_ntz,
            _schema_has_variant,
        )

        os.makedirs(os.path.join(path, "_delta_log"), exist_ok=True)
        # type-triggered protocol features, the same declarations
        # write_delta makes at creation (round-12 — previously a new
        # ntz/variant table through this writer under-declared its
        # protocol): timestampNtz / variantType need reader v3 + writer
        # v7 on BOTH sides; collations are writer-only
        typed_feats = []
        if _schema_has_ntz(df_schema):
            typed_feats.append("timestampNtz")
        if _schema_has_variant(df_schema):
            typed_feats.append("variantType")
        writer_only = (
            ["collations-preview"] if _schema_has_collation(df_schema) else []
        )
        if typed_feats or writer_only:
            proto: dict[str, Any] = {
                "minReaderVersion": 3 if typed_feats else 1,
                "minWriterVersion": 7,
                "writerFeatures": [
                    "appendOnly",
                    "invariants",
                    "checkConstraints",
                ]
                + typed_feats
                + writer_only,
            }
            if typed_feats:
                proto["readerFeatures"] = list(typed_feats)
            actions.append({"protocol": proto})
        else:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
        actions.append(
            {
                "metaData": {
                    "id": str(_uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df_schema.json(),
                    "partitionColumns": list(partition_cols),
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    removed: set[str] = set()
    prior_active: dict[str, dict] = {}
    if overwrite and version > 0:
        prior_active, _, _, _ = _replay(path, versions[-1])
        for rel, prior_add in prior_active.items():
            actions.append(_remove_action(rel, prior_add, now_ms))
        removed = set(prior_active)
    adds: list[dict[str, Any]] = []
    for m in messages:
        if m is None:
            continue
        for add in m.adds:
            a = {
                "path": add["path"],
                "partitionValues": add["partitionValues"],
                "size": add["size"],
                "modificationTime": now_ms,
                "dataChange": True,
            }
            if add.get("stats"):
                a["stats"] = add["stats"]
            adds.append({"add": a})
    cdc_actions: list[dict[str, Any]] = []
    if overwrite and version > 0:
        meta_now = _latest_metadata(path, versions[-1])
        if (
            meta_now.get("configuration", {}).get(
                "delta.enableChangeDataFeed"
            )
            == "true"
        ):
            # round-11: the CDF write contract for overwrite — old rows
            # as deletes, new rows as inserts, staged driver-side with
            # pyarrow (no SparkSession in the data-source runner)
            cdc_actions = _stage_cdc_overwrite_arrow(
                path, prior_active, adds
            )
    tail: list[dict[str, Any]] = cdc_actions + list(extra_actions or [])
    tail.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": operation,
                "operationParameters": op_params,
            }
        }
    )
    # same grants preflight validated: rowTracking/domainMetadata are
    # upheld by the re-stamp routing below; changeDataFeed by the
    # cdc staging above (appends stay cdc-free — add-only commits
    # derive as inserts per the spec)
    grants = frozenset({"rowTracking", "domainMetadata", "changeDataFeed"})
    try:
        if version > 0 and "rowTracking" in set(
            _latest_protocol(path, versions[-1]).get("writerFeatures") or []
        ):
            # same re-stamp loop write_delta uses: fresh baseRowIds +
            # high-water-mark domainMetadata, race-safe
            return _commit_row_tracking(
                path,
                actions,
                adds,
                tail,
                "overwrite" if overwrite else "append",
                5,
                grants,
            )
        return _commit_with_retry(
            path,
            version,
            actions + adds + tail,
            depends_on=removed,
            read_metadata=version > 0,
            extra_features=grants if version > 0 else frozenset(),
        )
    except Exception:
        _discard_cdc_files(path, cdc_actions)
        raise


def _abort_write(path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        for add in getattr(m, "adds", []):
            try:
                os.remove(os.path.join(path, add["path"]))
            except OSError:
                pass


class _DeltaBatchWriter(DataSourceArrowWriter):
    """``df.write.format("deltalog").mode("append"|"overwrite")`` —
    tasks write parquet straight into the table dir (invisible until
    committed), the driver publishes ONE atomic commit. Partitioned
    tables adopt their partition columns; new tables take
    ``option("partitionBy", "col1,col2")``."""

    def __init__(
        self, options: dict[str, str], schema: StructType, overwrite: bool
    ) -> None:
        self._path = options["path"]
        self._schema = schema
        self._overwrite = overwrite
        self._pcols, self._skip_minmax, self._stats_cols = (
            _writer_preflight(self._path, schema, overwrite, options)
        )
        missing = set(self._pcols) - set(schema.fieldNames())
        if missing:
            raise ValueError(
                f"partition columns not in dataframe: {sorted(missing)}"
            )

    def write(self, iterator):
        return _write_task(
            iterator,
            self._schema.json(),
            self._pcols,
            self._path,
            skip_minmax=self._skip_minmax,
            stats_cols=self._stats_cols,
        )

    def commit(self, messages) -> None:
        _commit_write(
            self._path,
            self._schema,
            self._pcols,
            messages,
            self._overwrite,
            "WRITE",
            {"mode": "Overwrite" if self._overwrite else "Append"},
        )

    def abort(self, messages) -> None:
        _abort_write(self._path, messages)


class _DeltaStreamWriter(DataSourceStreamArrowWriter):
    """``writeStream.format("deltalog")`` — each micro-batch commits
    atomically. Pass ``option("txnAppId", ...)`` for exactly-once
    across restarts: the commit then carries a ``txn`` action keyed by
    (appId, batchId) and a replayed batch is skipped (its re-written
    files stay orphaned until VACUUM — data is never duplicated).
    Without txnAppId the sink is at-least-once under restarts.

    Append output mode ONLY: ``commit`` always appends, so a
    ``complete``/``update`` sink (which Spark signals by
    ``overwrite=True``) would silently re-append every micro-batch and
    duplicate rows — refuse it up front instead."""

    def __init__(
        self, options: dict[str, str], schema: StructType, overwrite: bool
    ) -> None:
        if overwrite:
            raise ValueError(
                "deltalog streaming sink supports outputMode('append') "
                "only; complete/update would duplicate rows because "
                "each micro-batch commits as an append"
            )
        self._path = options["path"]
        self._schema = schema
        self._app_id = options.get("txnappid")
        self._pcols, self._skip_minmax, self._stats_cols = (
            _writer_preflight(self._path, schema, overwrite, options)
        )
        missing = set(self._pcols) - set(schema.fieldNames())
        if missing:
            raise ValueError(
                f"partition columns not in dataframe: {sorted(missing)}"
            )

    def write(self, iterator):
        return _write_task(
            iterator,
            self._schema.json(),
            self._pcols,
            self._path,
            skip_minmax=self._skip_minmax,
            stats_cols=self._stats_cols,
        )

    def commit(self, messages, batchId: int) -> None:
        from sustainable_building_energy_benchmarking_pipeline_spark.sources.deltalog import (
            last_txn_version,
        )

        extra = None
        if self._app_id is not None:
            if batchId <= last_txn_version(self._path, self._app_id):
                _abort_write(self._path, messages)  # replayed batch
                return
            extra = [
                {"txn": {"appId": self._app_id, "version": int(batchId)}}
            ]
        _commit_write(
            self._path,
            self._schema,
            self._pcols,
            messages,
            False,
            "STREAMING UPDATE",
            {"outputMode": "Append", "epochId": int(batchId)},
            extra_actions=extra,
        )

    def abort(self, messages, batchId: int) -> None:
        _abort_write(self._path, messages)


class DeltaLogDataSource(DataSource):
    """``spark.dataSource.register(DeltaLogDataSource)`` then read with
    ``format("deltalog")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "deltalog"

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        )

    def schema(self) -> StructType:
        v = _as_of_version(self.options)
        if v is not None:
            # pin ONCE: a timestampAsOf re-resolved at reader
            # construction could land on a later commit than the schema
            # was bound to (and costs a second full clock walk)
            self.options["versionasof"] = str(v)
            self.options.pop("timestampasof", None)
        _active, schema, _pcols, _cm = _replay_for_source(
            self.options["path"], v
        )
        out = _strip_field_metadata(schema)
        return _with_cdf_columns(out) if self._cdf() else out

    def reader(self, schema: StructType) -> DataSourceReader:
        if self._cdf():
            return _ChangesBatchReader(self.options, schema)
        if str(self.options.get("filterpushdown", "false")).lower() == "true":
            return _PruningSnapshotReader(self.options, schema)
        return _SnapshotReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self._cdf():
            return _ChangeFeedStreamReader(self.options, schema)
        return _CommitStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return _DeltaBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _DeltaStreamWriter(self.options, schema, overwrite)
