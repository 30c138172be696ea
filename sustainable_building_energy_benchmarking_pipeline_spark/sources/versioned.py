"""Versioned parquet tables: the engine-native S3/S11 (Delta scan/sink)
mechanism. For tables that must interoperate with real Delta Lake
deployments, ``sources/deltalog.py`` speaks the actual Delta
transaction-log protocol (JSON commits of protocol/metaData/add/remove
actions) with no jar required; this module keeps the simpler
engine-local commit log used by the medallion/MERGE paths.

delta-spark is not on this classpath, so the transactional mechanics the
reference gets from Delta (notebooks/benchmarking_medallion.py:98-104,127)
are provided directly over parquet: each write lands in an immutable
``_v{N}`` snapshot directory and becomes visible by appending one entry
to a JSON commit log — readers resolve the log first, so a half-written
snapshot is invisible (the commit append is the atomicity point, like
Delta's _delta_log). Gives: versioned writes, snapshot isolation for
readers, time travel by version, and append/overwrite modes. Does NOT
give: concurrent-writer conflict resolution (single-writer assumed, as
in the reference's batch jobs) or file-level compaction.

At scale each snapshot is ordinary partitioned parquet — scans prune and
push down exactly as the engine's other paths do; the log holds one tiny
JSON entry per commit, not per file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_LOG = "_commit_log.json"


def _log_path(path: str) -> str:
    return os.path.join(path, _LOG)


def _read_log(path: str) -> list[dict[str, Any]]:
    p = _log_path(path)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def write_versioned(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    metadata: dict[str, Any] | None = None,
) -> int:
    """Commit ``df`` as the next version of the table at ``path``.
    ``mode="overwrite"`` makes the new snapshot the full table state;
    ``mode="append"`` records a snapshot that readers union with the
    previous visible state. Returns the committed version number."""
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be overwrite or append")
    log = _read_log(path)
    version = (log[-1]["version"] + 1) if log else 0
    snap_dir = os.path.join(path, f"_v{version}")
    # write the snapshot fully before it is referenced anywhere
    df.write.mode("errorifexists").parquet(snap_dir)
    log.append(
        {
            "version": version,
            "mode": mode,
            "snapshot": f"_v{version}",
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "metadata": metadata or {},
        }
    )
    tmp = _log_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(log, f, indent=1)
    os.replace(tmp, _log_path(path))  # atomic visibility point
    return version


def read_versioned(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest). Resolves the
    commit log to the set of snapshots visible at that version: the most
    recent overwrite plus every append after it, unioned by name."""
    log = _read_log(path)
    if not log:
        raise FileNotFoundError(f"no versioned table at {path}")
    if version is None:
        version = log[-1]["version"]
    visible = [e for e in log if e["version"] <= version]
    if not visible:
        raise ValueError(f"version {version} predates the table")
    base_idx = max(
        (i for i, e in enumerate(visible) if e["mode"] == "overwrite"), default=0
    )
    parts = visible[base_idx:]
    out = spark.read.parquet(os.path.join(path, parts[0]["snapshot"]))
    for e in parts[1:]:
        out = out.unionByName(
            spark.read.parquet(os.path.join(path, e["snapshot"]))
        )
    return out


def table_history(path: str) -> list[dict[str, Any]]:
    """The commit log (Delta's DESCRIBE HISTORY equivalent)."""
    return list(_read_log(path))


def merge_versioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str] | str,
    metadata: dict[str, Any] | None = None,
) -> int:
    """MERGE (upsert): rows in ``updates`` replace current rows with the
    same key; unmatched keys insert — Delta's ``MERGE WHEN MATCHED
    UPDATE / WHEN NOT MATCHED INSERT`` over the versioned table, giving
    the substitute the full CRUD surface (write/append/merge/read/
    time-travel/history).

    Mechanics: anti-join the CURRENT snapshot against the update keys
    (surviving rows), union the updates, commit as one OVERWRITE version
    — readers see pre- or post-merge state only, never a mix. If
    ``updates`` carries several rows per key they all land, matching
    Delta's multi-row-source behavior for inserts (dedup upstream when
    one-row-per-key matters).

    Scale: one shuffled anti-join on the key (broadcast when updates are
    dim-sized) + a full snapshot rewrite. The rewrite is the honest cost
    of copy-on-write MERGE — real Delta pays it per touched FILE; doing
    better here needs file-level pruning this substitute does not model
    (documented gap, same family as concurrent writers)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    current = read_versioned(spark, path)
    surviving = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = surviving.unionByName(updates.select(*current.columns))
    # lazy read-through is safe: snapshot dirs are immutable and never
    # deleted, and the merged plan pinned its source snapshots when
    # read_versioned resolved the log — the overwrite commit only adds
    # a log entry on top
    return write_versioned(
        merged, path, mode="overwrite",
        metadata={**(metadata or {}), "op": "merge", "keys": keys},
    )
