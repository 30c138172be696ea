"""Generate the committed golden Delta fixture at tests/data/golden_delta.

The fixture replicates, byte-level, the `_delta_log` layout a real
delta-spark 3.x writer emits (action field sets, ordering, commitInfo
shape, hive partition dirs, stats JSON), hand-derived from the public
Delta transaction-log protocol (delta.io PROTOCOL.md) — the
in-sandbox stand-in for a table produced by an external Delta
implementation (no delta-spark jar / delta-rs / duckdb-delta exists in
this environment to generate one live). Deterministic: fixed UUIDs,
timestamps, and row contents, so the committed bytes are stable.

Layout (2 commits):
  v0  protocol + metaData (partitioned by `part`) + 2 adds
  v1  txn(appId=golden-app, version=7) + remove(part=b file) + 1 add

Run from the repo root: python scripts/make_golden_delta.py
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "golden_delta")

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "part", "type": "string", "nullable": True, "metadata": {}},
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    },
    separators=(",", ":"),
)

T0 = 1700000000000  # fixed ms timestamps — stable bytes

FILES = {
    # rel path -> (rows of (id, v))
    "part=a/part-00000-1111aaaa-0d7e-4b6f-8a77-000000000000-c000.snappy.parquet": [
        (1, 1.5),
        (2, 2.5),
    ],
    "part=b/part-00001-2222bbbb-1e8f-4c70-9b88-000000000000-c000.snappy.parquet": [
        (3, 3.5),
    ],
    "part=a/part-00002-3333cccc-2f90-4d81-ac99-000000000000-c000.snappy.parquet": [
        (4, 4.5),
    ],
}


def _write_parquet(rel: str, rows: list[tuple[int, float]]) -> int:
    dest = os.path.join(ROOT, rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    table = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.float64()),
        }
    )
    pq.write_table(table, dest, compression="snappy")
    return os.path.getsize(dest)


def _stats(rows: list[tuple[int, float]]) -> str:
    ids = [r[0] for r in rows]
    vs = [r[1] for r in rows]
    return json.dumps(
        {
            "numRecords": len(rows),
            "minValues": {"id": min(ids), "v": min(vs)},
            "maxValues": {"id": max(ids), "v": max(vs)},
            "nullCount": {"id": 0, "v": 0},
        },
        separators=(",", ":"),
    )


def _add(rel: str, size: int, rows, ts: int) -> dict:
    part_val = rel.split("/", 1)[0].split("=", 1)[1]
    return {
        "add": {
            "path": rel,
            "partitionValues": {"part": part_val},
            "size": size,
            "modificationTime": ts,
            "dataChange": True,
            "stats": _stats(rows),
        }
    }


def main() -> None:
    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    log = os.path.join(ROOT, "_delta_log")
    os.makedirs(log)
    sizes = {rel: _write_parquet(rel, rows) for rel, rows in FILES.items()}
    rels = list(FILES)

    v0_actions = [
        {
            "commitInfo": {
                "timestamp": T0,
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "ErrorIfExists",
                    "partitionBy": '["part"]',
                },
                "isolationLevel": "Serializable",
                "isBlindAppend": True,
                "operationMetrics": {
                    "numFiles": "2",
                    "numOutputRows": "3",
                    "numOutputBytes": str(sizes[rels[0]] + sizes[rels[1]]),
                },
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                "txnId": "44444444-dddd-4eee-8fff-000000000000",
            }
        },
        {"metaData": {
            "id": "55555555-eeee-4aaa-9bbb-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_STRING,
            "partitionColumns": ["part"],
            "configuration": {},
            "createdTime": T0,
        }},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _add(rels[0], sizes[rels[0]], FILES[rels[0]], T0),
        _add(rels[1], sizes[rels[1]], FILES[rels[1]], T0),
    ]
    v1_actions = [
        {
            "commitInfo": {
                "timestamp": T0 + 60000,
                "operation": "MERGE",
                "operationParameters": {"predicate": "(id = 3)"},
                "isolationLevel": "Serializable",
                "isBlindAppend": False,
                "operationMetrics": {"numTargetRowsUpdated": "0"},
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                "txnId": "66666666-ffff-4ccc-add0-000000000000",
            }
        },
        {"txn": {"appId": "golden-app", "version": 7, "lastUpdated": T0 + 60000}},
        {
            "remove": {
                "path": rels[1],
                "deletionTimestamp": T0 + 60000,
                "dataChange": True,
                "extendedFileMetadata": True,
                "partitionValues": {"part": "b"},
                "size": sizes[rels[1]],
            }
        },
        _add(rels[2], sizes[rels[2]], FILES[rels[2]], T0 + 60000),
    ]
    for version, actions in ((0, v0_actions), (1, v1_actions)):
        with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a, separators=(",", ":")) + "\n")
    print(f"golden fixture written to {ROOT}")


if __name__ == "__main__":
    main()
