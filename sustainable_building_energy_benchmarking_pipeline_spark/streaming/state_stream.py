"""Streaming CDC latest-state compaction — the streaming counterpart of
``operators.joins.latest_state_per_key`` / q55: each key holds ONE state
row (the current latest by the order columns), updated per micro-batch
and emitted whenever the key is touched. State is bounded at one row per
live key regardless of stream length, and updates are monotone (a late
out-of-order row older than the held state is ignored), so the emitted
stream converges to the batch compaction over the same rows.

Two implementations of the same contract:

- ``latest_state_stream`` — ``applyInPandasWithState`` (GroupState).
  This is the one the tests run; it works on any Spark 3.4+/4.x.
- ``latest_state_stream_tws`` — ``transformWithStateInPandas``, the
  Spark 4.x arbitrary-state successor API. Its driver-side worker
  channel needs the ``protobuf`` package, which this sandbox does not
  ship, so the function raises a clear error when protobuf is missing
  and is exercised only where the dependency exists.

Scale shape: state is one fixed-width row per key in the state store
(RocksDB-backed on a real cluster), input shuffles once on the key —
identical to what a keyed CDC compactor needs at any scale. No
watermark is required because state never grows past one row per key.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _ord_key(row: dict[str, Any], order_cols: list[str]) -> tuple:
    """NULL-tolerant ordering key: each element becomes ``(present,
    value)`` with None/NaN/NaT normalized to ``(False, None)``, so a
    null-ordered row loses to ANY real row (False < True), two nulls
    tie (first-seen kept), and a null restored from GroupState as None
    never reaches a ``Timestamp > None`` comparison (TypeError that
    would otherwise crash the query permanently — it replays on every
    restart)."""
    out = []
    for c in order_cols:
        v = row[c]
        null = v is None or v != v  # v != v catches both NaN and NaT
        out.append((False, None) if null else (True, v))
    return tuple(out)


def _ddl_field_names(schema: str) -> list[str]:
    """Field names from a DDL string via the real parser — a naive
    ``split(",")`` breaks on any parameterized or nested type
    (``decimal(10,2)``, ``array<...>``, ``struct<...>``), silently
    misaligning state tuples and crashing the executor with a KeyError
    on the bogus trailing token."""
    from pyspark.sql.types import StructType

    return [f.name for f in StructType.fromDDL(schema).fields]


def latest_state_stream(
    stream: DataFrame,
    key_cols: list[str] | str,
    order_cols: list[str],
    state_schema: str,
) -> DataFrame:
    """Compact an update stream to latest-row-per-key, continuously.

    ``state_schema`` is the DDL of the full row (e.g. ``"user_id long,
    ts timestamp, value double"``) — it serves as both the GroupState
    struct and the output struct. Each micro-batch emits each touched
    key's current latest row, so the output is a CHANGELOG: the LAST
    emission per key is that key's current state, and a downstream
    consumer compacts with latest_state_per_key. The operator runs in
    append mode (each emitted row is a final changelog entry) so it
    composes with append-only sinks like parquet files.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    columns = _ddl_field_names(state_schema)

    def process(
        key: Tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        best: dict[str, Any] | None = None
        if state.exists:
            best = dict(zip(columns, state.get))
        changed = False
        for pdf in pdf_iter:
            for rec in pdf[columns].to_dict("records"):
                if best is None or _ord_key(rec, order_cols) > _ord_key(
                    best, order_cols
                ):
                    best = rec
                    changed = True
        if best is not None:
            if changed:
                state.update(tuple(best[c] for c in columns))
            # emit current state whenever the key is touched, changed or
            # not — the sink's last-emission-wins contract stays simple
            yield pd.DataFrame([best], columns=columns)

    return stream.groupBy(*keys).applyInPandasWithState(
        process,
        outputStructType=state_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_state_stream_tws(
    stream: DataFrame,
    key_cols: list[str] | str,
    order_cols: list[str],
    state_schema: str,
) -> DataFrame:
    """Same contract on ``transformWithStateInPandas`` (Spark 4.x).

    Environment-gated: the TWS Python driver worker imports
    ``google.protobuf``; without it the streaming query crashes at
    start, so fail fast here with an actionable message instead.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "for its driver worker; install protobuf or use "
            "latest_state_stream (applyInPandasWithState) instead"
        ) from exc

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    columns = _ddl_field_names(state_schema)

    class LatestStateProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("latest", state_schema)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            best = None
            if self._state.exists():
                best = dict(zip(columns, self._state.get()))
            for pdf in rows:
                for rec in pdf[columns].to_dict("records"):
                    if best is None or _ord_key(rec, order_cols) > _ord_key(
                        best, order_cols
                    ):
                        best = rec
            if best is not None:
                self._state.update(tuple(best[c] for c in columns))
                yield pd.DataFrame([best], columns=columns)

        def close(self) -> None:
            pass

    return stream.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=LatestStateProcessor(),
        outputStructType=state_schema,
        outputMode="Update",
        timeMode="None",
    )
