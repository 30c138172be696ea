"""Structured Streaming variant of the HVAC detection pipeline
(SURVEY §2.10, §7.8 — the reference's declared future work,
``HVAC_README.md:561`` "Real-time data ingestion").

The reference is 100% batch; its "real-time" is a 60 s dashboard cache TTL
(``src/dashboard_app.py:54``). This module is the Spark-native extension:

- ``read_sensor_stream`` — file-source ``readStream`` over the same raw
  sensor schema the batch pipeline reads (S1/S2 made incremental);
- ``windowed_zone_stats`` — event-time sliding-window aggregates with a
  watermark: the streaming analogue of the batch rolling features
  (W1–W3), emitted per (zone, window) in append mode;
- ``stateful_anomaly_stream`` — the custom stateful operator: per-zone
  ``applyInPandasWithState`` keeping a trailing row buffer + run-length
  state, computing the batch feature expressions over buffer+batch and
  evaluating the rule detectors incrementally;
- ``write_anomaly_stream`` — ``writeStream`` parquet sink + checkpoint.

Scale design: state is keyed by ``zone_id`` — the same hash shuffle the
batch window stage uses, so executors each own a zone subset and state
size is O(zones × 11 rows). No global ordering is ever required.

Parity semantics vs batch (documented, test-asserted):
- clogged_filter / compressor_failure / oscillating(window variant):
  row-exact beyond each zone's 11-row warm-up (the buffer reproduces the
  trailing windows exactly for in-order data);
- temp_drift: append mode cannot retroactively flag the first 5 rows of
  a qualifying run once row 6 arrives, so the stream emits from the row
  where the run reaches ``min_duration`` onward (batch emits whole runs).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sustainable_building_energy_benchmarking_pipeline_spark.schemas import HVAC_RAW

ANOMALY_SCHEMA = T.StructType([
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("zone_id", T.StringType()),
    T.StructField("ahu_id", T.StringType()),
    T.StructField("metric", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("rule_name", T.StringType()),
    T.StructField("severity", T.StringType()),
    T.StructField("fault_type_label", T.StringType()),
])

# state: JSON-encoded trailing row buffer + temp_drift run length
_STATE_SCHEMA = T.StructType([
    T.StructField("buffer", T.StringType()),
    T.StructField("run_len", T.LongType()),
])

_BUFFER_COLS = [
    "timestamp", "ahu_id", "temp_zone_c", "power_kw", "fan_speed_pct",
    "setpoint_c", "mode", "fault_type",
]
# Trailing context: the 12-row (60-min) rolling windows need 11 prior
# rows; the oscillation window needs 12 prior temp_change_rate values =
# 13 prior raw rows (diff consumes one), so 13 covers every rule.
_BUFFER_ROWS = 13


def read_sensor_stream(
    spark: SparkSession,
    input_dir: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source readStream over the raw sensor schema (explicit schema —
    streaming sources never infer)."""
    reader = spark.readStream.schema(HVAC_RAW)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(input_dir)


def windowed_zone_stats(
    stream: DataFrame,
    width: str = "15 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time sliding-window per-zone stats — the streaming analogue of
    the batch rolling features (time-based windows replace row-count
    windows, per SURVEY §2.10). Append mode: a (zone, window) row emits
    once the watermark passes the window end, which bounds state."""
    temp_error = F.col("temp_zone_c") - F.col("setpoint_c")
    return (
        stream.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", width, slide), F.col("zone_id"))
        .agg(
            F.avg(temp_error).alias("temp_error_mean"),
            F.coalesce(F.stddev(temp_error), F.lit(0.0)).alias("temp_error_std"),
            F.avg("power_kw").alias("power_mean"),
            F.avg("fan_speed_pct").alias("fan_mean"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "zone_id",
            "temp_error_mean",
            "temp_error_std",
            "power_mean",
            "fan_mean",
            "n_rows",
        )
    )


def _compute_features(rows: pd.DataFrame) -> pd.DataFrame:
    """Pandas mirror of plans.hvac.engineer_features for one zone's
    in-order rows (buffer + batch). Same semantics: min_periods=1 rolling,
    sample stddev NaN→0, lag/diff bfill+fillna(0), round 4dp."""
    out = rows.copy()
    out["temp_error_c"] = out["temp_zone_c"] - out["setpoint_c"]
    for src, short in [("temp_error_c", "temp_error"), ("power_kw", "power")]:
        r3 = out[src].rolling(3, min_periods=1)
        r12 = out[src].rolling(12, min_periods=1)
        out[f"{short}_rolling_mean_15min"] = r3.mean()
        out[f"{short}_rolling_std_15min"] = r3.std().fillna(0.0)
        out[f"{short}_rolling_mean_60min"] = r12.mean()
        out[f"{short}_rolling_std_60min"] = r12.std().fillna(0.0)
    out["fan_rolling_mean_15min"] = out["fan_speed_pct"].rolling(3, min_periods=1).mean()
    out["temp_change_rate"] = (
        out["temp_zone_c"].diff().bfill().fillna(0.0)
    )
    feature_cols = [
        "temp_error_c",
        "temp_error_rolling_mean_15min", "temp_error_rolling_std_15min",
        "temp_error_rolling_mean_60min", "temp_error_rolling_std_60min",
        "power_rolling_mean_15min", "power_rolling_std_15min",
        "power_rolling_mean_60min", "power_rolling_std_60min",
        "fan_rolling_mean_15min", "temp_change_rate",
    ]
    out[feature_cols] = out[feature_cols].round(4)
    return out


def stateful_anomaly_stream(
    stream: DataFrame,
    drift_threshold: float = 3.0,
    min_duration: int = 6,
    osc_window: int = 12,
    osc_max_sign_changes: int = 6,
) -> DataFrame:
    """Per-zone stateful rule engine via ``applyInPandasWithState``.

    State per zone = trailing ``_BUFFER_ROWS`` raw rows (enough context to
    reproduce every trailing row-count window the batch features use) plus
    the current temp_drift run length. Each micro-batch: restore buffer →
    compute the batch feature expressions over buffer+batch in pandas →
    evaluate the four rules on the new rows only → persist new state.
    """

    def process(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (zone_id,) = key
        if state.exists:
            buffer_json, run_len = state.get
            buf = pd.read_json(buffer_json, orient="records")
            # normalize to tz-naive UTC so concat with Arrow-batch rows
            # keeps a single datetime64 dtype (mixed aware/naive → object)
            buf["timestamp"] = pd.to_datetime(
                buf["timestamp"], utc=True, format="ISO8601"
            ).dt.tz_localize(None)
        else:
            buf, run_len = pd.DataFrame(columns=_BUFFER_COLS), 0

        batch = pd.concat(list(pdf_iter), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values("timestamp")[_BUFFER_COLS]
        n_buf = len(buf)
        rows = pd.concat([buf, batch], ignore_index=True) if n_buf else batch.reset_index(drop=True)

        feats = _compute_features(rows)
        new = feats.iloc[n_buf:].reset_index(drop=True)

        alerts: list[pd.DataFrame] = []

        def emit(hits: pd.DataFrame, metric: str, score, rule: str, severity) -> None:
            if len(hits) == 0:
                return
            alerts.append(pd.DataFrame({
                "timestamp": hits["timestamp"],
                "zone_id": zone_id,
                "ahu_id": hits["ahu_id"],
                "metric": metric,
                "score": np.asarray(score, dtype=np.float64),
                "rule_name": rule,
                "severity": severity,
                "fault_type_label": hits["fault_type"].fillna("unknown"),
            }))

        # temp_drift: run-length state across batches; emit from the row
        # where the run reaches min_duration (append-mode semantics)
        cond = (new["temp_error_c"] > drift_threshold).to_numpy()
        run_positions = np.zeros(len(new), dtype=np.int64)
        rl = run_len
        for i, c in enumerate(cond):
            rl = rl + 1 if c else 0
            run_positions[i] = rl
        run_len = int(rl)
        drift_hits = new[run_positions >= min_duration]
        emit(
            drift_hits,
            "temp_zone_c",
            np.minimum(3.0, np.abs(drift_hits["temp_error_c"]) / drift_threshold),
            "temp_drift",
            np.where(drift_hits["temp_error_c"] > 5, "high", "medium"),
        )

        # clogged_filter: row-wise on rolling fan mean (exact batch parity)
        cf = new[(new["fan_speed_pct"] > 70) & (new["fan_rolling_mean_15min"] > 65)]
        emit(cf, "fan_speed_pct", np.full(len(cf), 2.0),
             "clogged_filter", np.where(cf["fan_speed_pct"] > 80, "high", "medium"))

        # compressor_failure: 4-conjunct predicate (exact batch parity)
        comp = new[
            (new["power_kw"] < 2.5)
            & (new["temp_error_c"] > 1.5)
            & (new["mode"] == "cooling")
            & (new["power_rolling_mean_60min"] < 3.0)
        ]
        emit(comp, "power_kw", np.full(len(comp), 3.0), "compressor_failure", "high")

        # oscillating control: overlapping trailing-window variant (W7) —
        # sign changes of temp_change_rate over the trailing osc_window rows
        tcr = feats["temp_change_rate"].to_numpy()
        sign_change = np.zeros(len(tcr), dtype=np.int64)
        if len(tcr) > 1:
            sign_change[1:] = (np.sign(tcr[1:]) != np.sign(tcr[:-1])).astype(np.int64)
        trailing = pd.Series(sign_change).rolling(osc_window - 1, min_periods=1).sum().to_numpy()
        osc_mask = trailing[n_buf:] > osc_max_sign_changes
        osc = new[osc_mask]
        emit(osc, "temp_zone_c", np.full(len(osc), 2.0), "oscillating_control", "medium")

        new_buf = rows.iloc[-_BUFFER_ROWS:][_BUFFER_COLS]
        state.update((new_buf.to_json(orient="records", date_format="iso"), run_len))

        if alerts:
            yield pd.concat(alerts, ignore_index=True)

    return (
        stream.groupBy("zone_id")
        .applyInPandasWithState(
            process,
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def write_anomaly_stream(
    anomalies: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Parquet sink + checkpoint (the streaming S7). ``available_now``
    processes the backlog then stops — the batch-parity test mode."""
    writer = (
        anomalies.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
