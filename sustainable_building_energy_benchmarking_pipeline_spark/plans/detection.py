"""Anomaly detection: 4 rule detectors + IsolationForest union
(SURVEY §2.9, reference ``src/models.py``).

Each rule is a pure DataFrame expression producing the anomaly schema
(``src/models.py:59-62``). The reference runs four sequential full-table
pandas passes; here each detector is a lazy plan over the same features
DataFrame — cache the input once and Catalyst shares the scan. The union
is ``unionByName`` (U1, src/models.py:437-440).

Severity/score semantics are copied from the reference behavior exactly:
- temp_drift   (src/models.py:65-127): temp_error_c > 3.0 for ≥6 consecutive
  rows; score = min(3.0, |temp_error|/3.0); high if temp_error > 5.
- clogged_filter (src/models.py:129-155): fan > 70 & fan_roll15 > 65;
  score 2.0; high if fan > 80.
- compressor_failure (src/models.py:157-192): power < 2.5 & temp_error > 1.5
  & mode='cooling' & power_roll60 < 3.0; score 3.0; always high.
- oscillating_control (src/models.py:194-234): >6 sign changes of
  temp_change_rate within a 12-row window; score 2.0; medium; the reference
  advances non-overlapping windows — ``oscillating_control`` reproduces that
  exactly per zone via applyInPandas (zones are bounded groups), while
  ``oscillating_control_window`` is the scalable overlapping-window variant
  (flags a superset; same plan shape at any scale).
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sustainable_building_energy_benchmarking_pipeline_spark.operators import windows as W

ANOMALY_COLS = [
    "timestamp", "zone_id", "ahu_id", "metric", "score",
    "rule_name", "severity", "fault_type_label",
]


def _as_anomalies(df: DataFrame, metric: str, score, rule: str, severity) -> DataFrame:
    return df.select(
        "timestamp",
        "zone_id",
        "ahu_id",
        F.lit(metric).alias("metric"),
        score.cast("double").alias("score"),
        F.lit(rule).alias("rule_name"),
        severity.alias("severity"),
        F.coalesce(F.col("fault_type"), F.lit("unknown")).alias("fault_type_label"),
    )


def temp_drift(features: DataFrame, threshold: float = 3.0, min_duration: int = 6) -> DataFrame:
    """Gaps-and-islands rule (W6): sustained positive temp error."""
    runs = W.detect_runs(
        features,
        F.col("temp_error_c") > threshold,
        partition_by="zone_id",
        order_by="timestamp",
        min_run_length=min_duration,
    )
    return _as_anomalies(
        runs,
        "temp_zone_c",
        F.least(F.lit(3.0), F.abs(F.col("temp_error_c")) / threshold),
        "temp_drift",
        F.when(F.col("temp_error_c") > 5, "high").otherwise("medium"),
    )


def clogged_filter(features: DataFrame) -> DataFrame:
    """Compound-predicate rule (P3): high fan with elevated rolling fan."""
    hits = features.filter(
        (F.col("fan_speed_pct") > 70) & (F.col("fan_rolling_mean_15min") > 65)
    )
    return _as_anomalies(
        hits,
        "fan_speed_pct",
        F.lit(2.0),
        "clogged_filter",
        F.when(F.col("fan_speed_pct") > 80, "high").otherwise("medium"),
    )


def compressor_failure(features: DataFrame) -> DataFrame:
    """4-conjunct predicate rule (P3): low power while cooling demand unmet."""
    hits = features.filter(
        (F.col("power_kw") < 2.5)
        & (F.col("temp_error_c") > 1.5)
        & (F.col("mode") == "cooling")
        & (F.col("power_rolling_mean_60min") < 3.0)
    )
    return _as_anomalies(
        hits, "power_kw", F.lit(3.0), "compressor_failure", F.lit("high")
    )


def oscillating_control_window(
    features: DataFrame, window_size: int = 12, max_sign_changes: int = 6
) -> DataFrame:
    """Scalable overlapping-window oscillation detector (W7).

    Pairwise sign-change indicator summed over a (window_size−1)-row frame
    = exactly the reference's ``np.diff(np.sign(x)) != 0`` count within each
    12-row window (the frame excludes the pair that crosses the window
    boundary). Flags every row whose trailing window oscillates — a
    superset of the reference's non-overlapping scan.
    """
    w = W.ordered_window("zone_id", "timestamp")
    flagged = features.withColumn(
        "_sign_changes",
        W.sliding_sign_change_count("temp_change_rate", w, window_size),
    ).filter(F.col("_sign_changes") > max_sign_changes)
    return _as_anomalies(
        flagged, "temp_zone_c", F.lit(2.0), "oscillating_control", F.lit("medium")
    )


def oscillating_control(
    features: DataFrame, window_size: int = 12, max_sign_changes: int = 6
) -> DataFrame:
    """Reference-exact oscillation detector (src/models.py:194-234).

    The non-overlapping advance (flag 12 rows, then skip past them) is
    inherently sequential per zone, so this runs the scan inside
    ``applyInPandas`` per zone — Arrow-batched, one group per zone. Zones
    are bounded (~10-100); for unbounded keys use
    ``oscillating_control_window``.
    """
    import numpy as np

    schema = T.StructType([
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("zone_id", T.StringType()),
        T.StructField("ahu_id", T.StringType()),
        T.StructField("metric", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("rule_name", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("fault_type_label", T.StringType()),
    ])

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("timestamp").reset_index(drop=True)
        out_idx: list[int] = []
        i = 0
        vals = pdf["temp_change_rate"].values
        n = len(pdf)
        while i < n - window_size + 1:
            window = vals[i : i + window_size]
            sign_changes = int(np.sum(np.diff(np.sign(window)) != 0))
            if sign_changes > max_sign_changes:
                out_idx.extend(range(i, i + window_size))
                i += window_size
            else:
                i += 1
        hits = pdf.iloc[out_idx]
        ftl = (
            hits["fault_type"].fillna("unknown")
            if "fault_type" in hits.columns
            else "unknown"
        )
        return pd.DataFrame(
            {
                "timestamp": hits["timestamp"],
                "zone_id": hits["zone_id"],
                "ahu_id": hits["ahu_id"],
                "metric": "temp_zone_c",
                "score": 2.0,
                "rule_name": "oscillating_control",
                "severity": "medium",
                "fault_type_label": ftl,
            }
        )

    cols = ["timestamp", "zone_id", "ahu_id", "temp_change_rate"] + (
        ["fault_type"] if "fault_type" in features.columns else []
    )
    return features.select(*cols).groupBy("zone_id").applyInPandas(scan, schema)


def run_rule_detection(features: DataFrame, exact_oscillation: bool = True) -> DataFrame:
    """All four rules unioned (src/models.py:30-63 + :437-440)."""
    osc = oscillating_control if exact_oscillation else oscillating_control_window
    parts = [
        temp_drift(features),
        clogged_filter(features),
        compressor_failure(features),
        osc(features),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
