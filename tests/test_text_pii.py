"""PII detection/redaction (functions.text): pattern coverage and
mask-order invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.functions import text as T


def test_pii_counts_and_redaction(spark):
    s = (
        "write bob.smith+x@mail.example.org or call +1-555-0142-7 "
        "from host 192.168.1.254 today"
    )
    df = spark.createDataFrame([(s,)], "t string")
    counts = T.pii_counts(F.col("t"))
    row = df.select(
        counts["email"].alias("e"),
        counts["phone"].alias("p"),
        counts["ipv4"].alias("i"),
        T.redact_pii(F.col("t")).alias("r"),
    ).first()
    assert (row.e, row.p, row.i) == (1, 1, 1)
    assert row.r == (
        "write [EMAIL] or call [PHONE] from host [IPV4] today"
    )


def test_redact_pii_clean_text_untouched(spark):
    s = "no contact info here, just words and the number 42"
    df = spark.createDataFrame([(s,)], "t string")
    assert df.select(T.redact_pii(F.col("t")).alias("r")).first().r == s
