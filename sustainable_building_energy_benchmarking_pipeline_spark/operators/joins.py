"""Join strategies beyond what AQE picks automatically.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; ``salted_join`` is the explicit form for when the skew is known
ahead of time (one mega-key dominating a fact table) or when running
without AQE — the classic salt-and-replicate decomposition, expressed as
plain DataFrame ops so Catalyst still plans each side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side into
    ``salt_buckets`` sub-keys and replicate the right side once per
    bucket, so one hot key's rows spread over ``salt_buckets`` tasks
    instead of hammering a single reducer.

    Semantically identical to ``left.join(right, on, how)`` for inner
    and left joins (each left row meets each matching right row exactly
    once: the row's salt picks one replica). Cost: right side ×
    ``salt_buckets`` — use when right is the small-but-not-broadcastable
    side and left's key distribution is heavy-tailed; broadcast beats
    salting whenever the right side fits (Spark then does not shuffle
    left at all).

    The salt is ``pmod(xxhash64(monotonically_increasing_id()), b)`` —
    row-unique, so even a single key's rows spread evenly; deterministic
    per task attempt is NOT required since any bucket is correct.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salted_left = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_left.join(replicated_right, [on, "_salt"], how).drop("_salt")


def latest_state_per_key(
    updates: DataFrame,
    key_cols: list[str] | str,
    order_cols: list[Column | str],
    how: str = "max_by",
) -> DataFrame:
    """CDC/upsert compaction WITHOUT a table format: reduce an update
    stream to the latest row per key — the merge step Delta/Iceberg
    perform internally, expressed over plain parquet.

    ``max_by`` form: one aggregation (partial map-side combine, single
    shuffle of one struct per key per map task — the 100 TB shape).
    ``window`` form (how="window"): row_number() DESC, filter rn=1 —
    same result, but shuffles every row; kept for when the full ordered
    history is needed anyway. ``order_cols`` must totally order updates
    within a key (e.g. ts + a unique id as tiebreaker) for deterministic
    output.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ords = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if how == "max_by":
        payload = F.struct(*[F.col(c) for c in updates.columns])
        rank = F.struct(*ords)
        latest = updates.groupBy(*keys).agg(
            F.max_by(payload, rank).alias("_row")
        )
        return latest.select([F.col(f"_row.{c}").alias(c) for c in updates.columns])
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in ords])
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def binned_range_join(
    intervals: DataFrame,
    points: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    point_col: str = "p",
    bin_size: int = 32,
) -> DataFrame:
    """Interval × point range join (``lo <= p < hi``) as an EQUI-join on
    bin ids — the operator Spark itself lacks: a plain non-equi join
    plans as BroadcastNestedLoopJoin (O(|I|·|P|) comparisons, and a hard
    wall once neither side broadcasts).

    Shape: each interval replicates to every ``bin_size``-wide bin it
    overlaps (``ceil(span / bin_size)`` rows, bounded replication); each
    point maps to exactly one bin; the join is then a hash equi-join on
    the bin id — both sides shuffle ONCE on the bin key, comparisons
    happen only within a bin, and the exact predicate filters the bin's
    false candidates. Pick ``bin_size`` near the median interval span:
    smaller bins → more interval replicas; larger bins → more false
    candidates per bin. Hot bins (a point pile-up) are ordinary join
    skew — AQE's skew split (on in session.py) handles them.

    ``lo``/``hi``/``point`` must be integer-valued columns (days since
    epoch, unix seconds, …) — callers convert dates/timestamps first.
    Column names must not collide across the two inputs (rename before
    calling, as with any join).
    """
    w = F.lit(int(bin_size))
    # empty intervals (hi <= lo) match nothing; drop them BEFORE the
    # sequence, which would otherwise count DOWN for stop < start and
    # replicate the interval into wrong bins
    binned_intervals = intervals.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w),
                F.floor((F.col(hi_col) - 1) / w),
            )
        ),
    )
    binned_points = points.withColumn("_bin", F.floor(F.col(point_col) / w))
    return (
        binned_points.join(binned_intervals, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


def _deletion_variants(s: Column) -> Column:
    """``s`` plus every string obtained by deleting one character —
    the SymSpell deletion neighborhood, |s|+1 entries, duplicates
    removed. Pure JVM transform; the empty-string guard matters because
    ``F.sequence(1, 0)`` counts DOWN instead of producing an empty
    sequence."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))),
    )
    return F.when(F.length(s) > 0, F.array_union(F.array(s), dels)).otherwise(
        F.array(s)
    )


def fuzzy_join_ed1(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Fuzzy key join at edit distance ≤ 1 (insert/delete/substitute) —
    the entity-resolution operator Spark lacks: a naive form is an
    O(|L|·|R|) cross join with a levenshtein filter, which plans as
    BroadcastNestedLoopJoin and hits a wall once neither side fits in
    memory.

    Shape (symmetric-deletion blocking, SymSpell): two strings within
    edit distance 1 NECESSARILY share a member of each other's deletion
    neighborhood ({s} ∪ one-char deletions, |s|+1 entries), so each side
    explodes to its neighborhood, candidates come from an EQUI-join on
    ``xxhash64(variant)`` (8-byte shuffle keys instead of strings), and
    the exact ``levenshtein`` check — linear-cost, run only on distinct
    candidate pairs — removes the false candidates (shared-variant is
    not sufficient: "ab"/"ba" share "a" at distance 2; hash collisions
    land in the same net). Work scales with Σ bucket² over variant
    buckets — the LSH-bucket cost model, not |L|·|R|; a pile-up on a
    short common variant is ordinary join skew (AQE splits it).

    Returns distinct ``(left_key, right_key, dist)`` with dist ≤ 1,
    NULL keys dropped. Self-matches of a self-join (same string both
    sides) come back at dist 0 — filter at the call site.
    """
    lv = (
        left.select(F.col(left_key).cast("string").alias("left_key"))
        .where(F.col("left_key").isNotNull())
        .distinct()
        .select("left_key", F.explode(_deletion_variants(F.col("left_key"))).alias("_v"))
        .select("left_key", F.xxhash64("_v").alias("_h"))
    )
    rv = (
        right.select(F.col(right_key).cast("string").alias("right_key"))
        .where(F.col("right_key").isNotNull())
        .distinct()
        .select(
            "right_key", F.explode(_deletion_variants(F.col("right_key"))).alias("_v")
        )
        .select("right_key", F.xxhash64("_v").alias("_h"))
    )
    return (
        lv.join(rv, "_h")
        .select("left_key", "right_key")
        .distinct()
        .withColumn("dist", F.levenshtein("left_key", "right_key"))
        .filter(F.col("dist") <= 1)
    )
